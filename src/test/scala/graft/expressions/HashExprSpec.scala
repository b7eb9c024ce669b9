package graft.expressions

import graft.SparkSpec

class RollingHashSpec extends SparkSpec {

  import spark.implicits._

  private val M = (1L << 61) - 1

  private def rh(s: String): Long = {
    RollingHash64.register(spark)
    Seq(s).toDF("s").selectExpr("rolling_hash64(s)").head.getLong(0)
  }

  test("polynomial structure: h(s + c) = h(s)*257 + c (mod 2^61-1)") {
    val base = rh("hello")
    val extended = rh("hello!")
    val expected = (BigInt(base) * 257 + '!'.toInt).mod(BigInt(M)).toLong
    assert(extended == expected)
  }

  test("deterministic, content-sensitive, in range") {
    assert(rh("abc") == rh("abc"))
    assert(rh("abc") != rh("acb")) // order matters (unlike set hashes)
    assert(rh("") == 0L)
    val h = rh("some longer document text with multiple words")
    assert(h >= 0 && h < M)
  }

  test("matches a direct BigInt reference implementation") {
    val s = "The quick brown fox"
    val ref = s.getBytes("UTF-8").foldLeft(BigInt(0)) { (h, b) =>
      (h * 257 + (b & 0xff)).mod(BigInt(M))
    }.toLong
    assert(rh(s) == ref)
  }
}

class SimHash64ExprSpec extends SparkSpec {

  import spark.implicits._

  test("simhash64 is usable from SQL after registration and is codegen'd") {
    SimHash64.register(spark)
    val out = Seq(Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("x", "y"))
      .toDF("toks").selectExpr("simhash64(toks) AS sig")
      .as[Long].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("null array → null signature") {
    SimHash64.register(spark)
    val out = Seq(Option.empty[Seq[String]]).toDF("toks")
      .selectExpr("simhash64(toks)").head
    assert(out.isNullAt(0))
  }
}
