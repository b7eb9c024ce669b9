package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Expressions._

class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("surrogateKey matches PG md5(a||b) byte-for-byte") {
    val df = Seq(("The Matrix", 136)).toDF("nm", "dur")
    val key = df.select(surrogateKey(col("nm"), col("dur"))).head.getString(0)
    // psql: select md5('The Matrix' || 136) = md5('The Matrix136')
    assert(key == java.security.MessageDigest.getInstance("MD5")
      .digest("The Matrix136".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("surrogateKey null-propagates like PG ||") {
    val df = Seq((Some("x"), None: Option[Int])).toDF("nm", "dur")
    assert(df.select(surrogateKey(col("nm"), col("dur"))).head.isNullAt(0))
  }

  test("digitsToLong extracts money digits, empty → null") {
    val df = Seq("$25,000,000", "no digits here", "").toDF("s")
    val out = df.select(digitsToLong(col("s"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    assert(out.toSeq == Seq(25000000L, null, null))
  }

  test("durationMinutes parses hour/minute forms") {
    val df = Seq("2 hours 11 minutes", "2 h 11 m", "45 m", "3 hours")
      .toDF("s")
    assert(df.select(durationMinutes(col("s"))).as[Int].collect().toSeq ==
      Seq(131, 131, 45, 180))
  }

  test("genre parse paths agree on clean input, diverge on apostrophes") {
    val clean = "['Drama', 'Crime']"
    val dfC = Seq(clean).toDF("g")
    val split = dfC.select(parseGenresSplit(col("g"))).head.getSeq[String](0)
    val json = dfC.select(parseGenresJson(col("g"))).head.getSeq[String](0)
    assert(split == Seq("Drama", "Crime"))
    assert(json == Seq("Drama", "Crime"))
    // H45 fidelity quirk: an embedded apostrophe breaks the JSON path
    val dirty = Seq("['L'amour', 'Drama']").toDF("g")
    assert(dirty.select(parseGenresJson(col("g"))).head.isNullAt(0))
    assert(dirty.select(parseGenresSplit(col("g"))).head.getSeq[String](0)
      == Seq("Lamour", "Drama"))
  }

  test("cleanseDescription: NaN sentinel → '', parens stripped") {
    val df = Seq("NaN", "(as Neo)", "plain").toDF("d")
    assert(df.select(cleanseDescription(col("d"))).as[String].collect().toSeq
      == Seq("", "as Neo", "plain"))
  }
}
