package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crypto-shredding: round-trip, one-row-delete erasure, and that the
  * ciphertext actually protects the plaintext. */
class CryptoShredSpec extends SparkSpec {

  import spark.implicits._

  private def people = Seq(
    (1L, "alice"), (2L, "bob"), (3L, "carol"), (4L, "dan")
  ).toDF("id", "name")

  test("encrypt → decrypt round-trips exactly while every key survives") {
    val keys = CryptoShred.keyTable(people, "id", salt = "s")
    val enc = CryptoShred.encrypt(people, "id", "name", keys)
    assert(enc.columns.toSet == Set("id", "name_enc"))
    val back = CryptoShred.decrypt(enc, "id", "name", keys)
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(back == Map(1L -> "alice", 2L -> "bob", 3L -> "carol",
      4L -> "dan"))
  }

  test("shredding a subject is one key-row delete: their value decrypts " +
      "to NULL, everyone else round-trips, the data is never rewritten") {
    val keys = CryptoShred.keyTable(people, "id", salt = "s")
    val enc = CryptoShred.encrypt(people, "id", "name", keys)
      .localCheckpoint() // freeze the ciphertext: erasure must not touch it
    val kept = CryptoShred.shred(keys, Seq(2L, 3L).toDF("id"))
    assert(kept.count() == 2)
    val back = CryptoShred.decrypt(enc, "id", "name", kept)
      .select("id", "name").as[(Long, String)].collect()
      .map { case (i, n) => i -> Option(n) }.toMap
    assert(back == Map(1L -> Some("alice"), 2L -> None, 3L -> None,
      4L -> Some("dan")))
  }

  test("ciphertext is not the plaintext and differs across subjects " +
      "holding the same value (per-subject keys)") {
    val twins = Seq((1L, "same"), (2L, "same")).toDF("id", "name")
    val keys = CryptoShred.keyTable(twins, "id", salt = "s")
    val enc = CryptoShred.encrypt(twins, "id", "name", keys)
      .select("id", "name_enc").as[(Long, Array[Byte])].collect().toMap
    assert(!java.util.Arrays.equals(enc(1L), "same".getBytes("UTF-8")))
    assert(!java.util.Arrays.equals(enc(1L), enc(2L)),
      "two subjects with one value must not share ciphertext")
  }

  test("encrypt FAILS LOUDLY when a subject has no key — never silently " +
      "drops the row (stale key snapshot / post-shred ingest)") {
    val partial = CryptoShred.keyTable(
      people.where(col("id") <= 2), "id", salt = "s")
    // collect(), not count(): column pruning under count() would drop
    // the guarded projection entirely (the guard is scan-local — it
    // fires when the encrypted column is computed, like any expression)
    val e = intercept[Exception](
      CryptoShred.encrypt(people, "id", "name", partial).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("no key for subject")),
      s"wanted the no-key error, got ${messages(e)}")
  }

  test("a wrong key never half-decrypts: try_aes_decrypt yields NULL") {
    val keys = CryptoShred.keyTable(people, "id", salt = "s")
    val enc = CryptoShred.encrypt(people, "id", "name", keys)
    val wrong = CryptoShred.keyTable(people, "id", salt = "OTHER")
    val back = CryptoShred.decrypt(enc, "id", "name", wrong)
      .select("name").as[String].collect()
    assert(back.forall(_ == null), "foreign-key decrypt must be NULL")
  }
}
