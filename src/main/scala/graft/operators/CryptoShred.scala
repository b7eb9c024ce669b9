package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crypto-shredding — GDPR erasure at the VALUE level, the complement
  * of the index-level tombstone lifecycle (TombstoneLedger): sensitive
  * columns are encrypted with a PER-SUBJECT key held in a tiny key
  * table, and "forget subject X" is ONE row delete in the key table —
  * the ciphertext, already copied into every downstream dataset,
  * backup, and export, becomes permanently undecipherable without a
  * single data rewrite. That inversion is the point at 100 TB: the
  * erasure cost is O(subjects forgotten), not O(bytes ever written).
  *
  * Built entirely on Spark's native AES expressions (aes_encrypt /
  * try_aes_decrypt — codegen'd, no UDFs). The key-table joins are
  * UNHINTED: AQE broadcasts the subject-count-sized table while it is
  * small and shuffles past that — a hard broadcast hint would cap the
  * subject population at driver memory.
  *
  * Key derivation here is a deterministic md5-based fixture (so gates
  * and specs replay); production swaps [[keyTable]] for a KMS-backed
  * source — every other path is key-source-agnostic. AES mode is ECB
  * for byte-deterministic ciphertext (the determinism discipline every
  * gate in this library follows); for production secrecy prefer GCM,
  * which trades that determinism for semantic security — decrypt-side
  * code is identical.
  */
object CryptoShred {

  /** One 16-byte AES-128 key per distinct subject id. */
  def keyTable(subjects: DataFrame, idCol: String,
               salt: String): DataFrame =
    subjects.select(col(idCol).cast("long").as("subject_id")).distinct()
      .withColumn("dek",
        unhex(md5(concat(col("subject_id").cast("string"), lit(salt)))))

  /** Encrypt `valueCol` under each row's subject key (unhinted join —
    * see the object note); output carries `<valueCol>_enc` (binary) in
    * place of the plaintext. Requires key coverage of every input
    * subject: a row whose subject has no key (data ingested after that
    * subject was shredded, or a stale key snapshot) FAILS LOUDLY — an
    * eager precondition (one early-out anti-join job, immune to column
    * pruning) plus a scan-local assert as defense in depth — where an
    * inner join would silently drop it, which for an encryption path
    * is undocumented data loss.
    *
    * Cost note: the eager check is one extra scan + distinct shuffle of
    * the input's id column per call — roughly doubling encrypt cost on
    * inputs where the scan dominates — and is check-then-act against a
    * concurrently mutated key table (correctness is still covered by
    * the retained scan-local assert). Callers whose downstream plan
    * provably retains the `_enc` column may pass
    * `eagerCoverageCheck = false` to skip the extra job and rely on the
    * in-scan assert alone. */
  def encrypt(df: DataFrame, idCol: String, valueCol: String,
              keys: DataFrame,
              eagerCoverageCheck: Boolean = true): DataFrame = {
    // The coverage contract is enforced EAGERLY with one tiny
    // early-out job (O(distinct unkeyed subjects), limit 1): the
    // scan-local assert below lives in the `_enc` projection, so any
    // plan that prunes that column (count(), a downstream select that
    // drops it) would silently skip the check — and unlike the old
    // inner join, the left join would then PROPAGATE unkeyed rows.
    // A precondition fails deterministically regardless of plan shape.
    if (eagerCoverageCheck) {
      val unkeyed = df.select(df(idCol).cast("long").as("subject_id"))
        .distinct()
        .join(keys.select("subject_id"), Seq("subject_id"), "left_anti")
        .limit(1).collect()
      require(unkeyed.isEmpty,
        s"CryptoShred.encrypt: no key for subject ${unkeyed.headOption
          .map(_.get(0)).getOrElse("")} — rebuild the key table over " +
          "the input's subjects before encrypting")
    }
    df.join(keys, df(idCol).cast("long") === keys("subject_id"), "left")
      .withColumn(s"${valueCol}_enc",
        when(assert_true(col("dek").isNotNull,
            concat(lit("CryptoShred.encrypt: no key for subject "),
              df(idCol).cast("string"),
              lit(" — rebuild the key table over the input's subjects " +
                "before encrypting"))).isNull,
          aes_encrypt(col(valueCol).cast("binary"), col("dek"),
            lit("ECB"))))
      .drop(valueCol, "subject_id", "dek")
  }

  /** Forget `ids` (a single-column frame of subject ids): one anti-join
    * on the subject-count-sized key table. The data is never touched. */
  def shred(keys: DataFrame, ids: DataFrame): DataFrame =
    keys.join(ids.select(col(ids.columns.head).cast("long")
        .as("subject_id")), Seq("subject_id"), "left_anti")

  /** Decrypt `<valueCol>_enc` with whatever keys SURVIVE in the key
    * table: a left join + try_aes_decrypt, so a shredded subject's
    * value comes back NULL — not an error, not a placeholder — and
    * every surviving subject round-trips exactly. */
  def decrypt(df: DataFrame, idCol: String, valueCol: String,
              keys: DataFrame): DataFrame =
    df.join(keys, df(idCol).cast("long") === keys("subject_id"), "left")
      .withColumn(valueCol,
        try_aes_decrypt(col(s"${valueCol}_enc"), col("dek"), lit("ECB"))
          .cast("string"))
      .drop(s"${valueCol}_enc", "subject_id", "dek")
}
