package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge LEARNING over a distributed word-frequency
  * table — the training half of the BPE stack
  * ([[graft.expressions.Bpe]] is the inference half, applying an
  * already-learned merges file). Sennrich et al.'s algorithm: start from
  * characters, repeatedly count adjacent symbol pairs across the
  * (frequency-weighted) vocabulary and merge the most frequent pair.
  *
  * Representation: each word is its symbol sequence joined by single
  * spaces with sentinel spaces at both ends (` h e l l o `). A merge of
  * pair (a, b) is a LEFT-TO-RIGHT GREEDY FOLD over the symbols: append
  * each symbol to a rebuilt string, except that a symbol equal to `b`
  * arriving while the rebuilt string ends with ` a` (space-delimited, so
  * it matches exactly the last whole symbol) fuses into `ab`. That is
  * the reference implementation's list walk — on ` a a a a ` it yields
  * ` aa aa `, where a naive non-overlapping string replace would consume
  * the shared delimiter and strand ` aa a a ` (BpeTrainSpec pins this) —
  * and it is expressible identically in DuckDB as a `list_reduce` over
  * the split symbols, which is what makes the whole training run
  * hash-replayable. Pair counting includes every adjacent position
  * (overlaps too: `aaaa` counts (a,a) three times), per the reference.
  *
  * Determinism: best pair = max summed frequency, ties to the
  * lexicographically smallest (left, right). All counts are integer.
  *
  * Scale shape: the corpus appears ONLY in building the word-frequency
  * input (one corpus-sized aggregation, done by the caller); every merge
  * round touches the vocabulary table — explode adjacent pairs, one
  * sum-shuffle, and ONE (left, right, count) row to the driver (the same
  * per-round scalar contract as Packing's per-partition offsets). The
  * vocabulary re-writes via a codegen'd string replace and
  * localCheckpoints each round so the plan stays one round deep. For a
  * 100 TB corpus the vocab table is millions of rows, not trillions —
  * rounds are seconds, and nothing vocabulary-sized ever reaches the
  * driver.
  */
object BpeTrain {

  /** Learn `nMerges` merges from `words(wordCol, freqCol)`.
    * @return (rank, left, right, cnt) — rank 1 is the first merge learned;
    *         `left`/`right` are the merged symbol pair, `cnt` the summed
    *         frequency that won the round. Fails loudly if the vocabulary
    *         runs out of adjacent pairs before `nMerges` rounds. */
  def learnMerges(words: DataFrame, nMerges: Int,
                  wordCol: String = "word",
                  freqCol: String = "freq"): DataFrame = {
    require(nMerges >= 1 && nMerges <= 10000,
      s"nMerges out of range: $nMerges")
    val spark = words.sparkSession
    import spark.implicits._
    var w = words.select(
        concat(lit(" "), regexp_replace(col(wordCol), "(.)", "$1 ")).as("s"),
        col(freqCol).cast("long").as("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String,
      String, Long)]
    for (i <- 1 to nMerges) {
      val parts = split(trim(col("s")), " ")
      val pairs = when(size(parts) > 1,
        transform(sequence(lit(1), size(parts) - 1),
          j => struct(element_at(parts, j).as("l"),
            element_at(parts, j + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val best = w.select(col("freq"), explode(pairs).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"vocabulary fully merged after ${i - 1} of $nMerges rounds")
      val (l, r, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((i, l, r, cnt))
      val folded = aggregate(split(trim(col("s")), " "), lit(""),
        (acc, x) => when(
          call_function("endswith", acc, lit(s" $l")) && x === lit(r),
          concat(acc, lit(r))).otherwise(concat(acc, lit(" "), x)))
      w = w.select(concat(folded, lit(" ")).as("s"), col("freq"))
        .localCheckpoint(true)
    }
    merges.toSeq.toDF("rank", "left", "right", "cnt")
  }

  /** [[learnMerges]] + the corpus-side word count in one call: tokenize
    * `textCol` on whitespace (lowercased), keep `^[a-z]+$` words of
    * length ≥ 2, take the `vocabSize` most frequent (ties to the
    * lexicographically smaller word) as the weighted training vocabulary.
    * The one corpus-sized stage is the word count. */
  def trainFromCorpus(docs: DataFrame, textCol: String, vocabSize: Int,
                      nMerges: Int): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val counts = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word"))
      .limit(vocabSize)
      // the top-N lands in ONE partition (TakeOrderedAndProject); spread
      // it back out or a LARGE vocabulary's merge rounds run serial.
      // Width is sized from the ROW COUNT (r19, guide §2.5 — a
      // synthetic width of `cpus` gave a 150-word vocabulary 32
      // partitions, so every one of the 12 rounds' two jobs paid 32
      // near-empty tasks): ~1k words per partition, capped at the
      // session's shuffle width, floor 1 — the same value at any core
      // count for a small vocab, and the full cluster width for the
      // millions-of-words corpora the scale note describes.
      .repartition(math.min(
        docs.sparkSession.sessionState.conf.numShufflePartitions,
        math.max(1, vocabSize / 1024)))
    learnMerges(counts, nMerges)
  }
}
