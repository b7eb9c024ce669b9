package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions.tokens

/** Positional phrase search — exact consecutive-token matching over a
  * corpus, the retrieval operation a bag-of-words index ([[Bm25]])
  * structurally cannot express (it loses positions at tf aggregation).
  * The decontamination sibling: "does this benchmark sentence appear
  * verbatim as a token sequence" is a phrase query, not a term query.
  *
  * Algorithm: positional postings (term, doc, pos) meet the phrase's
  * (term, offset) rows in ONE equi-join on term; every joined row votes
  * for candidate start `pos - offset`, and a start with votes at all k
  * offsets is a match. One broadcast join + one aggregation, regardless
  * of phrase count or length — never a k-way self-join chain (whose plan
  * depth would grow with the longest phrase) and never a per-phrase
  * pass over the corpus.
  *
  * Scale shape: phrase lists are queries — small frames, broadcast; the
  * corpus side prunes to phrase terms AT the join, aggregates
  * (phrase, doc, start) with map-side partial agg, and never collects.
  * Overlapping occurrences count individually (start positions differ),
  * matching the literal "every i where tokens[i..i+k) == phrase" spec.
  *
  * Vote counting is `count(*)`, not `count(distinct offset)`: postings
  * are unique at (doc, pos) and a phrase's offsets are unique by
  * construction, so a (start, offset) pair cannot repeat — a phrase
  * containing the SAME term at two offsets (e.g. "the big the") still
  * counts exactly once per offset because each posting row joins each
  * offset row once, at different starts.
  */
object PhraseSearch {

  /** Positional postings: one (term, doc_id, pos) row per token, pos
    * 1-based. Scan-local (one generator, no shuffle). */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("p0", "term")))
      .select(col("term"), col("doc_id"),
        (col("p0") + 1).cast(LongType).as("pos"))

  /** Occurrences of each phrase per document. `phrases`:
    * (phrase_id, terms: array<string>) — already-tokenized consecutive
    * sequences. Returns (phrase_id, doc_id, n_hits, first_pos) for
    * documents with ≥ 1 hit; positions are 1-based token indices. */
  def phraseHits(docs: DataFrame, phrases: DataFrame): DataFrame = {
    val postings = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("p0", "term")))
    val phraseTerms = phrases.select(col("phrase_id"),
        size(col("terms")).as("k"),
        posexplode(col("terms")).as(Seq("offset", "term")))
    postings.join(broadcast(phraseTerms), "term")
      .groupBy(col("phrase_id"), col("k"), col("doc_id"),
        (col("p0") - col("offset")).as("start"))
      .agg(count(lit(1)).as("nmatch"))
      .where(col("nmatch") === col("k"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"),
        (min("start") + 1).cast(LongType).as("first_pos"))
  }
}
