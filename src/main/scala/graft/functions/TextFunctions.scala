package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis expression library for training-data pipelines: tokenizing,
  * language ID, quality scoring, fingerprinting, shingling, MinHash.
  *
  * Everything is built from codegen'd higher-order functions over built-in
  * expressions — no UDFs — so a 100 TB documents scan stays inside
  * whole-stage codegen and the work distributes with zero driver involvement.
  *
  * MinHash design: hash_j(shingle) = md5(j || ':' || shingle) and the
  * signature entry is the lexicographic min over the hex digests — md5 makes
  * the signatures portable across engines (the DuckDB oracle reproduces them
  * byte-for-byte), at the cost of ~2× the throughput of xxhash64. The
  * performance path for the same pipeline is [[graft.expressions.SimHash64]].
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Fixed-size token windows with overlap — the training-prep chunker.
    * Window starts are 0, stride, 2·stride, … (stride = chunkLen −
    * overlap); a window is emitted only if it contributes at least one
    * token beyond the previous chunk's coverage (n = max(1,
    * ceil((size − overlap) / stride)) — a start inside the final chunk's
    * overlap tail would duplicate tokens already emitted). Each chunk is
    * `slice(toks, start+1, chunkLen)`; the final chunk may be short. Pure
    * per-row array arithmetic: scan-local, codegen'd, no shuffle —
    * chunking 100 TB is exactly one pass over the text column. Returns
    * `array<struct<chunk_idx int, chunk array<string>>>`; explode
    * downstream. */
  def tokenChunks(toks: Column, chunkLen: Int, overlap: Int): Column = {
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    require(overlap >= 0 && overlap < chunkLen,
      s"overlap must be in [0, chunkLen), got $overlap")
    val stride = chunkLen - overlap
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.cast("int").as("chunk_idx"),
        slice(toks, i * stride + 1, lit(chunkLen)).as("chunk")))
  }

  /** BPE-ish sub-word segmentation count: letter runs, digit runs, single
    * punctuation marks (the regex tokenizer a tokenizer-less pipeline uses
    * for cost estimates). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      lit(0)))

  /** Small per-language stopword inventories for the n-gram-free language-ID
    * heuristic. Deterministic and tiny by design — language ID at 100 TB is
    * a scan-local scoring expression, not a model. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that",
      "for", "on", "with", "as", "was", "at"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es",
      "los", "del", "se", "las", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu",
      "den", "von", "mit", "auf", "nicht", "im", "sich"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "les", "des",
      "dans", "que", "pour", "qui", "sur", "pas"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai", "ta", "men",
      "zhe", "na", "ni", "hao", "ma", "yi"))

  /** Count of tokens (with multiplicity) that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Heuristic language ID: score each language by stopword hits and pick
    * the max, ties broken by the declared language order; all-zero scores
    * → 'und' (undetermined). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.map { case (lang, words) =>
      struct(stopwordHits(toks, words).as("hits"), lit(lang).as("lang"))
    }
    // max over (hits, lang) structs would tie-break by lang name; instead
    // keep declared priority: fold left, strictly-greater replaces.
    val best = scored.reduceLeft { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** Composite quality score in [0,1]: length saturation, English-stopword
    * ratio, and mean-token-length saturation — the cheap structural signals
    * a pretraining filter thresholds on. Rounded to 4 decimals so the score
    * is bit-stable across engines. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast(DoubleType)
    val lenSat = least(lit(1.0), nTok / 100.0)
    val stopRatio = stopwordHits(toks, stopwords.head._2).cast(DoubleType) /
      greatest(nTok, lit(1.0))
    val meanLen = length(regexp_replace(text, "\\s+", "")).cast(DoubleType) /
      greatest(nTok, lit(1.0))
    val lenOk = least(lit(1.0), meanLen / 8.0)
    Rounding.round4(lit(0.4) * lenSat + lit(0.3) * stopRatio + lit(0.3) * lenOk)
  }

  /** Exact-dedup document fingerprint: md5 over the normalized text
    * (lowercase, punctuation stripped, whitespace collapsed). Survives
    * formatting-only edits; byte-portable across engines. */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Deterministic pseudonymization: a salted-hash surrogate replacing a
    * PII value while preserving equality (same input + salt → same token,
    * so joins and group-bys still line up across tables and runs). The
    * salt keeps tokens non-derivable from the bare value by rainbow
    * lookup; rotating it re-keys the whole corpus. One scan-local md5 —
    * pseudonymizing 100 TB is shuffle-free. NULL stays NULL (a sentinel
    * token would fabricate equality between unknown values). */
  def pseudonymize(value: Column, salt: String, prefix: String = "p_"): Column =
    when(value.isNotNull,
      concat(lit(prefix),
        substring(md5(concat(lit(salt + ":"), value.cast("string"))), 1, 16)))

  /** HTML → text extraction, the curation step upstream of every quality
    * filter on a web corpus: drop `<script>`/`<style>` payloads whole
    * (their CONTENT is not text — a tag-only strip would leak javascript
    * into the corpus), drop comments and remaining tags, decode the six
    * entities that dominate real markup, collapse whitespace. Decode
    * order matters: `&amp;` decodes LAST so `&amp;lt;` yields the literal
    * `&lt;` rather than double-decoding to `<` (the standard rule).
    *
    * A regex chain, not a DOM parse, by design: scan-local, codegen'd
    * builtins, no allocation beyond the rewritten string — the shape that
    * runs over 100 TB of crawl text. Malformed-markup edge cases degrade
    * to extra whitespace, never to dropped text. */
  def stripHtml(html: Column): Column = {
    // two passes, not a </\1> backreference: the DuckDB replay runs RE2,
    // which has no backreferences — both engines walk the same rules
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTag) { case (c, (ent, ch)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ent), ch)
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Word k-shingles (distinct): the near-dup unit for MinHash/Jaccard. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < k, array(array_join(toks, " ")))
        .otherwise(transform(
          sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " "))))
  }

  /** MinHash signature: m lexicographic-min md5 digests over the shingle
    * set, one per seed. Cost is O(m·|shingles|) scan-local work; signatures
    * are 32m bytes — the only thing that shuffles in LSH dedup. */
  def minhashSignature(shingleArr: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => array_min(transform(shingleArr,
        s => md5(concat(j.cast(StringType), lit(":"), s)))))

  /** LSH band keys: split the m-entry signature into `bands` bands of
    * `rowsPerBand` and hash each band. Near-dup candidates = docs sharing
    * any (band index, band key) bucket — the join key that replaces the
    * O(n²) pairwise comparison at scale. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(array_join(
        slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), "|")))
}
