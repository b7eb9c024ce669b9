package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's scalar-expression library: deterministic surrogate keys and
  * the cleansing expressions the reference applies at ingestion time.
  *
  * All of these are pure `Column` builders over Spark's codegen'd built-ins —
  * no UDFs — so they stay inside whole-stage codegen and push down through
  * Catalyst untouched.
  *
  * Reference semantics reproduced (file:line cites are into /root/reference):
  *  - surrogate keys:    md5 over PostgreSQL `||` concatenation
  *                       (core/movie_hub.sql:13, core/employee_hub.sql:10)
  *  - genre parsing:     two distinct parse paths, split-based
  *                       (core/genre_hub.sql:5-9) and JSON-based
  *                       (core/movie_genre_link.sql:5)
  *  - money/duration/year cleansing: imdb parser.py:85,103-113,50-55
  */
object Expressions {

  /** md5(a||b||...) surrogate key with PostgreSQL `||` semantics:
    * every operand is implicitly cast to text and NULL propagates — a single
    * NULL operand nulls the whole key (which the reference then filters with
    * `is not null`, core/movie_hub.sql:17). Spark's `concat` null-propagates
    * identically; `concat_ws` would NOT and must not be used here.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat(cols.map(_.cast(StringType)): _*))

  /** PG `||` (null-propagating, implicit casts) without the md5 — for
    * display keys like `movie_nm||', '||movie_duration||' min'`
    * (mart/genre_metrics.sql:53). */
  def pgConcat(cols: Column*): Column =
    concat(cols.map(_.cast(StringType)): _*)

  /** Digit extraction: `int(''.join(filter(str.isdigit, s)))`
    * (imdb parser.py:85,91) — money strings like `"$25,000,000"` → 25000000. */
  def digitsToLong(c: Column): Column =
    nullif(regexp_replace(c, "[^0-9]", ""), lit("")).cast(LongType)

  /** Duration normalization: `"2 hours 11 minutes"` / `"2 h 11 m"` → total
    * minutes (imdb parser.py:103-113, metacritic parser.py:104-114). */
  def durationMinutes(c: Column): Column = {
    val h = regexp_extract(c, "(\\d+)\\s*h", 1)
    val m = regexp_extract(c, "(\\d+)\\s*m", 1)
    (when(h === "", lit(0)).otherwise(h.cast(IntegerType)) * 60 +
      when(m === "", lit(0)).otherwise(m.cast(IntegerType)))
  }

  /** 4-digit year extraction (imdb parser.py:50-55). */
  def yearOf(c: Column): Column =
    nullif(regexp_extract(c, "(\\d{4})", 1), lit("")).cast(IntegerType)

  /** Apostrophe stripping applied to every string column at ingest
    * (imdb parser.py:241, metacritic parser.py:202). */
  def stripApostrophes(c: Column): Column = regexp_replace(c, "'", "")

  /** Metacritic metascore (0-100) rescaled to the IMDB 0-10 scale
    * (metacritic parser.py:82). */
  def rescaleMetascore(c: Column): Column = c.cast(DoubleType) / 10

  /** Genre parse path 1 (split-based, core/genre_hub.sql:5-9):
    * `"['Drama', 'Crime']"` → strip `[` `]`, split on `", "`, strip `'`
    * per element. Returns the array; explode at the call site. */
  def parseGenresSplit(genres: Column): Column =
    transform(
      split(translate(genres, "[]", ""), ", "),
      g => regexp_replace(g, "'", ""))

  /** Genre parse path 2 (JSON-based, core/movie_genre_link.sql:5):
    * `replace(genres, '''', '"')::json` + json_array_elements_text.
    * Diverges from path 1 when a value embeds an apostrophe — preserved
    * behavior, see SURVEY.md H45. */
  def parseGenresJson(genres: Column): Column =
    from_json(regexp_replace(genres, "'", "\""), ArrayType(StringType))

  /** `'NaN'`-sentinel cleansing of role descriptions
    * (mart/employee_data.sql:5-7): NaN → '', else strip parentheses. */
  def cleanseDescription(c: Column): Column =
    when(c === "NaN", lit(""))
      .otherwise(translate(c, "()", ""))
}
