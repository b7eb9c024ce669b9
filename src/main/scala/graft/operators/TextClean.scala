package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus cleaning — the C4-family passes (Raffel et al.,
  * "Exploring the Limits of Transfer Learning", JMLR'20 §2.2 describe
  * the public recipe) that run BETWEEN document-level quality scoring
  * and document-level dedup: boilerplate lines (navigation, cookie
  * banners, subscribe prompts) repeat across millions of pages and
  * survive whole-document fingerprints because the surrounding text
  * differs.
  *
  * Scale shape (both operators): `posexplode` keeps each line's position
  * — scan-local; the per-line rules are pure column expressions; the
  * cross-document frequency table is one map-side-combinable
  * aggregation joined back (AQE broadcasts it when small); reassembly
  * is one aggregation keyed by document using the ordered
  * `array_sort(collect_list(struct(pos, line)))` pattern (order imposed
  * by the sort, never by collect order). No windows, no driver loops —
  * two shuffles end to end at any corpus size.
  */
object TextClean {

  private def lines(df: DataFrame, idCol: String, textCol: String,
                    sep: String): DataFrame =
    // sep is a LITERAL separator (quoted for the regex split), the same
    // string reassembly joins with — never a pattern
    df.select(col(idCol), posexplode(split(col(textCol),
      java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))

  private def reassemble(keptLines: DataFrame, idCol: String,
                         textCol: String, sep: String,
                         keep: org.apache.spark.sql.Column): DataFrame =
    keptLines.groupBy(idCol).agg(
      count(lit(1)).as("n_lines"),
      count(when(keep, 1)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(when(keep,
            struct(col("pos"), col("line"))))),
          s => s.getField("line")),
        sep).as(textCol))

  /** Cross-document line dedup: a line whose corpus frequency exceeds 1
    * survives only in the document with the smallest id containing it
    * (every copy elsewhere is boilerplate by definition); unique lines
    * always survive. Returns (id, n_lines, n_kept, cleaned text) with
    * the kept lines rejoined in their original order. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val ln = lines(df, idCol, textCol, sep)
    val stats = ln.groupBy("line").agg(
      count(lit(1)).as("__cnt"), min(col(idCol)).as("__owner"))
    val keep = col("__cnt") === 1 || col(idCol) === col("__owner")
    reassemble(ln.join(stats, "line"), idCol, textCol, sep, keep)
      .select(col(idCol), col("n_lines"), col("n_kept"), col(textCol))
  }

  /** Per-line quality rules (the scan-local C4 passes): a line survives
    * iff it has at least `minWords` whitespace words AND contains none
    * of the `banned` substrings (case-insensitive). Returns
    * (id, n_lines, n_kept, cleaned text), order preserved. */
  def filterLines(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int, banned: Seq[String],
                  sep: String = "\n"): DataFrame = {
    require(minWords >= 0, s"minWords must be non-negative: $minWords")
    val ln = lines(df, idCol, textCol, sep)
    val wordsOk =
      size(split(trim(col("line")), "\\s+")) >= minWords &&
        trim(col("line")) =!= ""
    val keep = banned.foldLeft(wordsOk)((acc, b) =>
      acc && !lower(col("line")).contains(b.toLowerCase))
    reassemble(ln, idCol, textCol, sep, keep)
      .select(col(idCol), col("n_lines"), col("n_kept"), col(textCol))
  }
}
