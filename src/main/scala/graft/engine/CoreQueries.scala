package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Expressions._

/** The 7 core-layer (Data Vault) transforms, re-expressed as DataFrame
  * functions. Each mirrors one `core/<name>.sql` script of the reference
  * (also embedded in meta.etl_tab_script, ddl.py:67-242).
  *
  * Inputs are the raw landing tables (FIXTURES.md §1):
  *   movies: url, movie_name, original_name, year, certificate, rating,
  *           genres, budget, gross_worldwide, min_duration   (all string)
  *   actors: movie_name, movie_duration (int), name, raw_role, role
  *
  * PG `UNION` deduplicates, so every union here is `.union(...).distinct()`
  * (positional, like PG). Hubs are tiny relative to facts — callers join
  * them broadcast; at 100 TB the raw→link joins shuffle on the hub key and
  * benefit from AQE.
  */
object CoreQueries {

  /** core/movie_hub.sql — union movie sources, md5(movie_nm||duration) key,
    * drop rows where the null-propagating key is null. */
  def movieHub(imdb: DataFrame, metacritic: DataFrame): DataFrame = {
    def prep(src: DataFrame) = src.select(
      col("movie_name").as("movie_nm"),
      col("min_duration").cast(IntegerType).as("movie_duration"))
    // one distinct: the md5 projection of distinct (movie_nm, duration)
    // rows is itself distinct — the reference's outer SELECT DISTINCT is a
    // no-op and would cost a second full shuffle at scale
    prep(imdb).union(prep(metacritic)).distinct()
      .select(
        surrogateKey(col("movie_nm"), col("movie_duration")).as("movie_id"),
        col("movie_nm"), col("movie_duration"))
      .where(surrogateKey(col("movie_nm"), col("movie_duration")).isNotNull)
  }

  /** core/employee_hub.sql — union actor sources, md5(name) key. */
  def employeeHub(actorImdb: DataFrame, actorMetacritic: DataFrame): DataFrame =
    // narrow to `name` BEFORE the shuffle: distinct over the full 5-column
    // actor row then re-distinct over (md5(name), name) — as the reference
    // writes it — shuffles every column twice for a result that only
    // depends on `name`. One distinct on the one needed column.
    actorImdb.select(col("name")).union(actorMetacritic.select(col("name")))
      .distinct()
      .select(md5(col("name")).as("emp_id"), col("name").as("emp_nm"))

  /** core/genre_hub.sql — split-based genre parse (Expressions.parseGenresSplit)
    * over UNION ALL of both sources, distinct genres, md5 key. */
  def genreHub(imdb: DataFrame, metacritic: DataFrame): DataFrame =
    imdb.select(col("genres")).unionAll(metacritic.select(col("genres")))
      .select(explode(parseGenresSplit(col("genres"))).as("genre"))
      .distinct()
      .select(md5(col("genre")).as("genre_id"), col("genre").as("genre_nm"))

  /** core/movie_info_sat.sql — union with source tag, join movie_hub on the
    * recomputed md5 key (join-on-expression, SURVEY.md C21), satellite key
    * md5(movie_id||url). */
  def movieInfoSat(imdb: DataFrame, metacritic: DataFrame,
                   movieHub: DataFrame): DataFrame = {
    // per-side distincts dropped: distinct(A ∪ B) subsumes them, and each
    // was a full-width shuffle of its own at scale
    def prep(src: DataFrame, tag: String) = src.select(
      col("movie_name"),
      col("min_duration").cast(IntegerType).as("duration"),
      col("original_name"), col("year"), col("certificate"), col("rating"),
      col("budget"), col("gross_worldwide"),
      lit(tag).as("scr_nm"), col("url"))
    val films = prep(imdb, "IMDB").union(prep(metacritic, "METACRITIC")).distinct()
    films
      .join(broadcast(movieHub.select("movie_id")),
        surrogateKey(films("movie_name"), films("duration")) === col("movie_id"))
      .select(
        surrogateKey(col("movie_id"), col("url")).as("title_item_id"),
        col("movie_id"), col("original_name"), col("year"), col("certificate"),
        col("rating"), col("budget"), col("gross_worldwide"), col("scr_nm"),
        col("url"))
      .distinct()
  }

  /** core/movie_genre_link.sql — JSON-based genre parse
    * (Expressions.parseGenresJson), composite-key join to movie_hub
    * (movie_nm AND duration), equi join to genre_hub, link key
    * md5(movie_id||genre_id). */
  def movieGenreLink(imdb: DataFrame, metacritic: DataFrame,
                     movieHub: DataFrame, genreHub: DataFrame): DataFrame = {
    def prep(src: DataFrame) = src.select(
      col("movie_name").as("movie_nm"),
      col("min_duration").cast(IntegerType).as("duration"),
      explode(parseGenresJson(col("genres"))).as("genres"))
    val i = prep(imdb).union(prep(metacritic)).distinct()
    i.join(broadcast(movieHub),
        i("movie_nm") === movieHub("movie_nm") &&
          i("duration") === movieHub("movie_duration"))
      .join(broadcast(genreHub), genreHub("genre_nm") === i("genres"))
      .select(
        surrogateKey(movieHub("movie_id"), genreHub("genre_id"))
          .as("mv_gen_link_id"),
        movieHub("movie_id").as("movie_id"),
        genreHub("genre_id").as("genre_id"))
      .distinct()
  }

  /** core/movie_emp_link.sql — actor rows keyed to both hubs; note the
    * `is not null` filter on the computed movie key (null propagation,
    * SURVEY.md B14). */
  def movieEmpLink(actorImdb: DataFrame, actorMetacritic: DataFrame,
                   employeeHub: DataFrame, movieHub: DataFrame): DataFrame = {
    def prep(src: DataFrame) = src.select(
      col("movie_name").as("movie_nm"),
      col("movie_duration").cast(IntegerType).as("duration"),
      col("name"))
    val t1 = prep(actorImdb).union(prep(actorMetacritic)).distinct()
    val t2 = t1.select(
        surrogateKey(col("movie_nm"), col("duration")).as("movie_id"),
        md5(col("name")).as("emp_id"))
      .where(surrogateKey(col("movie_nm"), col("duration")).isNotNull)
    t2.join(broadcast(employeeHub.select(col("emp_id").as("j_emp_id"))),
        t2("emp_id") === col("j_emp_id"))
      .join(broadcast(movieHub.select(col("movie_id").as("m_movie_id"))),
        col("m_movie_id") === t2("movie_id"))
      .select(
        surrogateKey(col("m_movie_id"), t2("emp_id")).as("movie_emp_link_id"),
        col("m_movie_id").as("movie_id"),
        t2("emp_id").as("emp_id"))
      .distinct()
  }

  /** core/emp_movie_l_sat.sql — role satellite on the movie-employee link;
    * key md5(link_id||raw_role||role). */
  def empMovieLSat(actorImdb: DataFrame, actorMetacritic: DataFrame,
                   movieEmpLink: DataFrame): DataFrame = {
    // Shuffle inventory (vs the reference's literal SELECT DISTINCT
    // nesting): per-side distincts are subsumed by distinct(A ∪ B); the
    // link-membership JOIN + trailing DISTINCT becomes a left-semi join —
    // movie_emp_link_id is unique in the link table (it's md5(movie_id ||
    // emp_id) of distinct pairs), so the join cannot fan out and t3's rows
    // are already distinct. 5 wide shuffles → 2.
    def prep(src: DataFrame) = src.select(
      col("movie_name"),
      col("movie_duration").cast(IntegerType).as("dur"),
      col("name"), col("raw_role"), col("role"))
    val t2 = prep(actorImdb).union(prep(actorMetacritic)).distinct()
      .select(
        surrogateKey(col("movie_name"), col("dur")).as("movie_id"),
        md5(col("name")).as("emp_id"),
        col("raw_role"), col("role"))
    val t3 = t2.select(
        surrogateKey(col("movie_id"), col("emp_id")).as("emp_movie_link_id"),
        col("raw_role"), col("role"))
      .distinct()
    t3.join(movieEmpLink.select(col("movie_emp_link_id")),
        t3("emp_movie_link_id") === col("movie_emp_link_id"), "left_semi")
      .select(
        surrogateKey(col("emp_movie_link_id"), col("raw_role"), col("role"))
          .as("movie_emp_role_id"),
        col("emp_movie_link_id").as("movie_emp_link_id"),
        col("raw_role").as("description"),
        col("role"))
  }

  /** The raw-layer preprocess step (etl_layer_transfer.py:3-23, SURVEY.md
    * B17/B18): actor rows whose `role` is not one of the four known roles
    * had their columns rotated at scrape time; repair by rotating back
    * (raw_role→name, role→raw_role, name→role) and keep the good rows.
    * DELETE+INSERT becomes a filter + union rewrite.
    */
  def preprocessActors(actors: DataFrame,
                       knownRoles: Seq[String] = Seq("director", "producer", "writer", "actor")): DataFrame = {
    // PG `role not in (...)` is UNKNOWN for NULL role — the reference
    // neither rotates nor deletes such rows (etl_layer_transfer.py:18-20),
    // so they must pass through unchanged, not vanish from both branches.
    val rotate = coalesce(!col("role").isin(knownRoles: _*), lit(false))
    val good = actors.where(!rotate)
    val repaired = actors.where(rotate)
      .select(
        col("movie_name"), col("movie_duration"),
        col("raw_role").as("name"),
        col("role").as("raw_role"),
        col("name").as("role"))
    good.select(repaired.columns.map(col): _*).union(repaired)
  }
}
