package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.round4

/** The full driver-gated query catalog: SURVEY.md §2 operator coverage plus
  * the training-data-pipeline extensions. SparkEntry delegates here.
  */
object Catalog {

  def queries: Seq[Q] = {
    val qs = all
    // SparkEntry exposes these as a Map: a duplicated name would silently
    // shadow an earlier gate (its oracle would then judge the WRONG
    // query). Round 10 shipped exactly that for a day — fail loudly.
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate catalog query names: ${dups.mkString(", ")}")
    qs
  }

  private def all: Seq[Q] =
    RelationalQueries.all ++
      FunctionQueries.all ++
      Scd2Queries.all ++
      VaultQueries.all ++
      TextQueries.all ++
      VectorQueries.all ++
      EventQueries.all ++
      MediaQueries.all ++
      CurationQueries.all ++
      ApproxQueries.all ++
      TokenQueries.all ++
      GraphQueries.all ++
      SourceQueries.all ++
      EvalQueries.all

  /** Flagship query (driver smoke at sf0.001): the rating_slide analog
    * (SURVEY.md §7.2) — scan → filter → agg → distributed rank → full-outer
    * join → coalesce, the largest operator cross-section per line.
    */
  def entry(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.engine.Tables.t
    import graft.operators.GlobalRank
    val o = t(spark, sfDir, "orders")
    val cut = lit("1998-01-01").cast("timestamp")
    def leaderboard(df: DataFrame, rank: String) =
      GlobalRank.withRowNumber(
        df.groupBy("o_custkey")
          .agg(round4(sum("o_totalprice")).as("spend")),
        rank, Seq(desc("spend"), asc("o_custkey")))
    val early = leaderboard(o.where(col("o_orderdate") < cut), "early_place")
      .alias("a")
    val late = leaderboard(o.where(col("o_orderdate") >= cut), "late_place")
      .alias("b")
    early.join(late, col("a.o_custkey") === col("b.o_custkey"), "full_outer")
      .select(
        coalesce(col("a.o_custkey"), col("b.o_custkey")).as("custkey"),
        col("a.spend").as("early_spend"), col("a.early_place"),
        col("b.spend").as("late_spend"), col("b.late_place"))
      .orderBy(asc_nulls_last("late_place"))
  }
}
