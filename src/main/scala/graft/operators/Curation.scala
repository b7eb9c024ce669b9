package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level corpus curation: the per-source controls a web-scale
  * training pipeline applies BEFORE document-level filtering — drop
  * blocklisted domains entirely, then cap each surviving domain's
  * contribution so no single crawl host dominates the mixture.
  *
  * Scale shape: the blocklist is a literal broadcast anti-join (never a
  * shuffle of the corpus), and the cap is a per-domain top-k window whose
  * k stays at or below `spark.sql.optimizer.windowGroupLimitThreshold`,
  * so it plans a PARTIAL WindowGroupLimit under the exchange — a hot
  * domain with a billion pages forwards at most k rows per map task
  * (the q_dedup_skew_cap lesson, applied to curation).
  */
object Curation {

  /** Rows of `df` minus blocklisted domains, keeping the top `cap` rows
    * per domain by `order` (callers pass a total order — quality desc
    * with an id tiebreak — so the kept set is deterministic). */
  def domainCap(df: DataFrame, domainCol: String, cap: Int,
                order: Seq[Column], blocklist: Seq[String]): DataFrame = {
    require(cap > 0 && cap <= 1000,
      s"cap must be in (0, 1000] to keep the partial WindowGroupLimit, got $cap")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val blocked = blocklist.toDF(domainCol)
    val w = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    df.join(broadcast(blocked), Seq(domainCol), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap).drop("__rn")
  }
}
