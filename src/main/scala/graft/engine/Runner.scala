package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/** Metadata-driven warehouse runner — the Spark re-expression of the
  * reference's `meta.etl_tab_script` / `meta.etl_col` registries plus the
  * `stg_checker` dispatch loop (ddl.py:54-65,463-558;
  * etl_layer_transfer.py:26-65).
  *
  * Each [[TableSpec]] declares what the metadata rows declared: the target
  * schema, the primary key, which columns the SCD2 change predicate compares,
  * the transform, and the load mode. The reference's mode rule (ddl.py:526):
  * SCD2 iff the name doesn't contain 'hub' and the schema isn't 'data_mart' —
  * here an explicit enum, same assignments.
  *
  * The runner executes specs in declared order (links/sats join hubs loaded
  * moments earlier — core/movie_emp_link.sql:26-27 — and emp_movie_l_sat
  * joins the just-loaded movie_emp_link, core/emp_movie_l_sat.sql:41).
  */
object Runner {

  sealed trait LoadMode
  /** Links + satellites: close-out + versioned insert (ddl.py:527-549). */
  case object Scd2Merge extends LoadMode
  /** Hubs + marts: append rows with unseen pk only (ddl.py:551-556). */
  case object InsertOnlyNew extends LoadMode

  /** One row of the metadata registry: meta.etl_tab_script ∪ meta.etl_col. */
  final case class TableSpec(
      name: String,
      schema: StructType,           // declared target schema (pre-validity)
      pk: Seq[String],
      attrs: Seq[String],           // change-predicate columns (SCD2 only)
      mode: LoadMode,
      transform: Warehouse => DataFrame)

  /** The warehouse: named tables, in memory or parquet-backed. Plays the
    * role of the stg/data_mart schemas. */
  final class Warehouse(val spark: SparkSession,
                        persistDir: Option[String] = None) {
    private val tables = mutable.LinkedHashMap.empty[String, DataFrame]

    def apply(name: String): DataFrame = tables(name)
    def get(name: String): Option[DataFrame] = tables.get(name)
    def names: Seq[String] = tables.keys.toSeq

    def put(name: String, df: DataFrame): Unit = persistDir match {
      case Some(dir) =>
        // Pipeline breaker, like the reference's CREATE TEMP TABLE temp_
        // (ddl.py:559-570): materialize so both merge legs and downstream
        // consumers read a stable snapshot instead of recomputing lineage.
        // Write-then-rename so a failed job never leaves a half-written
        // table (SURVEY §7.4 "atomic-enough"; a real lakehouse commit
        // protocol — Delta/Iceberg — slots in here unchanged).
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
        val tmp = new org.apache.hadoop.fs.Path(s"$dir/.$name.staging")
        val dst = new org.apache.hadoop.fs.Path(s"$dir/$name")
        df.write.mode("overwrite").parquet(tmp.toString)
        fs.delete(dst, true)
        fs.rename(tmp, dst)
        tables(name) = spark.read.parquet(dst.toString)
      case None =>
        tables(name) = df.localCheckpoint(eager = true)
    }
  }

  /** Run one load cycle (= one `etl_layer_transfer.py` run) over the specs.
    *
    * @param loadTs frozen once per run — PG current_timestamp is
    *               transaction-stable (SURVEY.md H49)
    */
  def runLoad(wh: Warehouse, specs: Seq[TableSpec], loadTs: String): Warehouse = {
    specs.foreach { spec =>
      val snapshot = Scd2.reconcile(spec.transform(wh), spec.schema)
      val merged = spec.mode match {
        case Scd2Merge =>
          val target = wh.get(spec.name).getOrElse(
            emptyTarget(wh.spark, spec))
          Scd2.merge(target, snapshot, spec.pk, spec.attrs, loadTs)
        case InsertOnlyNew =>
          wh.get(spec.name) match {
            case Some(target) => Scd2.insertOnlyNew(target, snapshot, spec.pk)
            case None => snapshot
          }
      }
      wh.put(spec.name, merged)
    }
    wh
  }

  private def emptyTarget(spark: SparkSession, spec: TableSpec): DataFrame = {
    val withValidity = StructType(spec.schema.fields ++
      Seq(org.apache.spark.sql.types.StructField(Scd2.ValidFrom,
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField(Scd2.ValidTo,
            org.apache.spark.sql.types.TimestampType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      withValidity)
  }
}
