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
        // Write staging, rename the live dir ASIDE, rename staging into
        // place, then delete the old copy — a crash at any point leaves
        // either the old or the new table intact, never neither (SURVEY
        // §7.4 "atomic-enough"; a real lakehouse commit protocol —
        // Delta/Iceberg — slots in here unchanged).
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
        val tmp = new org.apache.hadoop.fs.Path(s"$dir/.$name.staging")
        val dst = new org.apache.hadoop.fs.Path(s"$dir/$name")
        df.write.mode("overwrite").parquet(tmp.toString)
        // swapInto checks both rename return values — FileSystem.rename
        // reports most failures by returning false, and an unchecked false
        // here would either delete the only surviving copy or silently
        // serve the stale table
        graft.sources.Formats.swapInto(fs, tmp, dst)
        // the swap happened behind Spark's back — drop the shared file
        // listing cache for the path or a later scan serves dead files
        spark.catalog.refreshByPath(dst.toString)
        tables(name) = spark.read.parquet(dst.toString)
      case None =>
        tables(name) = df.localCheckpoint(eager = true)
    }

    /** SCD2 leg of `put`: history partitioned by the `valid_to` DATE, so
      * closed history freezes into immutable partitions and an incremental
      * load rewrites ONLY the partitions the merge can touch — the open
      * sentinel partition (`valid_to_date=9999-12-31`, rows still open or
      * newly inserted) and the loadTs close-date partition (rows the run
      * just closed, plus any closed earlier the same day — dynamic
      * partition overwrite replaces whole partitions, so the slice keeps
      * them). At 100 TB this turns the SCD2 write from O(table) into
      * O(open + changed): years of closed history are never rewritten —
      * PipelineSpec asserts the frozen partition's files are untouched
      * across a later load. Partition-grain commit atomicity (per-partition
      * swap by Spark's dynamic overwrite) replaces `put`'s whole-dir swap;
      * a lakehouse table format upgrades it to table-grain unchanged.
      */
    def putScd2(name: String, df: DataFrame,
                affectedDates: Seq[String]): Unit = persistDir match {
      case Some(dir) =>
        import org.apache.spark.sql.functions.{col, lit, to_date}
        val conf = spark.sparkContext.hadoopConfiguration
        val dst = new org.apache.hadoop.fs.Path(s"$dir/$name")
        val fs = dst.getFileSystem(conf)
        val withPart = df.withColumn("valid_to_date",
          to_date(col(Scd2.ValidTo)))
        // Incremental ONLY when THIS process holds the merge target: the
        // merged frame was computed against `tables(name)`, so if the name
        // is absent from the map (fresh Warehouse over a dir a previous
        // process wrote), the merge treated the snapshot as all-new and a
        // partition-scoped write would leave the previous process's closed
        // partitions on disk as orphaned history. Full rewrite heals that.
        if (!tables.contains(name) || !fs.exists(dst)) {
          val tmp = new org.apache.hadoop.fs.Path(s"$dir/.$name.staging")
          withPart.write.partitionBy("valid_to_date")
            .mode("overwrite").parquet(tmp.toString)
          graft.sources.Formats.swapInto(fs, tmp, dst)
        } else {
          // localCheckpoint breaks lineage: the slice derives from a scan
          // of dst, and Spark (rightly) refuses to overwrite a path its
          // write plan still reads. Eager materialization is O(changed
          // partitions), not O(table) — the frozen history is filtered out
          // BEFORE the checkpoint.
          val slice = withPart.where(affectedDates
              .map(d => col("valid_to_date") === to_date(lit(d)))
              .reduce(_ || _))
            .localCheckpoint(eager = true)
          slice.write.partitionBy("valid_to_date")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(dst.toString)
        }
        spark.catalog.refreshByPath(dst.toString)
        tables(name) = spark.read.parquet(dst.toString).drop("valid_to_date")
      case None =>
        tables(name) = df.localCheckpoint(eager = true)
    }
  }

  /** The reference's EXECUTING form of the registry: `meta.etl_tab_script`
    * rows are SQL STRINGS run via dynamic SQL into temp_ staging tables
    * (ddl.py:559-570). The programmatic `transform` closure is the
    * preferred Spark mapping (SURVEY.md §2 H56); this constructor adds
    * mechanism-level parity for registries that hold SQL text: every
    * table currently loaded in the warehouse is registered as a temp
    * view, then the text runs through `spark.sql` — Catalyst compiles it
    * to the same optimized plan the equivalent DataFrame code would
    * build (same optimizer rules, same physical strategies), so a
    * SQL-text registry row is a first-class [[TableSpec]] transform. */
  def sqlTransform(sqlText: String): Warehouse => DataFrame = wh => {
    wh.names.foreach(n => wh(n).createOrReplaceTempView(n))
    // RDD boundary = the reference's CREATE TEMP TABLE temp_ step: the
    // text's result becomes a standalone relation with fresh attribute
    // ids, not a live view subtree — necessary because the merge unions
    // the snapshot with a target derived from the same lineage (shared
    // expression ids crash Union's constraint rewrite), and faithful
    // because dynamic SQL in the reference lands in a temp table before
    // the merge reads it. Lazy (nothing runs until the load consumes
    // it); the row-conversion cost is the temp-table write this models.
    val df = wh.spark.sql(sqlText)
    wh.spark.createDataFrame(df.rdd, df.schema)
  }

  /** Run one load cycle (= one `etl_layer_transfer.py` run) over the specs.
    *
    * @param loadTs frozen once per run — PG current_timestamp is
    *               transaction-stable (SURVEY.md H49)
    */
  def runLoad(wh: Warehouse, specs: Seq[TableSpec], loadTs: String): Warehouse = {
    specs.foreach { spec =>
      val snapshot = Scd2.reconcile(spec.transform(wh), spec.schema)
      spec.mode match {
        case Scd2Merge =>
          val target = wh.get(spec.name).getOrElse(
            emptyTarget(wh.spark, spec))
          val merged = Scd2.merge(target, snapshot, spec.pk, spec.attrs,
            loadTs)
          // the merge can only touch the open sentinel partition and the
          // partition of rows it closes at loadTs — everything else is
          // frozen history (see Warehouse.putScd2)
          wh.putScd2(spec.name, merged,
            Seq(loadTs.take(10), "9999-12-31"))
        case InsertOnlyNew =>
          val merged = wh.get(spec.name) match {
            case Some(target) => Scd2.insertOnlyNew(target, snapshot, spec.pk)
            case None => snapshot
          }
          wh.put(spec.name, merged)
      }
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
