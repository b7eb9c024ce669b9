package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Token-budget sequence packing — the pretraining-data step that groups
  * documents into fixed-budget bins (training sequences / shard files):
  * documents are laid out in a deterministic global order and cut into
  * contiguous bins of ~`budget` total weight.
  *
  * The core primitive is a DISTRIBUTED PREFIX SUM. A windowed
  * `sum() OVER (ORDER BY ...)` with no partition key collapses to a
  * single-partition window — the same 100 TB cliff GlobalRank avoids for
  * ranking. Here: range-repartition + sort on the order (one exchange),
  * per-partition weight totals (one tiny job: one long per partition to
  * the driver — bounded scalars, not data), broadcast exclusive offsets,
  * then a partition-local running sum. Every row gets the exact global
  * cumulative weight without ever funneling rows through one task.
  *
  * Bin assignment is contiguous packing: a row's bin is
  * `(cumulative_before_row) div budget` — so bins are contiguous in the
  * global order and each bin's weight stays below `budget` + one maximal
  * row (the greedy contiguous bound). The order must be total (supply a
  * tiebreak) for determinism, exactly like the window form.
  */
object Packing {

  /** Append `cum` (inclusive global running weight) and `bin` columns.
    * `weightCol` must be a non-negative integral column.
    *
    * `startCum` is the RESUME contract: pass the previous export's final
    * `cum` and the new batch continues the same global prefix sum — bins
    * keep numbering where the last run stopped, and packing a corpus in
    * two appends is row-identical to packing it whole (PackingSpec pins
    * the equivalence), provided the appended order keys sort after the
    * already-packed ones. At 100 TB this is what makes the nightly
    * export incremental: O(new batch), never a repack of history. */
  def packByBudget(df: DataFrame, order: Seq[Column], weightCol: String,
                   budget: Long,
                   numPartitions: Option[Int] = None,
                   startCum: Long = 0L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(startCum >= 0, s"startCum must be non-negative, got $startCum")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    // persist at the RDD level, not the DataFrame level: the two passes
    // below must see identical partitions, but a DataFrame persist is
    // pinned by the session's CacheManager until explicitly unpersisted —
    // a leak per call in a long-lived session. An RDD persist is released
    // by the ContextCleaner as soon as the returned frame (whose lineage
    // holds the only reference) is garbage collected.
    val sortedRdd = sorted.rdd
    sortedRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    def weightOf(r: Row): Long = {
      val w = r.get(wIdx) match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case other => throw new IllegalArgumentException(
          s"weight column $weightCol must be integral, got $other")
      }
      if (w < 0) throw new IllegalArgumentException(
        s"weight column $weightCol must be non-negative, got $w " +
          "(a negative weight would make the running sum non-monotone " +
          "and bin ids decrease)")
      w
    }
    // one long per partition to the driver — bounded by the partition
    // count, never by the data
    val partSums = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += weightOf(r))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(startCum)(_ + _)
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField("cum", LongType, nullable = false),
      StructField("bin", LongType, nullable = false)))
    val packed = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        val w = weightOf(r)
        val bin = run / budget // cumulative BEFORE this row
        run += w
        Row.fromSeq(r.toSeq ++ Seq(run, bin))
      }
    }
    spark.createDataFrame(packed, schema)
  }

  /** Append `cum` — the inclusive global running sum of `deltaCol` in the
    * given total `order` — with SIGNED deltas, which is what
    * [[packByBudget]]'s monotone contract forbids and what a sweep line
    * needs: interval-overlap problems (peak concurrency, active-session
    * counts, resource high-water marks) reduce to +1/−1 points swept in
    * time order, and `cum` IS the concurrency at each point. Same
    * distributed shape as the packer: range exchange on the order, one
    * signed long per partition to the driver, partition-local rescan —
    * never a single-partition window. The order must be total (add a
    * unique tiebreaker) and, for sweeps, must place an interval's end
    * before an unrelated start at the same instant iff touching
    * intervals shouldn't count as overlap — the caller encodes that in
    * the delta sort position. */
  def runningTotal(df: DataFrame, order: Seq[Column], deltaCol: String,
                   numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    // RDD-level persist for the two passes — see packByBudget's note
    val sortedRdd = sorted.rdd
    sortedRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dIdx = sorted.schema.fieldIndex(deltaCol)
    def deltaOf(r: Row): Long = r.get(dIdx) match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case other => throw new IllegalArgumentException(
        s"delta column $deltaCol must be integral, got $other")
    }
    val partSums = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += deltaOf(r))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = StructType(sorted.schema.fields :+
      StructField("cum", LongType, nullable = false))
    val swept = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        run += deltaOf(r)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(swept, schema)
  }

  /** Materialize packed training SHARDS: [[packByBudget]] then a parquet
    * write PARTITIONED BY bin — one directory per training shard, so a
    * trainer (or a resumed export job) reads exactly the shards it wants
    * and nothing else, the same partition-pruning contract as the IVF
    * index layout (Similarity.writeIndex). The write repartitions on bin
    * so each shard is one task's output — shard files are contiguous,
    * not striped across every executor's partials. Deterministic: same
    * input + order + budget ⇒ byte-identical shard contents (PackingSpec
    * pins it). */
  def writeShards(df: DataFrame, order: Seq[Column], weightCol: String,
                  budget: Long, dir: String,
                  numPartitions: Option[Int] = None): Unit =
    packByBudget(df, order, weightCol, budget, numPartitions)
      .repartition(col("bin"))
      .sortWithinPartitions(order: _*)
      .write.mode("overwrite").partitionBy("bin").parquet(dir)

  /** Per-bin integrity manifest of a packed frame (a `packByBudget`
    * output): row count, weight sum, running-total end, and an md5 over
    * `idExpr` values IN PACK ORDER — order imposed by
    * `array_sort(collect_list(struct))`, never by collect order. A
    * dropped, duplicated, or reordered row flips exactly the affected
    * bins' rows; the manifest is what a training job checks before
    * consuming an export (gated end-to-end by `q_export_manifest`). */
  def shardManifest(packed: DataFrame, order: Seq[Column], idExpr: Column,
                    weightCol: String): DataFrame = {
    val sortKey = struct(order :+ idExpr.as("__id"): _*)
    packed.groupBy("bin").agg(
      count(lit(1)).as("n_rows"),
      sum(weightCol).as("weight_sum"),
      max("cum").as("cum_end"),
      md5(array_join(transform(array_sort(collect_list(sortKey)),
        x => x.getField("__id")), " ")).as("ids_md5"))
  }

  /** [[writeShards]] plus the manifest: `dir/data/bin=N/` shards and
    * `dir/manifest/` — the export artifact pair a trainer consumes.
    * Manifest is written AFTER the data (a crash between the two leaves
    * data without a manifest — visibly unverifiable, never silently
    * wrong). */
  def writeShardsWithManifest(df: DataFrame, order: Seq[Column],
                              idExpr: Column, weightCol: String,
                              budget: Long, dir: String,
                              numPartitions: Option[Int] = None): Unit = {
    val packed = packByBudget(df, order, weightCol, budget, numPartitions)
    packed.repartition(col("bin"))
      .sortWithinPartitions(order: _*)
      .write.mode("overwrite").partitionBy("bin").parquet(s"$dir/data")
    shardManifest(packed, order, idExpr, weightCol)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** Validate a written export against its manifest: recompute every
    * bin's integrity row from the data actually on disk and full-outer
    * join with the stored manifest — returns one row per bin with `ok`
    * (false for corrupted, missing, or phantom bins). Reading the data
    * once is the entire cost; partition pruning lets a consumer validate
    * a bin subset by filtering before the aggregation. */
  def validateShards(spark: org.apache.spark.sql.SparkSession, dir: String,
                     order: Seq[Column], idExpr: Column,
                     weightCol: String): DataFrame = {
    val data = spark.read.parquet(s"$dir/data")
    val recomputed = shardManifest(data, order, idExpr, weightCol)
      .withColumnRenamed("n_rows", "got_n_rows")
      .withColumnRenamed("weight_sum", "got_weight_sum")
      .withColumnRenamed("cum_end", "got_cum_end")
      .withColumnRenamed("ids_md5", "got_ids_md5")
    val stored = spark.read.parquet(s"$dir/manifest")
    stored.join(recomputed, Seq("bin"), "full_outer")
      .select(col("bin"),
        (col("n_rows") === col("got_n_rows") &&
          col("weight_sum") === col("got_weight_sum") &&
          col("cum_end") === col("got_cum_end") &&
          col("ids_md5") === col("got_ids_md5")).as("ok"))
      .withColumn("ok", coalesce(col("ok"), lit(false)))
  }

  /** Length-bucketed batch assembly (dynamic batching): rows are grouped
    * into buckets of similar length, then cut into fixed-size batches
    * inside each bucket — padded-batch training/inference wastes
    * `batch·max(len) − Σlen` tokens per batch, and bucketing by length
    * is the standard way to shrink that waste without an O(n log n)
    * global sort. Returns per-batch accounting:
    * (bucket, batch_idx, n_rows, max_len, len_sum, padding_waste).
    *
    * Deterministic: bucket = min(len div bucketWidth, maxBucket), batch
    * order = id within bucket. The per-bucket window is a full
    * row_number (every row needs a batch), so the shuffle is one
    * exchange on bucket — at 100 TB use more buckets (smaller
    * `bucketWidth`) to keep per-bucket partitions bounded; the
    * integer-exact accounting hash-gates. */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenCol: String,
                          bucketWidth: Long, maxBucket: Int,
                          batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && maxBucket >= 0)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("bucket").orderBy(idCol)
    df.select(col(idCol), col(lenCol).cast("long").as("len"),
        least(col(lenCol).cast("long").divide(bucketWidth).cast("long"),
          lit(maxBucket.toLong)).as("bucket"))
      .withColumn("batch_idx",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy("bucket", "batch_idx")
      .agg(count(lit(1)).as("n_rows"), max("len").as("max_len"),
        sum("len").as("len_sum"))
      .withColumn("padding_waste",
        col("n_rows") * col("max_len") - col("len_sum"))
  }
}
