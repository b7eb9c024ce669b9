package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-selective tombstone rewrite — the vacuum shape that
  * survives 100 TB: every persisted index in this library stores its
  * big datasets PARTITIONED by a pruning key (centroid cell, doc/vec
  * bucket, term bucket), so physically removing a tombstone set only
  * ever needs to rewrite the partitions that CONTAIN tombstoned rows.
  * The previous whole-dataset staged swap rewrote the full live index
  * per vacuum — correct, but O(index) when the deletion set touches a
  * handful of cells; this is the one exception class the scaling
  * audit (SCALING_r15.json) named. Here the rewrite is O(affected
  * partitions):
  *
  *   1. ONE column-pruned scan (id + partition column only) semi-joins
  *      the ledger and groups by partition — yielding both the affected
  *      partition list (bounded by the fanout, collected) and the
  *      removed-row count;
  *   2. the anti-join rewrite reads ONLY the affected partitions (the
  *      partition filter is a literal list ≤ fanout values — never the
  *      tombstoned ids themselves) and writes them to a staging dir in
  *      the dataset's own layout;
  *   3. each affected partition LEAF swaps individually
  *      ([[graft.sources.Formats.swapInto]] per leaf — rename-aside,
  *      rename-in, drop); a partition whose every row was tombstoned
  *      has no staged leaf and is deleted outright. Untouched
  *      partitions' files are never opened, never moved.
  *
  * Root-level metadata (the `_compacted_batches` high-water marker,
  * `_SUCCESS`) is untouched by leaf swaps, so no marker carry is
  * needed — one less crash window than the whole-dir swap had.
  *
  * Crash contract: the ledger is cleared by the CALLER only after every
  * leaf swapped, so an interruption mid-pass leaves some partitions
  * vacuumed and some not — reads stay correct throughout (the
  * still-standing ledger masks whatever survived), and the next vacuum
  * converges (already-swapped partitions no longer contain tombstoned
  * rows, so they are simply not affected).
  *
  * A fully-purged dataset (no partition leaf survives) is left with one
  * zero-row schema-carrying file inside a literal `part=0/` leaf — the
  * same readable-AND-appendable empty layout the full-purge rewrite
  * uses ([[graft.sources.Formats.writeEmptyPartitioned]]). That empty
  * leaf is staged BEFORE the first live leaf is removed, so at every
  * instant (including after a crash at any point) at least one
  * schema-carrying leaf exists — reads and the next vacuum never hit a
  * schema-inference failure. Leaf rename-asides are dot-prefixed
  * (see [[graft.sources.Formats.swapInto]]) so partition discovery
  * never parses an in-flight or crashed swap's aside directory.
  */
object SelectiveVacuum {

  /** Vacuum `ts` (a one-column tombstone frame whose column matches
    * `idCol`) out of the dataset at `dsPath`, partitioned by `part`.
    * `slices` is the per-partition file fanout for the rewritten
    * partitions (same clustered-write discipline as the builders).
    * Returns rows removed. */
  def apply(spark: SparkSession, dsPath: org.apache.hadoop.fs.Path,
            part: String, idCol: String, ts: DataFrame,
            slices: Int): Long = {
    val fs = dsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = spark.read.parquet(dsPath.toString)
    val schema = base.schema
    // one column-pruned scan serves the affected-partition list AND the
    // removed count (per-partition counts, bounded by the fanout)
    val perPart = base.select(col(part), col(idCol))
      .join(ts, Seq(idCol), "left_semi")
      .groupBy(part).agg(count(lit(1)).as("__n")).collect()
    if (perPart.isEmpty) return 0L
    val affected = perPart.map(_.get(0)).toSeq
    val removed = perPart.map(_.getLong(1)).sum
    val tmp = new org.apache.hadoop.fs.Path(
      dsPath.getParent, s".${dsPath.getName}.vacuum")
    fs.delete(tmp, true)
    base.where(col(part).isin(affected: _*))
      .join(ts, Seq(idCol), "left_anti")
      .repartition(math.max(1, affected.size * slices), col(part),
        pmod(hash(col(idCol)), lit(slices)))
      .write.mode("overwrite").partitionBy(part).parquet(tmp.toString)
    // full-purge crash safety: if this pass deletes EVERY live leaf and
    // stages none back (all rows tombstoned), a crash after the last
    // delete but before the empty-leaf restore would leave a dataset
    // with only root metadata — schema inference then fails for readers
    // AND for the next vacuum, so it never converges. Stage the
    // zero-row schema-carrying `part=0` leaf BEFORE any leaf is
    // removed: at every instant at least one schema-carrying leaf
    // exists on disk.
    def leafName(v: Any) = s"$part=$v"
    val stagedLeaves =
      if (fs.exists(tmp))
        fs.listStatus(tmp).filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith(s"$part=")).toSet
      else Set.empty[String]
    val liveLeaves = fs.listStatus(dsPath).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(s"$part=")).toSet
    val fullPurge =
      stagedLeaves.isEmpty && liveLeaves.subsetOf(affected.map(leafName).toSet)
    if (fullPurge) {
      val tmpEmpty = new org.apache.hadoop.fs.Path(
        dsPath.getParent, s".${dsPath.getName}.vacuumempty")
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      graft.sources.Formats.writeEmptyPartitioned(empty, part, fs, tmpEmpty)
      val emptyLeaf = new org.apache.hadoop.fs.Path(tmpEmpty, s"$part=0")
      if (liveLeaves.contains(s"$part=0")) {
        // a live part=0 leaf is being purged: hand the empty leaf to the
        // swap loop as its staged replacement — swapInto keeps a leaf
        // standing across the swap, and part=0 is processed FIRST below
        // so every other live leaf still exists during its swap window
        if (!fs.rename(emptyLeaf,
            new org.apache.hadoop.fs.Path(tmp, s"$part=0")))
          throw new java.io.IOException(
            s"could not stage the empty leaf for $dsPath")
      } else if (!fs.rename(emptyLeaf,
          new org.apache.hadoop.fs.Path(dsPath, s"$part=0")))
        throw new java.io.IOException(
          s"could not pre-place the empty leaf under $dsPath")
      fs.delete(tmpEmpty, true)
    }
    val ordered =
      if (fullPurge) affected.sortBy(v => if (leafName(v) == s"$part=0") 0 else 1)
      else affected
    for (v <- ordered) {
      val staged = new org.apache.hadoop.fs.Path(tmp, leafName(v))
      val live = new org.apache.hadoop.fs.Path(dsPath, leafName(v))
      if (fs.exists(staged))
        graft.sources.Formats.swapInto(fs, staged, live)
      else fs.delete(live, true) // every row of the partition tombstoned
    }
    fs.delete(tmp, true)
    // converging fallback (e.g. a pre-existing broken state from older
    // layouts): if no leaf survived, restore the empty layout
    val anyLeaf = fs.exists(dsPath) && fs.listStatus(dsPath).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$part="))
    if (!anyLeaf) {
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      graft.sources.Formats.writeEmptyPartitioned(empty, part, fs, tmp)
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp, s"$part=0"),
          new org.apache.hadoop.fs.Path(dsPath, s"$part=0")))
        throw new java.io.IOException(
          s"could not restore the empty leaf under $dsPath")
      fs.delete(tmp, true)
    }
    spark.catalog.refreshByPath(dsPath.toString)
    removed
  }
}
