package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-selective vacuum: only the partitions CONTAINING
  * tombstoned ids are rewritten — every other partition's files are
  * bit-for-bit untouched (same names, same lengths, same modification
  * times), which is the on-disk proof the vacuum job neither read nor
  * wrote them. */
class SelectiveVacuumSpec extends SparkSpec {

  import spark.implicits._

  /** (fileName → (len, mtime)) per partition leaf dir. */
  private def leafFiles(root: String): Map[String, Map[String, (Long, Long)]] =
    new java.io.File(root).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map { d =>
        d.getName -> d.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> (f.length(), f.lastModified())).toMap
      }.toMap

  test("SketchIndex vacuum rewrites only the victims' buckets; every " +
      "other bucket's files are untouched; results match a fresh build") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_selvac_sketch").toString
    SketchIndex.writeIndex(emb, dir)
    val victims = Seq(7L, 8L)
    val victimBuckets = victims.map(v => math.floorMod(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42),
      SketchIndex.Buckets)).map(b => s"bucket=$b").toSet
    val before = leafFiles(s"$dir/vectors")
    SketchIndex.deleteFromIndex(victims.toDF("vec_id"), dir)
    assert(SketchIndex.vacuumIndex(spark, dir) == victims.size.toLong)
    val after = leafFiles(s"$dir/vectors")
    // untouched partitions: identical file inventory, bit for bit
    for ((leaf, files) <- before if !victimBuckets.contains(leaf))
      assert(after(leaf) == files,
        s"unaffected partition $leaf was rewritten by a selective vacuum")
    // affected partitions: rewritten (or deleted if fully tombstoned)
    for (leaf <- victimBuckets)
      assert(!after.get(leaf).contains(before(leaf)),
        s"affected partition $leaf was not rewritten")
    // and the vacuumed index answers exactly like one built without
    // the victims
    val live = emb.where(!col("vec_id").isin(victims: _*))
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_selvac_fresh").toString
    SketchIndex.writeIndex(live, fresh)
    val qs = emb.where(col("vec_id") < 3)
    def rows(d: String) = SketchIndex.searchIndex(spark, d, qs, k = 10,
        shortlist = 50)
      .as[(Long, Long, Int, Double, Int)].collect()
      .sortBy(r => (r._1, r._5)).toSeq
    assert(rows(dir) == rows(fresh),
      "selective vacuum diverged from a fresh no-victim build")
  }

  test("a partition whose every row is tombstoned is deleted outright, " +
      "and a fully-purged dataset stays readable and appendable") {
    val vecs = (0L until 8L).map(i =>
      (i, Seq.fill(8)(i.toDouble + 1.0))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_selvac_purge").toString
    SketchIndex.writeIndex(vecs, dir)
    SketchIndex.deleteFromIndex(vecs.select("vec_id"), dir)
    assert(SketchIndex.vacuumIndex(spark, dir) == 8L)
    // every bucket leaf deleted; the schema-carrying empty leaf remains
    assert(spark.read.parquet(s"$dir/vectors").count() == 0L)
    SketchIndex.appendToIndex(vecs, dir)
    assert(spark.read.parquet(s"$dir/vectors").count() == 8L,
      "append after a full selective purge broke the layout")
  }

  test("Similarity IVF vacuum touches only cells containing tombstoned " +
      "vectors") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_selvac_ivf").toString
    Similarity.writeIndex(emb, dir, nClusters = 16)
    val victim = 11L
    val victimCell = spark.read.parquet(s"$dir/assignments")
      .where(col("cand_id") === victim)
      .select("centroid_id").as[Int].head()
    val before = leafFiles(s"$dir/assignments")
    Similarity.deleteFromIndex(Seq(victim).toDF("vec_id"), dir)
    assert(Similarity.vacuumIndex(spark, dir) == 1L)
    val after = leafFiles(s"$dir/assignments")
    for ((leaf, files) <- before if leaf != s"centroid_id=$victimCell")
      assert(after(leaf) == files,
        s"unaffected cell $leaf was rewritten by a selective vacuum")
    assert(after(s"centroid_id=$victimCell") !=
        before(s"centroid_id=$victimCell"),
      "the victim's cell was not rewritten")
    assert(spark.read.parquet(s"$dir/assignments")
      .where(col("cand_id") === victim).count() == 0L)
  }
}
