package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinBucketingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def points = Seq(
    (1L, ts("2024-01-01 00:00:00")), // == start → in
    (2L, ts("2024-01-01 00:14:59")),
    (3L, ts("2024-01-01 00:15:00")), // == end → out
    (4L, ts("2024-01-01 03:59:59")),
    (5L, ts("2024-01-01 00:20:00"))
  ).toDF("pid", "pts")

  private def intervals = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:15:00")),
    (11L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")),
    (12L, ts("2024-01-01 00:14:00"), ts("2024-01-01 00:29:00"))
  ).toDF("iid", "istart", "iend")

  private val expected = Set((1L, 10L), (2L, 10L), (4L, 11L),
    (2L, 12L), (3L, 12L), (5L, 12L))

  private def naiveJoin =
    points.join(intervals,
        col("pts") >= col("istart") && col("pts") < col("iend"))
      .select("pid", "iid")

  test("rewrites the naive inequality join to a bucketed equi join") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    try {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_lbkt"), s"rule did not fire:\n$plan")
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("SortMergeJoin"),
        s"narrow leg is not a hash/merge equi join:\n$plan")
      val ds = df.as[(Long, Long)]
      assert(ds.collect().toSet == expected,
        "rewritten join changed the result")
      // No interval here spans more than maxBucketsPerRow, so the wide
      // fallback leg is runtime-empty; AQE's empty-relation propagation
      // must erase its nested loop so the probe side is not scanned twice.
      val planStr = ds.queryExecution.executedPlan.toString
      assert(planStr.contains("isFinalPlan=true"), planStr)
      val finalPlan = planStr.split("== Initial Plan ==").head
      assert(!finalPlan.contains("BroadcastNestedLoopJoin") &&
        !finalPlan.contains("CartesianProduct"),
        s"empty wide leg survived AQE:\n$finalPlan")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("without the rule the same join IS a nested loop (the problem)") {
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("CartesianProduct"))
    assert(naiveJoin.as[(Long, Long)].collect().toSet == expected)
  }

  test("does not fire on joins with equi keys or non-matching shapes") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    try {
      // equi key present → Catalyst already hash-joins; rule must not touch
      val l = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("k", "lts")
      val r = Seq((1L, ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:01:00"))).toDF("k2", "rstart", "rend")
      val df = l.join(r, col("k") === col("k2") &&
        col("lts") >= col("rstart") && col("lts") < col("rend"))
      assert(df.count() == 1)
      // left outer with the same range condition → untouched semantics
      val outer = l.join(r, col("lts") >= col("rstart") &&
        col("lts") < col("rend"), "left")
      assert(outer.count() == 1)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("respects the bucket-width conf") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    spark.conf.set("graft.rangeJoin.bucketSeconds", "60")
    try {
      assert(naiveJoin.as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.conf.unset("graft.rangeJoin.bucketSeconds")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("a non-positive bucket width falls back instead of emptying the join") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    spark.conf.set("graft.rangeJoin.bucketSeconds", "0")
    try {
      // width 0 would make IntegralDivide yield null buckets on both
      // sides — an equi join that silently matches NOTHING
      assert(naiveJoin.as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.conf.unset("graft.rangeJoin.bucketSeconds")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("wide sentinel intervals take the fallback leg, not a giant explode") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    try {
      // an SCD2-style open row: valid_to = 9999-12-31 spans ~2.8e8 buckets
      // at the default width — the unguarded rewrite exceeded Spark's max
      // array length at runtime; the guard must route it around the explode
      val sentinels = Seq(
        (90L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")),
        (12L, ts("2024-01-01 00:14:00"), ts("2024-01-01 00:29:00"))
      ).toDF("iid", "istart", "iend")
      val df = points.join(sentinels,
          col("pts") >= col("istart") && col("pts") < col("iend"))
        .select("pid", "iid")
      val got = df.as[(Long, Long)].collect().toSet
      val want = Set((1L, 90L), (2L, 90L), (3L, 90L), (4L, 90L), (5L, 90L),
        (2L, 12L), (3L, 12L), (5L, 12L))
      assert(got == want, "sentinel-guarded rewrite changed the result")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("narrow intervals still avoid the nested loop with the guard in place") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    // cap of 1 bucket: interval 11 (1 h wide, 4+1 buckets at W=900)
    // becomes "wide" and must still join correctly via the fallback leg
    spark.conf.set("graft.rangeJoin.maxBucketsPerRow", "1")
    try {
      assert(naiveJoin.as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.conf.unset("graft.rangeJoin.maxBucketsPerRow")
      spark.experimental.extraOptimizations = Nil
    }
  }
}
