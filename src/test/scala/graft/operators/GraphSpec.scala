package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("K4 has exactly 4 triangles; a path has none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val tris = Graph.triangles(k4)
      .as[(Long, Long, Long)].collect().toSet
    assert(tris == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangles(path).count() == 0)
  }

  test("canonicalization dedups reversed/duplicate edges and drops loops") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (2L, 3L), (1L, 3L))
      .toDF("a", "b")
    // after cleanup this is exactly triangle {1,2,3}
    assert(Graph.canonicalEdges(messy).count() == 3)
    assert(Graph.triangles(messy).count() == 1)
  }

  test("triangleStats: star center has wedges but no triangles") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val stats = Graph.triangleStats(star)
      .select("vertex", "deg", "n_tri", "wedges")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (v, d, t0, w) => v -> ((d, t0, w)) }.toMap
    assert(stats(0L) == ((4L, 0L, 6L)))
    assert(stats(1L) == ((1L, 0L, 0L)))
  }

  test("pageRank: symmetric graph gives equal ranks; hub outranks leaves") {
    // C4 cycle — all vertices equivalent
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val ranks = Graph.pageRankFixedPoint(c4, iters = 5)
      .select("rank_micro").as[Long].collect().toSet
    assert(ranks.size == 1, s"cycle ranks diverged: $ranks")
    // star — center collects mass from every leaf
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val r = Graph.pageRankFixedPoint(star, iters = 5)
      .select("vertex", "rank_micro").as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) && r(1L) == r(4L), s"star ranks wrong: $r")
  }

  test("pageRank is partitioning-invariant (integer arithmetic is exact)") {
    val edges = graft.engine.Tables.t(spark, sf001, "events")
      .select((col("user_id") % 20).as("u"),
        ((col("user_id") % 20 + 1 + col("event_id") % 3) % 20).as("v"))
    val a = Graph.pageRankFixedPoint(edges.repartition(1), iters = 3)
      .orderBy("vertex").collect().toSeq
    val b = Graph.pageRankFixedPoint(edges.repartition(13), iters = 3)
      .orderBy("vertex").collect().toSeq
    assert(a == b)
  }
}
