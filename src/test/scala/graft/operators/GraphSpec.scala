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

class EmptyInputSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")

  test("labelPropagation: two cliques with a bridge separate; ties go " +
      "to the smallest label") {
    import spark.implicits._
    // two triangles joined by one bridge edge: after enough sweeps each
    // triangle converges to its own minimum label
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
      .toDF("id1", "id2")
    val got = Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    // within each triangle all members share a community label
    assert(Set(got(1L), got(2L)).size == 1 && got(1L) == got(2L))
    assert(got(10L) == got(11L) && got(11L) == got(12L))
    // determinism: a rerun lands on the identical labeling
    val again = Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("graph operators on an empty edge set") {
    assert(Graph.triangles(noEdges).count() == 0)
    assert(Graph.triangleStats(noEdges).count() == 0)
    intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(noEdges, iters = 3).count()
    }
  }

  test("bm25 on an empty corpus returns an empty, well-typed frame") {
    val q = Seq((1L, "cat")).toDF("query_id", "term")
    val out = Bm25.topK(noDocs, q, k = 5)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "score", "rank"))
  }

  test("dsir on an empty corpus returns no scores (and does not NPE)") {
    val out = ImportanceWeights.dsirScores(noDocs, "doc_id", "text",
      lit(true))
    assert(out.count() == 0)
  }

  test("analyze/curation/packing on empty inputs") {
    val noSrc = Seq.empty[(String, Long, Long)]
      .toDF("source", "doc_id", "n_chars")
    assert(Analyze.columnStats(noDocs, Seq("doc_id")).count() == 1) // zeros row
    assert(Curation.domainCap(noSrc, "source", 5,
      Seq(col("doc_id").asc), Seq("x")).count() == 0)
    assert(Packing.lengthBucketBatches(noSrc, "doc_id", "n_chars",
      64, 7, 16).count() == 0)
  }
}
