package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t
import graft.operators.Graph

/** Driver-gated graph queries (operators.Graph) over a deterministic
  * edge list derived from the events table: vertex = user_id mod 60, each
  * event contributes the edge (u, (u + 1 + event_id mod 7) mod 60) — a
  * circulant-style lattice with offsets 1..7, dense in triangles, exactly
  * reproducible in SQL. Both gates are integer-exact end to end (the
  * point of the fixed-point PageRank design), so every row hash-matches.
  */
object GraphQueries {

  /** Shared edge fixture in DuckDB form. */
  private val sqlEdges =
    """raw AS (SELECT user_id % 60 AS u,
      |               (user_id % 60 + 1 + event_id % 7) % 60 AS v
      |        FROM events),
      |ce AS (SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst
      |       FROM raw WHERE u != v)""".stripMargin

  private def edges(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "events").select(
      (col("user_id") % 60).as("u"),
      ((col("user_id") % 60 + 1 + col("event_id") % 7) % 60).as("v"))

  val all: Seq[Q] = Seq(

    // Exact triangle counting with degree orientation: the wedge join's
    // out-degree is O(sqrt m) by construction, so a celebrity vertex
    // cannot explode the pair stream (orientation = the exact analog of
    // the dedup stack's hot-bucket cap). Per-vertex n_tri and
    // wedges = C(deg,2) stay integers — the clustering coefficient's
    // numerator and denominator — because the float ratio would not
    // hash-gate. The oracle counts the same triangles by id ordering
    // (a<b<c), which equals the orientation count: both enumerate each
    // triangle exactly once.
    Q("q_graph_triangles",
      s"""WITH $sqlEdges,
         |deg AS (SELECT v, count(*) AS deg FROM (
         |          SELECT src AS v FROM ce
         |          UNION ALL SELECT dst FROM ce) GROUP BY v),
         |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |        FROM ce e1
         |        JOIN ce e2 ON e2.src = e1.dst
         |        JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |pv AS (SELECT unnest([a, b, c]) AS v FROM tri),
         |cnt AS (SELECT v, count(*) AS n_tri FROM pv GROUP BY v)
         |SELECT d.v AS vertex, d.deg, coalesce(c.n_tri, 0) AS n_tri,
         |       d.deg * (d.deg - 1) // 2 AS wedges
         |FROM deg d LEFT JOIN cnt c USING (v)
         |ORDER BY vertex""".stripMargin) { (s, dir) =>
      Graph.triangleStats(edges(s, dir)).orderBy("vertex")
    },

    // Fixed-point PageRank, 5 iterations: ranks in integer micro-units,
    // contributions floor-divide by degree, damping = (85·in) div 100 —
    // every operation associative-exact, so the gate hash-matches a
    // plain unrolled SQL replay (float PageRank cannot be oracled: its
    // per-vertex sums are partial-order-dependent). One shuffle per
    // iteration on the rank side; the degree-annotated adjacency persists
    // once and never re-shuffles.
    Q("q_graph_pagerank", {
      val iters = 5
      val unrolled = (1 to iters).map { i =>
        s"""r$i AS (SELECT d.v, CAST((150000 // nn.n)
           |          + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
           |        FROM deg d CROSS JOIN nn
           |        LEFT JOIN (SELECT dir.dst AS v,
           |                     CAST(sum(p.r // g.deg) AS BIGINT) AS s
           |                   FROM dir
           |                   JOIN deg g ON g.v = dir.src
           |                   JOIN r${i - 1} p ON p.v = dir.src
           |                   GROUP BY dir.dst) s USING (v))""".stripMargin
      }.mkString(",\n")
      s"""WITH $sqlEdges,
         |dir AS (SELECT src, dst FROM ce
         |        UNION ALL SELECT dst, src FROM ce),
         |deg AS (SELECT src AS v, count(*) AS deg FROM dir GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT v, 1000000 // nn.n AS r FROM deg CROSS JOIN nn),
         |$unrolled
         |SELECT d.v AS vertex, d.deg, r$iters.r AS rank_micro
         |FROM deg d JOIN r$iters ON r$iters.v = d.v
         |ORDER BY vertex""".stripMargin
    }) { (s, dir) =>
      Graph.pageRankFixedPoint(edges(s, dir), iters = 5).orderBy("vertex")
    },

    // k-core decomposition by wave peeling (operators.Graph.kCore): each
    // round drops every vertex with degree < k and its edges; surviving
    // vertices report their within-core degree. The fixture is a SPARSE
    // bipartite slice of events (1/17th of rows) whose degree variance
    // drives a 13-round peel cascade at sf0.01 before the 3-core
    // stabilizes. Semantics = exactly 16 peel rounds (idempotent after
    // convergence), so the oracle's fixed unroll hash-matches wherever
    // convergence lands — all arithmetic integer, like the other graph
    // gates.
    Q("q_graph_kcore", {
      val k = 3
      val rounds = 16
      // Every e_i MUST be MATERIALIZED: each round references the
      // previous round's edge CTE four times (degree union twice + two
      // membership filters), so an inlining planner would expand the
      // 16-round chain into 4^16 scans of events.parquet — materializing
      // pins each round to one evaluation, mirroring the Spark side's
      // per-round localCheckpoint.
      val unrolled = (1 to rounds).map { i =>
        s"""d$i AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
           |          SELECT src AS v FROM e${i - 1}
           |          UNION ALL SELECT dst FROM e${i - 1}) GROUP BY v),
           |k$i AS MATERIALIZED (SELECT v FROM d$i WHERE deg >= $k),
           |e$i AS MATERIALIZED (SELECT src, dst FROM e${i - 1}
           |        WHERE src IN (SELECT v FROM k$i)
           |          AND dst IN (SELECT v FROM k$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (SELECT user_id % 120 AS u,
         |                    120 + event_id % 180 AS v
         |             FROM events WHERE event_id % 17 = 0),
         |e0 AS MATERIALIZED (
         |       SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst
         |       FROM raw WHERE u != v),
         |$unrolled
         |SELECT v AS vertex, count(*) AS deg FROM (
         |  SELECT src AS v FROM e$rounds
         |  UNION ALL SELECT dst FROM e$rounds) GROUP BY v
         |ORDER BY vertex""".stripMargin
    }) { (s, dir) =>
      val sparse = t(s, dir, "events")
        .where(col("event_id") % 17 === 0)
        .select((col("user_id") % 120).as("u"),
          (lit(120) + col("event_id") % 180).as("v"))
      Graph.kCore(sparse, k = 3, rounds = 16).orderBy("vertex")
    },

    // Deterministic synchronous label-propagation communities
    // (Graph.labelPropagation): two planted stars bridged at one edge,
    // three fixed sweeps, highest-count label with the SMALLEST-label
    // tiebreak. The oracle unrolls all three rounds (the q_train_logreg
    // pattern) with the identical argmax-via-window semantics, so a
    // tiebreak or round-boundary slip anywhere diverges.
    Q("q_graph_communities", {
      def round(k: Int) =
        s"""n$k AS (SELECT s.dst AS id, l.lbl, count(*) AS c
           |        FROM sym s JOIN l$k l ON l.id = s.src
           |        GROUP BY 1, 2),
           |l${k + 1} AS (SELECT id, lbl FROM (
           |  SELECT id, lbl, row_number() OVER (PARTITION BY id
           |           ORDER BY c DESC, lbl) AS rn
           |  FROM n$k) WHERE rn = 1)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT CAST(0 AS BIGINT) AS id1, doc_id AS id2
         |  FROM documents WHERE doc_id BETWEEN 1 AND 9
         |  UNION ALL
         |  SELECT 50, doc_id FROM documents
         |  WHERE doc_id BETWEEN 51 AND 59
         |  UNION ALL SELECT 9, 59),
         |sym AS (SELECT id1 AS src, id2 AS dst FROM e0
         |        UNION ALL SELECT id2, id1 FROM e0),
         |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM sym),
         |${round(0)},
         |${round(1)},
         |${round(2)}
         |SELECT id, lbl AS community FROM l3
         |ORDER BY id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs
        .where(col("doc_id").between(1, 9))
        .select(lit(0L).as("id1"), col("doc_id").as("id2"))
        .union(docs.where(col("doc_id").between(51, 59))
          .select(lit(50L).as("id1"), col("doc_id").as("id2")))
        .union(Seq((9L, 59L)).toDF("id1", "id2"))
      Graph.labelPropagation(edges, rounds = 3).orderBy("id")
    },
  )
}
