package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t
import graft.operators.Eval

/** Driver-gated model-evaluation queries: the audit loop a pipeline runs
  * over its own quality classifier (score corpus → AUC / calibration →
  * decide thresholds). Scores are deterministic integers by doc_id
  * formula — positives shifted up with a deliberately overlapping band
  * and cross-class ties, so the tie-corrected rank arithmetic is
  * actually exercised.
  */
object EvalQueries {

  private val fixtureSql =
    """SELECT doc_id, (doc_id % 3 = 0) AS label,
      |       (doc_id * 7919) % 600
      |       + CASE WHEN doc_id % 3 = 0 THEN 400 ELSE 0 END AS score
      |FROM documents""".stripMargin

  private def fixture(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents").select(col("doc_id"),
      (col("doc_id") % 3 === 0).as("label"),
      ((col("doc_id") * 7919) % 600
        + when(col("doc_id") % 3 === 0, 400).otherwise(0)).as("score"))

  val all: Seq[Q] = Seq(

    // ROC-AUC via the Mann–Whitney rank-sum identity (Eval.rocAuc):
    // exact average-rank tie handling in doubled integer units, computed
    // from per-distinct-score counts + the bounded prefix scan — the
    // corpus never ranks row-by-row and no single-partition window
    // exists anywhere. The oracle pays the SQL way (a window over the
    // distinct-score frame); u2 = 2·U is integer-exact on both sides, so
    // an off-by-one in tie averaging or the scan carry-in fails the hash
    // before the rounded AUC can mask it.
    Q("q_eval_auc",
      s"""WITH s AS ($fixtureSql),
         |g AS (SELECT score, count(*) AS cnt,
         |             sum(CASE WHEN label THEN 1 ELSE 0 END) AS pos
         |      FROM s GROUP BY score),
         |c AS (SELECT score, cnt, pos,
         |             sum(cnt) OVER (ORDER BY score) AS cum
         |      FROM g),
         |a AS (SELECT sum(pos) AS n_pos, sum(cnt) - sum(pos) AS n_neg,
         |             sum(pos * (2 * (cum - cnt) + cnt + 1)) AS r2
         |      FROM c)
         |SELECT CAST(n_pos AS BIGINT) AS n_pos,
         |       CAST(n_neg AS BIGINT) AS n_neg,
         |       CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
         |       round((r2 - n_pos * (n_pos + 1))
         |             / (2.0 * n_pos * n_neg), 4) AS auc
         |FROM a""".stripMargin) { (s, dir) =>
      Eval.rocAuc(fixture(s, dir), "label", "score")
    },

    // Precision/recall operating points (Eval.prAtThresholds): one
    // corpus aggregation, threshold sweep on the bounded distinct-score
    // frame against a broadcast literal. TP/FP/FN gate integer-exact
    // before the rounded ratios could mask a slip.
    Q("q_eval_pr",
      s"""WITH s AS ($fixtureSql),
         |g AS (SELECT score, count(*) AS cnt,
         |             sum(CASE WHEN label THEN 1 ELSE 0 END) AS pos
         |      FROM s GROUP BY score),
         |t(th) AS (VALUES (200), (400), (600), (800)),
         |a AS (SELECT th,
         |             sum(CASE WHEN score >= th THEN pos ELSE 0 END)
         |               AS tp,
         |             sum(CASE WHEN score >= th THEN cnt - pos
         |                 ELSE 0 END) AS fp,
         |             sum(CASE WHEN score < th THEN pos ELSE 0 END)
         |               AS fn
         |      FROM g, t GROUP BY 1)
         |SELECT CAST(th AS BIGINT) AS threshold,
         |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |       CAST(fn AS BIGINT) AS fn,
         |       CASE WHEN tp + fp > 0
         |            THEN round(tp / CAST(tp + fp AS DOUBLE), 4)
         |       END AS precision,
         |       CASE WHEN tp + fn > 0
         |            THEN round(tp / CAST(tp + fn AS DOUBLE), 4)
         |       END AS recall
         |FROM a ORDER BY threshold""".stripMargin) { (s, dir) =>
      Eval.prAtThresholds(fixture(s, dir), "label", "score",
          Seq(200L, 400L, 600L, 800L))
        .orderBy("threshold")
    },

    // Expected calibration error (Eval.expectedCalibrationError): the
    // scalar audit over the reliability bins, with the numerator kept
    // INTEGER (|n_pos·scoreMax − s_sum| per bin) so no order-dependent
    // double summation exists — one rounded division at the very end.
    Q("q_eval_ece",
      s"""WITH s AS ($fixtureSql),
         |b AS (SELECT least(score * 10 // 1000, 9) AS bin, score,
         |             CASE WHEN label THEN 1 ELSE 0 END AS lab
         |      FROM s),
         |g AS (SELECT bin, count(*) AS n, sum(lab) AS n_pos,
         |             sum(score) AS s_sum
         |      FROM b GROUP BY 1)
         |SELECT CAST(sum(n) AS BIGINT) AS n,
         |       CAST(sum(abs(n_pos * 1000 - s_sum)) AS BIGINT) AS ece_num,
         |       round(sum(abs(n_pos * 1000 - s_sum))
         |             / (sum(n) * 1000.0), 4) AS ece
         |FROM g""".stripMargin) { (s, dir) =>
      Eval.expectedCalibrationError(fixture(s, dir), "label", "score",
        scoreMax = 1000L, nBins = 10)
    },

    // Calibration / reliability table (Eval.calibrationBins): equal-width
    // score bins with per-bin observed positive rate — ONE map-side-
    // combinable aggregation. Integral bin math (`div`, not a double
    // divide) replays exactly in the oracle.
    Q("q_eval_calibration",
      s"""WITH s AS ($fixtureSql),
         |b AS (SELECT least(score * 10 // 1000, 9) AS bin, label FROM s)
         |SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_pos,
         |       round(sum(CASE WHEN label THEN 1 ELSE 0 END)
         |             / CAST(count(*) AS DOUBLE), 4) AS pos_rate
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      Eval.calibrationBins(fixture(s, dir), "label", "score",
          scoreMax = 1000L, nBins = 10)
        .orderBy("bin")
    },
  )
}
