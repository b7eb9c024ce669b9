package graft.operators

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: hand-checked with cross-class ties (average ranks)") {
    // scores asc: 1(neg) 2(neg) 2(pos) 3(pos); tie group avg rank 2.5
    // R+ = 2.5 + 4 = 6.5, U = 3.5, AUC = 3.5/4 = 0.875
    val df = Seq((true, 3L), (true, 2L), (false, 2L), (false, 1L))
      .toDF("label", "score")
    val r = Eval.rocAuc(df, "label", "score").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 7L)))
    assert(r.getDouble(3) == 0.875)
  }

  test("rocAuc: perfect separation = 1.0, reversed = 0.0") {
    val perfect = Seq((true, 10L), (true, 9L), (false, 2L), (false, 1L))
      .toDF("label", "score")
    assert(Eval.rocAuc(perfect, "label", "score")
      .collect().head.getDouble(3) == 1.0)
    val reversed = Seq((false, 10L), (false, 9L), (true, 2L), (true, 1L))
      .toDF("label", "score")
    assert(Eval.rocAuc(reversed, "label", "score")
      .collect().head.getDouble(3) == 0.0)
  }

  test("prAtThresholds: hand-checked operating points, null when " +
      "undefined") {
    val df = Seq((true, 9L), (true, 5L), (false, 5L), (false, 1L))
      .toDF("label", "score")
    val got = Eval.prAtThresholds(df, "label", "score", Seq(5L, 100L))
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4),
          if (r.isNullAt(5)) -1.0 else r.getDouble(5)))
      }.toMap
    // t=5: tp 2, fp 1, fn 0 → p 0.6667, r 1.0
    assert(got(5L) == ((2L, 1L, 0L, 0.6667, 1.0)), s"got: $got")
    // t=100: nothing predicted positive → precision undefined (null)
    assert(got(100L) == ((0L, 0L, 2L, -1.0, 0.0)), s"got: $got")
  }

  test("expectedCalibrationError: integer numerator, hand-checked") {
    // bin0 {1,2}: |0*10-3| = 3; bin1 {9,8}: |20-17| = 3 → 6/(4*10)
    val df = Seq((true, 9L), (false, 1L), (true, 8L), (false, 2L))
      .toDF("label", "score")
    val r = Eval.expectedCalibrationError(df, "label", "score",
      scoreMax = 10L, nBins = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ==
      ((4L, 6L, 0.15)))
  }

  test("calibrationBins: integral bin edges, clamp at top") {
    val df = Seq((false, 0L), (false, 99L), (true, 100L), (true, 999L),
      (true, 1000L)).toDF("label", "score")
    val got = Eval.calibrationBins(df, "label", "score", 1000L, 10)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // 0,99 → bin 0; 100 → bin 1; 999 → bin 9; 1000 clamps to bin 9
    assert(got == Map(0 -> ((2L, 0L)), 1 -> ((1L, 1L)),
      9 -> ((2L, 2L))), s"got: $got")
  }

  test("calibrationBins floors negative scores (matches SQL //)") {
    // floor(-1*2/10) = -1, not trunc's 0 — a stray negative score must
    // land one bin BELOW zero on both engines, never fold into bin 0
    val df = Seq((false, -1L), (false, 0L)).toDF("label", "score")
    val got = Eval.calibrationBins(df, "label", "score", 10L, 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(-1 -> 1L, 0 -> 1L), s"got: $got")
  }
}
