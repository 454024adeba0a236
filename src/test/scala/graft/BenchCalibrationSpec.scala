package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's container-speed calibration (Bench.calibrationFactor):
  * the factor is the MEDIAN observed/reference ratio over the ten
  * calibration rows, clamped to [0.5, 2.5], and degrades to 1.0 (no
  * normalization) when fewer than 3 calibration rows were measured —
  * so a partial bench run can never be "calibrated" off 1-2 noisy rows.
  * No SparkSession needed: the function is pure over the results map. */
class BenchCalibrationSpec extends AnyFunSuite {

  private def refs(n: Int): Seq[(String, Double)] =
    Bench.calibrationRefs.toSeq.sortBy(_._1).take(n)

  test("uniform container slowdown yields that exact factor") {
    val results = Bench.calibrationRefs.map { case (k, v) => k -> v * 1.4 }
    assert(math.abs(Bench.calibrationFactor(results) - 1.4) < 1e-12)
  }

  test("identical-to-reference run yields factor 1.0") {
    assert(Bench.calibrationFactor(Bench.calibrationRefs) == 1.0)
  }

  test("median tolerates a minority of wildly-regressed references") {
    // 8 rows at exactly ref speed, 2 rows 50x slow (a genuine regression
    // in those operators must NOT masquerade as container slowness)
    val (stable, regressed) = Bench.calibrationRefs.toSeq.sortBy(_._1).splitAt(8)
    val results = (stable.map { case (k, v) => k -> v } ++
      regressed.map { case (k, v) => k -> v * 50 }).toMap
    assert(Bench.calibrationFactor(results) == 1.0)
  }

  test("fewer than 3 measured calibration rows disables normalization") {
    val two = refs(2).map { case (k, v) => k -> v * 2.0 }.toMap
    assert(Bench.calibrationFactor(two) == 1.0)
    val three = refs(3).map { case (k, v) => k -> v * 2.0 }.toMap
    assert(Bench.calibrationFactor(three) == 2.0)
  }

  test("factor clamps to [0.5, 2.5] so a pathological container cannot silence bands") {
    val crawl = Bench.calibrationRefs.map { case (k, v) => k -> v * 10 }
    assert(Bench.calibrationFactor(crawl) == 2.5)
    val warp = Bench.calibrationRefs.map { case (k, v) => k -> v * 0.05 }
    assert(Bench.calibrationFactor(warp) == 0.5)
  }

  test("zero and missing observations are excluded, non-calibration rows ignored") {
    val base = Bench.calibrationRefs.toSeq.sortBy(_._1)
    val results = base.drop(2).map { case (k, v) => k -> v * 1.2 }.toMap ++
      Map(base.head._1 -> 0.0, "q_not_a_calibration_row" -> 999.0)
    assert(math.abs(Bench.calibrationFactor(results) - 1.2) < 1e-12)
  }

  test("every calibration reference row is a real bench query with a positive reference") {
    // guards against a renamed query silently dropping out of calibration
    assert(Bench.calibrationRefs.size == 10)
    assert(Bench.calibrationRefs.values.forall(_ > 0))
    val known = SparkEntry.queries.keySet
    val missing = Bench.calibrationRefs.keySet.diff(known)
    assert(missing.isEmpty, s"calibration refs not in SparkEntry.queries: $missing")
  }

  test("banded rows are disjoint from calibration rows (a row cannot normalize itself)") {
    val overlap = Bench.bands.keySet.intersect(Bench.calibrationRefs.keySet)
    assert(overlap.isEmpty, s"rows both banded and calibrating: $overlap")
  }
}
