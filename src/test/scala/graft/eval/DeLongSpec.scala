package graft.eval

import graft.SparkSpec

class DeLongSpec extends SparkSpec {

  // brute-force DeLong reference: placements by pairwise loops
  private def brute(rows: Seq[(Double, Double, Double)]) = {
    val pos = rows.filter(_._1 == 1.0)
    val neg = rows.filter(_._1 == 0.0)
    def v10(s: Double, score: ((Double, Double, Double)) => Double) =
      neg.map(r => if (score(r) < s) 1.0
        else if (score(r) == s) 0.5 else 0.0).sum / neg.size
    def v01(s: Double, score: ((Double, Double, Double)) => Double) =
      pos.map(r => if (score(r) > s) 1.0
        else if (score(r) == s) 0.5 else 0.0).sum / pos.size
    def cov(a: Seq[Double], b: Seq[Double]) = {
      val n = a.size
      (a.zip(b).map { case (x, y) => x * y }.sum -
        a.sum * b.sum / n) / (n - 1)
    }
    val p1 = pos.map(r => v10(r._2, _._2)); val p2 = pos.map(r => v10(r._3, _._3))
    val n1 = neg.map(r => v01(r._2, _._2)); val n2 = neg.map(r => v01(r._3, _._3))
    val auc1 = p1.sum / p1.size; val auc2 = p2.sum / p2.size
    val vd = (cov(p1, p1) + cov(p2, p2) - 2 * cov(p1, p2)) / pos.size +
      (cov(n1, n1) + cov(n2, n2) - 2 * cov(n1, n2)) / neg.size
    (auc1, auc2, vd, (auc1 - auc2) / math.sqrt(vd))
  }

  test("deLongTest matches the brute pairwise placements, with ties") {
    import spark.implicits._
    // (label, score1, score2) — ties in both scorers, correlated scores
    val rows = Seq(
      (1.0, 0.9, 0.8), (1.0, 0.8, 0.8), (1.0, 0.6, 0.7), (1.0, 0.6, 0.3),
      (1.0, 0.4, 0.6),
      (0.0, 0.7, 0.6), (0.0, 0.6, 0.4), (0.0, 0.3, 0.5), (0.0, 0.3, 0.2),
      (0.0, 0.1, 0.3), (0.0, 0.1, 0.1))
    val df = rows.zipWithIndex
      .map { case ((y, s1, s2), i) => (i.toLong, y, s1, s2) }
      .toDF("id", "y", "s1", "s2")
    val got = BinaryMetrics.deLongTest(df, "id", "y", "s1", "s2").head()
    val (auc1, auc2, vd, z) = brute(rows)
    assert(got.getLong(0) == 5L && got.getLong(1) == 6L)
    assert(math.abs(got.getDouble(2) - auc1) < 1e-12)
    assert(math.abs(got.getDouble(3) - auc2) < 1e-12)
    assert(math.abs(got.getDouble(4) - vd) < 1e-12)
    assert(math.abs(got.getDouble(5) - z) < 1e-10)
    // the AUC from placements agrees with the house cumulative AUC op
    val houseAuc = BinaryMetrics.auc(
      df.select($"s1".as("score"), $"y".as("label")), "score", "label")
      .head().getDouble(0)
    assert(math.abs(got.getDouble(2) - houseAuc) < 1e-12)
  }

  test("identical scorers: zero variance of the difference, null z") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 0.9, 0.9), (2L, 1.0, 0.4, 0.4),
      (3L, 0.0, 0.5, 0.5), (4L, 0.0, 0.2, 0.2))
      .toDF("id", "y", "s1", "s2")
    val got = BinaryMetrics.deLongTest(df, "id", "y", "s1", "s2").head()
    assert(got.getDouble(2) == got.getDouble(3))
    assert(got.getDouble(4) == 0.0 && got.isNullAt(5))
  }
}
