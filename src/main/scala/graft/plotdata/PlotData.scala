package graft.plotdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed pre-aggregations behind the reference's plots (SURVEY §2.11,
  * reference handyspark/plot.py). Rendering is out of engine scope — each
  * operator returns the aggregated plot data as a small DataFrame: bins +
  * counts (hist), boxplot stats (bxp), 2-D bucket proportions (scatter).
  * All are one grouped aggregation over a single scan.
  */
object PlotData {

  /** Equal-width histogram: edges from one min/max action, counts from one
    * groupBy over the arithmetic bucket index, completed to the dense
    * 0..bins-1 range (reference plot.py:126-148 left-joins the full bucket
    * range and fills 0). */
  def histogram(df: DataFrame, c: String, bins: Int = 10,
                strata: Seq[String] = Nil): DataFrame = {
    val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    // degenerate guards: empty/all-null column → single empty [0,0) bucket;
    // all-equal column → single [v,v] bucket (no zero-width division)
    val (lo, hi) =
      if (r.isNullAt(0) || r.isNullAt(1)) (0.0, 0.0)
      else (r.getDouble(0), r.getDouble(1))
    val nb = if (hi == lo) 1 else bins
    val w = if (hi == lo) 0.0 else (hi - lo) / nb
    val idx =
      if (w == 0) lit(0).cast("int")
      else least(greatest(floor((col(c) - lit(lo)) / lit(w)), lit(0)),
        lit(nb - 1)).cast("int")
    val counts = df.filter(col(c).isNotNull)
      .groupBy((strata.map(col) :+ idx.as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
    // dense completion: distinct strata × full bucket range (tiny frames)
    val buckets = df.sparkSession.range(nb).select(col("id").cast("int").as("bucket"))
    val full =
      if (strata.isEmpty) buckets
      else df.select(strata.map(col): _*).distinct().crossJoin(buckets)
    full.join(counts, strata :+ "bucket", "left")
      .na.fill(0, Seq("cnt"))
      .withColumn("bin_lo", lit(lo) + col("bucket") * lit(w))
      .withColumn("bin_hi", lit(lo) + (col("bucket") + 1) * lit(w))
      .orderBy((strata :+ "bucket").map(col): _*)
  }

  /** Histogram with an AUTO-derived bin count — the matplotlib
    * `bins='auto'` convenience the fixed-bins form makes the caller
    * guess: "fd" (Freedman–Diaconis, width = 2·IQR/n^(1/3) — robust to
    * outliers, the default) or "sturges" (⌈log2 n + 1⌉ — for small
    * n or zero-IQR columns, also the fd fallback when IQR = 0).
    * The bin count derives from one exact stats pass (count, q1, q3,
    * min, max — a single driver scalar, the eager-learn shape
    * [[histogram]] itself already uses for min/max), then delegates to
    * [[histogram]]. All derivation arithmetic is plain IEEE ops a SQL
    * oracle reproduces — bin-count parity holds unless (hi−lo)/width
    * sits within an ulp of an integer. */
  def autoHistogram(df: DataFrame, c: String, rule: String = "fd",
                    strata: Seq[String] = Nil): DataFrame = {
    require(Seq("fd", "sturges").contains(rule),
      s"rule must be fd|sturges, got $rule")
    val x = col(c).cast("double")
    val r = df.agg(count(x), element_at(
        graft.expr.ExactPercentile.of(x, Seq(0.25, 0.75)), 1),
      element_at(graft.expr.ExactPercentile.of(x, Seq(0.25, 0.75)), 2),
      min(x), max(x)).head()
    val n = r.getLong(0)
    if (n == 0) return histogram(df, c, 1, strata)
    val (q1, q3, lo, hi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val sturgesBins = math.ceil(math.log(n.toDouble) / math.log(2.0) + 1.0)
    val bins = rule match {
      case "fd" if q3 > q1 && hi > lo =>
        // pow(n, 1/3), not cbrt: mirrors the SQL oracle's op textually
        math.ceil((hi - lo) / (2.0 * (q3 - q1) / math.pow(n.toDouble, 1.0 / 3.0)))
      case _ if hi > lo => sturgesBins
      case _ => 1.0
    }
    histogram(df, c, math.max(1, bins.toInt), strata)
  }

  /** Categorical histogram = value_counts completed over the full
    * category×strata product (reference plot.py:112-124). */
  def histogramCategorical(df: DataFrame, c: String, topN: Int = 20,
                           strata: Seq[String] = Nil): DataFrame = {
    val counts = df.na.drop(Seq(c))
      .groupBy((strata :+ c).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    if (strata.isEmpty) counts.orderBy(desc("cnt"), col(c)).limit(topN)
    else {
      val cats = df.na.drop(Seq(c)).select(col(c)).distinct()
      val combos = df.select(strata.map(col): _*).distinct().crossJoin(cats)
      combos.join(counts, strata :+ c, "left").na.fill(0, Seq("cnt"))
        .orderBy((strata :+ c).map(col): _*)
    }
  }

  /** Boxplot stats per column/stratum (reference `_calc_bxp_stats`,
    * dataframe.py:402-473): q1/median/q3/mean in one pass, whiskers =
    * min/max of in-fence values and flier count in a second pass with the
    * fences broadcast back on strata keys. */
  def bxpStats(df: DataFrame, c: String, k: Double = 1.5,
               strata: Seq[String] = Nil, exact: Boolean = true): DataFrame = {
    val qe =
      if (exact) graft.expr.ExactPercentile.of(col(c), Seq(0.25, 0.5, 0.75))
      else expr(s"approx_percentile($c, array(0.25, 0.5, 0.75), 10000)")
    val stats = df.groupBy(strata.map(col): _*).agg(
      qe.as("__q"), avg(col(c)).as("mean"), count(lit(1)).as("n"))
      .select((strata.map(col) ++ Seq(
        element_at(col("__q"), 1).as("q1"), element_at(col("__q"), 2).as("med"),
        element_at(col("__q"), 3).as("q3"), col("mean"), col("n"))): _*)
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lfence", col("q1") - lit(k) * col("iqr"))
      .withColumn("ufence", col("q3") + lit(k) * col("iqr"))
    val joined =
      if (strata.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), strata)
    val inFence = col(c) >= col("lfence") && col(c) <= col("ufence")
    joined.groupBy(strata.map(col): _*).agg(
      first("q1").as("q1"), first("med").as("med"), first("q3").as("q3"),
      first("mean").as("mean"), first("n").as("n"),
      min(when(inFence, col(c))).as("lo_whisker"),
      max(when(inFence, col(c))).as("hi_whisker"),
      sum((!inFence).cast("long")).as("fliers"))
  }

  /** Top-N fliers by |value| descending (reference dataframe.py:446-450,
    * bounded at 1000) — Catalyst plans TakeOrderedAndProject. */
  def topFliers(df: DataFrame, c: String, lo: Double, hi: Double,
                n: Int = 1000): DataFrame =
    df.filter(col(c) < lit(lo) || col(c) > lit(hi))
      .orderBy(abs(col(c)).desc, col(c))
      .limit(n)

  /** 2-D scatter binning (reference plot.py:50-92): `bins`×`bins` bucket
    * grid over two columns, proportion = count/total. One scan + one
    * groupBy; edges from a single combined min/max agg. */
  def scatterBins(df: DataFrame, x: String, y: String, bins: Int = 30): DataFrame = {
    val r = df.agg(
      min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double"),
      count(lit(1))).head()
    // degenerate guards: no non-null data → empty result (counts frame is
    // empty anyway); all-equal axis → width 1 so everything lands in bucket 0
    val (xlo, xhi, ylo, yhi, n) =
      if (r.isNullAt(0) || r.isNullAt(2))
        (0.0, 1.0, 0.0, 1.0, math.max(r.getLong(4), 1L))
      else
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          math.max(r.getLong(4), 1L))
    val wx = if (xhi == xlo) 1.0 else (xhi - xlo) / bins
    val wy = if (yhi == ylo) 1.0 else (yhi - ylo) / bins
    def idx(c: String, lo: Double, w: Double) =
      least(greatest(floor((col(c) - lit(lo)) / lit(w)), lit(0)),
        lit(bins - 1)).cast("int")
    df.filter(col(x).isNotNull && col(y).isNotNull)
      .groupBy(idx(x, xlo, wx).as("bx"), idx(y, ylo, wy).as("by"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("proportion", col("cnt") / lit(n.toDouble))
      .orderBy("bx", "by")
  }
}
