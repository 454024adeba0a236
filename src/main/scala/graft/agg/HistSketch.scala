package graft.agg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable equal-width histogram sketch over a numeric column: the
  * QUANTILE analog of the [[CountMin]] frequency tier. A pinned value
  * range [lo, hi] is cut into `bins` equal cells; the sketch is the
  * per-cell counts plus out-of-range tallies — pure addition, so sketches
  * merge exactly across partitions AND across batches (parquet
  * persistence + append), answering rank/quantile questions over a
  * GROWING corpus without rescanning old batches. GK (the engine's
  * in-query approx-percentile tier) is NOT mergeable across persisted
  * batches; this is the cross-batch path, trading the ε·n rank guarantee
  * for a (hi−lo)/bins VALUE-space guarantee that holds under any number
  * of merges.
  *
  * Determinism: the cell index is one fixed IEEE double expression
  * (`floor((v − lo) / (hi − lo) * bins)`, clamped), so an external engine
  * replays the whole counter table bit-for-bit (q_hist_sketch) — same
  * contract style as the CMS md5 cell basis.
  *
  * Scale shape: one mapPartitions fold to a bins-sized long array,
  * treeAggregate to the driver; no shuffle, no per-row state. `bins` is
  * the only memory knob: 10⁴ bins = 80 KB per partial.
  */
object CountHist {

  /** Cell index for lo ≤ v ≤ hi (callers route v < lo / v > hi to the
    * out-of-range tallies): floor((v−lo)/(hi−lo)*bins) with the v == hi
    * edge clamped into the last cell. The expression shape is the
    * replay contract — don't refactor the arithmetic. */
  def binOf(v: Double, lo: Double, hi: Double, bins: Int): Int = {
    val idx = math.floor((v - lo) / (hi - lo) * bins).toInt
    if (idx >= bins) bins - 1 else idx
  }

  /** Mergeable state: in-range cell counts + below/above tallies. */
  final class Sketch(val lo: Double, val hi: Double, val bins: Int) extends Serializable {
    require(bins > 0, s"CountHist: bins must be positive, got $bins")
    require(lo < hi, s"CountHist: need lo < hi, got [$lo, $hi]")
    val counts = new Array[Long](bins)
    var below = 0L
    var above = 0L

    def add(v: Double): Unit =
      if (v < lo) below += 1L
      else if (v > hi) above += 1L
      else counts(binOf(v, lo, hi, bins)) += 1L

    def merge(o: Sketch): Sketch = {
      require(o.lo == lo && o.hi == hi && o.bins == bins,
        s"CountHist.merge: config mismatch ([$lo,$hi]x$bins vs [${o.lo},${o.hi}]x${o.bins})")
      var i = 0
      while (i < bins) { counts(i) += o.counts(i); i += 1 }
      below += o.below
      above += o.above
      this
    }

    /** In-range row count. */
    def n: Long = { var s = 0L; var i = 0; while (i < bins) { s += counts(i); i += 1 }; s }

    def width: Double = (hi - lo) / bins

    /** Interpolated p-quantile of the IN-RANGE mass (type-7 fractional
      * rank r = p·(n−1), uniform-within-cell assumption). The estimate
      * lies in the cell where the cumulative count crosses r, and the
      * exact type-7 quantile lies in that cell or the next, so
      * |estimate − exact| ≤ 2·width — the bound [[quantileCheck]]
      * asserts. Out-of-range mass is excluded (track `below`/`above` and
      * widen the range if they matter). */
    def quantile(p: Double): Double = {
      require(p >= 0.0 && p <= 1.0, s"CountHist.quantile: p=$p")
      val total = n
      require(total > 0L, "CountHist.quantile: empty in-range mass")
      val r = p * (total - 1)
      var cum = 0L
      var b = 0
      while (b < bins) {
        val c = counts(b)
        if (c > 0 && r < cum + c) {
          val frac = (r - cum + 0.5) / c
          return lo + width * (b + frac)
        }
        cum += c
        b += 1
      }
      hi // p == 1 and trailing zeros: last occupied cell's right edge path
    }

    /** Rank bounds for x: (minRank, maxRank) among in-range values —
      * exact cumulative count below x's cell, plus-or-minus the cell. */
    def rankBounds(x: Double): (Long, Long) = {
      if (x < lo) return (0L, 0L)
      if (x > hi) return (n, n)
      val b = binOf(x, lo, hi, bins)
      var cum = 0L
      var i = 0
      while (i < b) { cum += counts(i); i += 1 }
      (cum, cum + counts(b))
    }
  }

  /** One-pass sketch of a numeric column (nulls/NaN skipped). */
  def sketchCol(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, bins: Int): Sketch =
      graft.util.Errors.context("CountHist.sketchCol", Seq(valueCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq(valueCol))
      .select(col(valueCol).cast("double"))
      .filter(!isnan(col(valueCol).cast("double")))
      .as[Double]
      .rdd
      .mapPartitions { it =>
        val sk = new Sketch(lo, hi, bins)
        while (it.hasNext) sk.add(it.next())
        Iterator.single(sk)
      }
      .treeAggregate(new Sketch(lo, hi, bins))(_.merge(_), _.merge(_), depth = 2)
  }

  /** Sketch as a frame for the oracle/report: (bin, cell_lo, cell_hi, n)
    * with bin −1 = below-range and `bins` = above-range (their edges are
    * the range bounds). */
  def histFrame(sk: Sketch)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows =
      Seq((-1, Double.NegativeInfinity, sk.lo, sk.below)) ++
        (0 until sk.bins).map(b =>
          (b, sk.lo + sk.width * b, sk.lo + sk.width * (b + 1), sk.counts(b))) ++
        Seq((sk.bins, sk.hi, Double.PositiveInfinity, sk.above))
    rows.toDF("bin", "cell_lo", "cell_hi", "n")
  }

  /** Persist as parquet: the cell rows of [[histFrame]] plus a config row
    * (bin = −2) carrying (lo, hi) in the edge columns and `bins` in `n` —
    * self-describing, so read/append need no side channel. */
  def write(sk: Sketch, path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    val config = Seq((-2, sk.lo, sk.hi, sk.bins.toLong)).toDF("bin", "cell_lo", "cell_hi", "n")
    histFrame(sk).unionAll(config)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted sketch back. */
  def read(path: String)(implicit spark: SparkSession): Sketch = {
    val rows = spark.read.parquet(path)
      .select("bin", "cell_lo", "cell_hi", "n").collect()
    val config = rows.find(_.getInt(0) == -2)
      .getOrElse(throw new IllegalArgumentException(
        s"CountHist.read: no config row at $path"))
    val sk = new Sketch(config.getDouble(1), config.getDouble(2),
      config.getLong(3).toInt)
    rows.foreach { r =>
      r.getInt(0) match {
        case -2 => ()
        case -1 => sk.below = r.getLong(3)
        case b if b == sk.bins => sk.above = r.getLong(3)
        case b => sk.counts(b) = r.getLong(3)
      }
    }
    sk
  }

  /** Fold a new batch into the persisted sketch at `path` (read + sketch
    * the batch under the PERSISTED config + merge + overwrite). Counts
    * only add, so quantile/rank answers stay exact-for-the-sketch across
    * any number of appends; the rewrite is bins+2 rows, independent of
    * corpus size. */
  def append(df: DataFrame, valueCol: String, path: String): Unit = {
    implicit val spark: SparkSession = df.sparkSession
    val old = read(path)
    write(old.merge(sketchCol(df, valueCol, old.lo, old.hi, old.bins)), path)
  }

  /** Per-GROUP sketches in ONE hash aggregate, via the
    * [[graft.expr.HistCounts]] aggregate expression (same Sketch state,
    * same cell arithmetic — the counter tables replay bit-for-bit like
    * [[sketchCol]]'s). Partial aggregation combines each group's rows to
    * a bins-sized array map-side, so the shuffle carries
    * groups×partitions sketch rows, never the data — the per-group
    * quantile path that needs neither a sort nor one GK state per group.
    * Output: group columns + (below, counts: array<long>, above). */
  def byGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
              lo: Double, hi: Double, bins: Int): DataFrame =
      graft.util.Errors.context("CountHist.byGroup", groupCols :+ valueCol) {
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.expr.HistCounts.of(col(valueCol), lo, hi, bins).as("__h"))
      .select(groupCols.map(col) ++ Seq(
        col("__h.below").as("below"), col("__h.counts").as("counts"),
        col("__h.above").as("above")): _*)
  }

  /** Interpolated quantiles from a [[graft.expr.HistCounts]] `counts`
    * array — [[Sketch.quantile]] applied per row (null when the in-range
    * mass is empty). A UDF, but over ONE bins-sized array per GROUP row,
    * never per data row — interpolation needs the sequential cumulative
    * scan, which has no codegen'd column form. */
  def quantilesOf(counts: Column, lo: Double, hi: Double, bins: Int,
                  ps: Seq[Double]): Column = {
    require(ps.nonEmpty, "quantilesOf needs at least one percentile")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"bad percentile $p"))
    val f = udf { cs: Seq[Long] =>
      if (cs == null) null
      else {
        val sk = new Sketch(lo, hi, bins)
        require(cs.length == bins,
          s"quantilesOf: ${cs.length} cells, expected $bins")
        var i = 0
        while (i < bins) { sk.counts(i) = cs(i); i += 1 }
        if (sk.n == 0L) null else ps.map(sk.quantile)
      }
    }
    f(counts)
  }

  /** Per-group approximate quantiles in one pass: [[byGroup]] +
    * [[quantilesOf]]. Output: group columns + n (in-range rows) +
    * below/above tallies + `quantiles` aligned with `ps` (null for an
    * empty-in-range group). Estimates carry the sketch's 2·cell-width
    * bound vs the exact type-7 quantile ([[quantileCheck]]'s
    * contract). */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lo: Double, hi: Double, bins: Int,
                     ps: Seq[Double]): DataFrame = {
    val g = byGroup(df, groupCols, valueCol, lo, hi, bins)
    g.select(groupCols.map(col) ++ Seq(
      aggregate(col("counts"), lit(0L), _ + _).as("n"),
      col("below"), col("above"),
      quantilesOf(col("counts"), lo, hi, bins, ps).as("quantiles")): _*)
  }

  /** Quantile contract table, DuckDB-replayable in the
    * percentileApproxCheck style: per requested p, the EXACT type-7
    * quantile (deterministic — the oracle recomputes it with
    * quantile_cont) and a flag that the sketch's estimate landed within
    * 2·cell-width of it. Runs the exact percentile ALONGSIDE the sketch,
    * so this is the verification facade, not the scale path. */
  def quantileCheck(df: DataFrame, valueCol: String,
                    lo: Double, hi: Double, bins: Int,
                    ps: Seq[Double]): DataFrame =
      graft.util.Errors.context("CountHist.quantileCheck", Seq(valueCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    val sk = sketchCol(df, valueCol, lo, hi, bins)
    require(sk.below == 0L && sk.above == 0L,
      s"quantileCheck: out-of-range mass (below=${sk.below}, above=${sk.above}) " +
        "— the exact quantile and the sketch would rank different populations")
    // ALL percentiles in one shared sort pass (SortedQuantiles — the
    // builtin `percentile` re-aggregates per requested p, measured 7 s
    // vs <1 s at sf0.1; the buffering aggregate was the q_hist_quantile
    // funnel at 100×)
    val exact = SortedQuantiles
      .globalArray(df, col(valueCol), ps)
      .getOrElse(throw new IllegalArgumentException(
        s"quantileCheck: $valueCol has no non-null values"))
    ps.zipWithIndex.map { case (p, i) =>
      val ex = exact(i)
      (p, ex, math.abs(sk.quantile(p) - ex) <= 2.0 * sk.width + 1e-9)
    }.toDF("p", "exact", "ok")
  }
}
