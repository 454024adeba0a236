package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private def evts(rows: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "tsu", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
  }

  test("gapReport profiles per-key gaps and flags outages") {
    // user 1: events at 0, 10, 40, 100 us -> gaps 10, 30, 60
    // user 2: single event -> no gaps
    val df = evts(Seq((1L, 0L, 1L, 0.0), (1L, 10L, 2L, 0.0),
      (1L, 40L, 3L, 0.0), (1L, 100L, 4L, 0.0), (2L, 5L, 5L, 0.0)))
    val got = TimeSeries.gapReport(df, Seq("user_id"), "ts", "event_id",
        thresholdUs = 25L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = got(1L)
    assert(u1.getLong(1) == 4L && u1.getLong(2) == 100L)
    assert(u1.getLong(3) == 60L)
    assert(math.abs(u1.getDouble(4) - 100.0 / 3) < 1e-12)
    assert(u1.getLong(5) == 2L) // 30 and 60 exceed 25
    val u2 = got(2L)
    assert(u2.getLong(1) == 1L && u2.getLong(2) == 0L)
    assert(u2.isNullAt(3) && u2.isNullAt(4) && u2.getLong(5) == 0L)
  }

  test("timeWeightedAvg holds each value until the next observation") {
    // value 10 for 10us, 20 for 30us, 0 for 60us; span 100
    val df = evts(Seq((1L, 0L, 1L, 10.0), (1L, 10L, 2L, 20.0),
      (1L, 40L, 3L, 0.0), (1L, 100L, 4L, 99.0), (2L, 7L, 5L, 42.0)))
    val got = TimeSeries.timeWeightedAvg(df, Seq("user_id"), "ts",
        "event_id", "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    val expected = (10.0 * 10 + 20.0 * 30 + 0.0 * 60) / 100
    assert(math.abs(got(1L).getDouble(3) - expected) < 1e-12)
    // single-event key: twa = the value itself
    assert(got(2L).getDouble(3) == 42.0)
  }

  test("cusum accumulates one-sided sums and alarms on drift") {
    import spark.implicits._
    // target 10, slack 1: values drift up from 10 to 14
    val vals = Seq(10.0, 10.0, 12.0, 13.0, 14.0, 14.0)
    val df = evts(vals.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong * 10, i.toLong, v) })
    val got = TimeSeries.cusum(df, Seq("user_id"), "ts", "event_id",
        "value", target = 10.0, slack = 1.0, h = 5.0)
      .orderBy("event_id")
      .select("cusum_hi", "cusum_lo", "alarm")
      .as[(Double, Double, Boolean)].collect()
    // brute force
    var hi = 0.0; var lo = 0.0
    val ref = vals.map { v =>
      hi = math.max(0.0, hi + (v - 11.0))
      lo = math.max(0.0, lo + (9.0 - v))
      (hi, lo, hi > 5.0 || lo > 5.0)
    }
    assert(got.toSeq == ref)
    // the drift alarms only once accumulated: first alarm at index 4
    assert(got.map(_._3).toSeq == Seq(false, false, false, false, true, true))
  }

  test("cusum low side catches downward shifts; keys are independent") {
    import spark.implicits._
    val df = evts(Seq((1L, 0L, 1L, 10.0), (1L, 10L, 2L, 2.0),
      (1L, 20L, 3L, 2.0), (2L, 0L, 4L, 10.0)))
    val got = TimeSeries.cusum(df, Seq("user_id"), "ts", "event_id",
        "value", target = 10.0, slack = 0.0, h = 10.0)
      .orderBy("event_id")
      .select("user_id", "cusum_lo", "alarm")
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((1L, 0.0, false), (1L, 8.0, false), (1L, 16.0, true),
      (2L, 0.0, false)))
  }

  test("acf matches the direct biased-estimator computation") {
    val xs = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 2.0)
    val df = evts(xs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong * 10, i.toLong, v) })
    val got = TimeSeries.acf(df, Seq("user_id"), "ts", "event_id",
        "value", maxLag = 3)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val m = xs.sum / xs.length
    val den = xs.map(x => (x - m) * (x - m)).sum
    def ref(l: Int) = xs.dropRight(l).zip(xs.drop(l))
      .map { case (a, b) => (a - m) * (b - m) }.sum / den
    (1 to 3).foreach { l =>
      assert(got(l)._1 == xs.length.toLong)
      assert(math.abs(got(l)._2 - ref(l)) < 1e-12, s"lag $l")
    }
    // biased estimator bound
    (1 to 3).foreach(l => assert(math.abs(got(l)._2) <= 1.0 + 1e-12))
  }

  test("acf: constant series yields null; keys independent") {
    val df = evts(Seq((1L, 0L, 1L, 7.0), (1L, 10L, 2L, 7.0),
      (1L, 20L, 3L, 7.0), (2L, 0L, 4L, 1.0), (2L, 10L, 5L, 2.0),
      (2L, 20L, 6L, 3.0)))
    val got = TimeSeries.acf(df, Seq("user_id"), "ts", "event_id",
        "value", maxLag = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).isNullAt(3)) // zero variance -> null, not NaN
    // user 2: x = 1,2,3, mean 2: num = (1-2)(2-2)+(2-2)(3-2) = 0
    assert(got(2L).getDouble(3) == 0.0)
  }

  test("holtLinear reproduces the driver-side recursion; beta=0 " +
      "degrades to EWMA levels") {
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 18.0, 14.0)
    val df = evts(xs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong * 10, i.toLong, v) })
    val (alpha, beta) = (0.4, 0.3)
    val got = TimeSeries.holtLinear(df, Seq("user_id"), "ts", "event_id",
        "value", alpha, beta)
      .orderBy("event_id")
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    var l = xs.head; var b = 0.0
    val exp = xs.zipWithIndex.map { case (v, i) =>
      if (i > 0) {
        val lNew = alpha * v + (1.0 - alpha) * (l + b)
        b = beta * (lNew - l) + (1.0 - beta) * b
        l = lNew
      }
      (l, b, l + b)
    }
    got.zip(exp).foreach { case ((gl, gb, gf), (el, eb, ef)) =>
      assert(gl == el && gb == eb && gf == ef) // bit-exact recursion
    }
    // beta = 0: trend stays 0 and levels reduce to EWMA
    val holt0 = TimeSeries.holtLinear(df, Seq("user_id"), "ts",
        "event_id", "value", alpha, 0.0)
      .orderBy("event_id").collect()
    val ewma = Rolling.ewma(df, Seq("user_id"), "ts", "event_id",
        "value", alpha).orderBy("event_id").collect()
    holt0.zip(ewma).foreach { case (h, e) =>
      assert(h.getDouble(3) == 0.0)
      assert(h.getDouble(2) == e.getDouble(2))
    }
  }

  test("durbinWatson: perfect fit -> null; alternating residuals -> " +
      "dw near 4; trending residuals -> dw near 0") {
    // key 1: y exactly linear in t -> residuals all 0 -> dw null
    // key 2: y alternates around a flat line -> e flips sign each step
    val lin = (0 until 8).map(i => (1L, i.toLong * 1000000, i.toLong,
      2.0 + 3.0 * i))
    val alt = (0 until 8).map(i => (2L, i.toLong * 1000000, 100L + i,
      5.0 + (if (i % 2 == 0) 1.0 else -1.0)))
    // key 3: a slow full-period sine — the OLS trend is ~flat, the
    // residuals ARE the wave: smooth, strongly positively correlated
    val walk = (0 until 16).map(i => (3L, i.toLong * 1000000, 200L + i,
      math.sin(2 * math.Pi * i / 16)))
    val got = TimeSeries.durbinWatson(
        evts(lin ++ alt ++ walk), Seq("user_id"), "ts", "event_id",
        "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).isNullAt(2), "zero residual variance -> null dw")
    assert(got(2L).getDouble(2) > 3.0, "alternating -> dw near 4")
    assert(got(3L).getDouble(2) < 1.0, "persistent -> dw near 0")
    assert(got(2L).getLong(1) == 8L)
  }

  test("durbinWatson: single-event keys yield null dw") {
    val got = TimeSeries.durbinWatson(evts(Seq((9L, 0L, 1L, 5.0))),
      Seq("user_id"), "ts", "event_id", "value").collect()
    assert(got.length == 1 && got.head.isNullAt(2))
  }

  test("seasonality: pure hourly signal -> r2 1 with the right peak; " +
      "hour-independent signal -> r2 ~ 0; constant -> null") {
    val h = 3600000000L
    // user 1: value depends ONLY on hour-of-day (2 days of data):
    // hour 3 peaks at 30, hour 20 troughs at -5, others 1.0
    def v(hour: Int) = if (hour == 3) 30.0 else if (hour == 20) -5.0
      else 1.0
    val diurnal = (0 until 48).map(i =>
      (1L, i.toLong * h, i.toLong, v(i % 24)))
    // user 2: alternating values regardless of hour (period 2 over a
    // 24-hour grid hits each hour with BOTH values across 2 days)
    val flat = (0 until 48).map(i =>
      (2L, i.toLong * h, 100L + i, if (i / 24 == 0) 4.0 else 8.0))
    // user 3: constant
    val const = (0 until 5).map(i => (3L, i.toLong * h, 200L + i, 2.0))
    val got = TimeSeries.seasonality(evts(diurnal ++ flat ++ const),
        Seq("user_id"), "ts", "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = got(1L)
    assert(u1.getLong(1) == 48L)
    assert(math.abs(u1.getDouble(2) - 1.0) < 1e-9) // hour explains all
    assert(u1.getInt(3) == 3 && u1.getInt(4) == 20)
    assert(u1.getDouble(5) == 30.0 && u1.getDouble(6) == -5.0)
    // user 2: every hour's mean is 6.0 -> between-variance 0 -> r2 0
    assert(math.abs(got(2L).getDouble(2)) < 1e-9)
    assert(got(3L).isNullAt(2)) // SST 0 -> null
  }

  test("changePoint finds a planted mean shift at the exact split; " +
      "flat series maximize at tiny gains") {
    // user 1: 5 at t=0..4, then 50 at t=5..9 -> split after t=4
    val shift = (0 until 10).map(i => (1L, i.toLong * 10, i.toLong,
      if (i < 5) 5.0 else 50.0))
    val got = TimeSeries.changePoint(evts(shift), Seq("user_id"), "ts",
      "event_id", "value").head()
    assert(got.getLong(1) == 10L)
    assert(got.getLong(2) == 4L)  // split tie: last row of the prefix
    assert(got.getLong(3) == 5L)  // n_before
    assert(got.getDouble(5) == 5.0 && got.getDouble(6) == 50.0)
    // gain = sqrt(5*5/10) * 45
    assert(math.abs(got.getDouble(4) -
      math.sqrt(2.5) * 45.0) < 1e-6)
    // constant series: all gains 0 -> earliest split wins the tie
    val flat = (0 until 6).map(i => (2L, i.toLong * 10, 100L + i, 7.0))
    val f = TimeSeries.changePoint(evts(flat), Seq("user_id"), "ts",
      "event_id", "value").head()
    assert(f.getDouble(4) == 0.0 && f.getLong(2) == 100L)
    // single-observation keys are absent (no valid split)
    val single = evts(Seq((3L, 0L, 999L, 1.0)))
    assert(TimeSeries.changePoint(single, Seq("user_id"), "ts",
      "event_id", "value").count() == 0L)
  }

  test("dispersion: empty in-span buckets count as zeros; Poisson-ish " +
      "vs bursty ordering; exact moments") {
    // user 1: one event per bucket (buckets 0..3) -> var 0, fano 0
    val regular = (0 until 4).map(i => (1L, i.toLong * 10, i.toLong, 0.0))
    // user 2: 4 events in bucket 0, none in 1..3 (span forced by one
    // event in bucket 3): counts (4,0,0,1) over N=4
    val bursty = Seq((2L, 0L, 10L, 0.0), (2L, 1L, 11L, 0.0),
      (2L, 2L, 12L, 0.0), (2L, 3L, 13L, 0.0), (2L, 35L, 14L, 0.0))
    val got = TimeSeries.dispersion(evts(regular ++ bursty),
        Seq("user_id"), "ts", bucketUs = 10L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = got(1L)
    assert(u1.getLong(1) == 4L && u1.getLong(2) == 4L &&
      u1.getLong(3) == 4L)
    assert(u1.getDouble(4) == 1.0 && u1.getDouble(5) == 0.0 &&
      u1.getDouble(6) == 0.0)
    val u2 = got(2L)
    assert(u2.getLong(1) == 5L && u2.getLong(2) == 4L &&
      u2.getLong(3) == 2L) // occupied: buckets 0 and 3
    // counts (4,0,0,1): mean 1.25, var = (16+1)/4 - 1.5625 = 2.6875
    assert(u2.getDouble(4) == 1.25)
    assert(u2.getDouble(5) == 17.0 / 4 - 1.25 * 1.25)
    assert(u2.getDouble(6) == u2.getDouble(5) / 1.25)
    assert(u2.getDouble(6) > u1.getDouble(6)) // bursty > regular
  }

  test("mannKendall: monotone series maxes S, Sen slope exact on a " +
      "linear series; constant series nulls z") {
    // user 1: x = 3t + 1 at 1-second steps -> every pair concordant:
    // S = n(n-1)/2 = 15, sen = 3 per second
    val lin = (0 until 6).map(i =>
      (1L, i.toLong * 1000000, i.toLong, 3.0 * i + 1.0))
    // user 2: constant -> S = 0, var_s = 0 (one tie group), z null
    val const = (0 until 5).map(i =>
      (2L, i.toLong * 1000000, 100L + i, 7.0))
    // user 3: strictly decreasing -> S = -n(n-1)/2
    val dec = (0 until 4).map(i =>
      (3L, i.toLong * 1000000, 200L + i, -2.0 * i))
    val got = TimeSeries.mannKendall(evts(lin ++ const ++ dec),
        Seq("user_id"), "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = got(1L)
    assert(u1.getLong(1) == 6L && u1.getLong(2) == 15L)
    // no ties: var_s = n(n-1)(2n+5)/18 = 6*5*17/18
    assert(u1.getDouble(3) == 6.0 * 5 * 17 / 18.0)
    assert(u1.getDouble(4) == 14.0 / math.sqrt(6.0 * 5 * 17 / 18.0))
    assert(u1.getDouble(5) == 3.0) // sen: all pairwise slopes = 3/s
    val u2 = got(2L)
    assert(u2.getLong(2) == 0L && u2.getDouble(3) == 0.0)
    assert(u2.isNullAt(4)) // var_s = 0 -> z null
    assert(u2.getDouble(5) == 0.0) // slopes all 0
    val u3 = got(3L)
    assert(u3.getLong(2) == -6L)
    assert(u3.getDouble(5) == -2.0)
    assert(u3.getDouble(4) < 0) // continuity-corrected negative z
  }

  test("mannKendall: senEstimator='lower' picks the Type-1 order " +
      "statistic; equals interpolated on odd pair counts") {
    // x over 1-second steps: 0, 3, 4, 10 -> 6 pairwise slopes (per sec):
    // 3, 2, 10/3, 1, 3.5, 6 -> sorted 1, 2, 3, 10/3, 3.5, 6; m even:
    // interpolated median = (3 + 10/3)/2 = 19/6, lower pick = 3
    val df = evts(Seq((1L, 0L, 0L, 0.0), (1L, 1000000L, 1L, 3.0),
      (1L, 2000000L, 2L, 4.0), (1L, 3000000L, 3L, 10.0)))
    val lower = TimeSeries.mannKendall(df, Seq("user_id"), "ts",
      "event_id", "value", senEstimator = "lower").head()
    assert(lower.getDouble(5) == 3.0)
    val interp = TimeSeries.mannKendall(df, Seq("user_id"), "ts",
      "event_id", "value").head()
    // NOT a closed-form literal on purpose: the interpolated midpoint is
    // whatever double the interpolation chain produces (the very
    // engine-fragility senEstimator='lower' exists to avoid)
    assert(math.abs(interp.getDouble(5) - 19.0 / 6.0) < 1e-12)
    // odd pair count (3 points -> 3 slopes): the two estimators agree
    val odd = evts(Seq((2L, 0L, 0L, 0.0), (2L, 1000000L, 1L, 5.0),
      (2L, 2000000L, 2L, 6.0)))
    val a = TimeSeries.mannKendall(odd, Seq("user_id"), "ts",
      "event_id", "value", senEstimator = "lower").head().getDouble(5)
    val b = TimeSeries.mannKendall(odd, Seq("user_id"), "ts",
      "event_id", "value").head().getDouble(5)
    assert(a == b && a == 3.0) // slopes 5, 1, 3 -> median 3
    val bad = intercept[IllegalArgumentException] {
      TimeSeries.mannKendall(odd, Seq("user_id"), "ts", "event_id",
        "value", senEstimator = "upper")
    }
    assert(bad.getMessage.contains("senEstimator"))
  }

  test("mannKendall: ties reduce var_s by the tie correction; maxN " +
      "refuses long series") {
    // x = 1,1,2,2: ties t = {2,2}; S counts only cross-value pairs
    val df = evts(Seq((1L, 0L, 1L, 1.0), (1L, 1L, 2L, 1.0),
      (1L, 2L, 3L, 2.0), (1L, 3L, 4L, 2.0)))
    val r = TimeSeries.mannKendall(df, Seq("user_id"), "ts",
      "event_id", "value").head()
    assert(r.getLong(2) == 4L) // 2x2 concordant cross pairs
    // var = [4*3*13 - 2*(2*1*9)] / 18 = (156 - 36)/18
    assert(r.getDouble(3) == 120.0 / 18.0)
    val e = intercept[IllegalArgumentException] {
      TimeSeries.mannKendall(df, Seq("user_id"), "ts", "event_id",
        "value", maxN = 3)
    }
    assert(e.getMessage.contains("resample"))
  }

  test("bursts merges consecutive over-threshold buckets into islands") {
    import spark.implicits._
    // key A: mean = 31/8 = 3.875, threshold 5.8125 — buckets 10 (6) and
    // 11 (7) flag consecutively, 12 (5) does NOT (the documented
    // bursts-inflate-the-baseline caveat), 20 (9) flags alone
    val rows = Seq(
      ("A", 1L, 1.0), ("A", 2L, 1.0), ("A", 3L, 1.0), ("A", 4L, 1.0),
      ("A", 10L, 6.0), ("A", 11L, 7.0), ("A", 12L, 5.0),
      ("A", 20L, 9.0),
      ("B", 1L, 3.0), ("B", 2L, 3.0)) // constant: nothing flagged
      .toDF("k", "i", "c")
    val got = TimeSeries.bursts(rows, Seq("k"), "i", "c", mult = 1.5)
      .orderBy("k", "start_idx").collect()
    assert(got.length == 2)
    val first = got(0)
    assert(first.getString(0) == "A" && first.getLong(1) == 10L &&
      first.getLong(2) == 11L && first.getLong(3) == 2L)
    assert(first.getDouble(4) == 13.0 && first.getDouble(5) == 7.0)
    val second = got(1)
    assert(second.getLong(1) == 20L && second.getLong(2) == 20L &&
      second.getLong(3) == 1L)
    // a gap in the INPUT buckets does not merge islands: 10..12 and 20
    // stayed separate above even though no rows exist between them
    intercept[IllegalArgumentException] {
      TimeSeries.bursts(rows, Seq("k"), "i", "c", mult = 0.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.bursts(rows, Nil, "i", "c")
    }
  }

  test("pacf matches an independent Yule-Walker solve per lag") {
    val xs = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 2.0, 7.0, 3.0, 5.0)
    val df = evts(xs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong * 10, i.toLong, v) })
    val got = TimeSeries.pacf(df, Seq("user_id"), "ts", "event_id",
        "value", maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // reference: biased acf, then phi_kk from a Gaussian-elimination
    // solve of the k x k Toeplitz Yule-Walker system (independent of
    // the operator's Durbin-Levinson recursion)
    val m = xs.sum / xs.length
    val den = xs.map(x => (x - m) * (x - m)).sum
    def rho(l: Int): Double =
      if (l == 0) 1.0
      else xs.dropRight(l).zip(xs.drop(l))
        .map { case (a, b) => (a - m) * (b - m) }.sum / den
    def phiKK(k: Int): Double = {
      val a = Array.tabulate(k, k)((i, j) => rho(math.abs(i - j)))
      val b = Array.tabulate(k)(i => rho(i + 1))
      for (c <- 0 until k) { // partial-pivot elimination
        val piv = (c until k).maxBy(r => math.abs(a(r)(c)))
        val (ta, tb) = (a(piv), b(piv)); a(piv) = a(c); a(c) = ta
        val t2 = b(piv); b(piv) = b(c); b(c) = t2
        for (r <- c + 1 until k) {
          val f = a(r)(c) / a(c)(c)
          for (j <- c until k) a(r)(j) -= f * a(c)(j)
          b(r) -= f * b(c)
        }
      }
      val sol = new Array[Double](k)
      for (r <- (k - 1) to 0 by -1) {
        var s = b(r)
        for (j <- r + 1 until k) s -= a(r)(j) * sol(j)
        sol(r) = s / a(r)(r)
      }
      sol(k - 1)
    }
    (1 to 3).foreach { k =>
      assert(math.abs(got(k) - phiKK(k)) < 1e-10, s"lag $k")
    }
  }

  test("pacf: constant series nulls every lag; keys stay independent") {
    val df = evts(Seq((1L, 0L, 1L, 7.0), (1L, 10L, 2L, 7.0),
      (1L, 20L, 3L, 7.0), (1L, 30L, 4L, 7.0)) ++
      Seq(1.0, 3.0, 2.0, 5.0).zipWithIndex.map { case (v, i) =>
        (2L, i.toLong * 10, 10L + i, v) })
    val got = TimeSeries.pacf(df, Seq("user_id"), "ts", "event_id",
      "value", maxLag = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> Option(r.get(2))).toMap
    assert(got((1L, 1)).isEmpty && got((1L, 2)).isEmpty)
    assert(got((2L, 1)).isDefined)
  }

  test("crossCorrelation finds the planted lead at the documented sign") {
    import spark.implicits._
    // y is x delayed by 2 steps (x leads y): the CCF must peak at +2
    val n = 40
    val x = (0 until n).map(i => math.sin(i * 0.7) + 0.1 * i)
    val rows = (0 until n).flatMap { i =>
      val y = if (i >= 2) Some(x(i - 2)) else None
      Seq((i.toLong, Some(x(i)), y))
    }
    val df = rows.toDF("i", "x", "y")
    val got = TimeSeries.crossCorrelation(df, Nil, "i", "x", "y", 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(2) - 1.0) < 1e-9)
    assert((-3 to 3).filter(_ != 2).forall(l => got(l) < 0.999))
    // keyed variant keeps series separate
    val keyed = rows.map { case (i, xv, yv) => ("a", i, xv, yv) } ++
      rows.map { case (i, xv, yv) => ("b", i, yv, xv) } // reversed roles
    val kg = TimeSeries.crossCorrelation(
        keyed.toDF("k", "i", "x", "y"), Seq("k"), "i", "x", "y", 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3))
      .toMap
    assert(math.abs(kg(("a", 2)) - 1.0) < 1e-9)
    assert(math.abs(kg(("b", -2)) - 1.0) < 1e-9) // reversed: y leads x
  }

  test("crossCorrelation: short overlaps and zero variance yield null r") {
    import spark.implicits._
    val df = Seq((0L, 1.0, 5.0), (1L, 2.0, 5.0), (2L, 3.0, 5.0))
      .toDF("i", "x", "y")
    val got = TimeSeries.crossCorrelation(df, Nil, "i", "x", "y", 2)
      .collect()
    // y is constant: every lag's r is null, n still reported
    assert(got.nonEmpty && got.forall(_.isNullAt(2)))
    intercept[IllegalArgumentException] {
      TimeSeries.crossCorrelation(df, Nil, "i", "x", "y", 0)
    }
  }
}
