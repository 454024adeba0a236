package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingSpec extends SparkSpec {

  test("rollingAgg matches the brute-force trailing-window definition") {
    import spark.implicits._
    val rows = Seq( // (id, user, tsSec, value)
      (1L, 1L, 100L, 1.0), (2L, 1L, 200L, 2.0), (3L, 1L, 3699L, 4.0),
      (4L, 1L, 3700L, 8.0), (5L, 2L, 150L, 16.0), (6L, 2L, 150L, 32.0))
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val got = Rolling.rollingAgg(df, Seq("user_id"), "ts", "value", 3600L)
      .select("event_id", "n_win", "sum_win").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val brute = rows.map { case (id, u, t, _) =>
      val in = rows.filter { case (_, u2, t2, _) =>
        u2 == u && t2 <= t && t2 > t - 3600L }
      id -> ((in.size.toLong, in.map(_._4).sum))
    }.toMap
    assert(got == brute)
    // the 100-s event has aged out of event 4's frame; event 3 still holds it
    assert(got(3L)._1 == 3L && got(4L)._1 == 3L)
    // same-second peers share one frame (RANGE semantics): both count both
    assert(got(5L) == ((2L, 48.0)) && got(6L) == ((2L, 48.0)))
  }

  test("rollingAggCoarse equals rollingAgg on grain-aligned timestamps") {
    import spark.implicits._
    // all timestamps are multiples of the grain → bucketing is lossless
    val rows = Seq(
      (1L, 60L, 1.0), (1L, 120L, 2.0), (1L, 3600L, 4.0), (1L, 3660L, 8.0),
      (2L, 60L, 16.0))
    val df = rows.toDF("user_id", "ts", "value")
    val fine = Rolling.rollingAgg(df, Seq("user_id"), "ts", "value", 3600L)
      .select("user_id", "ts", "n_win", "sum_win")
      .as[(Long, Long, Long, Double)].collect().toSet
    val coarse = Rolling.rollingAggCoarse(df, Seq("user_id"), "ts", "value",
        3600L, grainSec = 60L)
      .select(col("user_id"), col("grain_ts"), col("n_win"), col("sum_win"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(coarse == fine)
  }

  test("rollingAggCoarse rejects a grain that does not divide the window") {
    import spark.implicits._
    val df = Seq((1L, 60L, 1.0)).toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      Rolling.rollingAggCoarse(df, Seq("user_id"), "ts", "value", 3600L, 7L)
    }
  }

  test("rollingAggCoarse floors negative (pre-1970) timestamps into their grain") {
    import spark.implicits._
    // ts = -30 belongs to grain [-60, 0), i.e. bucket start -60; the old
    // truncate-toward-zero cast put it in bucket 0
    val df = Seq((1L, -30L, 1.0), (1L, -90L, 2.0)).toDF("user_id", "ts", "value")
    val got = Rolling.rollingAggCoarse(df, Seq("user_id"), "ts", "value",
        windowSec = 60L, grainSec = 60L)
      .select(col("grain_ts"), col("n_win"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(-60L -> 1L, -120L -> 1L))
  }

  test("rolling on empty input yields an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("user_id", "ts", "value")
    assert(Rolling.rollingAgg(empty, Seq("user_id"), "ts", "value", 60L).count() == 0L)
    assert(Rolling.rollingAggCoarse(empty, Seq("user_id"), "ts", "value", 60L, 60L)
      .count() == 0L)
  }

  test("locfFill carries the last non-null forward per key; leading nulls stay") {
    import spark.implicits._
    val rows = Seq[(Long, String, Long, java.lang.Double)](
      (1L, "a", 10L, null), (2L, "a", 20L, 5.0), (3L, "a", 30L, null),
      (4L, "a", 40L, 7.0), (5L, "a", 50L, null),
      (6L, "b", 10L, 9.0), (7L, "b", 20L, null),
      // duplicate ts: tie resolves by id, so 9's null sees 8's value
      (8L, "c", 10L, 1.0), (9L, "c", 10L, null)
    ).toDF("id", "k", "ts", "v")
    val got = Rolling.locfFill(rows, Seq("k"), "ts", "v", "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got(1L) == null) // before the key's first observation
    assert(got(3L) == 5.0 && got(5L) == 7.0)
    assert(got(7L) == 9.0) // keys never leak: b fills from b
    assert(got(9L) == 1.0)
  }

  test("resample: grid coverage, cell means, gap carry-forward, span guard") {
    import spark.implicits._
    val rows = Seq( // key a: cells 0 and 30 observed, 10/20 are gaps
      ("a", 1L, 2.0), ("a", 4L, 4.0), ("a", 31L, 10.0),
      ("b", 100L, 1.0)
    ).toDF("k", "ts", "v")
    val got = Rolling.resample(rows, Seq("k"), "ts", "v", stepSec = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", 0L)) == ((2L, 3.0)))   // mean of 2 and 4
    assert(got(("a", 10L)) == ((0L, 3.0)))  // gap, carried forward
    assert(got(("a", 20L)) == ((0L, 3.0)))
    assert(got(("a", 30L)) == ((1L, 10.0)))
    assert(got(("b", 100L)) == ((1L, 1.0))) // single-cell key
    assert(got.size == 5)
    // degenerate span fails loudly
    val wide = Seq(("a", 0L, 1.0), ("a", 1000000L, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception](
      Rolling.resample(wide, Seq("k"), "ts", "v", 1L, maxCells = 100).collect())
    assert(e.getMessage.contains("raise stepSec") ||
      Option(e.getCause).exists(_.getMessage.contains("raise stepSec")))
  }

  test("ewma matches the per-key recursion; ties break on the tie id") {
    import spark.implicits._
    // key 1: values 10, 20, 30 in ts order; key 2: one row; two rows of
    // key 3 share a timestamp — tie id decides the recursion order
    val rows = Seq(
      (1L, 100L, 1L, 10.0), (1L, 200L, 2L, 20.0), (1L, 300L, 3L, 30.0),
      (2L, 100L, 4L, 7.0),
      (3L, 100L, 6L, 1.0), (3L, 100L, 5L, 100.0))
    val df = rows.toDF("k", "tss", "id", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val a = 0.5
    val got = Rolling.ewma(df, Seq("k"), "ts", "id", "v", a)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(got(1L) === 10.0)
    assert(got(2L) === a * 20.0 + (1 - a) * 10.0)
    assert(got(3L) === a * 30.0 + (1 - a) * (a * 20.0 + (1 - a) * 10.0))
    assert(got(4L) === 7.0)
    // id 5 sorts before id 6 at the shared timestamp
    assert(got(5L) === 100.0)
    assert(got(6L) === a * 1.0 + (1 - a) * 100.0)
    // alpha = 1 degrades to the value itself
    val id1 = Rolling.ewma(df, Seq("k"), "ts", "id", "v", 1.0)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(rows.forall { case (_, _, id, v) => id1(id) === v })
    intercept[IllegalArgumentException](
      Rolling.ewma(df, Seq("k"), "ts", "id", "v", 0.0))
  }

  test("ewma multi-key grouping and null dropping") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 100L, 1L, java.lang.Double.valueOf(4.0)),
      (1L, "b", 100L, 2L, java.lang.Double.valueOf(8.0)),
      (1L, "a", 200L, 3L, java.lang.Double.valueOf(6.0)),
      (1L, "a", 300L, 4L, null.asInstanceOf[java.lang.Double]))
      .toDF("k1", "k2", "tss", "id", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Rolling.ewma(df, Seq("k1", "k2"), "ts", "id", "v", 0.5)
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._3 -> r._4).toMap
    assert(got === Map(1L -> 4.0, 2L -> 8.0, 3L -> 5.0)) // null row dropped
  }

  test("rollingZscore: strictly-earlier baseline, warm-up null, flag") {
    import spark.implicits._
    // baseline 10,12,14 (mean 12, sd 2) then a 100 burst; the burst's own
    // second is excluded so it can't mask itself
    val df = Seq((1L, 10L, 10.0), (1L, 20L, 12.0), (1L, 30L, 14.0),
      (1L, 40L, 100.0), (1L, 41L, 12.0))
      .toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Rolling.rollingZscore(df, Seq("k"), "ts", "v",
        windowSec = 3600L, threshold = 3.0)
      .select("tss", "z", "is_anomaly")
      .as[(Long, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) === ((None, Some(false)))) // no baseline: not flagged
    assert(got(20L) === ((None, Some(false)))) // baseline of 1: null z
    assert(got(30L)._1.exists(z => math.abs(z - (14.0 - 11.0) /
      math.sqrt(2.0)) < 1e-12))              // mean 11, sd sqrt(2)
    assert(got(40L)._1.exists(_ > 3.0) && got(40L)._2 === Some(true))
    // at 41 the baseline includes the 100 burst (mean 34, wide sd), so
    // the ordinary 12 is not anomalous — but its z IS defined
    assert(got(41L)._1.isDefined && got(41L)._2 === Some(false))
  }

  test("rollingZscore: zero-variance baseline stays null") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 20L, 5.0), (1L, 30L, 5.0),
      (1L, 40L, 9.0)).toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Rolling.rollingZscore(df, Seq("k"), "ts", "v", 3600L)
      .select("tss", "z").as[(Long, Option[Double])].collect().toMap
    assert(got(40L) === None) // sd 0 -> no defined z
  }

  test("rollingRobustZscore: contaminated baseline still flags the " +
      "second burst; stddev baseline would not") {
    import spark.implicits._
    // baseline 10,10,10,12,1000 (an earlier burst inside the window),
    // then a 200 burst. Robust: median 10, IQR 2 -> huge z. Classic:
    // mean 208.4, sd ~442 -> z < 0.1.
    val df = Seq((1L, 10L, 10.0), (1L, 20L, 10.0), (1L, 30L, 10.0),
      (1L, 40L, 12.0), (1L, 50L, 1000.0), (1L, 60L, 200.0))
      .toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val robust = Rolling.rollingRobustZscore(df, Seq("k"), "ts", "v",
        windowSec = 3600L, threshold = 3.5)
      .select("tss", "robust_z", "is_anomaly")
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // warm-up: < 4 baseline events -> null z, never flagged
    assert(robust(10L)._1.isEmpty && !robust(10L)._2)
    assert(robust(40L)._1.isEmpty && !robust(40L)._2)
    // burst at 60: baseline 10,10,10,12,1000 -> med 10, IQR = q3-q1 = 2
    val z60 = robust(60L)._1.get
    assert(math.abs(z60 - (200.0 - 10.0) / (0.7413 * 2.0)) < 1e-9)
    assert(robust(60L)._2)
    val classic = Rolling.rollingZscore(df, Seq("k"), "ts", "v",
        windowSec = 3600L, threshold = 3.5)
      .select("tss", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(!classic(60L)) // the stddev baseline is blind to it
  }

  test("rollingRobustZscore: zero IQR stays null") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 20L, 5.0), (1L, 30L, 5.0),
      (1L, 40L, 5.0), (1L, 50L, 99.0))
      .toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Rolling.rollingRobustZscore(df, Seq("k"), "ts", "v",
        windowSec = 3600L)
      .select("tss", "robust_z").as[(Long, Option[Double])]
      .collect().toMap
    assert(got(50L).isEmpty) // constant baseline: IQR 0 -> null
  }

  test("rollingRobustZscoreSketch: every sketch quantile brackets the " +
      "exact frame's order statistics within 2*cellWidth") {
    import spark.implicits._
    // deterministic pseudo-random values in [0, 100): hash-mixed index
    val df = spark.range(600)
      .selectExpr("id % 3 as k", "cast(10 * (id / 3) as long) as tss",
        "cast(pmod(hash(id * 2654435761), 10000) as double) / 100.0 as v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val lo = 0.0; val hi = 100.0; val bins = 200
    val width = (hi - lo) / bins
    val winSec = 300L
    val sk = Rolling.rollingRobustZscoreSketch(df, Seq("k"), "ts", "v",
        winSec, lo, hi, bins, threshold = 2.5)
      .select("k", "tss", "baseline_median", "baseline_iqr",
        "baseline_below", "baseline_above")
      .as[(Long, Long, Option[Double], Option[Double], Long, Long)]
      .collect()
    assert(sk.nonEmpty)
    // driver-side exact frames over the same small fixture: the sketch's
    // contract is per-QUANTILE — the estimate lies within 2*width of the
    // order-statistic bracket [x_(floor(r)+1), x_(floor(r)+2)] the exact
    // type-7 quantile interpolates inside (interpolation itself can sit
    // anywhere in the bracket when the frame is sparse, so the honest
    // envelope is bracket +/- 2*width, not exact +/- 2*width)
    val rows = df.select("k", "tss", "v")
      .as[(Long, Long, Double)].collect()
    def frame(k: Long, tss: Long): Array[Double] = rows
      .filter(r => r._1 == k && r._2 >= tss - (winSec - 1) && r._2 < tss)
      .map(_._3).sorted
    def bracket(xs: Array[Double], p: Double): (Double, Double) = {
      val r = p * (xs.length - 1)
      val i = math.floor(r).toInt
      (xs(i), xs(math.min(i + 1, xs.length - 1)))
    }
    var checked = 0
    sk.foreach { case (k, tss, med, iqr, below, above) =>
      assert(below == 0L && above == 0L) // range covers all values
      val xs = frame(k, tss)
      assert(med.isDefined == xs.nonEmpty, s"($k,$tss) med definedness")
      med.foreach { m =>
        val (blo, bhi) = bracket(xs, 0.5)
        assert(m >= blo - 2 * width - 1e-9 && m <= bhi + 2 * width + 1e-9,
          s"($k,$tss) sketch median $m outside [$blo, $bhi] +/- 2*width")
        checked += 1
      }
      iqr.foreach { v =>
        val (q1lo, q1hi) = bracket(xs, 0.25)
        val (q3lo, q3hi) = bracket(xs, 0.75)
        val lo_ = q3lo - q1hi - 4 * width - 1e-9
        val hi_ = q3hi - q1lo + 4 * width + 1e-9
        assert(v >= lo_ && v <= hi_,
          s"($k,$tss) sketch IQR $v outside [$lo_, $hi_]")
      }
    }
    assert(checked > 150) // the envelope was actually exercised
  }

  test("rollingRobustZscoreSketch: out-of-range baseline mass is " +
      "surfaced, not silently dropped into the quantiles") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 20L, 6.0), (1L, 30L, 7.0),
      (1L, 40L, 8.0), (1L, 50L, 999.0), (1L, 60L, 7.5))
      .toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Rolling.rollingRobustZscoreSketch(df, Seq("k"), "ts", "v",
        windowSec = 3600L, lo = 0.0, hi = 10.0, bins = 100)
      .select("tss", "baseline_above")
      .as[(Long, Long)].collect().toMap
    assert(got(60L) == 1L) // the 999 landed above the range and is visible
    assert(got(50L) == 0L)
  }
}
