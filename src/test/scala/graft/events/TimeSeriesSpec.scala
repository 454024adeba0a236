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
}
