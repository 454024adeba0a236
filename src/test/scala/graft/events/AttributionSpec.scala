package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {

  // user 1: touches at 10, 20, 100 (type A/B), conversion at 30 and 110;
  // user 2: conversion with no touch in window
  private def ev() = {
    import spark.implicits._
    Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"),
      (1L, 100L, 4L, "view"), (1L, 110L, 5L, "purchase"),
      (2L, 50L, 6L, "purchase"), (2L, 200L, 7L, "view"))
      .toDF("user_id", "tss", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("tss")))
  }

  private def run(model: String, lookback: Long = 50L) =
    Attribution.attribute(ev(), Seq("user_id"), "ts", "event_id",
        "event_type", Seq("view", "click"), "purchase", lookback, model)
      .select("user_id", "conv_tie", "touch_tie", "n_touches", "weight")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

  test("linear: equal split over in-window touches; orphans weight 0") {
    assert(run("linear") == Set(
      (1L, 3L, 1L, 2L, 0.5), (1L, 3L, 2L, 2L, 0.5), // conv 30 ← {10, 20}
      (1L, 5L, 4L, 1L, 1.0),                        // conv 110 ← {100}
      (2L, 6L, -1L, 0L, 0.0)))                      // no touch before 50
  }

  test("first / last pick one touch but report the full count") {
    assert(run("first") == Set(
      (1L, 3L, 1L, 2L, 1.0), (1L, 5L, 4L, 1L, 1.0), (2L, 6L, -1L, 0L, 0.0)))
    assert(run("last") == Set(
      (1L, 3L, 2L, 2L, 1.0), (1L, 5L, 4L, 1L, 1.0), (2L, 6L, -1L, 0L, 0.0)))
  }

  test("lookback cuts old touches; same-ts touch credits only on lower tie") {
    // lookback 15: conv at 30 only sees touch at 20
    assert(run("linear", lookback = 15L).contains((1L, 3L, 2L, 1L, 1.0)))
    import spark.implicits._
    // touch and conversion at the same timestamp: tie decides
    val df = Seq((1L, 10L, 1L, "view"), (1L, 10L, 2L, "purchase"),
      (1L, 10L, 3L, "view"))
      .toDF("user_id", "tss", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("tss")))
    val got = Attribution.attribute(df, Seq("user_id"), "ts", "event_id",
        "event_type", Seq("view"), "purchase", 100L)
      .select("touch_tie", "n_touches").collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L &&
      got(0).getLong(1) == 1L) // id 3 (same ts, higher tie) not credited
  }

  test("model validation") {
    intercept[IllegalArgumentException](run("u_shaped"))
  }
}
