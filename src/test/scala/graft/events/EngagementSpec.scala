package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EngagementSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s")))
  }

  test("cumulativeReach: first-seen day per user, running total") {
    val df = ev(Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-03 10:00:00", 2L),
      (2L, "2024-01-01 12:00:00", 3L),
      (3L, "2024-01-03 09:00:00", 4L),
      (4L, "2024-01-05 01:00:00", 5L)))
    val got = Engagement.cumulativeReach(df, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L), ("2024-01-05", 1L, 4L)))
  }

  test("rollingActive: trailing window counts, gap days report zero") {
    val df = ev(Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (2L, "2024-01-01 11:00:00", 2L),
      (1L, "2024-01-02 10:00:00", 3L), // user 1 active twice in window
      (3L, "2024-01-05 10:00:00", 4L)))
    val got = Engagement.rollingActive(df, "user_id", "ts", 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    // windows (trailing 2 days): 01: {1,2}=2; 02: {1,2 (from 01), 1}= {1,2}=2;
    // 03: {1 (from 02)}=1; 04: {}=0; 05: {3}=1
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L), ("2024-01-02", 2L), ("2024-01-03", 1L),
      ("2024-01-04", 0L), ("2024-01-05", 1L)))
  }

  test("rollingActive windowDays=1 is daily distinct actives") {
    val df = ev(Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 11:00:00", 2L),
      (2L, "2024-01-01 12:00:00", 3L), (1L, "2024-01-02 10:00:00", 4L)))
    val got = Engagement.rollingActive(df, "user_id", "ts", 1)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(got.toSeq == Seq(("2024-01-01", 2L), ("2024-01-02", 1L)))
  }

  test("debounce: drops events within the gap of their predecessor") {
    val df = ev(Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:00:05", 2L),  // 5s after #1 → dropped (gap 10s)
      (1L, "2024-01-01 10:00:12", 3L),  // 7s after #2 → dropped (raw predecessor)
      (1L, "2024-01-01 10:00:30", 4L),  // 18s after #3 → kept
      (2L, "2024-01-01 10:00:01", 5L))) // other key: first → kept
    val kept = Engagement.debounce(df, Seq("user_id"), "ts", "event_id",
        10000000L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("debounce: ties on ts break by tie column; zero gap keeps all") {
    val df = ev(Seq(
      (1L, "2024-01-01 10:00:00", 2L),
      (1L, "2024-01-01 10:00:00", 1L)))
    val kept = Engagement.debounce(df, Seq("user_id"), "ts", "event_id", 1L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L)) // id 2 is 0µs after id 1 → dropped
    val all = Engagement.debounce(df, Seq("user_id"), "ts", "event_id", 0L)
    assert(all.count() == 2)
  }
}
