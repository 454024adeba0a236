package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {

  test("cohorts builds the triangular retention matrix") {
    import spark.implicits._
    // bucket = 10: u1 first in period 0, active 0/1/2; u2 first in 0,
    // active 0 only; u3 first in 1, active 1 and 3
    val df = Seq(
        (1L, 5L), (1L, 12L), (1L, 14L), (1L, 27L),
        (2L, 9L),
        (3L, 15L), (3L, 35L))
      .toDF("user_id", "ts")
    val got = Retention.cohorts(df, "user_id", "ts", bucket = 10L)
      .select("cohort", "offset", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L, 2L, 1.0), (0L, 1L, 1L, 2L, 0.5), (0L, 2L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0), (1L, 2L, 1L, 1L, 1.0)))
  }

  test("duplicate events in one period count a user once") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("user_id", "ts")
    val got = Retention.cohorts(df, "user_id", "ts", bucket = 10L)
      .select("cohort", "offset", "n_active")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L)))
  }

  test("nulls are dropped; boundary timestamps bucket exactly") {
    import spark.implicits._
    val df = Seq(
        (Some(1L), Some(10L)), (Some(1L), Some(19L)), (Some(1L), Some(20L)),
        (None, Some(5L)), (Some(2L), None))
      .toDF("user_id", "ts")
    val got = Retention.cohorts(df, "user_id", "ts", bucket = 10L)
      .select("cohort", "offset", "n_active")
      .as[(Long, Long, Long)].collect().toSet
    // ts=10 and 19 are period 1; ts=20 is period 2 — no off-by-one
    assert(got == Set((1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("rfm: scores rank users correctly on each axis; segment " +
      "concatenates the digits") {
    import spark.implicits._
    val h = 3600000000L
    // 4 users: 1 = fresh+busy+big, 4 = stale+rare+small
    val rows =
      (1 to 8).map(i => (1L, 10L * h + i * h, 100.0)) ++   // last 18h
      (1 to 4).map(i => (2L, 5L * h + i * h, 50.0)) ++     // last 9h
      (1 to 2).map(i => (3L, 2L * h + i * h, 10.0)) ++     // last 4h
      Seq((4L, 1L * h, 1.0))                               // last 1h
    val df = rows.toDF("u", "tsu", "v")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val got = Retention.rfm(df, "u", "ts", "v", nBins = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // reference time = max ts (user 1's last event): recency 0 for u1
    assert(got(1L).getLong(1) == 0L)
    assert(got(1L).getAs[Int]("r_score") == 4) // freshest
    assert(got(4L).getAs[Int]("r_score") == 1) // stalest
    assert(got(1L).getAs[Int]("f_score") == 4)
    assert(got(4L).getAs[Int]("f_score") == 1)
    assert(got(1L).getAs[Int]("m_score") == 4)
    assert(got(4L).getAs[Int]("m_score") == 1)
    assert(got(1L).getAs[String]("segment") == "444")
    assert(got(4L).getAs[String]("segment") == "111")
    // monotone on every axis: fresher/busier/bigger never scores lower
    val ord = Seq(1L, 2L, 3L, 4L).map(got)
    assert(ord.map(_.getAs[Int]("f_score")).sliding(2)
      .forall(p => p.head >= p.last))
    assert(ord.map(_.getAs[Int]("m_score")).sliding(2)
      .forall(p => p.head >= p.last))
  }
}
