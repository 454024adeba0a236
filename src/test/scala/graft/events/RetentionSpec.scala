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
}
