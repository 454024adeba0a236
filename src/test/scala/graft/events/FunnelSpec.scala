package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  // (user, type, ts)
  private val rows = Seq(
    // u1 completes A→B→C in order
    (1L, "A", 100L), (1L, "B", 200L), (1L, "C", 300L),
    // u2: B before A never counts; B after A missing → stops at A
    (2L, "B", 50L), (2L, "A", 100L), (2L, "C", 400L),
    // u3: completes A→B, C out of window (window = 500)
    (3L, "A", 100L), (3L, "B", 150L), (3L, "C", 700L),
    // u4: same-ts B does NOT count (strictly after), later B does
    (4L, "A", 100L), (4L, "B", 100L), (4L, "B", 130L), (4L, "C", 140L),
    // u5: only C → no row
    (5L, "C", 10L),
    // u6: anchor is the FIRST A; B before it never counts even though a
    // later A would complete (first-touch semantics)
    (6L, "A", 100L), (6L, "B", 90L), (6L, "A", 80L))

  test("funnelTimes implements greedy first-touch matching") {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelTimes(df, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), window = 500L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 6L)) // u5 has no step-0
    assert(got(1L) == ((Some(100L), Some(200L), Some(300L))))
    assert(got(2L) == ((Some(100L), None, None)))
    assert(got(3L) == ((Some(100L), Some(150L), None)))
    assert(got(4L) == ((Some(100L), Some(130L), Some(140L))))
    // u6: anchor = min A time (80), B at 90 IS after it → completes to B
    assert(got(6L) == ((Some(80L), Some(90L), None)))
  }

  test("report counts and conversions") {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type", "ts")
    val rep = Funnel.report(df, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), window = 500L)
      .orderBy("step")
      .select("step_name", "n_users", "conversion")
      .as[(String, Long, Double)].collect()
    assert(rep.toSeq == Seq(("A", 5L, 1.0), ("B", 4L, 0.8), ("C", 2L, 0.4)))
  }

  test("null users/timestamps and non-step types are ignored") {
    import spark.implicits._
    val df = Seq(
        (Some(1L), Some("A"), Some(10L)), (Some(1L), Some("X"), Some(20L)),
        (None, Some("A"), Some(30L)), (Some(2L), Some("A"), None))
      .toDF("user_id", "event_type", "ts")
    val rep = Funnel.report(df, "user_id", "event_type", "ts",
      Seq("A", "B"), window = 100L)
    assert(rep.filter(col("step") === 0).head().getLong(2) == 1L)
  }

  test("empty funnel yields zero rows with null conversion") {
    import spark.implicits._
    val df = Seq((1L, "Z", 5L)).toDF("user_id", "event_type", "ts")
    val rep = Funnel.report(df, "user_id", "event_type", "ts",
      Seq("A", "B"), window = 100L).collect()
    assert(rep.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(rep.forall(_.isNullAt(3)))
  }
}
