package graft.events

import graft.SparkSpec

class TransitionsSpec extends SparkSpec {

  test("transitionMatrix counts consecutive pairs with tie-broken order") {
    import spark.implicits._
    // user 1: A(1) B(2) A(3) B(4); user 2: ties at ts=5 ordered by id
    val df = Seq(
        (1L, "A", 1L, 10L), (1L, "B", 2L, 11L), (1L, "A", 3L, 12L),
        (1L, "B", 4L, 13L),
        (2L, "B", 5L, 20L), (2L, "A", 5L, 21L), (2L, "C", 6L, 22L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Transitions.transitionMatrix(df, "user_id", "event_type",
        "ts", "event_id")
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // pairs: u1 A→B, B→A, A→B; u2 B→A (tie order), A→C
    assert(got == Map(
      ("A", "B") -> ((2L, 2.0 / 3)), ("A", "C") -> ((1L, 1.0 / 3)),
      ("B", "A") -> ((2L, 1.0))))
  }

  test("single-event keys and null rows contribute nothing") {
    import spark.implicits._
    val df = Seq(
        (Some(1L), Some("A"), Some(1L), 1L),
        (Some(2L), Some("B"), Some(9L), 2L), // singleton key
        (None, Some("A"), Some(2L), 3L), (Some(1L), None, Some(3L), 4L),
        (Some(1L), Some("B"), None, 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    assert(Transitions.transitionMatrix(df, "user_id", "event_type",
      "ts", "event_id").count() == 0)
  }
}
