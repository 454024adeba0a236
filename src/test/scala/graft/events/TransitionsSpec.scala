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

  test("sessionPaths splits on the gap and counts first-k prefixes") {
    import spark.implicits._
    // user 1: two sessions (gap > 100 splits); user 2: one session with
    // 4 events (only the first 3 enter the path)
    val rows = Seq(
      (1L, 0L, 1L, "a"), (1L, 50L, 2L, "b"),          // session 1: a>b
      (1L, 500L, 3L, "a"), (1L, 550L, 4L, "b"),       // session 2: a>b
      (2L, 0L, 5L, "a"), (2L, 10L, 6L, "b"),
      (2L, 20L, 7L, "c"), (2L, 30L, 8L, "d"))         // a>b>c (d cut)
      .toDF("user_id", "tsu", "event_id", "event_type")
    val got = Transitions.sessionPaths(rows, Seq("user_id"), "tsu",
      "event_id", "event_type", gap = 100L, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b" -> 2L, "a>b>c" -> 1L))
    // ties at the same timestamp resolve by the tie column
    val tied = Seq((1L, 0L, 2L, "y"), (1L, 0L, 1L, "x"))
      .toDF("user_id", "tsu", "event_id", "event_type")
    val tp = Transitions.sessionPaths(tied, Seq("user_id"), "tsu",
      "event_id", "event_type", gap = 100L, k = 2).collect()
    assert(tp.length == 1 && tp(0).getString(0) == "x>y")
    // topN truncates deterministically (count desc, then path)
    val many = (1 to 6).map(u => (u.toLong, 0L, u.toLong, s"t$u"))
      .toDF("user_id", "tsu", "event_id", "event_type")
    val top = Transitions.sessionPaths(many, Seq("user_id"), "tsu",
      "event_id", "event_type", gap = 1L, k = 1, topN = 3).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("t1", "t2", "t3"))
    intercept[IllegalArgumentException] {
      Transitions.sessionPaths(many, Seq("user_id"), "tsu", "event_id",
        "event_type", gap = 1L, k = 0)
    }
  }
}
