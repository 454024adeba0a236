package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def frame(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("diff: every status class, by content not row identity") {
    val old = frame(Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    val neu = frame(Seq(2L -> "b", 3L -> "c CHANGED", 5L -> "e"))
    val got = Snapshot.diff(old, neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("diff: null text compares as empty fingerprint, not SQL null") {
    val old = frame(Seq(1L -> null, 2L -> null, 3L -> "x"))
    val neu = frame(Seq(1L -> null, 2L -> "y", 3L -> null))
    val got = Snapshot.diff(old, neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // null == null must be unchanged (a full-null row is still the same
    // row); null vs text must be changed, never silently dropped
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("diffReport counts match diff statuses; identical snapshots all unchanged") {
    val old = frame((1L to 50L).map(i => i -> s"t$i"))
    val neu = frame((11L to 60L).map(i => i -> (if (i <= 20) s"t$i!" else s"t$i")))
    val rep = Snapshot.diffReport(old, neu, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("removed" -> 10L, "changed" -> 10L,
      "unchanged" -> 30L, "added" -> 10L))
    val same = Snapshot.diffReport(old, old, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same == Map("unchanged" -> 50L))
  }

  test("schemaDiff: added/removed/type_changed/unchanged; order ignored") {
    import spark.implicits._
    val old = Seq((1L, "t", 5)).toDF("id", "text", "n")
    val neu = old.drop("text")
      .withColumn("lang", lit("en"))
      .withColumn("n", col("n").cast("double"))
      .select("n", "lang", "id") // shuffled column order must not matter
    val d = Snapshot.schemaDiff(old, neu).orderBy("column")
      .as[(String, String, String, String)].collect()
    assert(d.map(r => r._1 -> r._2).toSeq == Seq(
      "id" -> "unchanged", "lang" -> "added", "n" -> "type_changed",
      "text" -> "removed"))
    val n = d.find(_._1 == "n").get
    assert(n._3 == "INT" && n._4 == "DOUBLE")
    assert(d.find(_._1 == "lang").get._3 == null)
    assert(d.find(_._1 == "text").get._4 == null)
    // identical schemas: all unchanged, no phantom rows
    val same = Snapshot.schemaDiff(old, old)
    assert(same.filter(col("status") =!= "unchanged").count() == 0)
    assert(same.count() == 3)
  }

  test("scd2 collapses runs and emits half-open intervals") {
    import spark.implicits._
    // key 1: A,A,B,A -> three intervals (A x2, B, A); key 2: constant C
    val df = Seq(
        (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
        (2L, 5L, "C"), (2L, 6L, "C"),
        (3L, 1L, null)) // null tracked value is a real state
      .toDF("k", "ver", "v")
    val got = Snapshot.scd2(df, "k", "ver", Seq("v"))
      .select("k", "v", "valid_from", "valid_to", "n_versions", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toSet
    assert(got == Set(
      (1L, "A", 10L, 30L, 2L, false), (1L, "B", 30L, 40L, 1L, false),
      (1L, "A", 40L, -1L, 1L, true),
      (2L, "C", 5L, -1L, 2L, true),
      (3L, null, 1L, -1L, 1L, true)))
    // null -> value is a change (null-safe compare), not an unchanged run
    val nulls = Seq((1L, 1L, null), (1L, 2L, "X"))
      .toDF("k", "ver", "v")
    assert(Snapshot.scd2(nulls, "k", "ver", Seq("v")).count() == 2)
    intercept[IllegalArgumentException](
      Snapshot.scd2(df, "k", "ver", Seq.empty))
    intercept[IllegalArgumentException](
      Snapshot.scd2(df, "k", "ver", Seq("ver")))
  }

  test("applyChanges: upsert, insert, delete, passthrough") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "price")
    val changes = Seq(
      (2L, "U", 1L, "b2", 21.0),  // update existing
      (3L, "D", 1L, "", 0.0),     // delete existing
      (4L, "U", 1L, "d", 40.0),   // insert new
      (5L, "D", 1L, "", 0.0))     // delete absent — no-op
      .toDF("id", "op", "seq", "name", "price")
    val got = Snapshot.applyChanges(snap, changes, "id", "op", "seq",
        Seq("name", "price"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("applyChanges: last writer wins on seq; delete-then-update resurrects") {
    import spark.implicits._
    val snap = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq(
      (1L, "U", 1L, "x"), (1L, "U", 3L, "z"), (1L, "U", 2L, "y"),
      (2L, "D", 1L, ""), (2L, "U", 2L, "new"))
      .toDF("id", "op", "seq", "v")
    val got = Snapshot.applyChanges(snap, changes, "id", "op", "seq",
        Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "z"), (2L, "new")))
    // reverse case: update then delete at higher seq → gone
    val del = Seq((1L, "U", 1L, "x"), (1L, "D", 2L, ""))
      .toDF("id", "op", "seq", "v")
    assert(Snapshot.applyChanges(snap, del, "id", "op", "seq",
      Seq("v")).count() == 0)
  }

  test("applyChanges: seq ties resolve deterministically via struct order") {
    import spark.implicits._
    val snap = Seq((9L, "s")).toDF("id", "v")
    // same id, same seq: ("U","b") vs ("U","a") — full struct order picks
    // the lexicographically larger payload, every run
    val changes = Seq((1L, "U", 1L, "a"), (1L, "U", 1L, "b"))
      .toDF("id", "op", "seq", "v")
    val got1 = Snapshot.applyChanges(snap, changes, "id", "op", "seq",
      Seq("v")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got1 == Set((9L, "s"), (1L, "b")))
  }
}
