package graft.joins

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(leftRows: Seq[(String, Long, Double)],
                  rightRows: Seq[(String, Long, Double)]) = {
    val left = leftRows.toDF("k", "ts", "v")
    val right = rightRows.toDF("k", "ts", "q")
    AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("q"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
  }

  test("backward as-of picks the latest right row at or before each left ts") {
    val m = run(
      leftRows = Seq(("a", 10L, 1.0), ("a", 25L, 2.0), ("a", 5L, 3.0)),
      rightRows = Seq(("a", 10L, 100.0), ("a", 20L, 200.0), ("a", 30L, 300.0)))
    assert(m(("a", 10L)) == 100.0) // exact-timestamp right row matches
    assert(m(("a", 25L)) == 200.0) // latest at-or-before 25
    assert(m(("a", 5L)) == null)   // nothing before 5 → null
  }

  test("keys never leak matches across each other; ASOF LEFT null semantics") {
    val m = run(
      leftRows = Seq(("a", 10L, 1.0), ("b", 10L, 2.0)),
      rightRows = Seq(("a", 5L, 100.0)))
    assert(m(("a", 10L)) == 100.0)
    assert(m(("b", 10L)) == null) // b has no right rows

    // left rows with null ts are RETAINED with null values (ASOF LEFT
    // JOIN semantics); right rows with null ts are dropped
    val withNull = Seq[(String, java.lang.Long, Double)](
      ("a", 10L, 1.0), ("a", null, 9.0)).toDF("k", "ts", "v")
    val right = Seq[(String, java.lang.Long, Double)](
      ("a", 5L, 100.0), ("a", null, 777.0)).toDF("k", "ts", "q")
    val out = AsofJoin.asofJoin(withNull, right, Seq("k"), "ts", Seq("q"))
      .collect()
    assert(out.length == 2)
    val nullRow = out.find(_.isNullAt(1)).get
    assert(nullRow.getDouble(2) == 9.0 && nullRow.isNullAt(3))
    assert(out.find(!_.isNullAt(1)).get.getDouble(3) == 100.0)
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    val left = Seq(("a", 10L, 1.0), ("a", 25L, 2.0), ("a", 35L, 3.0),
      ("b", 1L, 4.0)).toDF("k", "ts", "v")
    val right = Seq(("a", 10L, 100.0), ("a", 20L, 200.0), ("a", 30L, 300.0))
      .toDF("k", "ts", "q")
    val m = AsofJoin.asofJoinForward(left, right, Seq("k"), "ts", Seq("q"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(m(("a", 10L)) == 100.0) // exact-timestamp tie matches (inclusive)
    assert(m(("a", 25L)) == 300.0) // earliest at-or-after 25
    assert(m(("a", 35L)) == null)  // nothing after 35 → null
    assert(m(("b", 1L)) == null)   // keys never leak

    // brute-force parity on a pseudo-random many-key corpus
    val ls = (0 until 150).map(i =>
      (s"k${i % 7}", (i * 2654435761L) % 500, i.toDouble))
    val rs = (0 until 150).map(i =>
      (s"k${i % 5}", (i * 48271L) % 500, i + 1000.0))
    val got = AsofJoin.asofJoinForward(ls.toDF("k", "ts", "v"),
        rs.toDF("k", "ts", "q"), Seq("k"), "ts", Seq("q"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    ls.foreach { case (k, ts, v) =>
      val want: Any = rs.filter(r => r._1 == k && r._2 >= ts)
        .sortBy(_._2).headOption.map(_._3).getOrElse(null)
      assert(got((k, ts, v)) == want, s"key $k ts $ts")
    }
  }

  test("nearest as-of picks the closer side, ties backward, one-sided fallbacks") {
    val left = Seq((1L, "a", 10L, 1.0), (2L, "a", 24L, 2.0),
      (3L, "a", 26L, 3.0), (4L, "a", 25L, 4.0), (5L, "a", 2L, 5.0),
      (6L, "a", 99L, 6.0)).toDF("id", "k", "ts", "v")
    val right = Seq(("a", 20L, 200.0), ("a", 30L, 300.0))
      .toDF("k", "ts", "q")
      .select(col("k"), col("ts"), col("ts").as("rts"), col("q"))
    val m = AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts",
        Seq("rts", "q"), "id", "rts")
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("q"))) null
         else r.getAs[Double]("q"))).toMap
    assert(m(1L) == 200.0) // 10: nothing before -> forward match at 20
    assert(m(2L) == 200.0) // 24: back 20 (4) vs fwd 30 (6) -> back
    assert(m(3L) == 300.0) // 26: back 20 (6) vs fwd 30 (4) -> fwd
    assert(m(4L) == 200.0) // 25: tie (5 vs 5) -> backward (pandas)
    assert(m(5L) == 200.0) // 2: nothing before -> forward fallback
    assert(m(6L) == 300.0) // 99: nothing after -> backward fallback
  }

  test("tolerance bounds the match gap in both directions") {
    val left = Seq(("a", 10L, 1.0), ("a", 45L, 2.0), ("a", 100L, 3.0))
      .toDF("k", "ts", "v")
    val right = Seq(("a", 8L, 8L, 80.0), ("a", 50L, 50L, 500.0))
      .toDF("k", "ts", "rts", "q")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    val back = toMap(AsofJoin.asofJoinTolerance(left, right, Seq("k"), "ts",
      Seq("rts", "q"), "rts", tolerance = 10.0))
    assert(back(10L) == 80.0)  // gap 2 within tolerance
    assert(back(45L) == null)  // backward match is 8, gap 37 > 10
    assert(back(100L) == null) // backward match is 50, gap 50 > 10
    val fwd = toMap(AsofJoin.asofJoinForwardTolerance(left, right, Seq("k"),
      "ts", Seq("rts", "q"), "rts", tolerance = 10.0))
    assert(fwd(10L) == null)   // forward match is 50, gap 40 > 10
    assert(fwd(45L) == 500.0)  // gap 5 within tolerance
    assert(fwd(100L) == null)  // no forward match at all
    intercept[IllegalArgumentException](AsofJoin.asofJoinTolerance(
      left, right, Seq("k"), "ts", Seq("q"), "rts", 10.0))
    intercept[IllegalArgumentException](AsofJoin.asofJoinTolerance(
      left, right, Seq("k"), "ts", Seq("rts", "q"), "rts", -1.0))
  }

  test("binary join keys compare by content, not reference") {
    val left = Seq((Array[Byte](1, 2), 10L, 1.0), (Array[Byte](3), 10L, 2.0))
      .toDF("k", "ts", "v")
    val right = Seq((Array[Byte](1, 2), 5L, 100.0)).toDF("k", "ts", "q")
    val m = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("q"))
      .collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(m(Seq[Byte](1, 2)) == 100.0, "binary key match lost")
    assert(m(Seq[Byte](3)) == null)
  }

  test("range join: bins, boundaries, signs, and the giant-interval guard") {
    val points = Seq(("a", -5L, 1), ("a", 0L, 2), ("a", 10L, 3),
      ("a", 25L, 4), ("b", 10L, 5)).toDF("k", "x", "pid")
    val intervals = Seq(("a", -15L, -5L, 100), ("a", 10L, 24L, 200),
      ("b", 0L, 50L, 300)).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "x", "lo", "hi", binWidth = 10L)
      .collect().map(r => (r.getAs[Int]("pid"), r.getAs[Int]("iid"))).toSet
    // -5 lands on the inclusive upper boundary of [-15,-5]; 10 on the
    // inclusive lower boundary of [10,24]; 0 and 25 match nothing
    assert(got == Set((1, 100), (3, 200), (5, 300)), got.toString)

    // every matching pair appears exactly once even when the interval
    // spans several bins
    val wide = Seq(("a", 0L, 95L, 1)).toDF("k", "lo", "hi", "iid")
    val p2 = Seq(("a", 50L, 9)).toDF("k", "x", "pid")
    assert(RangeJoin.pointInInterval(p2, wide, Seq("k"), "x", "lo", "hi",
      binWidth = 10L).count() == 1)

    // degenerate giant interval fails loudly instead of exploding
    val giant = Seq(("a", 0L, Long.MaxValue / 2, 1)).toDF("k", "lo", "hi", "iid")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p2, giant, Seq("k"), "x", "lo", "hi",
        binWidth = 10L).count()
    }
    assert(e.getMessage.contains("raise binWidth") ||
      Option(e.getCause).exists(_.getMessage.contains("raise binWidth")))
  }

  test("interval overlap join: exactly-once pairs, boundaries, brute-force parity") {
    // hand fixture: touching endpoints count as overlap; disjoint don't;
    // keys never leak
    val l = Seq(("a", 0L, 10L, 1), ("a", 20L, 30L, 2), ("b", 0L, 100L, 3))
      .toDF("k", "lo_a", "hi_a", "lid")
    val r = Seq(("a", 10L, 15L, 100), ("a", 31L, 40L, 200),
      ("a", 5L, 25L, 300), ("b", 99L, 99L, 400))
      .toDF("k", "lo_b", "hi_b", "rid")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"),
        "lo_a", "hi_a", "lo_b", "hi_b", binWidth = 7L)
      .collect().map(x => (x.getAs[Int]("lid"), x.getAs[Int]("rid"))).toSeq
    // (1,100) touch at 10; (1,300) and (2,300) overlap; (2,200) disjoint
    // (gap of 1); (3,400) same key b; nothing crosses keys
    assert(got.sorted == Seq((1, 100), (1, 300), (2, 300), (3, 400)))
    // exactly once even when the shared span covers many bins
    assert(got.size == got.distinct.size)

    // brute-force parity on a pseudo-random corpus across bin widths
    val xs = (0 until 80).map { i =>
      val k = if (i % 3 == 0) "a" else "b"
      val lo = (i * 2654435761L) % 200
      (k, lo, lo + (i * 40503L) % 37, i)
    }
    val ys = (0 until 80).map { i =>
      val k = if (i % 4 == 0) "a" else "b"
      val lo = (i * 48271L) % 200
      (k, lo, lo + (i * 16807L) % 53, i + 1000)
    }
    val lf = xs.toDF("k", "lo_a", "hi_a", "lid")
    val rf = ys.toDF("k", "lo_b", "hi_b", "rid")
    val want = (for {
      (k1, lo1, hi1, i1) <- xs
      (k2, lo2, hi2, i2) <- ys
      if k1 == k2 && lo1 <= hi2 && lo2 <= hi1
    } yield (i1, i2)).toSet
    for (w <- Seq(1L, 8L, 64L, 1024L)) {
      val fast = RangeJoin.intervalOverlap(lf, rf, Seq("k"),
          "lo_a", "hi_a", "lo_b", "hi_b", binWidth = w)
        .collect().map(x => (x.getAs[Int]("lid"), x.getAs[Int]("rid")))
      assert(fast.length == fast.distinct.length, s"dup pairs at width $w")
      assert(fast.toSet == want, s"width $w")
    }
  }

  test("matches a window-function reference on many keys and partitions") {
    val rnd = new scala.util.Random(13)
    val left = (0 until 400).map(i =>
      (s"k${i % 7}", rnd.nextInt(1000).toLong, i.toDouble))
    val right = (0 until 300).map(i =>
      (s"k${i % 7}", rnd.nextInt(1000).toLong, i * 10.0))
    // reference: per left row, max-ts right row with ts <= left.ts.
    // build with distinct right ts per key to keep the reference unambiguous
    val rightDedup = right.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val expect = left.map { case (k, ts, v) =>
      val best = rightDedup.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      ((k, ts, v), best)
    }.toMap
    val got = AsofJoin.asofJoin(
      left.toDF("k", "ts", "v").repartition(13),
      rightDedup.toDF("k", "ts", "q").repartition(5),
      Seq("k"), "ts", Seq("q"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    expect.foreach { case (key, want) =>
      assert(got(key) == want, s"$key: got ${got(key)} want $want")
    }
  }
}
