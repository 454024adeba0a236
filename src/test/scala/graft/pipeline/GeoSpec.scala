package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {

  private def brute(aLat: Double, aLon: Double,
                    bLat: Double, bLon: Double): Double = {
    val d = math.Pi / 180
    val a = math.pow(math.sin((bLat - aLat) * d / 2), 2) +
      math.cos(aLat * d) * math.cos(bLat * d) *
        math.pow(math.sin((bLon - aLon) * d / 2), 2)
    2 * 6371000.0 * math.asin(math.sqrt(a))
  }

  test("haversineMeters matches known distances") {
    import spark.implicits._
    // Paris <-> London is ~343-344 km by great circle
    val df = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
    val got = df.select(Geo.haversineMeters(col("a"), col("b"),
      col("c"), col("d"))).head().getDouble(0)
    assert(got > 330000 && got < 350000)
    assert(math.abs(got - brute(48.8566, 2.3522, 51.5074, -0.1278)) < 1e-6)
    // zero distance, antipodal ~ half circumference
    val z = Seq((10.0, 20.0)).toDF("a", "b")
      .select(Geo.haversineMeters(col("a"), col("b"), col("a"), col("b")))
      .head().getDouble(0)
    assert(z == 0.0)
    val anti = Seq((0.0, 0.0, 0.0, 180.0)).toDF("a", "b", "c", "d")
      .select(Geo.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .head().getDouble(0)
    assert(math.abs(anti - math.Pi * 6371000.0) < 1.0)
  }

  test("radiusJoin equals the brute-force cross join, including the " +
    "antimeridian wrap") {
    import spark.implicits._
    // a deterministic scatter within |lat| <= 40, plus points straddling
    // the 180 meridian on both sides
    val pts = ((1 to 60).map { i =>
      (i.toLong, (i * 37 % 80) - 40.0, (i * 91 % 360) - 180.0)
    } ++ Seq((101L, 10.0, 179.5), (102L, 10.0, -179.5)))
      .toDF("pid", "plat", "plon")
    val qs = ((1 to 15).map { i =>
      (i.toLong, (i * 53 % 80) - 40.0, (i * 17 % 360) - 180.0)
    } ++ Seq((201L, 10.2, 179.9))).toDF("qid", "qlat", "qlon")
    val got = Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
        radiusMeters = 300000.0, cellDeg = 4.0)
      .select("qid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val pRows = pts.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val qRows = qs.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expect = (for {
      (pid, plat, plon) <- pRows
      (qid, qlat, qlon) <- qRows
      if brute(plat, plon, qlat, qlon) <= 300000.0
    } yield (qid, pid)).toSet
    assert(got == expect)
    // the wrap pair: query at 179.9 must see the point at -179.5
    assert(got.contains((201L, 102L)))
  }

  test("radiusJoin refuses when the radius outgrows the cell at max |lat|") {
    import spark.implicits._
    val pts = Seq((1L, 80.0, 0.0)).toDF("pid", "plat", "plon")
    val qs = Seq((1L, 80.0, 1.0)).toDF("qid", "qlat", "qlon")
    val e = intercept[IllegalArgumentException] {
      Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
        radiusMeters = 300000.0, cellDeg = 4.0)
    }
    assert(e.getMessage.contains("cellDeg"))
    // cellDeg must divide 360
    intercept[IllegalArgumentException] {
      Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
        radiusMeters = 1000.0, cellDeg = 7.0)
    }
  }

  test("radiusJoin pair-mass guard: measured candidate mass >= actual " +
    "output, refuses past the budget, and increments radiusJoin.refused") {
    import spark.implicits._
    // a dense cluster near (10, 10): every pair is in radius, so the
    // output is substantial and the mass bound is exercised for real
    val pts = (1 to 60).map { i =>
      (i.toLong, 10.0 + (i % 7) * 0.2, 10.0 + (i % 5) * 0.2)
    }.toDF("pid", "plat", "plon")
    val qs = (1 to 15).map { i =>
      (i.toLong, 10.0 + (i % 4) * 0.2, 10.0 + (i % 3) * 0.2)
    }.toDF("qid", "qlat", "qlon")
    val actual = Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
      radiusMeters = 300000.0, cellDeg = 4.0).count()
    // budget of 1 candidate pair must refuse (some cell overlaps exist:
    // actual > 0 here), and the message carries the measured mass —
    // which must be >= the post-filter output
    assert(actual > 0)
    graft.util.SkipMetrics.reset("radiusJoin.refused")
    val e = intercept[IllegalArgumentException] {
      Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
        radiusMeters = 300000.0, cellDeg = 4.0, maxPairMass = 1L)
    }
    assert(e.getMessage.contains("candidate pair mass"))
    assert(graft.util.SkipMetrics.value("radiusJoin.refused") === 1L)
    val measured = "candidate pair mass (\\d+)".r
      .findFirstMatchIn(e.getMessage).get.group(1).toLong
    assert(measured >= actual,
      s"cell-grid estimate $measured must bound the output $actual")
    // Long.MaxValue disables the measurement entirely (lazy again)
    assert(Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
      radiusMeters = 300000.0, cellDeg = 4.0,
      maxPairMass = Long.MaxValue).count() === actual)
  }

  test("nearestJoin picks the closest point with a deterministic tie break") {
    import spark.implicits._
    val pts = Seq((1L, 10.0, 20.0), (2L, 10.0, 20.5), (3L, 10.0, 21.5))
      .toDF("pid", "plat", "plon")
    val qs = Seq((7L, 10.0, 20.1)).toDF("qid", "qlat", "qlon")
    val got = Geo.nearestJoin(pts, qs, "plat", "plon", "qlat", "qlon",
      queryKey = "qid", tieCol = "pid",
      radiusMeters = 300000.0, cellDeg = 4.0).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("pid") == 1L)
    // out-of-range query simply yields no row
    val far = Geo.nearestJoin(pts,
      Seq((8L, -40.0, -120.0)).toDF("qid", "qlat", "qlon"),
      "plat", "plon", "qlat", "qlon", "qid", "pid", 300000.0, 4.0)
    assert(far.count() == 0)
  }

  test("withCells wraps longitude so -180 and +180 share a cell") {
    import spark.implicits._
    val df = Seq((1L, 0.0, -180.0), (2L, 0.0, 180.0), (3L, 0.0, 179.9))
      .toDF("id", "lat", "lon")
    val cells = Geo.withCells(df, "lat", "lon", 4.0)
      .select("id", "lon_cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(1L) == cells(2L)) // antimeridian identified
    assert(cells(3L) == 89)        // last cell before the wrap
    assert(cells(1L) == 0)
  }
}
