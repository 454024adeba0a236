package graft.pipeline

import graft.SparkSpec

class GeoIndexSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-geoindex").toString

  test("radiusQuery through the persisted index equals the direct join") {
    import spark.implicits._
    val pts = ((1 to 80).map { i =>
      (i.toLong, (i * 37 % 80) - 40.0, (i * 91 % 360) - 180.0)
    } ++ Seq((901L, 5.0, 179.6), (902L, 5.0, -179.7)))
      .toDF("pid", "plat", "plon")
    val qs = ((1 to 12).map { i =>
      (i.toLong, (i * 53 % 80) - 40.0, (i * 17 % 360) - 180.0)
    } ++ Seq((801L, 5.1, 179.9))).toDF("qid", "qlat", "qlon")
    val path = tmp()
    GeoIndex.write(pts, "pid", "plat", "plon", cellDeg = 4.0, path)
    val viaIndex = GeoIndex.radiusQuery(qs, "qlat", "qlon", 300000.0, path)
      .select("qid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Geo.radiusJoin(pts, qs, "plat", "plon", "qlat", "qlon",
        300000.0, 4.0)
      .select("qid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == direct && viaIndex.nonEmpty)
    // the antimeridian query must see both straddling points
    assert(viaIndex.contains((801L, 901L)) && viaIndex.contains((801L, 902L)))
  }

  test("append grows the index to the union and widens the stored max-lat") {
    import spark.implicits._
    val base = (1 to 40).map { i =>
      (i.toLong, (i * 37 % 60) - 30.0, (i * 91 % 360) - 180.0)
    }.toDF("pid", "plat", "plon")
    val extra = Seq((501L, 10.0, 12.0), (502L, 44.0, -30.0))
      .toDF("pid", "plat", "plon")
    val qs = Seq((1L, 10.1, 12.2), (2L, 44.1, -30.3))
      .toDF("qid", "qlat", "qlon")
    val path = tmp()
    GeoIndex.write(base, "pid", "plat", "plon", 4.0, path)
    GeoIndex.append(extra, path)
    val viaIndex = GeoIndex.radiusQuery(qs, "qlat", "qlon", 100000.0, path)
      .select("qid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Geo.radiusJoin(base.unionAll(extra), qs,
        "plat", "plon", "qlat", "qlon", 100000.0, 4.0)
      .select("qid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == direct)
    assert(viaIndex.contains((1L, 501L)) && viaIndex.contains((2L, 502L)))
    // appended 44-deg point widened the stored max-lat: a radius legal
    // for the base corpus (|lat| <= 30) but not for 44 deg now refuses
    val e = intercept[IllegalArgumentException] {
      GeoIndex.radiusQuery(qs, "qlat", "qlon", 330000.0, path)
    }
    assert(e.getMessage.contains("cellDeg"))
    // batch missing the pinned columns refuses
    intercept[IllegalArgumentException] {
      GeoIndex.append(Seq((1L, 2.0)).toDF("pid", "lat_other"), path)
    }
  }

  test("write refuses to clobber; config guards radius and version") {
    import spark.implicits._
    val pts = Seq((1L, 70.0, 10.0)).toDF("pid", "plat", "plon")
    val path = tmp()
    GeoIndex.write(pts, "pid", "plat", "plon", 4.0, path)
    intercept[Exception] {
      GeoIndex.write(pts, "pid", "plat", "plon", 4.0, path)
    }
    GeoIndex.write(pts, "pid", "plat", "plon", 4.0, path, overwrite = true)
    // stored max |lat| = 70: a 300 km radius outgrows the 4-deg cell
    // there even though the QUERY sits at the equator
    val eq = Seq((1L, 0.0, 0.0)).toDF("qid", "qlat", "qlon")
    val e = intercept[IllegalArgumentException] {
      GeoIndex.radiusQuery(eq, "qlat", "qlon", 300000.0, path)
    }
    assert(e.getMessage.contains("cellDeg"))
    // a radius the high-latitude cell still holds works
    assert(GeoIndex.radiusQuery(eq, "qlat", "qlon", 10000.0, path)
      .count() == 0)
  }

  test("write refuses a grid too fine for cell_key injectivity") {
    import spark.implicits._
    val pts = Seq((1L, 70.0, 10.0)).toDF("pid", "plat", "plon")
    // 0.001 divides 360 (passes Geo.withCells) but yields 360000 lon
    // cells >= KeyBase=100000 — keys would alias and defeat pruning
    val e = intercept[IllegalArgumentException] {
      GeoIndex.write(pts, "pid", "plat", "plon", 0.001, tmp())
    }
    assert(e.getMessage.contains("cell_key would alias"))
  }
}
