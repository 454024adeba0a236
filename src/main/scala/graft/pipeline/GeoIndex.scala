package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted spatial index: [[Geo.withCells]] grid keys baked into a
  * cell-PARTITIONED parquet layout, so a radius query touches only the
  * 3×3 neighbor directories per query cell instead of scanning the
  * point corpus — the geospatial member of the persisted-index family
  * ([[TextIndex]]/[[VecIndex]]/[[SubstrIndex]]/[[AggIndex]]): build
  * once over the standing corpus, amortize across query batches.
  *
  * Layout: `path/cells` (points parquet, partitioned by lat_cell,
  * lon_cell), `path/config` (cellDeg, the indexed corpus's max |lat|,
  * version). The stored max-|lat| makes the [[Geo.radiusJoin]]
  * completeness guard checkable WITHOUT scanning the index — the write
  * pays the probe once.
  *
  * Scale shape: the query side derives its cells + neighbors and joins
  * the index on the two partition columns — Spark prunes the matching
  * directories (static pruning when the query-cell set folds to
  * literals, dynamic partition pruning under a join), so cost is
  * O(queries · 9 · cell density), never the corpus. The exact
  * haversine predicate then filters candidates. */
object GeoIndex {

  private val Version = 1

  /** Build the index at `path`. Fails if the path already holds one
    * unless `overwrite`. */
  def write(points: DataFrame, idCol: String, latCol: String,
            lonCol: String, cellDeg: Double, path: String,
            overwrite: Boolean = false): Unit = {
    val spark = points.sparkSession
    val clean = points.na.drop(Seq(idCol, latCol, lonCol))
    val withCells = Geo.withCells(clean, latCol, lonCol, cellDeg)
      .persist() // the max-lat probe and the write both read it
    try {
      val mal = withCells
        .agg(max(abs(col(latCol).cast("double")))).head() match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getDouble(0)
        }
      val mode = if (overwrite) "overwrite" else "error"
      withCells.write.mode(mode)
        .partitionBy("lat_cell", "lon_cell")
        .parquet(s"$path/cells")
      import spark.implicits._
      Seq((cellDeg, mal, latCol, lonCol, Version))
        .toDF("cell_deg", "max_abs_lat", "lat_col", "lon_col", "version")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
    } finally withCells.unpersist(blocking = false)
  }

  /** Append a batch of new points under the stored config. The config's
    * max-|lat| widens if the batch reaches further toward a pole (the
    * guard must keep holding for the UNION of everything indexed);
    * cellDeg and the coordinate column names are pinned at write time —
    * the batch must carry the same column names. */
  def append(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val (cellDeg, storedMal, latCol, lonCol) = cfgOf(spark, path)
    require(batch.columns.contains(latCol) &&
      batch.columns.contains(lonCol),
      s"GeoIndex.append: batch must carry the indexed columns " +
        s"($latCol, $lonCol)")
    val clean = batch.na.drop(Seq(latCol, lonCol))
    val withCells = Geo.withCells(clean, latCol, lonCol, cellDeg)
      .persist()
    try {
      val mal = withCells
        .agg(max(abs(col(latCol).cast("double")))).head() match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getDouble(0)
        }
      withCells.write.mode("append")
        .partitionBy("lat_cell", "lon_cell")
        .parquet(s"$path/cells")
      if (mal > storedMal) {
        import spark.implicits._
        Seq((cellDeg, mal, latCol, lonCol, Version))
          .toDF("cell_deg", "max_abs_lat", "lat_col", "lon_col", "version")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
      }
    } finally withCells.unpersist(blocking = false)
  }

  private def cfgOf(spark: SparkSession,
                    path: String): (Double, Double, String, String) = {
    val row = spark.read.parquet(s"$path/config").head()
    require(row.getAs[Int]("version") == Version,
      s"GeoIndex at $path has version ${row.getAs[Int]("version")}, " +
        s"this build reads $Version")
    (row.getAs[Double]("cell_deg"), row.getAs[Double]("max_abs_lat"),
      row.getAs[String]("lat_col"), row.getAs[String]("lon_col"))
  }

  /** All (query, point) pairs within `radiusMeters`, against the stored
    * index: query cells + 3×3 neighbors (antimeridian-wrapped) join the
    * partition columns, then the exact haversine filters. The
    * completeness guard combines the STORED corpus max-|lat| with a
    * probe of the query side — same refuse contract as
    * [[Geo.radiusJoin]]. Returns query columns + index columns +
    * `dist_m`. */
  def radiusQuery(queries: DataFrame, qLat: String, qLon: String,
                  radiusMeters: Double, path: String): DataFrame = {
    require(radiusMeters > 0, "GeoIndex.radiusQuery: radius must be > 0")
    val spark = queries.sparkSession
    val (cellDeg, storedMal, pLat, pLon) = cfgOf(spark, path)
    val nLon = math.rint(360.0 / cellDeg).toInt
    val qClean = queries.na.drop(Seq(qLat, qLon))
    val qMal = qClean.agg(max(abs(col(qLat).cast("double")))).head() match {
      case r if r.isNullAt(0) => 0.0
      case r => r.getDouble(0)
    }
    val mal = math.max(storedMal, qMal)
    val minCellM = cellDeg * 111320.0 *
      math.cos(mal * 0.017453292519943295)
    require(radiusMeters <= minCellM,
      f"GeoIndex.radiusQuery: radius $radiusMeters%.0f m exceeds the " +
        f"narrowest cell dimension $minCellM%.0f m at |lat|=$mal%.2f — " +
        "rebuild with a larger cellDeg or cap the latitude range")
    val idx = spark.read.parquet(s"$path/cells")
    val q = Geo.withCells(qClean, qLat, qLon, cellDeg, "__q_")
      .withColumn("__dlat", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__dlon", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__q_lat_cell", col("__q_lat_cell") + col("__dlat"))
      .withColumn("__q_lon_cell",
        ((col("__q_lon_cell") + col("__dlon")) % nLon + nLon) % nLon)
      .drop("__dlat", "__dlon")
    q.join(idx,
        col("__q_lat_cell") === idx("lat_cell") &&
          col("__q_lon_cell") === idx("lon_cell"))
      .withColumn("dist_m", Geo.haversineMeters(
        idx(pLat), idx(pLon), col(qLat), col(qLon)))
      .filter(col("dist_m") <= radiusMeters)
      .drop("lat_cell", "lon_cell", "__q_lat_cell", "__q_lon_cell")
  }
}
