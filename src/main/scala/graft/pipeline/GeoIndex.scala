package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted spatial index: [[Geo.withCells]] grid keys baked into a
  * parquet layout RANGE-SORTED on a single packed cell key, so a
  * radius query touches only the row groups holding its 3×3 neighbor
  * cells instead of scanning the point corpus — the geospatial member
  * of the persisted-index family
  * ([[TextIndex]]/[[VecIndex]]/[[SubstrIndex]]/[[AggIndex]]): build
  * once over the standing corpus, amortize across query batches.
  *
  * Layout: `path/cells` (points parquet + `cell_key` =
  * lat_cell·10⁵ + lon_cell, repartitionByRange + sortWithinPartitions
  * on that key — contiguous cells, tight per-row-group min/max stats),
  * `path/config` (cellDeg, the indexed corpus's max |lat|, the pinned
  * coordinate column names, version). Directory-per-cell partitioning
  * was deliberately REJECTED: a 4-degree grid has ~4000 populated
  * directories, and the per-directory commit cost dwarfed the data
  * write by 40× at sf0.1 (metadata explosion — the classic
  * high-cardinality partitionBy trap).
  *
  * Scale shape: the query side derives its wrapped 3×3 cell-key set —
  * BOUNDED by the grid size (≤ (360/cellDeg)·(180/cellDeg)), not by
  * the query count — collects it, and pushes it into the parquet scan
  * as an IN filter over the sorted key, so row-group pruning does the
  * directory pruning's job without the directories. The candidate join
  * and exact haversine predicate then run on the pruned slice. The
  * stored max-|lat| makes the [[Geo.radiusJoin]] completeness guard
  * checkable WITHOUT scanning the index. */
object GeoIndex {

  private val Version = 2
  private val KeyBase = 100000L // lon-cell count enforced < KeyBase below

  private def cellKey(latCell: org.apache.spark.sql.Column,
                      lonCell: org.apache.spark.sql.Column) =
    latCell.cast("long") * KeyBase + lonCell.cast("long")

  private def withKey(df: DataFrame, latCol: String, lonCol: String,
                      cellDeg: Double): DataFrame = {
    // cell_key injectivity needs lon cells (360/cellDeg) < KeyBase —
    // Geo.withCells only requires cellDeg to divide 360, so a sub-0.0036°
    // grid would silently alias keys: results would stay correct (the
    // exact haversine filter runs after the key join) but the collisions
    // would defeat the row-group pruning the key exists for. Refuse.
    require(360.0 / cellDeg < KeyBase,
      s"GeoIndex: cellDeg=$cellDeg yields ${(360.0 / cellDeg).toLong} " +
        s"longitude cells >= KeyBase=$KeyBase — cell_key would alias; " +
        "use a coarser grid")
    Geo.withCells(df, latCol, lonCol, cellDeg)
      .withColumn("cell_key", cellKey(col("lat_cell"), col("lon_cell")))
      .drop("lat_cell", "lon_cell")
  }

  private def maxAbsLat(df: DataFrame, c: String): Double =
    df.agg(max(abs(col(c).cast("double")))).head() match {
      case r if r.isNullAt(0) => 0.0
      case r => r.getDouble(0)
    }

  private def writeCells(cells: DataFrame, path: String,
                         mode: String): Unit = {
    // no explicit partition count: AQE sizes the range shuffle from the
    // data (advisoryPartitionSizeInBytes), so the index comes out as few
    // full files instead of numShufflePartitions slivers — deterministic
    // write cost at gate scale, sensible (~advisory-sized) files at
    // 100 TB where a pinned count would mean multi-TB files (guide §6)
    cells.repartitionByRange(col("cell_key"))
      .sortWithinPartitions("cell_key")
      .write.mode(mode).parquet(s"$path/cells")
  }

  private def writeConfig(spark: SparkSession, path: String,
                          cellDeg: Double, mal: Double, latCol: String,
                          lonCol: String): Unit = {
    import spark.implicits._
    Seq((cellDeg, mal, latCol, lonCol, Version))
      .toDF("cell_deg", "max_abs_lat", "lat_col", "lon_col", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
  }

  /** Build the index at `path`. Fails if the path already holds one
    * unless `overwrite`. */
  def write(points: DataFrame, idCol: String, latCol: String,
            lonCol: String, cellDeg: Double, path: String,
            overwrite: Boolean = false): Unit = {
    val spark = points.sparkSession
    val clean = points.na.drop(Seq(idCol, latCol, lonCol))
    val cells = withKey(clean, latCol, lonCol, cellDeg)
      .persist() // the max-lat probe and the write both read it
    try {
      val mal = maxAbsLat(cells, latCol)
      writeCells(cells, path, if (overwrite) "overwrite" else "error")
      writeConfig(spark, path, cellDeg, mal, latCol, lonCol)
    } finally cells.unpersist(blocking = false)
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
    val cells = withKey(batch.na.drop(Seq(latCol, lonCol)),
      latCol, lonCol, cellDeg).persist()
    try {
      val mal = maxAbsLat(cells, latCol)
      writeCells(cells, path, "append")
      if (mal > storedMal)
        writeConfig(spark, path, cellDeg, mal, latCol, lonCol)
    } finally cells.unpersist(blocking = false)
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
    * index: query cells + 3×3 wrapped neighbors fold to a DISTINCT
    * cell-key set (grid-bounded), which prunes the sorted index scan as
    * an IN filter; the candidate equi-join on the key and the exact
    * haversine predicate finish the job. The completeness guard
    * combines the STORED corpus max-|lat| with a probe of the query
    * side — same refuse contract as [[Geo.radiusJoin]]. Returns query
    * columns + index columns + `dist_m`. */
  def radiusQuery(queries: DataFrame, qLat: String, qLon: String,
                  radiusMeters: Double, path: String): DataFrame = {
    require(radiusMeters > 0, "GeoIndex.radiusQuery: radius must be > 0")
    val spark = queries.sparkSession
    val (cellDeg, storedMal, pLat, pLon) = cfgOf(spark, path)
    val nLon = math.rint(360.0 / cellDeg).toInt
    val qClean = queries.na.drop(Seq(qLat, qLon))
    val mal = math.max(storedMal, maxAbsLat(qClean, qLat))
    val minCellM = cellDeg * 111320.0 *
      math.cos(mal * 0.017453292519943295)
    require(radiusMeters <= minCellM,
      f"GeoIndex.radiusQuery: radius $radiusMeters%.0f m exceeds the " +
        f"narrowest cell dimension $minCellM%.0f m at |lat|=$mal%.2f — " +
        "rebuild with a larger cellDeg or cap the latitude range")
    val q = Geo.withCells(qClean, qLat, qLon, cellDeg, "__q_")
      .withColumn("__dlat", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__dlon", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__q_key", cellKey(
        col("__q_lat_cell") + col("__dlat"),
        ((col("__q_lon_cell") + col("__dlon")) % nLon + nLon) % nLon))
      .drop("__dlat", "__dlon", "__q_lat_cell", "__q_lon_cell")
    // the needed-cell set is grid-bounded (≤ 64800/cellDeg² keys), so
    // collecting it is safe regardless of query count — it becomes a
    // pushed-down IN filter over the sorted cell_key
    val neededKeys = q.select("__q_key").distinct()
      .collect().map(_.getLong(0))
    val idx = spark.read.parquet(s"$path/cells")
      .where(col("cell_key").isInCollection(neededKeys))
    q.join(idx, col("__q_key") === idx("cell_key"))
      .withColumn("dist_m", Geo.haversineMeters(
        idx(pLat), idx(pLon), col(qLat), col(qLon)))
      .filter(col("dist_m") <= radiusMeters)
      .drop("cell_key", "__q_key")
  }
}
