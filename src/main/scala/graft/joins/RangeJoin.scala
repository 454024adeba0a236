package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via unit binning. Spark plans the SQL
  * formulation (`ON l.k = r.k AND x BETWEEN lo AND hi`) as a hash join on
  * the key with the range as a post-filter — fine when keys are selective,
  * O(|points|·|intervals|) per hot key when they are not — and as a
  * broadcast-nested-loop when there is no equality key at all.
  *
  * Binning turns it into one equi-join: intervals are exploded to every
  * `binWidth`-sized bin they cover, points map to their single containing
  * bin, and the join key becomes (keys..., bin) with an exact range
  * post-filter. A point lies in exactly ONE bin while its interval covers
  * that bin too (truncating division is monotone, signs included), so
  * every matching pair meets exactly once — no dedup pass. Pick `binWidth`
  * near the typical interval length: replication per interval is
  * `span/binWidth + 1` rows, and bins much smaller than intervals only
  * inflate the build side. Degenerate giant intervals fail loudly at
  * `maxBinsPerInterval` instead of exploding an executor. */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      loCol: String, hiCol: String, binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keys
    require(clash.isEmpty,
      s"point/interval column names clash: ${clash.mkString(", ")}")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"), "__bin is reserved by rangeJoin")
    val loBin = expr(s"`$loCol` div ${binWidth}L")
    val hiBin = expr(s"`$hiCol` div ${binWidth}L")
    val binned = intervals
      .na.drop(keys ++ Seq(loCol, hiCol))
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(loBin,
        when(hiBin - loBin < maxBinsPerInterval, hiBin)
          .otherwise(raise_error(concat(
            lit(s"range-join interval spans more than $maxBinsPerInterval " +
              s"bins of width $binWidth — raise binWidth or split: lo="),
            col(loCol), lit(" hi="), col(hiCol)))))))
    points.na.drop(keys :+ pointCol)
      .withColumn("__bin", expr(s"`$pointCol` div ${binWidth}L"))
      .join(binned, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
