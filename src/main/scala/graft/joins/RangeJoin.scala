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

  /** INTERVAL-INTERVAL overlap join (sessions × outages, exposure
    * windows × label windows) — the two-sided sibling of
    * [[pointInInterval]], which Spark would otherwise plan as a hash join
    * with a range post-filter (quadratic per hot key) or a
    * broadcast-nested-loop. Both sides explode to their `binWidth` bins
    * and meet on (keys..., bin) with the exact overlap post-filter
    * `lo_a <= hi_b && lo_b <= hi_a`.
    *
    * Exactly-once without a dedup pass: an overlapping pair shares the
    * whole bin range [max(loBin_a, loBin_b), min(hiBin_a, hiBin_b)], so
    * keeping only the FIRST shared bin — `bin == max(loBin_a, loBin_b)`,
    * which both sides cover whenever they meet at all — emits each
    * qualifying pair exactly once (the [[pointInInterval]] uniqueness
    * argument, applied to the later-starting interval's first bin).
    * Replication is span/binWidth + 1 rows PER SIDE; the same
    * `maxBinsPerInterval` guard fails loudly on degenerate spans. Rows
    * with lo > hi are dropped (empty intervals match nothing). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      loA: String, hiA: String, loB: String, hiB: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(clash.isEmpty,
      s"interval column names clash: ${clash.mkString(", ")}")
    require(!left.columns.contains("__bin") &&
      !right.columns.contains("__bin"),
      "__bin is reserved by intervalOverlap")
    def binned(df: DataFrame, lo: String, hi: String) = {
      val loBin = expr(s"`$lo` div ${binWidth}L")
      val hiBin = expr(s"`$hi` div ${binWidth}L")
      df.na.drop(keys ++ Seq(lo, hi))
        .filter(col(lo) <= col(hi))
        .withColumn("__bin", explode(sequence(loBin,
          when(hiBin - loBin < maxBinsPerInterval, hiBin)
            .otherwise(raise_error(concat(
              lit(s"interval spans more than $maxBinsPerInterval bins of " +
                s"width $binWidth — raise binWidth or split: lo="),
              col(lo), lit(" hi="), col(hi)))))))
    }
    binned(left, loA, hiA)
      .join(binned(right, loB, hiB), keys :+ "__bin")
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("__bin") ===
        greatest(expr(s"`$loA` div ${binWidth}L"),
          expr(s"`$loB` div ${binWidth}L")))
      .drop("__bin")
  }
}
