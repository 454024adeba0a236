package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification guards for curated releases — the structured-data
  * complement of [[TextAnalysis.scrubPii]]: PII scrubbing removes direct
  * identifiers from text; k-anonymity bounds what the remaining
  * QUASI-identifiers (the column combination an adversary links on)
  * reveal. Sweeney's k-anonymity by suppression: every released row must
  * share its quasi-identifier tuple with at least k−1 others.
  *
  * 100-TB shape: violation listing is one hash aggregate; anonymization
  * is one window pass (null-safe grouping for free — quasi columns with
  * nulls group together, which an equi-join-back would silently drop);
  * rare-category suppression joins a value-count frame AQE broadcasts
  * when small, so the corpus itself never shuffles for it. */
object Privacy {

  /** Quasi-identifier groups occurring fewer than k times: the rows an
    * adversary could single out. Returns the quasi columns plus `n`
    * (1 ≤ n < k). Null quasi values form their own groups. */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[String],
                           k: Int): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** `df` with the quasi-identifier columns SUPPRESSED (set to NULL) on
    * every row whose quasi tuple occurs fewer than k times — the release
    * then satisfies k-anonymity on those columns (suppressed rows all
    * share the all-NULL tuple). Non-quasi columns pass through. One
    * window shuffle on the quasi key. */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(k >= 2, s"k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasi.map(col): _*)
    val n = count(lit(1)).over(w)
    val cols = df.columns.map { c =>
      if (quasi.contains(c))
        when(n >= k, col(c)).otherwise(lit(null)).as(c)
      else col(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Quasi-identifier groups whose SENSITIVE column takes fewer than `l`
    * distinct non-null values — the k-anonymity follow-up (Machanavajjhala
    * 2006): a group can be large yet still leak if everyone in it shares
    * the same sensitive value. Returns the quasi columns plus
    * `distinct_sensitive` (0 ≤ v < l; all-null groups report 0). One hash
    * aggregate — the count-distinct is per-group, never corpus-wide. */
  def lDiversityViolations(df: DataFrame, quasi: Seq[String],
                           sensitive: String, l: Int): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(!quasi.contains(sensitive),
      s"sensitive column $sensitive cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(countDistinct(col(sensitive)).as("distinct_sensitive"))
      .filter(col("distinct_sensitive") < l)
  }

  /** ε-differentially-private group counts by the Laplace mechanism:
    * count + Laplace(1/ε) noise per group (sensitivity 1 — one row moves
    * one count by one). The noise is derived DETERMINISTICALLY from
    * `md5(seed:groupValues)` (60-bit uniform → inverse-CDF Laplace), the
    * [[Dsir]]/[[Pca.jlProject]] device: runs are reproducible and the
    * DuckDB oracle replays the draw bit-for-bit. CAVEAT, stated plainly:
    * a pseudorandom draw from a published seed is NOT a cryptographic DP
    * guarantee — an adversary knowing the seed can subtract the noise.
    * Treat ε as an engineering knob for release pipelines that hold the
    * seed secret, exactly as they would hold the raw counts.
    * One hash aggregate + a stateless projection; `noisy_count` is the
    * release column, `n` the true count for the holder's own use. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: Long): DataFrame = {
    require(groupCols.nonEmpty, "no group columns")
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val keyStr = concat_ws("\u0001",
      lit(seed.toString) +: groupCols.map(c => col(c).cast("string")): _*)
    val h = conv(substring(md5(keyStr.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    // u in (0,1): the +0.5 keeps the inverse CDF off both ln(0) poles
    val u = (h.cast("double") + lit(0.5)) / lit(1.152921504606846976e18)
    val noise = (lit(-1.0) / lit(epsilon)) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_count", col("n") + noise)
  }

  /** Categorical values occurring fewer than `minCount` times replaced by
    * `other` — the long-tail cut that both bounds a categorical column's
    * cardinality before a groupBy/pivot AND removes singleton categories
    * that act as quasi-identifiers. NULL values stay NULL (they are not a
    * category). The count frame is one aggregate on the value column,
    * joined back null-safely. */
  def suppressRare(df: DataFrame, column: String, minCount: Long,
                   other: String = "OTHER"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val counts = df.groupBy(col(column).as("__v"))
      .agg(count(lit(1)).as("__n"))
    val joined = df.join(counts, col(column) <=> col("__v"), "left")
    val replaced = when(col(column).isNull, lit(null))
      .when(col("__n") < minCount, lit(other))
      .otherwise(col(column))
    joined.select(df.columns.map {
      case c if c == column => replaced.as(c)
      case c => col(c)
    }.toIndexedSeq: _*)
  }
}
