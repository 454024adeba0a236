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

  /** Per-quasi-group t-closeness distance for a CATEGORICAL sensitive
    * column (Li et al. 2007, the l-diversity follow-up): the distance
    * between the group's sensitive-value distribution P and the whole
    * table's distribution Q. For categorical values under the uniform
    * ground distance this is the variational distance
    * 0.5·Σ|p_v − q_v|; a release is t-close when every group's distance
    * is ≤ t. Null sensitive values are excluded from BOTH distributions.
    *
    * Scale shape — the absent-value terms are folded algebraically
    * instead of materialized: Σ over ALL values of |p−q| =
    * 1 + Σ_{v∈group}(|p_v − q_v| − q_v), so the plan is one
    * (quasi, value) aggregate joined to the BROADCAST global value
    * distribution (distinct sensitive values — small by the nature of a
    * categorical column), then one group aggregate. No group × universe
    * grid, no window. Returns the quasi columns + `n` (group size among
    * non-null-sensitive rows) + `emd`. */
  def tCloseness(df: DataFrame, quasi: Seq[String],
                 sensitive: String): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(!quasi.contains(sensitive),
      s"sensitive column $sensitive cannot also be a quasi-identifier")
    val nn = df.filter(col(sensitive).isNotNull)
    val global = nn.groupBy(col(sensitive).as("__v"))
      .agg(count(lit(1)).as("__gn"))
    val globalQ = global.crossJoin(
        broadcast(global.agg(sum("__gn").cast("double").as("__N"))))
      .select(col("__v"), (col("__gn") / col("__N")).as("__q"))
    val cell = nn.groupBy(quasi.map(col) :+ col(sensitive).as("__v"): _*)
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasi.map(col): _*)
    cell.join(broadcast(globalQ), "__v")
      .withColumn("__gsz", sum("__n").over(w))
      .groupBy(quasi.map(col): _*)
      .agg(max("__gsz").as("n"),
        (lit(0.5) * (lit(1.0) +
          sum(abs(col("__n") / col("__gsz") - col("__q")) - col("__q"))))
          .as("emd"))
  }

  /** [[tCloseness]] groups whose distance exceeds `t`. */
  def tClosenessViolations(df: DataFrame, quasi: Seq[String],
                           sensitive: String, t: Double): DataFrame = {
    require(t > 0.0 && t < 1.0, s"t must be in (0,1), got $t")
    tCloseness(df, quasi, sensitive).filter(col("emd") > t)
  }

  /** t-closeness distance for an ORDERED (numeric) sensitive column:
    * the normalized Earth Mover's Distance under the ordered ground
    * distance, EMD = (1/(m−1))·Σ_i |Σ_{j≤i}(p_j − q_j)| over the m
    * distinct observed values of the WHOLE table in order (Li et al.
    * 2007 eq. 5). Groups missing a universe value still accumulate its
    * cumulative term, so the plan builds the group × universe grid:
    * distinct quasi groups CROSS JOIN the broadcast value universe, left
    * join the per-cell counts, one windowed cumulative sum per group.
    * The grid is |groups| × m rows — bound m by banding the sensitive
    * column first (the same pre-banding k-anonymity releases use);
    * `maxUniverse` refuses a universe that would explode the grid.
    * Returns quasi columns + `n` + `emd`; requires ≥ 2 distinct values
    * (EMD is undefined on a constant column). */
  def tClosenessOrdered(df: DataFrame, quasi: Seq[String],
                        sensitive: String,
                        maxUniverse: Int = 10000): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(!quasi.contains(sensitive),
      s"sensitive column $sensitive cannot also be a quasi-identifier")
    val nn = df.filter(col(sensitive).isNotNull)
    val global = nn.groupBy(col(sensitive).cast("double").as("__v"))
      .agg(count(lit(1)).as("__gn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = global.count()
    require(m >= 2, s"ordered t-closeness needs >= 2 distinct values, got $m")
    require(m <= maxUniverse,
      s"sensitive universe has $m distinct values (> maxUniverse=" +
        s"$maxUniverse); band the column first — the grid is groups x m")
    val globalQ = global.crossJoin(
        broadcast(global.agg(sum("__gn").cast("double").as("__N"))))
      .select(col("__v"), (col("__gn") / col("__N")).as("__q"))
    val cell = nn.groupBy(quasi.map(col) :+
        col(sensitive).cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("__n"))
    val groups = cell.groupBy(quasi.map(col): _*)
      .agg(sum("__n").as("__gsz"))
    // null-safe quasi equality: null quasi values form their own group
    // (matching the groupBy semantics above); a plain equi-join would
    // silently zero those groups' cells
    val cellR = cell.select(quasi.map(c => col(c).as(s"__k_$c")) ++
      Seq(col("__v").as("__cv"), col("__n")): _*)
    val joinCond = quasi.map(c => col(c) <=> col(s"__k_$c"))
      .reduce(_ && _) && col("__v") === col("__cv")
    val grid = groups.crossJoin(broadcast(globalQ))
      .join(cellR, joinCond, "left")
      .withColumn("__p", coalesce(col("__n"), lit(0L)) / col("__gsz"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(quasi.map(col): _*).orderBy("__v")
    grid
      .withColumn("__cum", sum(col("__p") - col("__q")).over(wOrd))
      .groupBy(quasi.map(col): _*)
      .agg(max("__gsz").as("n"),
        (sum(abs(col("__cum"))) / lit((m - 1).toDouble)).as("emd"))
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
