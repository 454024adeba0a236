package graft.stat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hypothesis tests over categorical / group-structured data —
  * completes the testing tier around [[StatTests]] (Welch t,
  * two-proportion z, KS) with the classic categorical and rank tests
  * (reference stats.py stops at t-test/KS/Mahalanobis; these are the
  * engine-tier extensions a curation pipeline reaches for when
  * comparing sources, raters, and filter variants).
  *
  * Scale shape shared by all four: ONE hash aggregate folds the corpus
  * to a bounded frame (contingency cells, per-group moment sums, or
  * distinct-value counts), and every subsequent window/join runs on
  * that bounded frame, never the corpus. Statistics are raw-sums
  * identities so a SQL oracle replays them term-for-term; p-values
  * (the only parts needing CDFs) are spec-pinned against commons-math
  * like the Welch/prop-test precedent. */
object InferenceTests {

  /** Pearson chi-square test of independence between two categorical
    * columns, plus Cramér's V effect size. Uses the zero-cell-free
    * identity chi2 = N·(Σ_observed o²/(row_i·col_j) − 1): observed-zero
    * cells contribute exactly their expected count to the classic
    * Σ(o−e)²/e, and algebra folds that into the constant, so the
    * missing cells of the groupBy never need completion. One corpus
    * aggregate to the |A|·|B| cell frame; marginals are windows over
    * the cells. Returns ONE row: (n, rows, cols, dof, chi2,
    * cramers_v = √(chi2 / (N·min(rows−1, cols−1)))). Degenerate 1×k
    * tables yield dof=0 and null chi2/V. */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df.na.drop(Seq(a, b))
      .groupBy(col(a).as("__a"), col(b).as("__b"))
      .agg(count(lit(1)).cast("double").as("__n"))
    // NOTE: temp names must differ case-INsensitively from __n — Spark's
    // default resolver is case-insensitive, so withColumn("__N") would
    // silently REPLACE __n (found the hard way: chi2 came out 25x off)
    val withM = cells
      .withColumn("__row", sum("__n").over(Window.partitionBy("__a")))
      .withColumn("__col", sum("__n").over(Window.partitionBy("__b")))
      .withColumn("__tot", sum("__n").over(Window.partitionBy()))
    val agg = withM.agg(
      max("__tot").cast("long").as("n"),
      countDistinct("__a").as("rows"),
      countDistinct("__b").as("cols"),
      sum(col("__n") * col("__n") / (col("__row") * col("__col"))).as("__s"),
      max("__tot").as("__Nd"))
    val dof = (col("rows") - 1) * (col("cols") - 1)
    val chi2 = when(dof > 0, col("__Nd") * (col("__s") - lit(1.0)))
    agg
      .withColumn("dof", dof)
      .withColumn("chi2", chi2)
      .withColumn("cramers_v",
        when(dof > 0, sqrt(chi2 / (col("__Nd") *
          least(col("rows") - 1, col("cols") - 1)))))
      .drop("__s", "__Nd")
  }

  /** One-way ANOVA F over `groupCol`'s groups of `valueCol`. Per-group
    * (n, Σx, Σx²) in one aggregate; SSW = Σ_g(Σx² − (Σx)²/n_g),
    * SSB = Σ_g (Σx)²/n_g − (ΣΣx)²/N — the raw-sums identity (callers
    * with astronomically scaled values should center first, as with
    * [[graft.agg.Stats.linearFit]]). Returns ONE row: (k, n, ss_between,
    * ss_within, df_between = k−1, df_within = N−k, f_stat). Degenerate
    * inputs (k < 2, N ≤ k, or zero within-variance) yield null F. */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val g = df.filter(x.isNotNull && col(groupCol).isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("double").as("__n"), sum(x).as("__s"),
        sum(x * x).as("__ss"))
    val tot = g.agg(
      count(lit(1)).as("k"), sum("__n").cast("long").as("n"),
      (sum(col("__s") * col("__s") / col("__n")) -
        sum("__s") * sum("__s") / sum("__n")).as("ss_between"),
      sum(col("__ss") - col("__s") * col("__s") / col("__n")).as("ss_within"),
      sum("__n").as("__N"))
    val dfb = (col("k") - 1).cast("double")
    val dfw = col("__N") - col("k")
    tot
      .withColumn("df_between", dfb.cast("long"))
      .withColumn("df_within", dfw.cast("long"))
      .withColumn("f_stat",
        when(col("k") >= 2 && dfw > 0 && col("ss_within") > 0,
          (col("ss_between") / dfb) / (col("ss_within") / dfw)))
      .drop("__N")
  }

  /** Cohen's kappa agreement between two label columns (rater/model
    * agreement beyond chance): po = Σ diag/N, pe = Σ_k row_k·col_k/N²,
    * kappa = (po − pe)/(1 − pe). One corpus aggregate to the cell
    * frame; marginals are windows over it (labels appearing on only one
    * side still enter their own marginal, and contribute pe only if the
    * other side also uses the label — the standard contingency
    * definition). Returns ONE row: (n, po, pe, kappa); perfect chance
    * agreement (pe = 1, a constant pair) yields null kappa. */
  def cohenKappa(df: DataFrame, c1: String, c2: String): DataFrame = {
    val cells = df.na.drop(Seq(c1, c2))
      .groupBy(col(c1).as("__a"), col(c2).as("__b"))
      .agg(count(lit(1)).cast("double").as("__n"))
    // pe needs Σ_label row·col over each DISTINCT label (not per cell):
    // derive it from the per-label marginal frames, joined on the label
    val rowM = cells.groupBy("__a").agg(sum("__n").as("__row"))
    val colM = cells.groupBy("__b").agg(sum("__n").as("__col"))
    val pe = rowM.join(colM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__row") * col("__col")), lit(0.0)).as("__pe_num"))
    val po = cells.agg(
      sum("__n").cast("long").as("n"),
      (sum(when(col("__a") === col("__b"), col("__n")).otherwise(0.0)) /
        sum("__n")).as("po"),
      sum("__n").as("__Nd"))
    val out = po.crossJoin(broadcast(pe))
      .withColumn("pe", col("__pe_num") / (col("__Nd") * col("__Nd")))
    out
      .withColumn("kappa",
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
      .drop("__pe_num", "__Nd")
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) between the `groupA` and
    * `groupB` values of `groupCol`, with mid-ranks for ties and the
    * tie-corrected normal approximation:
    * z = (U_A − n₁n₂/2) / √(n₁n₂/12 · (n+1 − Σ(t³−t)/(n(n−1)))).
    * The corpus folds to ONE distinct-value count frame (n per value,
    * n_A per value); mid-ranks come from [[graft.util.RangeCum]]'s
    * range-sort + partition-offset scan over the distinct values —
    * distributed even when the value column is continuous (distinct ≈
    * n), where an unpartitioned window would funnel one partition. The
    * cum'd columns are exact integer counts, so the offset chain is
    * bit-identical to a sequential window. Returns ONE row:
    * (n1, n2, u_stat, z_stat); all-tied inputs (σ = 0) yield null z. */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String,
                  groupA: String, groupB: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val twoGroups = df
      .filter(x.isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
      .select(x.as("__v"), (col(groupCol) === groupA).cast("double").as("__a"))
    val byValue = twoGroups.groupBy("__v")
      .agg(count(lit(1)).cast("double").as("__n"), sum("__a").as("__na"))
    val ranked = graft.util.RangeCum.cumSum(byValue, Nil, "__v", Seq("__n"))
      .withColumn("__before", col("__cum___n") - col("__n"))
    val agg = ranked.agg(
      sum("__na").as("__n1"),
      sum(col("__n") - col("__na")).as("__n2"),
      sum(col("__na") * (col("__before") + (col("__n") + 1) / 2)).as("__ra"),
      sum(col("__n") * col("__n") * col("__n") - col("__n")).as("__ties"))
    val n1 = col("__n1"); val n2 = col("__n2")
    val n = n1 + n2
    val u = col("__ra") - n1 * (n1 + 1) / 2
    val sigma2 = n1 * n2 / 12 *
      ((n + 1) - col("__ties") / (n * (n - 1)))
    agg
      .withColumn("n1", n1.cast("long"))
      .withColumn("n2", n2.cast("long"))
      .withColumn("u_stat", u)
      .withColumn("z_stat",
        when(sigma2 > 0, (u - n1 * n2 / 2) / sqrt(sigma2)))
      .select("n1", "n2", "u_stat", "z_stat")
  }

  /** Two-sided p-values for the statistics above (CDF-dependent, so
    * spec-pinned rather than oracle-replayed — the Welch/propTest
    * precedent). */
  def chiSquarePValue(chi2: Double, dof: Long): Double =
    1.0 - new org.apache.commons.math3.distribution.ChiSquaredDistribution(
      dof.toDouble).cumulativeProbability(chi2)

  def anovaPValue(f: Double, dfB: Long, dfW: Long): Double =
    1.0 - new org.apache.commons.math3.distribution.FDistribution(
      dfB.toDouble, dfW.toDouble).cumulativeProbability(f)

  def mannWhitneyPValue(z: Double): Double =
    2.0 * (1.0 - new org.apache.commons.math3.distribution.NormalDistribution()
      .cumulativeProbability(math.abs(z)))
}
