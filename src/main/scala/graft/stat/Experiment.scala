package graft.stat

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Experimentation tier: CUPED variance reduction and the sample-ratio
  * mismatch (SRM) guardrail — the two calculations every A/B platform
  * runs before anyone reads a treatment effect.
  */
object Experiment {

  /** CUPED (Controlled-experiment Using Pre-Experiment Data; Deng et
    * al., WSDM 2013): reduce metric variance with a pre-period
    * covariate. Input is UNIT-level (one row per randomization unit)
    * with arm assignment, pre-period metric and post-period metric.
    *
    * theta = cov_pop(pre, post) / var_pop(pre) is fit POOLED across all
    * arms (the standard choice — fitting per-arm reintroduces bias),
    * then adjusted = post − theta·(pre − mean(pre)). Returns one row
    * per arm: n, mean_post, mean_cuped, var_post, var_cuped (sample
    * variances) — var_cuped/var_post ≈ 1 − corr² is the variance
    * reduction bought.
    *
    * Degenerate guard: var_pop(pre) = 0 (constant covariate) forces
    * theta = 0, i.e. no adjustment, mean_cuped = mean_post.
    *
    * Scale shape: one scalar aggregate (theta, mean_pre) broadcast back
    * over the unit frame, then one hash aggregate keyed on arm. Two
    * passes over unit rows, no driver collection, no window. */
  def cuped(df: DataFrame, armCol: String, preCol: String,
            postCol: String): DataFrame = {
    val clean = df.na.drop(Seq(armCol, preCol, postCol))
    val pre = col(preCol).cast(DoubleType)
    val post = col(postCol).cast(DoubleType)
    val fit = clean.agg(
        var_pop(pre).as("__v"), covar_pop(pre, post).as("__c"),
        avg(pre).as("__mu_pre"))
      // explicit zero-variance guard (not a bare divide): deterministic
      // under ANSI and non-ANSI division semantics alike
      .select(when(col("__v") > 0, col("__c") / col("__v"))
        .otherwise(lit(0.0)).as("__theta"), col("__mu_pre"))
    clean.crossJoin(broadcast(fit))
      .withColumn("__adj",
        post - col("__theta") * (pre - col("__mu_pre")))
      .groupBy(armCol).agg(
        count(lit(1)).as("n"),
        avg(post).as("mean_post"),
        avg(col("__adj")).as("mean_cuped"),
        var_samp(post).as("var_post"),
        var_samp(col("__adj")).as("var_cuped"))
  }

  /** Sample-ratio mismatch check: chi-square goodness-of-fit of observed
    * arm counts against `expected` weights (need not sum to 1 — they
    * are normalized). An SRM (p below ~1e-3) means the assignment
    * mechanism is broken and the experiment unreadable, whatever the
    * metric movement says.
    *
    * Returns one row: n (units), n_arms, chi2, dof
    * (= arms-in-expected − 1), p_value (Wilson–Hilferty via
    * [[InferenceTests.chiSquarePValue]]). Arms observed but absent from
    * `expected` are a hard error (require) — silently dropping them
    * would hide exactly the bug SRM exists to catch; expected arms with
    * zero observed rows contribute their full expected count.
    *
    * Scale shape: one hash aggregate keyed on arm (arms ≪ rows), then
    * the chi-square sum folds driver-side over `expected.size` rows —
    * the only collect is over the arm-count result, bounded by the
    * experiment's arm count. */
  def srmCheck(df: DataFrame, armCol: String,
               expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "srmCheck needs expected arm weights")
    require(expected.forall(_._2 > 0), "expected weights must be positive")
    val spark = df.sparkSession
    val wSum = expected.map(_._2).sum
    // bounded collect: > expected.size distinct arms already proves an
    // unknown arm, so never pull more than expected.size+1 count rows
    // even if the caller pointed armCol at a high-cardinality column
    val rows = df.filter(col(armCol).isNotNull)
      .groupBy(col(armCol).cast(StringType).as("arm"))
      .agg(count(lit(1)).as("cnt"))
      .take(expected.size + 1)
    val counts = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val unknown = counts.keySet -- expected.map(_._1).toSet
    require(unknown.isEmpty,
      s"observed arms absent from expected: ${unknown.mkString(", ")} — " +
        "an unknown arm IS a sample-ratio bug; list it explicitly")
    val n = counts.values.sum
    val chi2 = expected.map { case (arm, w) =>
      val e = n * w / wSum
      val o = counts.getOrElse(arm, 0L).toDouble
      if (e > 0) (o - e) * (o - e) / e else 0.0
    }.sum
    val dof = (expected.size - 1).toLong
    val p = InferenceTests.chiSquarePValue(chi2, dof)
    // Row(...) keeps each value's own type — a Seq(long, double) literal
    // would numeric-widen the longs to Double and break the LongType
    // schema fields
    toRow(spark, Row(n, expected.size.toLong, chi2, dof, p),
      StructType(Seq(
        StructField("n", LongType), StructField("n_arms", LongType),
        StructField("chi2", DoubleType), StructField("dof", LongType),
        StructField("p_value", DoubleType))))
  }

  /** Uplift (Qini) curve by score bucket: rank units by a targeting
    * score, cut into `buckets` quantile slices (bucket 1 = HIGHEST
    * scores), and per slice report treated/control counts, outcome
    * rates, the slice uplift (rate_t − rate_c), and the cumulative
    * Qini value
    *
    *   qini(k) = Σ_{b ≤ k} y_t(b) − Σ_{b ≤ k} y_c(b) · N_t(k)/N_c(k)
    *
    * — the model-evaluation curve for "who should we treat": a random
    * score gives a straight line to the endpoint, a good model front-
    * loads the uplift. Slices with no control units yield null
    * rate_c/uplift (and qini inherits null until controls appear).
    *
    * Scale shape: one exact-percentile pass for the bucket thresholds
    * (a broadcast scalar row — bucket assignment is a literal
    * comparison chain, no global rank window over units), one hash
    * aggregate keyed on the bucket, then windows over the
    * `buckets`-row result frame (bounded by the parameter, not the
    * data). */
  def upliftDeciles(df: DataFrame, armCol: String, treatedValue: String,
                    outcomeCol: String, scoreCol: String,
                    buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 100,
      s"buckets must be in [2,100], got $buckets")
    val score = col(scoreCol).cast("double")
    val y = col(outcomeCol).cast("double")
    val t = (col(armCol).cast(StringType) === treatedValue).cast("double")
    val clean = df.na.drop(Seq(armCol, outcomeCol, scoreCol))
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val thr = clean.agg(graft.expr.ExactPercentile.of(score, ps).as("__t"))
    // bucket 1 = top scores: count how many thresholds the score exceeds,
    // from the bucket's top end down
    val withB = clean.crossJoin(broadcast(thr))
      .withColumn("__gt", (1 until buckets).map(i =>
        (score > element_at(col("__t"), i)).cast("int"))
        .reduceOption(_ + _).getOrElse(lit(0)))
      .withColumn("bucket", lit(buckets) - col("__gt"))
    val per = withB.groupBy("bucket").agg(
      sum(t).as("n_t"), sum(lit(1.0) - t).as("n_c"),
      sum(t * y).as("y_t"), sum((lit(1.0) - t) * y).as("y_c"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // windows over <= `buckets` rows — bounded by the parameter
    per
      .withColumn("rate_t",
        when(col("n_t") > 0, col("y_t") / col("n_t")))
      .withColumn("rate_c",
        when(col("n_c") > 0, col("y_c") / col("n_c")))
      .withColumn("uplift", col("rate_t") - col("rate_c"))
      .withColumn("qini",
        sum("y_t").over(wCum) - sum("y_c").over(wCum) *
          (sum("n_t").over(wCum) /
            nullif(sum("n_c").over(wCum), lit(0.0))))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_t").cast("long").as("n_t"),
        col("n_c").cast("long").as("n_c"),
        col("y_t"), col("y_c"), col("rate_t"), col("rate_c"),
        col("uplift"), col("qini"))
      .orderBy("bucket")
  }

  /** Difference-in-differences estimate from unit-period outcome rows:
    * DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre),
    * the classic two-group two-period design (treatment effect under
    * the parallel-trends assumption). `treatCol` and `postCol` are
    * 0/1-coercible indicators. Returns ONE row: per-cell counts/means
    * (n_tpre, n_tpost, n_cpre, n_cpost, mean_tpre, …), the estimate,
    * and its standard error from the four-cell variance sum
    * SE = √(Σ s²_cell/n_cell) — exact for the cell-means estimator
    * (equivalently the OLS interaction coefficient with
    * heteroscedasticity-by-cell). Any EMPTY cell yields null `did`
    * (a missing cell means the design ran off the rails, not zero);
    * `se` additionally needs every cell at n >= 2 — a singleton cell
    * has a defined mean but no sample variance, so `did` is reported
    * and `se` alone is null there.
    *
    * Scale shape: ONE hash aggregate folds the corpus to the 4 cells
    * (conditional sums — no pivot, no second scan); everything after is
    * scalar arithmetic on one row. */
  def diffInDiff(df: DataFrame, treatCol: String, postCol: String,
                 yCol: String): DataFrame = {
    val y = col(yCol).cast(DoubleType)
    val t = col(treatCol).cast(IntegerType)
    val p = col(postCol).cast(IntegerType)
    val clean = df.na.drop(Seq(treatCol, postCol, yCol))
    def cell(tv: Int, pv: Int, suffix: String) = {
      val in = t === tv && p === pv
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$suffix"),
        sum(when(in, y)).as(s"__s_$suffix"),
        sum(when(in, y * y)).as(s"__ss_$suffix"))
    }
    val aggs = cell(1, 0, "tpre") ++ cell(1, 1, "tpost") ++
      cell(0, 0, "cpre") ++ cell(0, 1, "cpost")
    val one = clean.agg(aggs.head, aggs.tail: _*)
    def mean(sfx: String) = col(s"__s_$sfx") / col(s"n_$sfx")
    // sample variance of the cell / its n — the SE² contribution
    def v(sfx: String) = {
      val n = col(s"n_$sfx").cast(DoubleType)
      (col(s"__ss_$sfx") - col(s"__s_$sfx") * col(s"__s_$sfx") / n) /
        (n - 1) / n
    }
    val allCells = Seq("tpre", "tpost", "cpre", "cpost")
    // the cell-means DiD point estimate is defined from n = 1 per cell;
    // only the SE needs the sample variances (n >= 2 per cell)
    val nonEmpty = allCells.map(sfx => col(s"n_$sfx") > 0).reduce(_ && _)
    val seDefined = allCells.map(sfx => col(s"n_$sfx") > 1).reduce(_ && _)
    val est = (mean("tpost") - mean("tpre")) -
      (mean("cpost") - mean("cpre"))
    val se = sqrt(v("tpost") + v("tpre") + v("cpost") + v("cpre"))
    one
      .withColumn("mean_tpre", when(col("n_tpre") > 0, mean("tpre")))
      .withColumn("mean_tpost", when(col("n_tpost") > 0, mean("tpost")))
      .withColumn("mean_cpre", when(col("n_cpre") > 0, mean("cpre")))
      .withColumn("mean_cpost", when(col("n_cpost") > 0, mean("cpost")))
      .withColumn("did", when(nonEmpty, est))
      .withColumn("se", when(seDefined, se))
      .select("n_tpre", "n_tpost", "n_cpre", "n_cpost",
        "mean_tpre", "mean_tpost", "mean_cpre", "mean_cpost", "did", "se")
  }

  /** Inverse-probability-weighted average treatment effect from scored
    * rows (unit, 0/1 treatment, outcome, propensity e = P(T=1|X) from
    * any upstream model — e.g. [[graft.pipeline.Classify]]'s logistic
    * scores). Emits BOTH standard estimators:
    *
    *  - Horvitz-Thompson: ATE_ht = mean(t·y/e − (1−t)·y/(1−e)) — the
    *    textbook unbiased form, variance-fragile when weights get big;
    *  - Hájek (self-normalized): Σ(t·y/e)/Σ(t/e) −
    *    Σ((1−t)y/(1−e))/Σ((1−t)/(1−e)) — the production default, exact
    *    under weight scaling.
    *
    * Propensities clip into [clip, 1−clip] FIRST (the standard
    * positivity trim; extreme e would hand one unit the whole
    * estimate). Returns ONE row: (n, n_treat, n_ctrl, mean_w_treat,
    * mean_w_ctrl, ate_ht, ate_hajek). One hash aggregate over the
    * scored frame — nothing downstream grows with the data. Either arm
    * empty yields null ATEs. */
  def ipwAte(df: DataFrame, treatCol: String, yCol: String,
             propensityCol: String, clip: Double = 0.01): DataFrame = {
    require(clip >= 0 && clip < 0.5, s"ipwAte: clip must be in [0, 0.5), got $clip")
    val t = col(treatCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val e = least(greatest(col(propensityCol).cast(DoubleType), lit(clip)),
      lit(1.0 - clip))
    val clean = df.na.drop(Seq(treatCol, yCol, propensityCol))
    val one = clean.agg(
      count(lit(1)).as("n"),
      sum(t).cast("long").as("n_treat"),
      sum(lit(1.0) - t).cast("long").as("n_ctrl"),
      sum(t / e).as("__wt"), sum((lit(1.0) - t) / (lit(1.0) - e)).as("__wc"),
      sum(t * y / e).as("__wyt"),
      sum((lit(1.0) - t) * y / (lit(1.0) - e)).as("__wyc"))
    val both = col("n_treat") > 0 && col("n_ctrl") > 0
    one
      .withColumn("mean_w_treat",
        when(col("n_treat") > 0, col("__wt") / col("n_treat")))
      .withColumn("mean_w_ctrl",
        when(col("n_ctrl") > 0, col("__wc") / col("n_ctrl")))
      .withColumn("ate_ht",
        when(both, (col("__wyt") - col("__wyc")) / col("n")))
      .withColumn("ate_hajek",
        when(both, col("__wyt") / col("__wt") - col("__wyc") / col("__wc")))
      .select("n", "n_treat", "n_ctrl", "mean_w_treat", "mean_w_ctrl",
        "ate_ht", "ate_hajek")
  }

  private def toRow(spark: SparkSession, row: Row,
                    schema: StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(row).asJava, schema)
  }
}
