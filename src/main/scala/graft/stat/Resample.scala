package graft.stat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Resampling-based uncertainty: Poisson-bootstrap confidence intervals
  * and split-conformal prediction intervals — both DETERMINISTIC
  * (Lehmer-hash pseudo-randomness, the [[graft.pipeline.Sampling]]
  * basis) so results reproduce across runs, partitionings and engines.
  */
object Resample {

  /** Cumulative Poisson(1) CDF thresholds for inverse-CDF draws:
    * P(X ≤ k) for k = 0..11 (the k = 12 tail has mass < 1e-12 — below
    * the 60-bit uniform's resolution). HARDCODED decimal literals, not
    * computed: math.exp could differ by an ulp across libms, while a
    * decimal literal parses to the identical double in every engine —
    * a SQL oracle replays this CASE chain verbatim. */
  val poisCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216, 0.9999999899522336, 0.9999999991683892)

  /** Per-(row, replica) uniform in (0, 1) on the engine's Lehmer basis
    * ([[graft.pipeline.Sampling.hashKey]]'s documented construction),
    * with the replica index injected AFTER the id nonlinearity —
    * (seed' + b·A) mod (M−1) at the seed stage — and THREE more
    * Park-Miller steps to decorrelate adjacent replicas. Pure 64-bit
    * modular arithmetic (every intermediate < 2^31·48271 ≈ 1e14):
    * codegen-friendly, ~50× cheaper per row than an md5-string draw
    * (measured 23 s → bench-normal on the 10M-row sf0.1 explode), and
    * replayable VERBATIM in any SQL engine — the q_hash_sample oracle
    * treatment. */
  private def uniform(idCol: String, b: Column, seed: Long): Column = {
    val M = 2147483647L // 2^31 − 1 (prime)
    val A = 48271L
    val idL = col(idCol).cast("long")
    val lo = pmod(idL, lit(2147483648L))
    val hi = shiftrightunsigned(idL, 31)
    val x0 = pmod(lo + hi * lit(A), lit(M - 1)) + lit(1L)
    val x3 = (1 to 3).foldLeft(x0)((x, _) => pmod(x * lit(A), lit(M)))
    val inj = pmod(lit(math.floorMod(seed, M - 1)) + b.cast("long") * lit(A),
      lit(M - 1))
    val y0 = pmod(x3 + inj, lit(M - 1)) + lit(1L)
    val y3 = (1 to 3).foldLeft(y0)((x, _) => pmod(x * lit(A), lit(M)))
    y3.cast("double") / lit(M.toDouble)
  }

  /** Per-group mean with a Poisson-bootstrap percentile confidence
    * interval (Poisson(1) replica weights — the streaming-friendly
    * bootstrap: weights are independent per row, no resampling pass;
    * indistinguishable from the multinomial bootstrap at n ≫ 1).
    * Replica b weights each row by a Lehmer-hash-seeded Poisson draw
    * (see [[uniform]]); the CI is the [α/2, 1−α/2] percentile band of
    * the B replica means. `idCol` must be integral (the Lehmer-basis
    * contract, as in hashSample). Returns one row per group:
    * (groups…, n, mean, ci_lo, ci_hi, n_replicas).
    *
    * Determinism: the weight of (row, replica) is a pure function of
    * (idCol, replica index, seed) — reproducible across runs and
    * replayable verbatim in SQL.
    *
    * Scale shape: one ×B explode (B chosen by the caller — cost is B
    * aggregate inputs, the standard Poisson-bootstrap trade), one hash
    * aggregate keyed on (groups, replica) producing groups×B rows, then
    * one exact-percentile aggregate per group over B values. Replicas
    * whose total weight is 0 (vanishing probability beyond toy n) are
    * dropped. */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
                      groupCols: Seq[String], b: Int = 200,
                      alpha: Double = 0.05, seed: Long = 0L): DataFrame = {
    require(b >= 2, s"bootstrapMeanCI needs b >= 2 replicas, got $b")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"bootstrapMeanCI needs an integral id column (the Lehmer-basis " +
          s"contract); $idCol is ${t.simpleString}")
    }
    val gs = groupCols.map(col)
    val clean = df.na.drop(idCol +: valueCol +: groupCols)
    val x = col(valueCol).cast("double")
    // inverse-CDF Poisson(1) draw as a literal CASE chain over a
    // MATERIALIZED uniform: the 12 branch predicates all reference
    // `__u`; inlining the Lehmer chain into each branch would evaluate
    // it up to 12× per exploded row (CASE branches are outside
    // common-subexpression elimination), and CollapseProject keeps the
    // projection because the chain is not collapse-cheap
    val w = poisCdf.zipWithIndex.reverse
      .foldLeft(lit(poisCdf.size).cast("double")) { case (acc, (t, k)) =>
        when(col("__u") < lit(t), lit(k.toDouble)).otherwise(acc)
      }
    val replicas = clean
      .select(gs :+ x.as("__x") :+ col(idCol).cast("long").as(idCol): _*)
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__u", uniform(idCol, col("__b"), seed))
      .withColumn("__w", w)
      .groupBy(gs :+ col("__b"): _*)
      .agg(sum(col("__w") * col("__x")).as("__wx"),
        sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0)
      .withColumn("__mean_b", col("__wx") / col("__sw"))
    val point = clean.groupBy(gs: _*)
      .agg(count(lit(1)).as("n"), avg(x).as("mean"))
    val ci = replicas.groupBy(groupCols.map(col): _*)
      .agg(
        element_at(graft.expr.ExactPercentile.of(col("__mean_b"),
          Seq(alpha / 2, 1 - alpha / 2)), 1).as("ci_lo"),
        element_at(graft.expr.ExactPercentile.of(col("__mean_b"),
          Seq(alpha / 2, 1 - alpha / 2)), 2).as("ci_hi"),
        count(lit(1)).as("n_replicas"))
    point.join(ci, groupCols)
      .select((groupCols.map(col) ++ Seq(col("n"), col("mean"),
        col("ci_lo"), col("ci_hi"), col("n_replicas"))): _*)
  }

  /** Split-conformal prediction intervals: from a CALIBRATION frame
    * with predictions and actuals, compute the conformal quantile q =
    * the k-th smallest absolute residual, k = ⌈(1−α)(n+1)⌉, then band
    * every TARGET prediction as [pred − q, pred + q] — finite-sample
    * ≥ 1−α coverage for exchangeable data, no distributional
    * assumptions (Vovk et al.; the split/inductive variant).
    * If k > n (α too small for the calibration size) q is null and the
    * bands are null — the honest answer, not a clamped one.
    *
    * Returns `target` with ci_lo/ci_hi appended.
    *
    * Scale shape: residuals fold to a distinct-value count frame; the
    * order statistic comes from [[graft.util.RangeCum]]'s range-sort +
    * partition-offset scan over the distinct residuals — distributed
    * even for continuous residuals (distinct ≈ n), where an
    * unpartitioned window would funnel one partition; the counts are
    * exact integers so the distributed cum is bit-identical to a
    * sequential one. The scalar q then broadcasts onto the target scan
    * — no target shuffle. */
  def conformalInterval(calib: DataFrame, target: DataFrame,
                        predCol: String, actualCol: String,
                        alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val r = abs(col(actualCol).cast("double") - col(predCol).cast("double"))
    val byV = calib.na.drop(Seq(predCol, actualCol))
      .select(r.as("__r")).groupBy("__r")
      .agg(count(lit(1)).as("__c"))
    // scalar (n, k) via a broadcast cross join — no driver action
    val nk = byV.agg(sum("__c").as("__n"))
      .select(col("__n"),
        ceil((lit(1.0) - lit(alpha)) * (col("__n") + 1)).as("__k"))
    val q = graft.util.RangeCum.cumSum(byV, Nil, "__r", Seq("__c"))
      .crossJoin(broadcast(nk))
      .filter(col("__cum___c") >= col("__k"))
      .agg(min("__r").as("__q"))
    target.crossJoin(broadcast(q))
      .withColumn("ci_lo", col(predCol).cast("double") - col("__q"))
      .withColumn("ci_hi", col(predCol).cast("double") + col("__q"))
      .drop("__q")
  }
}
