package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines. `df.sample()` is
  * seed-stable only for a FIXED partitioning — repartition the input (or
  * re-run after appends) and membership churns, which silently changes a
  * training set. These operators key membership on a deterministic hash of
  * a stable id column instead: a row's membership never depends on
  * partitioning, row order, or the rest of the corpus — append-safe,
  * re-runnable, and cheap (pure projection arithmetic inside whole-stage
  * codegen, no shuffle).
  *
  * The hash is THREE iterated Lehmer/Park-Miller steps
  * `x → (x · 48271) mod (2^31 − 1)` from `x₀ = (id + seed) mod (2^31 − 2)
  * + 1`, folded to (0, 1). One step is NOT enough: for sequential ids
  * below ~44k the first multiply never wraps the modulus, so every key
  * lands near 0 and a 30% sample keeps 100% of the rows (measured) —
  * three wraps equidistribute. x₀ ≥ 1 avoids the generator's 0 fixed
  * point. Every intermediate stays below 2^31·48271 ≈ 1e14 (ANSI-mode
  * safe in a long), and the arithmetic is expressible verbatim in any SQL
  * engine, so sampling decisions can be reproduced (and oracle-checked)
  * outside Spark.
  */
object Sampling {

  private val M = 2147483647L // 2^31 − 1 (prime)
  private val A = 48271L      // Park–Miller multiplier

  /** uniform (0, 1) sampling key for an integral id (seed shifts the id
    * stream, so different seeds give independent samples) */
  def hashKey(id: Column, seed: Long = 0L): Column = {
    val x0 = pmod(id.cast("long") + lit(seed), lit(M - 1)) + lit(1L)
    val x3 = (1 to 3).foldLeft(x0)((x, _) => pmod(x * lit(A), lit(M)))
    x3.cast("double") / lit(M.toDouble)
  }

  /** Keep ~`fraction` of rows, keyed on `idCol` — same id always makes the
    * same decision under the same seed. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]")
    Similarity.requireIntegralId(df, idCol, "hashSample")
    df.filter(hashKey(col(idCol), seed) < lit(fraction))
  }

  /** Per-stratum fractions (downsample dominant languages / quality tiers):
    * rows of strata absent from `fractions` are dropped, mirroring
    * `sampleBy`. The fraction map rides into the plan as a literal CASE —
    * no join, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 0L): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "stratifiedSample")
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(hashKey(col(idCol), seed) < frac)
  }

  /** Deterministic train/validation/test assignment: adds `splitCol` with
    * values "train"/"val"/"test" by hash range — membership survives
    * appends and re-partitioning, the property random splits lack. */
  def trainTestSplit(df: DataFrame, idCol: String, valFraction: Double,
                     testFraction: Double, seed: Long = 0L,
                     splitCol: String = "split"): DataFrame = {
    require(valFraction + testFraction < 1.0, "val + test must leave train mass")
    Similarity.requireIntegralId(df, idCol, "trainTestSplit")
    val k = hashKey(col(idCol), seed)
    df.withColumn(splitCol,
      when(k < lit(testFraction), lit("test"))
        .when(k < lit(testFraction + valFraction), lit("val"))
        .otherwise(lit("train")))
  }
}
