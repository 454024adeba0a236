package graft.agg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketch over a column: the DISTINCT-COUNT member
  * of the persisted-sketch trio (frequency = [[CountMin]], quantiles =
  * [[CountHist]], cardinality = this). Built on Spark's Apache
  * DataSketches HLL functions (`hll_sketch_agg` / `hll_union` /
  * `hll_sketch_estimate`): one aggregation pass folds the column into a
  * fixed-size binary sketch, sketches union losslessly across partitions
  * AND persisted batches, so "how many distinct users/urls/tokens so far"
  * over a growing corpus never rescans old batches and never shuffles a
  * key set.
  *
  * The estimate is approximate (relative error ~1.04/√2^lgK), so unlike
  * the CMS/CountHist cell tables it cannot hash-match an external engine
  * — the oracle contract is instead the ENVELOPE check
  * ([[estimateCheck]], same style as the q_nunique_approx HLL row): the
  * estimate must land within `4·rsd` of the exact distinct count, and
  * the flag plus the exact count are what DuckDB reproduces.
  *
  * Scale shape: one partial/final aggregate (sketch bytes, no key
  * shuffle); persistence is a single row of bytes per batch; union of b
  * batches is driver-trivial. lgK is the only memory knob (2^lgK
  * registers; lgK 12 ≈ 1.6% rsd in a few KB).
  */
object DistinctSketch {

  /** Relative standard deviation for an HLL with 2^lgK registers. */
  def rsd(lgK: Int): Double = 1.04 / math.sqrt((1L << lgK).toDouble)

  /** One-pass sketch of a column (nulls skipped by the aggregate).
    * Returns the serialized sketch bytes. */
  def sketchCol(df: DataFrame, valueCol: String, lgK: Int = 12): Array[Byte] = {
    require(lgK >= 4 && lgK <= 21, s"DistinctSketch: lgK must be in [4,21], got $lgK")
    graft.util.Errors.context("DistinctSketch.sketchCol", Seq(valueCol)) {
      df.agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sk"))
        .head().getAs[Array[Byte]]("sk")
    }
  }

  /** Estimated distinct count of a serialized sketch. */
  def estimate(sketch: Array[Byte])(implicit spark: SparkSession): Long = {
    import spark.implicits._
    Seq(sketch).toDF("sk")
      .select(expr("hll_sketch_estimate(sk)")).head().getLong(0)
  }

  /** Lossless union of serialized sketches (register-wise max). */
  def union(sketches: Seq[Array[Byte]])(implicit spark: SparkSession): Array[Byte] = {
    require(sketches.nonEmpty, "DistinctSketch.union: no sketches")
    import spark.implicits._
    sketches.map(Tuple1(_)).toDF("sk")
      .agg(expr("hll_union_agg(sk, true)").as("u"))
      .head().getAs[Array[Byte]]("u")
  }

  /** Persist a sketch as parquet: one (batch, sketch-bytes) row. */
  def write(sketch: Array[Byte], path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    Seq((0, sketch)).toDF("batch", "sk")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted sketch (union of all batch rows — append adds
    * rows, so the read is always the running union). */
  def read(path: String)(implicit spark: SparkSession): Array[Byte] = {
    val rows = spark.read.parquet(path).select("sk").collect()
      .map(_.getAs[Array[Byte]]("sk"))
    require(rows.nonEmpty, s"DistinctSketch.read: empty sketch at $path")
    union(rows.toSeq)
  }

  /** Sketch a new batch and append it as one more row — O(bytes) write,
    * nothing rewritten; the running estimate is [[read]] + [[estimate]].
    * Batches may overlap with old data: union is idempotent per value,
    * which is the whole point (re-crawled urls don't double-count). */
  def append(df: DataFrame, valueCol: String, path: String, lgK: Int = 12): Unit = {
    implicit val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val sk = sketchCol(df, valueCol, lgK)
    val next = spark.read.parquet(path).agg(max("batch")).head().getInt(0) + 1
    Seq((next, sk)).toDF("batch", "sk")
      .write.mode("append").parquet(path)
  }

  /** Envelope contract, DuckDB-replayable (the q_nunique_approx style):
    * exact distinct count (deterministic — the oracle recomputes it) and
    * a flag that the sketch estimate lands within `4·rsd(lgK)` of it
    * (≥ 4σ, overwhelmingly probable by the HLL guarantee). Runs the
    * exact count ALONGSIDE the sketch — the verification facade, not the
    * scale path. */
  def estimateCheck(df: DataFrame, valueCol: String, lgK: Int = 12): DataFrame = {
    implicit val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val est = estimate(sketchCol(df, valueCol, lgK))
    val exact = df.na.drop(Seq(valueCol))
      .agg(countDistinct(col(valueCol))).head().getLong(0)
    val ok = math.abs(est - exact).toDouble <= 4.0 * rsd(lgK) * exact
    Seq((exact, ok)).toDF("n_exact", "within_envelope")
  }
}
