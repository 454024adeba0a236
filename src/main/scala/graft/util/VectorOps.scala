package graft.util

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Vector/array interop (reference handyspark/util.py:140-190). */
object VectorOps {

  /** ML VectorUDT column → ArrayType(Double) — the reference does an RDD
    * map (util.py:140-156); since Spark 3 this is one native function. */
  def denseToArray(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, vector_to_array(col(c)))

  /** Explode a vector/array column into `c_0..c_{n-1}` scalar columns
    * (reference disassemble, util.py:158-190). Width = MIN size over the
    * dataset — the reference's documented ragged-array semantics
    * (util.py:171). One action for the width, then a pure projection. */
  def disassemble(df: DataFrame, c: String): DataFrame = {
    val asArray = df.schema(c).dataType match {
      case _: ArrayType => df
      case _            => denseToArray(df, c)
    }
    val width = asArray.agg(min(size(col(c)))).head().getInt(0)
    val fields = df.columns.filterNot(_ == c).map(col) ++
      (0 until width).map(i => col(c).getItem(i).as(s"${c}_$i"))
    asArray.select(fields.toSeq: _*)
  }

  /** Per-dimension profile of an embedding/array column — the
    * data-quality readout for a vector table (dead dimensions, scale
    * drift between snapshots, batch-norm sanity): one row per dimension
    * with (dim 0-based, n, mean, variance_pop, min, max). One posexplode
    * (×D rows, D = vector width) into one hash aggregate KEYED on the
    * dimension — no per-vector collect, no width-wide agg column list,
    * so a 4096-dim table profiles in the same two-stage plan as a
    * 16-dim one. Ragged inputs profile whatever positions exist (n per
    * dim reports the coverage); variance is the population raw-sums
    * identity — embedding components are O(1), the cancellation caveat
    * does not bite. */
  def vecProfile(df: DataFrame, c: String): DataFrame = {
    val asArray = df.schema(c).dataType match {
      case _: ArrayType => df
      case _            => denseToArray(df, c)
    }
    val exploded = asArray.filter(col(c).isNotNull)
      .select(posexplode(col(c)).as(Seq("dim", "__v")))
      .withColumn("__v", col("__v").cast("double"))
      .filter(col("__v").isNotNull)
    exploded.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        (sum("__v") / count(lit(1))).as("mean"),
        (sum(col("__v") * col("__v")) / count(lit(1)) -
          (sum("__v") / count(lit(1))) * (sum("__v") / count(lit(1))))
          .as("variance_pop"),
        min("__v").as("min"), max("__v").as("max"))
  }
}
