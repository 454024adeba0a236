package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization: per-dimension min/max scaling
  * of a float-vector column onto 0..levels−1 integers — 4× the vectors
  * per byte of executor memory for the ANN/dedup tier, with the usual
  * ~1% recall cost the verify pass (exact cosine on the FULL vectors,
  * Similarity/Dedup) already absorbs.
  *
  * Scale shape: pass 1 folds per-partition (lo, hi) arrays and
  * treeReduces them — 2·dim doubles reach the driver, nothing shuffles
  * by dimension (a posexplode + groupBy(pos) would shuffle n·dim rows).
  * Pass 2 is a pure projection: the dim-length range arrays ship as
  * literals inside one `transform`, so quantization stays inside
  * whole-stage codegen. Callers with expensive upstream pipelines
  * should cache the input (two passes) — same contract as the bits=0
  * embeddingDedup path.
  *
  * Determinism: q = round((v − lo) / span · (levels−1)) computed in
  * double with span := hi − lo (1 when the dimension is constant) is a
  * fixed IEEE expression tree — any engine reproduces it bit-for-bit,
  * so quantized corpora are comparable across systems (oracle-checked).
  */
object Quantize {

  /** Per-dimension (lo, hi) over the corpus: one pass, no shuffle. */
  def dimRanges(df: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val (lo, hi) = df.na.drop(Seq(vecCol))
      .select(transform(col(vecCol), _.cast("double")))
      .as[Array[Double]].rdd
      .treeAggregate((null: Array[Double], null: Array[Double]))(
        { case ((lo, hi), v) =>
          if (lo == null) (v.clone(), v.clone())
          else {
            require(lo.length == v.length,
              s"Quantize: corpus mixes dims ${lo.length} and ${v.length}")
            var i = 0
            while (i < v.length) {
              if (v(i) < lo(i)) lo(i) = v(i)
              if (v(i) > hi(i)) hi(i) = v(i)
              i += 1
            }
            (lo, hi)
          }
        },
        { case ((al, ah), (bl, bh)) =>
          if (al == null) (bl, bh)
          else if (bl == null) (al, ah)
          else {
            require(al.length == bl.length,
              s"Quantize: corpus mixes dims ${al.length} and ${bl.length}")
            var i = 0
            while (i < al.length) {
              if (bl(i) < al(i)) al(i) = bl(i)
              if (bh(i) > ah(i)) ah(i) = bh(i)
              i += 1
            }
            (al, ah)
          }
        })
    require(lo != null, "Quantize: empty corpus (no non-null vectors)")
    (lo, hi)
  }

  /** Input plus `qvec`: `vecCol` quantized to 0..levels−1 ints against
    * the corpus per-dimension ranges. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String,
                   levels: Int = 256): DataFrame = {
    require(levels >= 2, s"quantizeInt8 needs levels >= 2, got $levels")
    graft.util.Errors.context("quantizeInt8", Seq(idCol, vecCol)) {
    val clean = df.na.drop(Seq(idCol, vecCol))
    val (lo, hi) = dimRanges(clean, vecCol)
    val span = lo.indices.map(i =>
      if (hi(i) == lo(i)) 1.0 else hi(i) - lo(i)).toArray
    val loC = lit(lo)
    val spanC = lit(span)
    clean.withColumn("qvec",
      transform(col(vecCol), (v, i) =>
        round(
          (v.cast("double") - element_at(loC, (i + 1).cast("int")))
            / element_at(spanC, (i + 1).cast("int")) * lit(levels - 1))
          .cast("int")))
  } }

  /** Dequantized view of a [[quantizeInt8]] output for downstream math:
    * v̂ = lo + q/(levels−1) · span per dimension, as array<double>. */
  def dequantize(qvecCol: String, lo: Array[Double],
                 hi: Array[Double], levels: Int = 256): Column = {
    val span = lo.indices.map(i =>
      if (hi(i) == lo(i)) 1.0 else hi(i) - lo(i)).toArray
    transform(col(qvecCol), (q, i) =>
      element_at(lit(lo), (i + 1).cast("int")) +
        q.cast("double") / lit((levels - 1).toDouble) *
          element_at(lit(span), (i + 1).cast("int")))
  }
}
