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

  // ---- product quantization (PQ) -----------------------------------------
  //
  // Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
  // Search": split each vector into m subvectors, vector-quantize each
  // subspace against its own ksub-centroid codebook, store m small codes
  // per vector (m bytes at ksub=256 — 32x smaller than 64 float dims).
  // Search uses Asymmetric Distance Computation: per query, an m x ksub
  // lookup table of subspace dot products; scoring a corpus vector is m
  // table adds, no float-vector access at all. This is the memory tier
  // UNDER the IVF index: at 100 TB the full float corpus doesn't fit the
  // cluster's RAM, the PQ codes do.

  /** PQ codebook: `centers(sub)(code)` is the dsub-dim centroid. Trained
    * once (bounded sample), broadcast everywhere; a few MB at most. */
  final class PQCodebook(val dim: Int, val m: Int,
                         val centers: Array[Array[Array[Double]]])
      extends Serializable {
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m subspaces")
    val dsub: Int = dim / m
    def ksub: Int = centers(0).length
  }

  /** Train a PQ codebook on a BOUNDED deterministic sample (hashed-id
    * order, like the IVF quantizer): slice each sample vector into m
    * subvectors, run the local seeded Lloyd loop per subspace. Corpus
    * scans: one (the sample take). */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              m: Int, ksub: Int = 256, seed: Long = 42L): PQCodebook =
    graft.util.Errors.context("pqTrain", Seq(idCol, vecCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), _.cast("double")))
      .as[(Long, Array[Double])]
    val sampleN = math.max(ksub * 16, 1024)
    val sample = vecs
      .map { case (id, v) =>
        (java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L), v)
      }
      .orderBy(col("_1")).limit(sampleN) // TakeOrdered: no full-sort shuffle
      .collect().map(_._2)
    require(sample.nonEmpty, "pqTrain: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val centers = Array.tabulate(m) { sub =>
      val slices = sample.map(v => java.util.Arrays.copyOfRange(
        v, sub * dsub, (sub + 1) * dsub))
      Similarity.localKMeans(slices, ksub, iters = 10, seed + sub)
    }
    new PQCodebook(dim, m, centers)
  }

  /** Encode the corpus: (id, codes array<int>) — one typed map against
    * the broadcast codebook, no shuffle. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               cb: PQCodebook): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), _.cast("double")))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val c = bc.value
        require(v.length == c.dim,
          s"pqEncode: vector dim ${v.length} != codebook dim ${c.dim}")
        val codes = new Array[Int](c.m)
        var sub = 0
        while (sub < c.m) {
          val slice = java.util.Arrays.copyOfRange(
            v, sub * c.dsub, (sub + 1) * c.dsub)
          codes(sub) = Similarity.nearestCenter(slice, c.centers(sub))
          sub += 1
        }
        (id, codes)
      }
      .toDF(idCol, "codes")
  }

  /** Reconstruction (the decoder side of [[pqEncode]]). */
  def pqReconstruct(codes: Array[Int], cb: PQCodebook): Array[Double] = {
    val out = new Array[Double](cb.dim)
    var sub = 0
    while (sub < cb.m) {
      System.arraycopy(cb.centers(sub)(codes(sub)), 0, out, sub * cb.dsub,
        cb.dsub)
      sub += 1
    }
    out
  }

  /** IVF-PQ index: the coarse IVF cell assignment AND the PQ codes in one
    * frame (id, cell, codes) — the standard composition (Jégou et al. §V):
    * IVF routes a query to `nProbe` cells, PQ scores only those cells'
    * rows from codes, so the float corpus is touched by NEITHER stage.
    * Returns (index, ivf centers, pq codebook). Two corpus passes (IVF
    * assign reads vectors, encode reads the assigned frame); cache `df`
    * upstream if its lineage is expensive. */
  def ivfPqIndex(df: DataFrame, idCol: String, vecCol: String,
                 nCells: Int, m: Int, ksub: Int = 256, seed: Long = 42L)
      : (DataFrame, Array[Array[Double]], PQCodebook) = {
    val spark = df.sparkSession
    import spark.implicits._
    val (assigned, centers) = Similarity.ivfAssign(df, idCol, vecCol,
      nCells, seed)
    val cb = pqTrain(df, idCol, vecCol, m, ksub, seed)
    val bc = spark.sparkContext.broadcast(cb)
    val index = assigned
      .select(col(idCol).cast("long"), col("v"), col("cell"))
      .as[(Long, Array[Double], Int)]
      .map { case (id, v, cell) =>
        val c = bc.value
        val codes = new Array[Int](c.m)
        var sub = 0
        while (sub < c.m) {
          val slice = java.util.Arrays.copyOfRange(
            v, sub * c.dsub, (sub + 1) * c.dsub)
          codes(sub) = Similarity.nearestCenter(slice, c.centers(sub))
          sub += 1
        }
        (id, cell, codes)
      }
      .toDF(idCol, "cell", "codes")
    (index, centers, cb)
  }

  /** Persist an IVF-PQ index: the encoded rows at `path/index` and both
    * model halves (IVF centroids + PQ codebook) at `path/meta` as
    * (kind, i, j, vec) rows — self-describing (dim/m/ksub/nCells all
    * derive from the meta rows), so [[readIvfPq]] needs no side channel.
    * The persisted-screen pattern of TextIndex/VecIndex applied to ANN
    * serving: train/encode once, search and APPEND forever after without
    * touching float vectors or refitting. */
  def writeIvfPq(index: DataFrame, centers: Array[Array[Double]],
                 cb: PQCodebook, idCol: String, path: String): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    index.select(col(idCol).cast("long").as("id"), col("cell"), col("codes"))
      .write.mode("overwrite").parquet(s"$path/index")
    val ivfRows = centers.zipWithIndex.map { case (c, i) =>
      ("ivf", i, 0, c.toSeq)
    }
    val pqRows = for {
      sub <- 0 until cb.m
      code <- 0 until cb.ksub
    } yield ("pq", sub, code, cb.centers(sub)(code).toSeq)
    (ivfRows.toSeq ++ pqRows).toDF("kind", "i", "j", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted IVF-PQ index back: (index frame over the parquet
    * files — appends picked up on re-read — IVF centers, PQ codebook). */
  def readIvfPq(path: String, idCol: String)
               (implicit spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, Array[Array[Double]], PQCodebook) =
      graft.util.Errors.context("readIvfPq", Seq(idCol)) {
    val meta = spark.read.parquet(s"$path/meta")
      .select("kind", "i", "j", "vec").collect()
    val ivf = meta.filter(_.getString(0) == "ivf")
      .map(r => r.getInt(1) -> r.getSeq[Double](3).toArray)
      .sortBy(_._1).map(_._2)
    require(ivf.nonEmpty, s"readIvfPq: no IVF centroids at $path/meta")
    val pq = meta.filter(_.getString(0) == "pq")
    require(pq.nonEmpty, s"readIvfPq: no PQ codebook at $path/meta")
    val m = pq.map(_.getInt(1)).max + 1
    val ksub = pq.map(_.getInt(2)).max + 1
    val centers = Array.ofDim[Array[Double]](m, ksub)
    pq.foreach { r =>
      centers(r.getInt(1))(r.getInt(2)) = r.getSeq[Double](3).toArray
    }
    val dsub = centers(0)(0).length
    val cb = new PQCodebook(m * dsub, m, centers)
    val index = spark.read.parquet(s"$path/index")
      .select(col("id").as(idCol), col("cell"), col("codes"))
    (index, ivf, cb)
  }

  /** Encode a new batch under the PERSISTED models and append its rows to
    * `path/index` — continuous ANN ingestion with zero refit and zero
    * old-row rewrites (cell assignment + codes are one typed map against
    * the broadcast meta; the append is batch-sized). Readers pick the new
    * rows up on their next [[readIvfPq]]. */
  def appendIvfPq(df: DataFrame, idCol: String, vecCol: String,
                  path: String): Unit = {
    implicit val spark: org.apache.spark.sql.SparkSession = df.sparkSession
    import spark.implicits._
    val (_, ivf, cb) = readIvfPq(path, idCol)
    val bcIvf = spark.sparkContext.broadcast(ivf)
    val bcCb = spark.sparkContext.broadcast(cb)
    df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), _.cast("double")))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val c = bcCb.value
        require(v.length == c.dim,
          s"appendIvfPq: vector dim ${v.length} != codebook dim ${c.dim}")
        val cell = Similarity.nearestCenter(v, bcIvf.value)
        val codes = new Array[Int](c.m)
        var sub = 0
        while (sub < c.m) {
          val slice = java.util.Arrays.copyOfRange(
            v, sub * c.dsub, (sub + 1) * c.dsub)
          codes(sub) = Similarity.nearestCenter(slice, c.centers(sub))
          sub += 1
        }
        (id, cell, codes)
      }
      .toDF("id", "cell", "codes")
      .write.mode("append").parquet(s"$path/index")
  }

  /** IVF-routed ADC search: rank cells by centroid cosine, ADC-score the
    * top `nProbe` cells' codes. Scan cost ≈ nProbe/nCells of [[pqTopK]]'s,
    * and the cell filter prunes at the source. `nProbe = nCells` degrades
    * exactly to [[pqTopK]] over the whole index (spec-pinned). */
  def ivfPqTopK(index: DataFrame, centers: Array[Array[Double]],
                cb: PQCodebook, idCol: String, query: Array[Double],
                k: Int, nProbe: Int = 3): DataFrame = {
    def cosLocal(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val probeCells = centers.zipWithIndex
      .map { case (c, i) => (i, cosLocal(c, query)) }
      .sortBy(-_._2).take(nProbe).map(_._1)
    pqTopK(index.filter(col("cell").isin(probeCells.toIndexedSeq: _*)),
      cb, idCol, query, k)
  }

  /** ADC top-k by approximate cosine: per-query m x ksub tables of
    * subspace dot products and centroid squared norms, broadcast; each
    * corpus row costs m table adds. cos ≈ Σ_sub dot(q_sub, c_sub(code))
    * / sqrt(‖q‖² · Σ_sub ‖c_sub(code)‖²) — exact cosine of query vs the
    * RECONSTRUCTION. TakeOrdered (cos desc, id) — no full-sort shuffle.
    * Restrict `encoded` upstream (e.g. to IVF probe cells) to compose
    * with the coarse index. */
  def pqTopK(encoded: DataFrame, cb: PQCodebook, idCol: String,
             query: Array[Double], k: Int): DataFrame = {
    require(k >= 1, s"pqTopK requires k >= 1, got $k")
    require(query.length == cb.dim,
      s"pqTopK: query dim ${query.length} != codebook dim ${cb.dim}")
    val spark = encoded.sparkSession
    import spark.implicits._
    val dots = Array.tabulate(cb.m, cb.ksub) { (sub, code) =>
      val c = cb.centers(sub)(code)
      var d = 0.0
      var i = 0
      while (i < cb.dsub) { d += c(i) * query(sub * cb.dsub + i); i += 1 }
      d
    }
    val norms2 = Array.tabulate(cb.m, cb.ksub) { (sub, code) =>
      val c = cb.centers(sub)(code)
      var n = 0.0
      var i = 0
      while (i < cb.dsub) { n += c(i) * c(i); i += 1 }
      n
    }
    val qn = query.map(x => x * x).sum
    val bcD = spark.sparkContext.broadcast(dots)
    val bcN = spark.sparkContext.broadcast(norms2)
    encoded.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .map { case (id, codes) =>
        val d = bcD.value; val n2 = bcN.value
        var dot = 0.0; var nn = 0.0
        var sub = 0
        while (sub < codes.length) {
          dot += d(sub)(codes(sub)); nn += n2(sub)(codes(sub)); sub += 1
        }
        (id, dot / math.sqrt(qn * nn))
      }
      .toDF(idCol, "cos")
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }
}
