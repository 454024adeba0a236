package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed embedding clustering for corpus curation (extension tier —
  * no reference analog): full-corpus Lloyd k-means and the SemDeDup-style
  * semantic near-duplicate pass built on it (cluster first, then exact
  * cosine only WITHIN clusters — Abbas et al. 2023, arXiv:2303.09540).
  * Complements the IVF quantizer in [[Similarity]] (which fits centers on
  * a bounded sample because its cells only need to split space roughly):
  * here the centers are the product, so every iteration scans the corpus.
  *
  * Scale shape: per iteration ONE mapPartitions pass producing a single
  * (k × dim sums, k counts) partial per partition, tree-reduced to the
  * driver — no shuffle of the data, no per-row aggregation state. The
  * corpus projection is persisted across iterations (iters + 1 scans of a
  * two-column frame otherwise) and released before returning; the
  * returned assignment is a lazy map over FRESH lineage so nothing stays
  * cached. Centers are k × dim doubles broadcast per pass — fine to
  * k ~ 10⁵ at dim 64. Init is the k lowest-id vectors: deterministic and
  * oracle-reproducible; at 100 TB swap in a sampled k-means|| init via
  * `initCenters` if the head of the id space is not representative.
  */
object Clustering {

  private def vecsOf(df: DataFrame, idCol: String, vecCol: String) = {
    val spark = df.sparkSession
    import spark.implicits._
    // same id contract as the Similarity typed paths: a string id would
    // null-cast AFTER na.drop already ran and fail later with an opaque
    // Dataset decode error
    Similarity.requireIntegralId(df, idCol, "Clustering")
    df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long").as("_1"),
        transform(col(vecCol), x => x.cast("double")).as("_2"))
      .as[(Long, Array[Double])]
  }

  /** Fit k centers with `iters` full Lloyd updates. Returns the centers
    * ordered by init id — cluster ids are stable across runs. Empty
    * clusters keep their previous center (standard Lloyd degeneracy
    * handling, deterministic). */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
                iters: Int,
                initCenters: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    require(k >= 1, s"kmeansFit needs k >= 1, got $k")
    require(iters >= 0, s"kmeansFit needs iters >= 0, got $iters")
    val spark = df.sparkSession
    val vecs = vecsOf(df, idCol, vecCol)
    val cached = vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centers = initCenters.getOrElse {
        val seed = cached.orderBy(col("_1")).limit(k).collect() // TakeOrdered
        require(seed.nonEmpty, "kmeansFit: empty input")
        seed.sortBy(_._1).map(_._2)
      }
      val dim = centers(0).length
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(centers)
        val (sums, counts) = cached.rdd.mapPartitions { rows =>
          val cs = bc.value
          val s = Array.fill(cs.length)(new Array[Double](dim))
          val n = new Array[Long](cs.length)
          rows.foreach { case (_, v) =>
            val c = Similarity.nearestCenter(v, cs)
            val acc = s(c)
            var i = 0
            while (i < dim) { acc(i) += v(i); i += 1 }
            n(c) += 1L
          }
          Iterator.single((s, n))
        }.treeReduce { (a, b) =>
          var c = 0
          while (c < a._1.length) {
            val (x, y) = (a._1(c), b._1(c))
            var i = 0
            while (i < dim) { x(i) += y(i); i += 1 }
            a._2(c) += b._2(c)
            c += 1
          }
          a
        }
        bc.destroy()
        centers = centers.indices.map { c =>
          if (counts(c) == 0L) centers(c)
          else {
            val m = sums(c)
            var i = 0
            while (i < dim) { m(i) /= counts(c); i += 1 }
            m
          }
        }.toArray
        it += 1
      }
      centers
    } finally cached.unpersist(blocking = false)
  }

  /** Nearest-center assignment: (idCol, cluster, dist) with `dist` the
    * euclidean distance (sqrt — DuckDB `list_distance` convention). Ties
    * resolve to the lowest cluster id. Lazy map over the input — safe to
    * call on a different frame than the one the centers were fit on. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centers: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centers)
    vecsOf(df, idCol, vecCol).map { case (id, v) =>
      val c = Similarity.nearestCenter(v, bc.value)
      val ctr = bc.value(c)
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - ctr(i); d += t * t; i += 1 }
      (id, c, math.sqrt(d))
    }.toDF(idCol, "cluster", "dist")
  }

  /** Fit + assign in one call. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int): (DataFrame, Array[Array[Double]]) = {
    val centers = kmeansFit(df, idCol, vecCol, k, iters)
    (assign(df, idCol, vecCol, centers), centers)
  }

  /** Coverage sampling: ONE representative per k-means cell — the
    * medoid-style pick (row nearest its centroid, ties → lowest id) that
    * turns clustering into a diversity-preserving subset: k docs that
    * SPAN the embedding space instead of k random docs that oversample
    * its dense core. The eval-set / seed-set construction primitive
    * (cluster-then-pick is the scalable stand-in for greedy k-center,
    * whose sequential argmax doesn't distribute).
    *
    * Selection is one hash aggregate — `min(struct(dist, id))` per
    * cluster with map-side combine — not a per-cluster window, so a
    * popular cell never concentrates on one task. Output:
    * (idCol, cluster, dist), one row per non-empty cell. `iters = 0`
    * keeps the deterministic lowest-id init as the centers, which is the
    * SQL-replayable configuration the oracle uses; production callers
    * run a few Lloyd rounds for tighter cells. */
  def coverageSample(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     iters: Int = 5,
                     initCenters: Option[Array[Array[Double]]] = None)
      : DataFrame =
      graft.util.Errors.context("coverageSample", Seq(idCol, vecCol)) {
    val centers = kmeansFit(df, idCol, vecCol, k, iters, initCenters)
    val assigned = assign(df, idCol, vecCol, centers)
    assigned
      .groupBy("cluster")
      .agg(min(struct(col("dist"), col(idCol).as("__id"))).as("__m"))
      .select(col("__m.__id").as(idCol), col("cluster"),
        col("__m.dist").as("dist"))
  }

  /** Element-wise MEAN of the vectors in each group — the chunk→document
    * embedding rollup (documents are embedded chunk-by-chunk; retrieval
    * and SemDeDup often want one vector per document), and equally the
    * per-cluster centroid readout. `aggregateByKey` with MAP-SIDE partial
    * sums: what crosses the wire is one (sum, n) partial per group per
    * partition, not the vectors themselves — a typed
    * groupByKey.mapGroups would shuffle the full dataset. Output
    * `(group, vec, n)`; groups with inconsistent dimensions fail fast
    * rather than silently truncating. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // aggregateByKey's seqOp doesn't see the key — the message names the
    // dims, which is enough to find the offending group
    def mism(a: Int, b: Int) = require(a == b,
      s"meanPool: a group mixes dims $a and $b")
    Similarity.requireIntegralId(df, groupCol, "meanPool")
    df.na.drop(Seq(groupCol, vecCol))
      .select(col(groupCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .rdd
      .aggregateByKey((null: Array[Double], 0L))(
        { case ((s, n), v) =>
          if (s == null) (v.clone(), 1L)
          else {
            mism(s.length, v.length)
            var i = 0
            while (i < v.length) { s(i) += v(i); i += 1 }
            (s, n + 1L)
          }
        },
        { case ((a, na), (b, nb)) =>
          if (a == null) (b, nb)
          else if (b == null) (a, na)
          else {
            mism(a.length, b.length)
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            (a, na + nb)
          }
        })
      .map { case (g, (s, n)) =>
        var i = 0
        while (i < s.length) { s(i) /= n; i += 1 }
        (g, s, n)
      }.toDF(groupCol, "vec", "n")
  }

  /** The `probes` nearest center indices (ascending distance, ties to the
    * lower index) — the multi-probe analog of [[Similarity.nearestCenter]]. */
  private[pipeline] def nearestCenters(v: Array[Double],
                                       cs: Array[Array[Double]],
                                       probes: Int): Array[Int] = {
    val d = new Array[Double](cs.length)
    var c = 0
    while (c < cs.length) {
      val ctr = cs(c)
      var s = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - ctr(i); s += t * t; i += 1 }
      d(c) = s
      c += 1
    }
    cs.indices.toArray.sortBy(i => (d(i), i)).take(math.min(probes, cs.length))
  }

  /** SemDeDup: semantic near-duplicate PAIRS (id_a < id_b, cosine ≥
    * `threshold`) found by exact all-pairs comparison WITHIN k-means
    * clusters only — the clustering bounds the quadratic term to
    * Σ_c |cluster_c|², the whole point of the construction at corpus
    * scale (k chosen so n/k is a few thousands). Cross-cluster near-dups
    * are missed by design; `probes` > 1 re-buckets every vector into its
    * top-p clusters (the IVF nProbe idea applied to dedup) — pairs
    * straddling a cluster boundary meet in one of the shared probes, at
    * `probes`× the bucketed volume. RecallSpec measures both settings
    * against the exact all-pairs baseline. Output layout matches the
    * other dedup passes (minhash/simhash/embedding LSH) so the same
    * victim-selection and connected-components machinery applies
    * downstream. `maxCluster` caps the per-cluster posting list like the
    * LSH buckets: an over-cap cluster (degenerate mass) is skipped rather
    * than OOMing an executor — raise k instead. */
  /** Cluster-count selector for [[semDedup]]: enough clusters that the
    * EXPECTED cluster holds ~`targetClusterSize` vectors
    * (`k = ceil(n / targetClusterSize)`, floored at `minK`). SemDeDup's
    * within-cluster comparison is exact all-pairs, so pair mass is
    * ~`probes·n²/k` — a FIXED k makes the operator quadratic in corpus
    * size (the sf10d campaign finding: k=8 over 200k vectors = 10
    * BILLION cosine evaluations in 16 tasks, a stalled bench row),
    * while k tracking n keeps it at `probes·n·targetClusterSize`,
    * linear. Same sizing-rule shape as
    * [[graft.pipeline.Dedup.lshBitsFor]]; recall shifts with k (smaller
    * cells split more true pairs across boundaries — compensate with
    * `probes`, RecallSpec measures the curve). */
  def kFor(n: Long, targetClusterSize: Int = 1000, minK: Int = 8): Int = {
    require(targetClusterSize >= 1,
      s"targetClusterSize must be >= 1, got $targetClusterSize")
    require(minK >= 1, s"minK must be >= 1, got $minK")
    math.max(minK,
      math.ceil(n.toDouble / targetClusterSize).toInt)
  }

  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
               threshold: Double, iters: Int = 2, probes: Int = 1,
               maxCluster: Int = 1 << 20): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "semDedup")
    require(probes >= 1, s"semDedup needs probes >= 1, got $probes")
    val spark = df.sparkSession
    import spark.implicits._
    // empty corpus: no clusters to fit and no pairs to emit — return the
    // empty pair frame instead of tripping kmeansFit's empty-input guard
    // (dedup passes compose into pipelines that may legitimately see
    // zero-row slices)
    if (df.na.drop(Seq(idCol, vecCol)).isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "cos")
    val centers = kmeansFit(df, idCol, vecCol, k, iters)
    val bc = spark.sparkContext.broadcast(centers)
    val skipAcc = graft.util.SkipMetrics.counter(
      "semDedup.skippedClusters", spark)
    vecsOf(df, idCol, vecCol).flatMap { case (id, v) =>
      var n = 0.0
      var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      nearestCenters(v, bc.value, probes).iterator.map(c => (c, id, v, n))
    }.groupByKey(_._1).flatMapGroups { (_, it) =>
      val limit = if (maxCluster == Int.MaxValue) Int.MaxValue else maxCluster + 1
      val rows = it.take(limit).toArray.sortBy(_._2)
      if (rows.length > maxCluster) { skipAcc.add(1L); Iterator.empty }
      else {
        val out = Array.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < rows.length) {
          val (_, ida, va, na) = rows(i)
          var j = i + 1
          while (j < rows.length) {
            val (_, idb, vb, nb) = rows(j)
            var dot = 0.0
            var x = 0
            while (x < va.length) { dot += va(x) * vb(x); x += 1 }
            val cos = dot / math.sqrt(na * nb)
            if (cos >= threshold) out += ((ida, idb, cos))
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }
    } match {
      // multi-probe: a pair sharing several probed clusters is emitted
      // once per shared cluster — dedup (identical rows, one shuffle);
      // single-probe buckets are disjoint, skip the exchange
      case ds if probes > 1 => ds.toDF("id_a", "id_b", "cos").distinct()
      case ds => ds.toDF("id_a", "id_b", "cos")
    }
  }
}
