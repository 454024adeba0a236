package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact cosine against one query vector — a pure
  *    map + TakeOrderedAndProject; the correctness baseline.
  *  - `topKJoin`: exact top-k for MANY queries — bounded by a window over
  *    the (queries × corpus) join; right only for small query sets.
  *  - `ivfTopK`: IVF-style two-stage search — coarse centroids from
  *    ml.KMeans, probe the nearest `nProbe` cells only; at 100 TB this
  *    turns a full corpus scan per query into a scan of ~nProbe/nCells of
  *    the data, with the centroid table broadcast.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** The typed scale paths key on long ids; fail loudly on non-integral id
    * columns instead of silently null-casting them. */
  private[pipeline] def requireIntegralId(df: DataFrame, idCol: String,
                                          op: String): Unit = {
    val tn = df.schema(idCol).dataType.typeName
    require(Set("byte", "short", "integer", "long").contains(tn),
      s"$op requires an integral id column; got $tn for '$idCol'")
  }

  /** The batch query paths collect the QUERY side to the driver and
    * broadcast it — correct only under the "bounded query set" contract.
    * Same hard guard as [[allPairsCosine]]'s maxRows: a
    * `limit(max+1).count()` probe (partial scan, short-circuits) BEFORE
    * any collect, so pointing the query arg at a corpus-sized table
    * refuses loudly instead of OOMing the driver. */
  private def requireBoundedQueries(queries: DataFrame, maxQueries: Int,
                                    op: String): Unit = {
    require(maxQueries >= 1, s"$op requires maxQueries >= 1, got $maxQueries")
    // saturate: max + 1 overflows when a caller passes Int.MaxValue to
    // deliberately disable the guard
    val probeLimit = if (maxQueries == Int.MaxValue) maxQueries else maxQueries + 1
    val probe = queries.limit(probeLimit).count()
    require(probe <= maxQueries,
      s"$op collects and broadcasts the query side and refuses query sets " +
        s"above maxQueries=$maxQueries rows; this input has more. Batch the " +
        s"queries, or raise maxQueries deliberately.")
  }

  /** Exact cosine top-k neighbors of one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Double], k: Int): DataFrame = {
    val q = array(query.toIndexedSeq.map(lit): _*)
    val v = asDouble(col(vecCol))
    df.select(col(idCol),
        Dedup.cosinePre(v, q, Dedup.sqNorm(v),
          lit(query.map(x => x * x).sum)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Exact top-k for a set of query rows. The queries are broadcast as
    * primitive arrays; each corpus partition scores them in a tight JVM
    * loop and keeps a bounded per-query heap, so only #partitions × Q × k
    * candidate rows reach the final window — the scored corpus × Q stream
    * itself is never shuffled (the previous window-over-cross-join
    * formulation shuffled every scored row). Dot products sum sequentially
    * ascending — bit-identical to the HOF/DuckDB formulation. */
  def topKJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int, dim: Int = -1,
               maxQueries: Int = 100000): DataFrame = {
    require(k >= 1, s"topKJoin requires k >= 1, got $k")
    Similarity.requireIntegralId(corpus, idCol, "topKJoin")
    requireBoundedQueries(queries, maxQueries, "topKJoin")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qs = queries.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
      .map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i) * v(i); i += 1 }
        (id, v, n)
      }
    val bc = spark.sparkContext.broadcast(qs)
    // head of the heap = WORST kept candidate (lowest cos, then largest id)
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val candidates = corpus
      .select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val queries = bc.value
        val heaps = Array.fill(queries.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        rows.foreach { case (cid, v) =>
          var na = 0.0
          var i = 0
          while (i < v.length) { na += v(i) * v(i); i += 1 }
          var qi = 0
          while (qi < queries.length) {
            val (qid, qv, qn) = queries(qi)
            if (cid != qid) {
              var dot = 0.0
              var j = 0
              while (j < v.length) { dot += v(j) * qv(j); j += 1 }
              val cand = (dot / math.sqrt(na * qn), cid)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(cand)
              else if (worstFirst.compare(cand, h.head) < 0) {
                h.dequeue(); h.enqueue(cand)
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => (queries(qi)._1, cid, cos) }
        }
      }
      .toDF("query_id", "corpus_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("corpus_id"))
    candidates.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "corpus_id", "cos", "rn")
  }

  /** Exact all-pairs cosine above a threshold — the brute-force baseline
    * for near-dup mining. One side is broadcast as primitive double
    * arrays; each partition runs a tight JVM loop (no boxed HOF
    * evaluation — measured ~10× faster than the zip_with crossJoin at
    * 12.5M pairs). Summation order is sequential ascending, so cosines
    * are bit-identical to the HOF/DuckDB formulation. O(n²)·dim compute:
    * this is deliberately the SMALL-corpus exact path; `Dedup
    * .embeddingDedup` (hyperplane LSH buckets) is the 100-TB path.
    *
    * `maxRows` is a hard guard, not advice: the corpus is collected to the
    * driver, so pointing this at a big table would OOM the driver long
    * before the O(n²) compute hurt. The bound is checked with a
    * `limit(maxRows+1).count()` probe — a partial scan that short-circuits
    * — BEFORE any collect. Callers above the bound belong on
    * `Dedup.embeddingDedup`. The 65536 default sizes the WORST allowed
    * corpus at ~2×10⁹ pair evaluations ≈ a minute on 32 threads — the
    * most an exact "small-corpus baseline" should silently accept (the
    * old 200k default let the r13 sf10d decade suite run a 2×10¹⁰-pair
    * brute row for 40+ minutes instead of refusing; at decade scale the
    * refusal IS the contract, the q_margin_mine precedent). */
  def allPairsCosine(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, maxRows: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long"),
        asDouble(col(vecCol))).as[(Long, Array[Double])]
    // saturate: maxRows + 1 overflows when a caller passes Int.MaxValue to
    // deliberately disable the guard
    val probeLimit = if (maxRows == Int.MaxValue) maxRows else maxRows + 1
    val probe = df.limit(probeLimit).count()
    if (probe > maxRows) graft.util.SkipMetrics.refuse("allPairsCosine", spark,
      s"allPairsCosine is the exact small-corpus baseline (driver collect + " +
        s"O(n^2) compute) and refuses corpora above maxRows=$maxRows rows; " +
        s"this input has more. Use Dedup.embeddingDedup (hyperplane-LSH " +
        s"buckets) for large corpora, or raise maxRows deliberately.")
    val local = vecs.collect().sortBy(_._1)
    val withNorm = local.map { case (id, v) =>
      var na = 0.0; var i = 0
      while (i < v.length) { na += v(i) * v(i); i += 1 }
      (id, v, na)
    }
    val bc = spark.sparkContext.broadcast(withNorm)
    vecs.mapPartitions { rows =>
      val all = bc.value
      rows.flatMap { case (idA, va) =>
        var naA = 0.0
        var i = 0
        while (i < va.length) { naA += va(i) * va(i); i += 1 }
        all.iterator.filter(_._1 > idA).flatMap { case (idB, vb, nb) =>
          var dot = 0.0
          var j = 0
          while (j < va.length) { dot += va(j) * vb(j); j += 1 }
          val cos = dot / math.sqrt(naA * nb)
          if (cos >= threshold) Some((idA, idB, cos)) else None
        }
      }
    }.toDF("id_a", "id_b", "cos")
  }

  /** Cosine-similarity histogram of A×B pairs — the embedding DRIFT
    * diagnostic: how does a corpus slice sit, geometrically, against a
    * reference sample? Two snapshots of the same corpus should produce
    * near-identical histograms; a new source, a changed encoder, or an
    * encoding bug shifts the mass visibly. The companion of
    * [[graft.agg.Stats.psi]] (numeric features) and
    * [[LanguageModel.tokenJsDivergence]] (token distributions) for the
    * embedding column.
    *
    * `b` is the REFERENCE side and must be bounded (`maxRef` guard —
    * probe + refuse, the [[allPairsCosine]] contract): it broadcasts,
    * and each A-row scores against all of it. `a` streams at ANY scale:
    * the plan is scan → broadcast-nested-loop → per-pair bin projection
    * → bins-bounded hash aggregate, so partial aggregation collapses
    * every partition to ≤ `bins` rows before the only shuffle. Pairs
    * with a shared id are NOT excluded — for self-drift (a vs a sample
    * of itself) the |B| self-pairs land in the top bin; subtract them
    * or sample disjoint slices. The cosine is rounded to 6 decimals
    * BEFORE binning so the bin edges are engine-replayable. Output:
    * one row per bin b ∈ [0, bins): (bin, lo, hi, n) — empty bins
    * present with n = 0, edges lo/hi spanning [−1, 1]. */
  def cosineHistogram(a: DataFrame, idColA: String, vecColA: String,
                      b: DataFrame, idColB: String, vecColB: String,
                      bins: Int = 20, maxRef: Int = 10000): DataFrame = {
    require(bins >= 1, s"cosineHistogram needs bins >= 1, got $bins")
    val spark = a.sparkSession
    val probeLimit = if (maxRef == Int.MaxValue) maxRef else maxRef + 1
    val refProbe = b.na.drop(Seq(idColB, vecColB)).limit(probeLimit).count()
    require(refProbe <= maxRef,
      s"cosineHistogram broadcasts the reference side and refuses " +
        s"references above maxRef=$maxRef rows; this reference has more. " +
        s"Sample it first (Sampling.hashSample) or raise maxRef " +
        s"deliberately.")
    val ca = a.na.drop(Seq(idColA, vecColA))
      .select(col(vecColA).cast("array<double>").as("__va"))
      .withColumn("__na", Dedup.sqNorm(col("__va")))
    val cb = b.na.drop(Seq(idColB, vecColB))
      .select(col(vecColB).cast("array<double>").as("__vb"))
      .withColumn("__nb", Dedup.sqNorm(col("__vb")))
    val cos = round(Dedup.cosinePre(col("__va"), col("__vb"),
      col("__na"), col("__nb")), 6)
    val counts = ca.crossJoin(broadcast(cb))
      .select(least(floor((cos + 1.0) / 2.0 * bins), lit(bins - 1))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("__n"))
    spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(-1.0) + lit(2.0) * col("bin") / bins).as("lo"),
        (lit(-1.0) + lit(2.0) * (col("bin") + 1) / bins).as("hi"),
        coalesce(col("__n"), lit(0L)).as("n"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — greedy diversity for a retrieval candidate set: at each
    * step pick the candidate maximizing
    *
    *   mmr(d) = λ·rel(d) − (1−λ)·max_{s ∈ selected} cos(d, s)
    *
    * (first pick: pure relevance — the subtracted term is empty). The
    * result trades relevance against redundancy: λ = 1 is the raw
    * ranking, λ → 0 maximizes spread. Ties break on the doc id, so
    * the selection is fully deterministic.
    *
    * Scale shape: candidates are already per-query bounded (an ANN /
    * BM25 top-N), so the greedy runs INSIDE one `flatMapGroups` over
    * the query key — each query's O(k·N) loop is local to its group,
    * queries parallelize across the cluster, and nothing global moves.
    * `maxCandidates` bounds the per-group buffer (refuse, don't spill
    * — a "candidate set" of a million rows means the upstream cut is
    * missing). Output: (queryCol, docCol, relCol, mmr_score, mmr_rank)
    * for the top `k` per query. */
  def mmrRerank(candidates: DataFrame, queryCol: String, docCol: String,
                relCol: String, vecCol: String, k: Int,
                lambda: Double = 0.7,
                maxCandidates: Int = 10000): DataFrame = {
    require(k >= 1, s"mmrRerank needs k >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val base = candidates.na.drop(Seq(queryCol, docCol, relCol, vecCol))
      .select(col(queryCol).cast("long").as("__q"),
        col(docCol).cast("long").as("__d"),
        col(relCol).cast("double").as("__rel"),
        col(vecCol).cast("array<double>").as("__v"))
      .as[(Long, Long, Double, Array[Double])]
    base.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cand = it.toArray
        require(cand.length <= maxCandidates,
          s"mmrRerank: query $q has ${cand.length} candidates " +
            s"(> maxCandidates=$maxCandidates) — cut the candidate set " +
            s"upstream (ANN top-N) before re-ranking")
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
            i += 1
          }
          dot / math.sqrt(na * nb)
        }
        val selected = Array.newBuilder[(Long, Long, Double, Double, Int)]
        val used = new Array[Boolean](cand.length)
        // maxSim(i) = max cosine of candidate i to the selected set,
        // maintained incrementally: O(k·N) cosines per query
        val maxSim = Array.fill(cand.length)(Double.NegativeInfinity)
        var step = 0
        val steps = math.min(k, cand.length)
        while (step < steps) {
          var bi = -1
          var bScore = Double.NegativeInfinity
          var bDoc = Long.MaxValue
          var i = 0
          while (i < cand.length) {
            if (!used(i)) {
              val pen = if (step == 0) 0.0
                else (1.0 - lambda) * maxSim(i)
              val s = lambda * cand(i)._3 - pen
              if (s > bScore || (s == bScore && cand(i)._2 < bDoc)) {
                bi = i; bScore = s; bDoc = cand(i)._2
              }
            }
            i += 1
          }
          used(bi) = true
          selected += ((q, cand(bi)._2, cand(bi)._3, bScore, step + 1))
          var j = 0
          while (j < cand.length) {
            if (!used(j)) {
              val c = cos(cand(j)._4, cand(bi)._4)
              if (c > maxSim(j)) maxSim(j) = c
            }
            j += 1
          }
          step += 1
        }
        selected.result().iterator
      }
      .toDF("__q", "__d", "__rel", "mmr_score", "mmr_rank")
      .select(col("__q").as(queryCol), col("__d").as(docCol),
        col("__rel").as(relCol), col("mmr_score"), col("mmr_rank"))
  }

  /** Margin-based best-match mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix bitext-mining criterion): for every A-row, the
    * B-row maximizing
    *
    *   margin(x, y) = cos(x, y) / ((nnₖ(x) + nnₖ(y)) / 2)
    *
    * where nnₖ(x) is the mean cosine of x's k nearest B-neighbors and
    * nnₖ(y) the mean of y's k nearest A-neighbors. The ratio discounts
    * HUB vectors (high cosine to everything): a raw-cosine top-1 pairs
    * half the corpus to the same few hubs; the margin demands the pair
    * stand out against BOTH sides' local neighborhoods. Margin > 1 ⇒
    * closer than the average of their neighborhoods — the usual mining
    * threshold is 1.04-1.06.
    *
    * This is the EXACT (brute-force) baseline, guarded like
    * [[allPairsCosine]]: both sides must fit `maxRows` (the pair frame
    * is |A|·|B|). At corpus scale, shard A and mine against an IVF-
    * restricted B candidate set, then feed the candidate pairs here.
    * Output: (id_a, id_b, cos, margin) — one row per A-row with a
    * non-degenerate neighborhood (nn means summing to 0 yield null
    * margin and are dropped). */
  def marginMatches(a: DataFrame, idColA: String, vecColA: String,
                    b: DataFrame, idColB: String, vecColB: String,
                    k: Int = 4, maxRows: Int = 100000): DataFrame = {
    require(k >= 1, s"marginMatches needs k >= 1, got $k")
    def guard(df: DataFrame, side: String): DataFrame = {
      val clean = df.na.drop(Seq(
        if (side == "A") idColA else idColB,
        if (side == "A") vecColA else vecColB))
      val probeLimit = if (maxRows == Int.MaxValue) maxRows else maxRows + 1
      if (clean.limit(probeLimit).count() > maxRows)
        graft.util.SkipMetrics.refuse("marginMatches", df.sparkSession,
          s"marginMatches is the exact brute-force miner (|A|x|B| pair " +
            s"frame) and refuses side $side above maxRows=$maxRows rows; " +
            s"restrict candidates with an IVF/LSH pass first, or raise " +
            s"maxRows deliberately.")
      clean
    }
    val ca = guard(a, "A").select(col(idColA).cast("long").as("id_a"),
        col(vecColA).cast("array<double>").as("__va"))
      .withColumn("__na", Dedup.sqNorm(col("__va")))
    val cb = guard(b, "B").select(col(idColB).cast("long").as("id_b"),
        col(vecColB).cast("array<double>").as("__vb"))
      .withColumn("__nb", Dedup.sqNorm(col("__vb")))
    val pairs = ca.crossJoin(broadcast(cb))
      .select(col("id_a"), col("id_b"),
        Dedup.cosinePre(col("__va"), col("__vb"), col("__na"), col("__nb"))
          .as("cos"))
    val wa = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    val wb = Window.partitionBy("id_b").orderBy(col("cos").desc, col("id_a"))
    val nnx = pairs.withColumn("__r", row_number().over(wa))
      .filter(col("__r") <= k)
      .groupBy("id_a").agg(avg("cos").as("__nnx"))
    val nny = pairs.withColumn("__r", row_number().over(wb))
      .filter(col("__r") <= k)
      .groupBy("id_b").agg(avg("cos").as("__nny"))
    val wBest = Window.partitionBy("id_a")
      .orderBy(col("margin").desc, col("id_b"))
    pairs.join(broadcast(nnx), "id_a").join(broadcast(nny), "id_b")
      .withColumn("margin", col("cos") /
        nullif((col("__nnx") + col("__nny")) / 2.0, lit(0.0)))
      .na.drop(Seq("margin"))
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select("id_a", "id_b", "cos", "margin")
  }

  /** IVF index: coarse-quantizer cells for every corpus vector.
    *
    * The quantizer is trained on a BOUNDED deterministic sample (first
    * ~64·nCells vectors by hashed id) with a local JIT'd Lloyd loop, then
    * broadcast; the corpus pass is one typed map assigning each vector to
    * its nearest center. This is the standard IVF construction at scale —
    * a distributed KMeans over the full corpus would burn several full
    * scans (init + per-iteration jobs) to fit centers whose only job is to
    * partition the space roughly evenly. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                nCells: Int, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    requireIntegralId(df, idCol, "ivfAssign")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Array[Double])]
    val sampleN = math.max(nCells * 64, 1024)
    val sample = vecs
      .map { case (id, v) =>
        (java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L), v)
      }
      .orderBy(col("_1")).limit(sampleN) // TakeOrdered: no full-sort shuffle
      .collect().map(_._2)
    val centers = localKMeans(sample, nCells, iters = 10, seed)
    val bc = spark.sparkContext.broadcast(centers)
    val assigned = vecs.map { case (id, v) =>
      (id, v, Similarity.nearestCenter(v, bc.value))
    }.toDF(idCol, "v", "cell")
    (assigned, centers)
  }

  private[pipeline] def nearestCenter(v: Array[Double],
                                      cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val ctr = cs(c)
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic local Lloyd iterations over a sample (seeded farthest-
    * point-ish init: evenly spaced picks from the hashed-id-ordered
    * sample). */
  private[pipeline] def localKMeans(sample: Array[Array[Double]], k: Int,
                                    iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty sample for IVF quantizer")
    val n = sample.length
    val dim = sample(0).length
    var centers = Array.tabulate(math.min(k, n))(i => sample(i * n / math.min(k, n)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Int](centers.length)
      var s = 0
      while (s < n) {
        val v = sample(s)
        val c = nearestCenter(v, centers)
        val acc = sums(c)
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
        counts(c) += 1
        s += 1
      }
      centers = centers.indices.map { c =>
        if (counts(c) == 0) centers(c)
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
  }

  /** Multi-query two-stage IVF search: every query is broadcast with its
    * own `nProbe` probe-cell set; one pass over the assigned corpus scores
    * each row only against the queries probing ITS cell (cell → queries
    * inverted on the executor), keeping a bounded per-query heap — the
    * batch analog of `ivfTopK` with `topKJoin`'s no-shuffle candidate
    * stream. Scan cost is Σ_q |probed cells of q| / nCells of the corpus,
    * not Q × corpus. */
  def ivfTopKMulti(assigned: DataFrame, centers: Array[Array[Double]],
                   idCol: String, queries: DataFrame, vecCol: String,
                   k: Int, nProbe: Int = 3,
                   maxQueries: Int = 100000): DataFrame = {
    require(k >= 1, s"ivfTopKMulti requires k >= 1, got $k")
    requireIntegralId(queries, idCol, "ivfTopKMulti")
    requireBoundedQueries(queries, maxQueries, "ivfTopKMulti")
    val spark = assigned.sparkSession
    import spark.implicits._
    val qs = queries.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
      .map { case (qid, qv) =>
        var n = 0.0
        var i = 0
        while (i < qv.length) { n += qv(i) * qv(i); i += 1 }
        val probed = centers.zipWithIndex.map { case (c, ci) =>
          var dot = 0.0; var nc = 0.0
          var j = 0
          while (j < c.length) { dot += c(j) * qv(j); nc += c(j) * c(j); j += 1 }
          (ci, dot / math.sqrt(nc * n))
        }.sortBy(-_._2).take(nProbe).map(_._1).toSet
        (qid, qv, n, probed)
      }
    val bc = spark.sparkContext.broadcast(qs)
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val candidates = assigned
      .select(col(idCol).cast("long"), col("v"), col("cell"))
      .as[(Long, Array[Double], Int)]
      .mapPartitions { rows =>
        val queries = bc.value
        // cell → indexes of the queries probing it
        val byCell = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
        queries.zipWithIndex.foreach { case ((_, _, _, probed), qi) =>
          probed.foreach(c => byCell.getOrElseUpdate(c,
            scala.collection.mutable.ArrayBuffer.empty) += qi)
        }
        val heaps = Array.fill(queries.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        rows.foreach { case (cid, v, cell) =>
          byCell.get(cell).foreach { qis =>
            var na = 0.0
            var i = 0
            while (i < v.length) { na += v(i) * v(i); i += 1 }
            qis.foreach { qi =>
              val (qid, qv, qn, _) = queries(qi)
              if (cid != qid) {
                var dot = 0.0
                var j = 0
                while (j < v.length) { dot += v(j) * qv(j); j += 1 }
                val cand = (dot / math.sqrt(na * qn), cid)
                val h = heaps(qi)
                if (h.size < k) h.enqueue(cand)
                else if (worstFirst.compare(cand, h.head) < 0) {
                  h.dequeue(); h.enqueue(cand)
                }
              }
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => (bc.value(qi)._1, cid, cos) }
        }
      }
      .toDF("query_id", "corpus_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("corpus_id"))
    candidates.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "corpus_id", "cos", "rn")
  }

  /** Two-stage IVF search: rank cells by centroid cosine, scan only the
    * top `nProbe` cells. */
  def ivfTopK(assigned: DataFrame, centers: Array[Array[Double]],
              idCol: String, query: Array[Double], k: Int,
              nProbe: Int = 3): DataFrame = {
    def cosLocal(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val probeCells = centers.zipWithIndex
      .map { case (c, i) => (i, cosLocal(c, query)) }
      .sortBy(-_._2).take(nProbe).map(_._1)
    val q = array(query.toIndexedSeq.map(lit): _*)
    assigned.filter(col("cell").isin(probeCells.toSeq: _*))
      .select(col(idCol), Dedup.cosinePre(col("v"), q,
        Dedup.sqNorm(col("v")), lit(query.map(x => x * x).sum)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  // ---- k-nearest-neighbor graph --------------------------------------------

  /** Per-candidate top-k insertion shared by both kNN tiers: a fixed
    * (nid, cos) array ordered best-first under the total order
    * (cos desc, nid asc) — k is small, so insertion beats a heap and the
    * DETERMINISTIC tie-break matches a SQL
    * `row_number() OVER (ORDER BY cos DESC, nid)` exactly. */
  private final class TopK(k: Int) {
    val nids = new Array[Long](k)
    val coss = new Array[Double](k)
    var filled = 0
    @inline private def better(c: Double, n: Long, i: Int): Boolean =
      c > coss(i) || (c == coss(i) && n < nids(i))
    def offer(n: Long, c: Double): Unit = {
      if (filled < k || better(c, n, filled - 1)) {
        var i = math.min(filled, k - 1)
        while (i > 0 && better(c, n, i - 1)) {
          nids(i) = nids(i - 1); coss(i) = coss(i - 1); i -= 1
        }
        nids(i) = n; coss(i) = c
        if (filled < k) filled += 1
      }
    }
    def emit(id: Long): Iterator[(Long, Long, Double, Int)] =
      (0 until filled).iterator.map(r => (id, nids(r), coss(r), r + 1))
  }

  /** EXACT k-nearest-neighbor graph under cosine: (id, nid, cos, rank)
    * with rank 1..k ordered (cos desc, nid asc) — the curation primitive
    * behind duplicate clustering, diversity sampling, and SemDeDup-style
    * neighborhoods. O(n²) compute against a driver-collected broadcast,
    * so it carries [[allPairsCosine]]'s maxRows guard and exists as the
    * small-corpus baseline and oracle anchor; [[knnGraph]] is the
    * LSH-bucketed scale path. */
  def knnGraphExact(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    maxRows: Int = 65536): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralId(df, idCol, "knnGraphExact")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        asDouble(col(vecCol))).as[(Long, Array[Double])]
    val probeLimit = if (maxRows == Int.MaxValue) maxRows else maxRows + 1
    if (df.limit(probeLimit).count() > maxRows)
      graft.util.SkipMetrics.refuse("knnGraphExact", spark,
        s"knnGraphExact is the exact O(n^2) baseline and refuses corpora " +
          s"above maxRows=$maxRows rows; use knnGraph (LSH) for large corpora.")
    val withNorm = vecs.collect().map { case (id, v) =>
      var n2 = 0.0; var i = 0
      while (i < v.length) { n2 += v(i) * v(i); i += 1 }
      (id, v, n2)
    }
    val bc = spark.sparkContext.broadcast(withNorm)
    val kk = k
    vecs.mapPartitions { rows =>
      val all = bc.value
      rows.flatMap { case (idA, va) =>
        var na = 0.0
        var i = 0
        while (i < va.length) { na += va(i) * va(i); i += 1 }
        val top = new TopK(kk)
        all.foreach { case (idB, vb, nb) =>
          if (idB != idA) {
            var dot = 0.0
            var j = 0
            while (j < va.length) { dot += va(j) * vb(j); j += 1 }
            top.offer(idB, dot / math.sqrt(na * nb))
          }
        }
        top.emit(idA)
      }
    }.toDF(idCol, "nid", "cos", "rank")
  }

  /** EXACT hard-negative mining for contrastive/retrieval training: each
    * row's top-`k` highest-cosine neighbors whose `labelCol` DIFFERS —
    * the near-misses a metric-learning objective needs (same-label
    * neighbors are positives; far negatives are uninformative). Output
    * (idCol, nid, cos, rank), rank 1..k over the different-label
    * population ordered (cos desc, nid asc); join labels back by id when
    * needed. Rows with a null label are dropped ("different from null"
    * is undefined). Same O(n²) broadcast shape and maxRows guard as
    * [[knnGraphExact]] — the small-corpus baseline and oracle anchor;
    * [[hardNegatives]] is the LSH scale path. */
  def hardNegativesExact(df: DataFrame, idCol: String, vecCol: String,
                         labelCol: String, k: Int,
                         maxRows: Int = 65536): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralId(df, idCol, "hardNegativesExact")
    graft.util.Errors.context("hardNegativesExact",
        Seq(idCol, vecCol, labelCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.na.drop(Seq(idCol, vecCol, labelCol))
      .select(col(idCol).cast("long"), asDouble(col(vecCol)),
        col(labelCol).cast("string"))
      .as[(Long, Array[Double], String)]
    val probeLimit = if (maxRows == Int.MaxValue) maxRows else maxRows + 1
    require(df.limit(probeLimit).count() <= maxRows,
      s"hardNegativesExact is the exact O(n^2) baseline and refuses " +
        s"corpora above maxRows=$maxRows rows; use hardNegatives (LSH).")
    val withNorm = vecs.collect().map { case (id, v, lbl) =>
      var n2 = 0.0; var i = 0
      while (i < v.length) { n2 += v(i) * v(i); i += 1 }
      (id, v, n2, lbl)
    }
    val bc = spark.sparkContext.broadcast(withNorm)
    val kk = k
    vecs.mapPartitions { rows =>
      val all = bc.value
      rows.flatMap { case (idA, va, lblA) =>
        var na = 0.0
        var i = 0
        while (i < va.length) { na += va(i) * va(i); i += 1 }
        val top = new TopK(kk)
        all.foreach { case (idB, vb, nb, lblB) =>
          if (idB != idA && lblB != lblA) {
            var dot = 0.0
            var j = 0
            while (j < va.length) { dot += va(j) * vb(j); j += 1 }
            top.offer(idB, dot / math.sqrt(na * nb))
          }
        }
        top.emit(idA).map { case (id2, nid, c, r) => (id2, nid, c, r) }
      }
    }.toDF(idCol, "nid", "cos", "rank")
  } }

  /** LSH-bucketed hard negatives — the scale path: [[knnGraph]] searched
    * at `k·oversample` depth, neighbors with the SAME label dropped, the
    * survivors re-ranked to the top `k` per row. Recall caveat beyond the
    * bucket recall: a row whose k·oversample nearest are ALL same-label
    * returns fewer than k negatives — raise `oversample` on corpora with
    * large same-label near-dup cliques. */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, dim: Int, k: Int, oversample: Int = 4,
                    bits: Int = 0, tables: Int = 4,
                    maxBucket: Int = 1 << 20): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    graft.util.Errors.context("hardNegatives", Seq(idCol, vecCol, labelCol)) {
    val clean = df.na.drop(Seq(idCol, vecCol, labelCol))
    val labels = clean.select(col(idCol).cast("long").as("__hid"),
      col(labelCol).cast("string").as("__hlbl"))
    val base = knnGraph(clean, idCol, vecCol, dim, k * oversample, bits,
      tables, maxBucket)
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("cos"), col("nid"))
    base
      .join(labels.withColumnRenamed("__hid", "__ha")
        .withColumnRenamed("__hlbl", "__la"), col(idCol) === col("__ha"))
      .join(labels.withColumnRenamed("__hid", "__hb")
        .withColumnRenamed("__hlbl", "__lb"), col("nid") === col("__hb"))
      .filter(col("__la") =!= col("__lb"))
      .select(col(idCol), col("nid"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  } }

  /** APPROXIMATE k-nearest-neighbor graph via the dedup tier's
    * deterministic hyperplane LSH: per-bucket exact top-k with the same
    * (cos desc, nid asc) order, then a per-id merge across buckets and
    * tables. Within any shared bucket the neighbor list is exact; recall
    * of the true top-k follows the multi-table S-curve
    * (1−(1−p^bits)^tables — RecallSpec's model), so raise `tables` (or
    * lower `bits`) for closer graphs. `bits = 0` sizes the signature
    * adaptively ([[Dedup.lshBitsFor]]); the [[Dedup.embeddingDedup]]
    * bits=0 cache caveat applies.
    *
    * Scale shape: one typed assignment pass per table, one shuffle on the
    * bucket key, O(bucket²) per-bucket work bounded by `maxBucket` (the
    * same skip-don't-OOM policy as the dedup tier), then ONE keyed window
    * over ≤ tables·k candidate rows per id — never over the corpus. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, dim: Int,
               k: Int, bits: Int = 0, tables: Int = 4,
               maxBucket: Int = 1 << 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralId(df, idCol, "knnGraph")
    require(bits >= 0 && bits <= 32, s"bits out of range: $bits")
    val spark = df.sparkSession
    import spark.implicits._
    val clean0 = df.na.drop(Seq(idCol, vecCol))
    val clean = if (bits == 0) clean0.cache() else clean0
    val sigBits = if (bits == 0) Dedup.lshBitsFor(clean.count()) else bits
    val tableBits = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1, tables - 1).toLong)
    require(sigBits + tableBits <= 63,
      s"table index + signature must fit a long key (bits=$sigBits tables=$tables)")
    val planes = spark.sparkContext.broadcast(
      Array.tabulate(tables)(t => Dedup.hyperplanes(sigBits, dim, t)))
    val kk = k
    val skipAcc = graft.util.SkipMetrics.counter(
      "knnGraph.skippedBuckets", spark)
    val bucketTopK = clean
      .select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val tabs = planes.value
        it.flatMap { case (id, v) =>
          var n2 = 0.0
          var i = 0
          while (i < v.length) { n2 += v(i) * v(i); i += 1 }
          tabs.iterator.zipWithIndex.map { case (ps, t) =>
            var bucket = 0L
            var b = 0
            while (b < ps.length) {
              val p = ps(b)
              var dot = 0.0
              var j = 0
              while (j < v.length) { dot += v(j) * p(j); j += 1 }
              if (dot > 0) bucket |= (1L << b)
              b += 1
            }
            ((t.toLong << sigBits) | bucket, id, v, n2)
          }
        }
      }
      .groupByKey(_._1).flatMapGroups { (_, it) =>
        val limit = if (maxBucket == Int.MaxValue) Int.MaxValue else maxBucket + 1
        val rows = it.take(limit).toArray
        if (rows.length > maxBucket) { skipAcc.add(1L); Iterator.empty }
        else rows.iterator.flatMap { case (_, id, v, n2) =>
          val top = new TopK(kk)
          rows.foreach { case (_, nid, nv, nn2) =>
            if (nid != id) {
              var dot = 0.0
              var j = 0
              while (j < v.length) { dot += v(j) * nv(j); j += 1 }
              top.offer(nid, dot / math.sqrt(n2 * nn2))
            }
          }
          top.emit(id).map { case (i2, n2id, c, _) => (i2, n2id, c) }
        }
      }
      .toDF(idCol, "nid", "cos")
      .distinct() // same pair from several tables carries an identical cos
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("cos"), col("nid"))
    bucketTopK.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
