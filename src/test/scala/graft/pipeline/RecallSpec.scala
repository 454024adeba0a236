package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured recall/error harness for the approximate tiers, asserted
  * against their EXACT in-repo counterparts (the approximation-aware
  * oracle style of reference tests/handyspark/sql/test_dataframe.py:
  * 101-106, 154-167). Each test derives its acceptance bound from the
  * algorithm's published guarantee (LSH S-curve / hyperplane collision
  * probability / GK rank error / HLL rsd) rather than a magic constant,
  * and prints the measured value so NOTES.md can record it. */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

  test("minhash candidate recall meets the S-curve prediction vs exact jaccard") {
    // ground truth: EXACT all-pairs n-gram jaccard at the bench threshold
    val truth = Dedup.ngramJaccard(docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(truth.nonEmpty, "no exact pairs >= 0.7 — corpus unusable for recall")

    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 63, bands = 21)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = truth.keySet.count(cands.contains)
    val recall = caught.toDouble / truth.size

    // S-curve: P(candidate | j) = 1 − (1 − j^r)^b with r=3, b=21; the
    // statistical floor is mean(p) − 3·sqrt(Σ p(1−p))/n over truth pairs
    val ps = truth.values.map(j => 1.0 - math.pow(1.0 - math.pow(j, 3), 21))
    val mean = ps.sum / ps.size
    val sigma = math.sqrt(ps.map(p => p * (1 - p)).sum) / ps.size
    val floor = mean - 3 * sigma
    info(f"minhash candidate recall = $recall%.4f over ${truth.size} exact " +
      f"pairs (S-curve prediction $mean%.4f, floor $floor%.4f)")
    assert(recall >= floor,
      f"recall $recall%.4f below S-curve floor $floor%.4f")

    // end-to-end minhashDedup = candidates ∩ exact-verify: recall carries
    // through, and NO false positives survive the exact verify
    val e2e = Dedup.minhashDedup(docs, "doc_id", "text", 3, 63, 21, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e2e.subsetOf(truth.keySet), "verified pair not in exact truth")
    assert(e2e.size == caught, "exact verify changed the caught-pair count")
  }

  test("embeddingDedup recall meets the hyperplane collision prediction") {
    val threshold = 0.4 // the bench threshold (q_embedding_dedup_lsh)
    val truth = Similarity.allPairsCosine(embs, "vec_id", "embedding", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(truth.nonEmpty)

    val got = Dedup.embeddingDedup(embs, "vec_id", "embedding", dim = 64,
      threshold = threshold, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth.keySet), "LSH pair not in exact truth (exact " +
      "within-bucket cosine should never emit a false positive)")
    val recall = got.size.toDouble / truth.size

    // random-hyperplane LSH: P(same bucket | cos) = (1 − arccos(cos)/π)^bits
    val ps = truth.values.map(c => math.pow(1.0 - math.acos(c) / math.Pi, 4))
    val mean = ps.sum / ps.size
    val sigma = math.sqrt(ps.map(p => p * (1 - p)).sum) / ps.size
    val floor = math.max(0.0, mean - 3 * sigma)
    info(f"embeddingDedup recall = $recall%.4f over ${truth.size} exact " +
      f"pairs (collision prediction $mean%.4f, floor $floor%.4f)")
    assert(recall >= floor,
      f"recall $recall%.4f below collision-model floor $floor%.4f")

    // tables=4 — the BENCHED configuration (q_embedding_dedup_lsh_mt):
    // per-pair catch probability 1 − (1 − p^4)^4
    val got4 = Dedup.embeddingDedup(embs, "vec_id", "embedding", dim = 64,
      threshold = threshold, bits = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got4.subsetOf(truth.keySet))
    val recall4 = got4.size.toDouble / truth.size
    val ps4 = truth.values.map { c =>
      val p1 = math.pow(1.0 - math.acos(c) / math.Pi, 4)
      1.0 - math.pow(1.0 - p1, 4)
    }
    val mean4 = ps4.sum / ps4.size
    val floor4 = math.max(0.0, mean4 - 3 * math.sqrt(ps4.map(p => p * (1 - p)).sum) / ps4.size)
    info(f"embeddingDedup 4-table recall = $recall4%.4f (prediction " +
      f"$mean4%.4f, floor $floor4%.4f)")
    assert(recall4 >= floor4)
    assert(recall4 > recall, "4-table recall did not improve on single-table")

    // multi-table tier: 8 independent 4-bit tables → per-pair catch
    // probability 1 − (1 − p^4)^8; recall must rise accordingly
    val got8 = Dedup.embeddingDedup(embs, "vec_id", "embedding", dim = 64,
      threshold = threshold, bits = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got8.subsetOf(truth.keySet))
    val recall8 = got8.size.toDouble / truth.size
    val ps8 = truth.values.map { c =>
      val p1 = math.pow(1.0 - math.acos(c) / math.Pi, 4)
      1.0 - math.pow(1.0 - p1, 8)
    }
    val mean8 = ps8.sum / ps8.size
    val floor8 = math.max(0.0, mean8 - 3 * math.sqrt(ps8.map(p => p * (1 - p)).sum) / ps8.size)
    info(f"embeddingDedup 8-table recall = $recall8%.4f (prediction " +
      f"$mean8%.4f, floor $floor8%.4f)")
    assert(recall8 >= floor8)
    assert(recall8 > recall, "multi-table recall did not improve on single-table")
  }

  test("embeddingDedupAgainst recall meets the 4-table collision prediction") {
    val threshold = 0.4
    // cross-side truth: exact batch x corpus pairs at the q_near_new split
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val bv = batch.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cv = corpus.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = (for { (bi, bvec) <- bv.toSeq; (ci, cvec) <- cv.toSeq
      c = cos(bvec, cvec) if c >= threshold } yield (bi, ci) -> c).toMap
    assert(truth.nonEmpty)
    val got = Dedup.embeddingDedupAgainst(batch, corpus, "vec_id",
      "embedding", dim = 64, threshold = threshold, bits = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth.keySet), "screen pair not in exact truth")
    val recall = got.size.toDouble / truth.size
    val ps = truth.values.map { c =>
      val p1 = math.pow(1.0 - math.acos(c) / math.Pi, 4)
      1.0 - math.pow(1.0 - p1, 4)
    }
    val mean = ps.sum / ps.size
    val floor = math.max(0.0,
      mean - 3 * math.sqrt(ps.map(p => p * (1 - p)).sum) / ps.size)
    info(f"embeddingDedupAgainst 4-table recall = $recall%.4f over " +
      f"${truth.size} exact cross pairs (prediction $mean%.4f, floor $floor%.4f)")
    assert(recall >= floor)
  }

  test("semDedup: no false positives; recall = co-clustered exact pairs") {
    val threshold = 0.4
    val truth = Similarity.allPairsCosine(embs, "vec_id", "embedding", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val got = Clustering.semDedup(embs, "vec_id", "embedding", k = 8,
        threshold = threshold, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // within-cluster comparison is EXACT cosine: false positives impossible
    assert(got.subsetOf(truth),
      "semDedup pair not in the exact all-pairs truth")
    val recall = got.size.toDouble / truth.size
    info(f"semDedup recall = $recall%.4f over ${truth.size} exact pairs " +
      f"(missed pairs straddle cluster boundaries at this moderate " +
      f"threshold — the multi-probe tier below is the recall knob)")
    assert(recall > 0.0, "semDedup found nothing — clustering collapsed")

    // multi-probe: each vector lands in its top-2 clusters, so boundary
    // pairs meet in a shared probe — recall must improve materially
    val got2 = Clustering.semDedup(embs, "vec_id", "embedding", k = 8,
        threshold = threshold, iters = 2, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2.subsetOf(truth))
    assert(got.subsetOf(got2),
      "probes=2 must be a superset of probes=1 (same clusters probed first)")
    val recall2 = got2.size.toDouble / truth.size
    info(f"semDedup 2-probe recall = $recall2%.4f")
    assert(recall2 > recall, "multi-probe did not improve recall")
    assert(recall2 >= 0.5,
      f"semDedup 2-probe recall $recall2%.4f too low at k=8")
  }

  test("percentileApprox honors the GK rank-error contract vs exact ranks") {
    val c = "l_extendedprice"
    val eps = 0.01 // precision 0.01 → accuracy 100 → rank error ≤ n/100
    val n = lineitem.filter(col(c).isNotNull).count().toDouble
    val approx = graft.agg.Stats.percentileApprox(lineitem, Seq(c),
      Seq(0.25, 0.5, 0.75), precision = eps).head()
    for (((p, i)) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val v = approx.getDouble(i)
      val below = lineitem.filter(col(c) <= v).count() / n
      val strictlyBelow = lineitem.filter(col(c) < v).count() / n
      info(f"p=$p approx=$v%.2f rank window [$strictlyBelow%.4f, $below%.4f]")
      assert(below >= p - eps - 1e-9,
        f"p=$p: only $below%.4f of rows <= approx value (rank too low)")
      assert(strictlyBelow <= p + eps + 1e-9,
        f"p=$p: $strictlyBelow%.4f of rows < approx value (rank too high)")
    }
  }

  test("nunique (HLL++) stays within 3×rsd of the exact distinct counts") {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val rsd = 0.05
    val approx = graft.agg.Stats.nunique(lineitem, cols, rsd).head()
    val exact = graft.agg.Stats.nuniqueExact(lineitem, cols).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      val a = approx.getLong(i).toDouble
      val e = exact.getLong(i).toDouble
      val rel = math.abs(a - e) / e
      info(f"$c: approx ${a.toLong} exact ${e.toLong} rel-err $rel%.4f")
      assert(rel <= 3 * rsd, f"$c: HLL rel-err $rel%.4f exceeds 3×rsd")
    }
  }
}
