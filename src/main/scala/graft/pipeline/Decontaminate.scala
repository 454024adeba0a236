package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and remove) training documents that
  * share word n-grams with an evaluation/benchmark set — the standard
  * guard against test-set leakage into a training corpus (the GPT-3 paper
  * removed 13-gram overlaps; n is a parameter here).
  *
  * Scale shape: the BENCHMARK side is tiny next to a training corpus
  * (thousands of eval items vs billions of documents), so its distinct
  * n-gram set is collected into a broadcast hash relation and the corpus
  * side is a map-side semi/anti join over its shingle stream — the corpus
  * never shuffles. Shingles travel as 64-bit hashes ([[Dedup.hash64]]):
  * 8-byte keys, and a false positive needs a 64-bit collision that also
  * splits across the two sides (~1e-8 per corpus-scale shingle set). An
  * exactness-critical caller can verify flagged docs with
  * [[Dedup.shingledStrings]] — the flagged set is small by construction.
  */
object Decontaminate {

  /** Distinct hashed word n-grams of the benchmark, deduped across ALL
    * benchmark rows — one tiny frame fit for broadcast. */
  private def benchGrams(benchmark: DataFrame, benchTextCol: String,
                         n: Int): DataFrame = {
    val withId = benchmark.select(col(benchTextCol))
      .withColumn("__bid", monotonically_increasing_id())
    Dedup.shingled(withId, "__bid", benchTextCol, n)
      .select(col("sh")).distinct()
  }

  /** Per-document n-gram NOVELTY of a batch against a standing corpus:
    * (id, n_grams, n_novel, novelty) where n_grams counts the doc's
    * DISTINCT word n-grams and novelty = n_novel/n_grams is the
    * fraction absent from the corpus's distinct gram set — the
    * "is this re-crawl actually new text?" curation signal that sits
    * between exact/near dedup (whole-doc granularity) and
    * decontamination (benchmark-sized reference). Novelty 1.0 = fully
    * new; ~0 = the doc is stitched from text the corpus already has
    * even if no single document near-matches it.
    *
    * Scale shape: UNLIKE [[contaminated]], the reference side here is
    * corpus-sized, so nothing broadcasts — the corpus gram set is one
    * hash aggregate on the 8-byte gram key (map-side combine collapses
    * each partition's duplicates before the shuffle) and the membership
    * test is a gram-keyed LEFT join of two co-partitioned streams, then
    * one per-doc fold. For a STANDING corpus screened repeatedly,
    * persist the distinct gram frame once (parquet, sorted by gram) and
    * append new batches' grams — the TextIndex/Bloom screen-then-append
    * amortization; this method prices the from-scratch pass. */
  def noveltyAgainst(batch: DataFrame, idCol: String, textCol: String,
                   corpus: DataFrame, corpusTextCol: String,
                   n: Int = 4): DataFrame = {
    require(n >= 1, s"noveltyAgainst: n must be >= 1, got $n")
    val corpusGrams = Dedup.shingled(
        corpus.select(col(corpusTextCol))
          .withColumn("__cid", monotonically_increasing_id()),
        "__cid", corpusTextCol, n)
      .select(col("sh")).distinct()
      .withColumn("__seen", lit(1))
    Dedup.shingled(batch, idCol, textCol, n)
      .join(corpusGrams, Seq("sh"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("__id").as(idCol), col("n_grams"), col("n_novel"),
        // one division of two exact longs — correctly rounded, so it
        // compares UNROUNDED across engines (avg_gap precedent)
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  /** (id, overlap) for every document sharing at least one word n-gram
    * with the benchmark set; `overlap` counts the distinct shared
    * n-grams. Documents with no overlap are absent. */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   benchmark: DataFrame, benchTextCol: String,
                   n: Int = 13): DataFrame =
    Dedup.shingled(docs, idCol, textCol, n)
      .join(broadcast(benchGrams(benchmark, benchTextCol, n)), Seq("sh"))
      .groupBy("__id")
      .agg(count(lit(1)).as("overlap")) // shingled dedups per doc → distinct
      .withColumnRenamed("__id", idCol)

  /** The benchmark's distinct n-gram hashes collected to a SORTED array
    * for per-row membership tests (binary search; 8 bytes per gram). A
    * benchmark set is small by contract — thousands of eval items, not a
    * corpus — and the explicit `maxGrams` bound rejects misuse before the
    * driver collects something corpus-sized. */
  def benchmarkGramSet(benchmark: DataFrame, benchTextCol: String,
                       n: Int = 13, maxGrams: Int = 50_000_000): Array[Long] = {
    val grams = benchGrams(benchmark, benchTextCol, n)
      .limit(maxGrams + 1).collect().map(_.getLong(0))
    require(grams.length <= maxGrams,
      s"benchmark has more than $maxGrams distinct $n-grams — " +
        "that is a corpus, not a benchmark; raise maxGrams explicitly " +
        "or use the join-based decontaminate")
    java.util.Arrays.sort(grams)
    grams
  }

  /** Streaming-friendly decontaminate: keep rows sharing NO n-gram with
    * the benchmark, decided per row against the broadcast sorted gram
    * array — completely stateless, so it composes with any streaming
    * query (no stateful agg, no stream-stream join, no watermark
    * requirement). Works identically on batch frames. Null text rows are
    * dropped (they cannot be checked). */
  def decontaminateStream(stream: DataFrame, textCol: String,
                          benchmark: DataFrame, benchTextCol: String,
                          n: Int = 13): DataFrame = {
    val bc = stream.sparkSession.sparkContext.broadcast(
      benchmarkGramSet(benchmark, benchTextCol, n))
    // Null is handled INSIDE the udf (returning false = drop): the
    // isNotNull conjunct below documents the semantics, but predicate
    // order is the optimizer's to choose, so the udf must not rely on it.
    val clean = udf { text: String =>
      text != null && {
        val grams = bc.value
        Dedup.shinglesOf(text, n)
          .forall(sh => java.util.Arrays.binarySearch(grams, Dedup.hash64(sh)) < 0)
      }
    }
    stream.filter(col(textCol).isNotNull && clean(col(textCol)))
  }

  /** Documents with NO n-gram overlap against the benchmark — the clean
    * training corpus. A broadcast anti-join on the benchmark's n-gram
    * set applied to the corpus shingle stream; rows whose text is null
    * are dropped (they cannot be checked). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 13): DataFrame = {
    val bad = contaminated(docs, idCol, textCol, benchmark, benchTextCol, n)
      .select(col(idCol).as("__contaminated_id"))
    // null-text rows can never be flagged by the anti-join, so drop them
    // explicitly — keeps the batch and stream variants (decontaminateStream
    // filters textCol.isNotNull) agreeing on null text
    docs.filter(col(textCol).isNotNull)
      .join(broadcast(bad), col(idCol) === col("__contaminated_id"),
        "left_anti")
  }

  /** SEMANTIC contamination: corpus rows whose embedding is within
    * `threshold` cosine of ANY benchmark embedding — the paraphrase-level
    * leak the n-gram pass can't see (a reworded eval question shares no
    * 13-gram with the original but sits next to it in embedding space).
    * Output: (idCol, max_cos) for flagged rows.
    *
    * Scale shape: benchmarks are small by nature (thousands of rows, not
    * corpus-scale) — the benchmark vectors COLLECT (guarded by
    * `maxBench`) and broadcast, and the corpus does one embarrassingly-
    * parallel typed pass computing its max cosine against them: no
    * shuffle, no join, cost = |corpus| × |bench| dot products map-side.
    * For benchmark sets beyond the bound, pre-cluster the benchmark
    * (Clustering.kmeans) and screen against centroids first. */
  def semanticContaminated(corpus: DataFrame, idCol: String, vecCol: String,
                           benchmark: DataFrame, benchVecCol: String,
                           threshold: Double,
                           maxBench: Int = 1 << 18): DataFrame = {
    Similarity.requireIntegralId(corpus, idCol, "semanticContaminated")
    val spark = corpus.sparkSession
    import spark.implicits._
    val bench = benchmark.na.drop(Seq(benchVecCol))
      .select(transform(col(benchVecCol), x => x.cast("double")))
      .limit(maxBench + 1).as[Array[Double]].collect()
    require(bench.length <= maxBench,
      s"semanticContaminated: benchmark exceeds maxBench=$maxBench rows — " +
        "screen against Clustering.kmeans centroids instead")
    // squared norms kept un-rooted: cos = dot / sqrt(na·nb) is the exact
    // fp form the oracle-green cosine operators use (Dedup.cosinePre)
    val normed = bench.map { v =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      (v, n)
    }
    val bc = spark.sparkContext.broadcast(normed)
    corpus.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        var vn = 0.0
        var i = 0
        while (i < v.length) { vn += v(i) * v(i); i += 1 }
        var best = Double.MinValue
        val bs = bc.value
        var b = 0
        while (b < bs.length) {
          val (w, wn) = bs(b)
          var dot = 0.0
          var j = 0
          while (j < v.length) { dot += v(j) * w(j); j += 1 }
          val cos = dot / math.sqrt(vn * wn)
          if (cos > best) best = cos
          b += 1
        }
        if (best >= threshold) Iterator.single((id, best)) else Iterator.empty
      }.toDF(idCol, "max_cos")
  }

  /** Corpus with semantically-contaminated rows removed (broadcast
    * anti-join on the flagged id set — same shape as [[decontaminate]]). */
  def semanticDecontaminate(corpus: DataFrame, idCol: String, vecCol: String,
                            benchmark: DataFrame, benchVecCol: String,
                            threshold: Double): DataFrame = {
    val bad = semanticContaminated(corpus, idCol, vecCol, benchmark,
      benchVecCol, threshold).select(col(idCol).as("__contaminated_id"))
    corpus.join(broadcast(bad), col(idCol) === col("__contaminated_id"),
      "left_anti")
  }
}
