package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed end-to-end curation: the standard training-data funnel
  * (length filter → exact dedup → benchmark decontamination → split)
  * built FROM the engine's own operators, with a stage-count report so a
  * pipeline run documents its own attrition. Each stage is the operator
  * a 100-TB run would use; the funnel report's counts are SQL-replayable
  * end to end (q_curation_funnel).
  */
object Curate {

  /** The curated corpus: rows of `df` that survive
    *  1. non-null id/text,
    *  2. tokenCount >= minWords,
    *  3. exact dedup (min-id survivor per distinct text),
    *  4. n-gram decontamination against `benchmark` (n=4) — benchmark
    *     members themselves are dropped (self-overlap),
    * with a `split` column (train/val/test by the id hash, so the
    * assignment is append-stable). Columns: (textCol, idCol, dup_count,
    * split). Chain the contamination-safe variant by re-splitting with
    * [[Sampling.componentSafeSplit]] when a near-dup pair stream exists.
    */
  def curated(df: DataFrame, idCol: String, textCol: String,
              benchmark: DataFrame, minWords: Int = 30,
              valFraction: Double = 0.15, testFraction: Double = 0.1,
              seed: Long = 7L, substrMinLen: Int = 0): DataFrame = {
    val input = df.na.drop(Seq(idCol, textCol))
    val minw = input.filter(
      TextAnalysis.tokenCount(col(textCol)) >= minWords)
    val deduped = Dedup.exact(minw, idCol, textCol)
    val afterSub = substrStage(deduped, idCol, textCol, minWords,
      substrMinLen)
    val clean = Decontaminate.decontaminate(afterSub, idCol, textCol,
      benchmark, textCol, n = 4)
    Sampling.trainTestSplit(clean, idCol, valFraction, testFraction, seed)
  }

  /** Optional ExactSubstr pass between dedup and decontamination
    * (`substrMinLen` > 0 enables it): cross-document repeated spans are
    * cut ([[SubstringDedup.removeRepeatedSubstrings]]) and remnants
    * falling under `minWords` drop — the Lee et al. order (dedup whole
    * docs first so the span pass only sees one copy of each text). */
  private def substrStage(deduped: DataFrame, idCol: String,
                          textCol: String, minWords: Int,
                          substrMinLen: Int): DataFrame =
    if (substrMinLen <= 0) deduped
    else SubstringDedup
      .removeRepeatedSubstrings(deduped, idCol, textCol, substrMinLen)
      .filter(TextAnalysis.tokenCount(col(textCol)) >= minWords)

  /** Text SEMANTIC near-dup pairs with NO embedding column: hashed-TF
    * vectors ([[TextAnalysis.hashEmbed]]) fed into SemDeDup's
    * cluster-then-verify ([[Clustering.semDedup]]) — bag-of-words cosine
    * near-dups at the embedding tier's cost profile. Catches the
    * reworded-boilerplate band BETWEEN minhash's shingle overlap and a
    * learned embedding's paraphrase recall, deterministically and on any
    * text corpus. `dim` trades hash-collision noise for vector width.
    * The hashEmbed frame is persisted (SemDeDup's kmeans fit is
    * multi-pass and the returned pair frame reads it once more) and left
    * cached for the result's lifetime — clear it once the pairs are
    * consumed (`spark.catalog.clearCache()` or unpersist upstream). */
  def semDedupText(df: DataFrame, idCol: String, textCol: String,
                   k: Int, threshold: Double, dim: Int = 256,
                   iters: Int = 2, probes: Int = 1): DataFrame = {
    val vecs = TextAnalysis.hashEmbed(df, idCol, textCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Clustering.semDedup(vecs, idCol, "vec", k, threshold, iters, probes)
  }

  /** Build a persisted SEMANTIC text index: hashed-TF vectors of the
    * corpus written through [[VecIndex.write]] — the standing-corpus
    * side of [[semanticTextMatchesStream]]. `dim` must match at screen
    * time (the index stores it). */
  def writeSemanticTextIndex(corpus: DataFrame, idCol: String,
                             textCol: String, path: String, dim: Int = 256,
                             bits: Int = 0, tables: Int = 4,
                             overwrite: Boolean = false): Unit = {
    val vecs = TextAnalysis.hashEmbed(corpus, idCol, textCol, dim)
    VecIndex.write(vecs, idCol, "vec", dim, path, bits, tables, overwrite)
  }

  /** Streaming SEMANTIC text screen with no model: each micro-batch's
    * documents are hash-embedded PER ROW ([[TextAnalysis.hashEmbedCol]]
    * — a projection, no aggregate, so it is legal in a stream) and
    * screened against the persisted index via [[VecIndex.matchesStream]]
    * (stream-static joins only). Emits (batch_id, corpus_id, cos) for
    * every near-paraphrase hit; the bag-of-words-cosine companion to
    * [[Dedup.textScreenStream]]'s shingle-overlap screen. */
  def semanticTextMatchesStream(stream: DataFrame, idCol: String,
                                textCol: String, path: String,
                                threshold: Double = 0.9): DataFrame = {
    val (dim, _, _) = VecIndex.cfgOf(stream.sparkSession, path)
    val withVec = stream
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .withColumn("__graft_vec",
        TextAnalysis.hashEmbedCol(col(textCol), dim))
      .filter(col("__graft_vec").isNotNull)
    VecIndex.matchesStream(withVec, idCol, "__graft_vec", path, threshold)
  }

  /** Stage-count funnel report for [[curated]]: one row per stage,
    * (stage, n) — input, after min-words, after exact dedup, after
    * decontamination, then the three split sizes. Stages prefix-numbered
    * so the natural sort is the pipeline order.
    *
    * Scale note: the report unions per-stage count aggregates into ONE
    * lazy plan, so each stage's subtree recomputes its prefix of the
    * chain — fine for a run-once report; cache the input upstream if its
    * lineage is expensive. */
  def funnel(df: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, minWords: Int = 30,
             valFraction: Double = 0.15, testFraction: Double = 0.1,
             seed: Long = 7L, substrMinLen: Int = 0): DataFrame = {
    val input = df.na.drop(Seq(idCol, textCol))
    val minw = input.filter(
      TextAnalysis.tokenCount(col(textCol)) >= minWords)
    val deduped = Dedup.exact(minw, idCol, textCol)
    // the rewrite subtree feeds FIVE stage counts (3b, 4, and the three
    // splits) — persist it so the window/hash pipeline runs once, not
    // once per count (measured 7.4 -> ~3 s at sf0.1); released by the
    // caller's cache clear, same convention as the other report ops
    val afterSub0 = substrStage(deduped, idCol, textCol, minWords,
      substrMinLen)
    val afterSub = if (substrMinLen > 0)
      afterSub0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else afterSub0
    // decontamination feeds four counts (stage 4 + three splits) — same
    // treatment on the substring path; the plain path stays untouched
    // (its stages are cheap projections)
    val clean0 = Decontaminate.decontaminate(afterSub, idCol, textCol,
      benchmark, textCol, n = 4)
    val clean = if (substrMinLen > 0)
      clean0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else clean0
    val split = Sampling.trainTestSplit(clean, idCol, valFraction,
      testFraction, seed)
    def stage(name: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("n"))
        .select(lit(name).as("stage"), col("n"))
    // stages 1-3 fold into ONE corpus scan: n_input = count, n_min_words
    // = conditional count, n_exact_dedup = distinct texts among the
    // min-words rows (Dedup.exact keeps one row per text, so its count
    // IS countDistinct) — three separate scans before, and the third
    // re-ran the dedup window pipeline just to count it
    val tc = TextAnalysis.tokenCount(col(textCol))
    val head = input.agg(
        count(lit(1)).as("__n1"),
        coalesce(sum(when(tc >= minWords, 1L)), lit(0L)).as("__n2"),
        countDistinct(when(tc >= minWords, col(textCol))).as("__n3"))
      .select(explode(array(
        struct(lit("1_input").as("stage"), col("__n1").as("n")),
        struct(lit("2_min_words").as("stage"), col("__n2").as("n")),
        struct(lit("3_exact_dedup").as("stage"), col("__n3").as("n"))))
        .as("__s"))
      .select(col("__s.stage").as("stage"), col("__s.n").as("n"))
    // "3_" < "3b_" < "4_" lexicographically, so the stage sort holds
    (if (substrMinLen > 0)
       head.unionAll(stage("3b_substr_rewrite", afterSub))
     else head)
      .unionAll(stage("4_decontaminated", clean))
      .unionAll(split.groupBy("split")
        .agg(count(lit(1)).as("n"))
        .select(concat(
          when(col("split") === "train", lit("5_train"))
            .when(col("split") === "val", lit("6_val"))
            .otherwise(lit("7_test"))).as("stage"), col("n")))
  }
}
