package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus curation (extension
  * tier — no reference analog): an add-k smoothed bigram model trained on
  * a (reference) corpus, scoring each document by its mean token
  * log-likelihood. This is the classic KenLM-shaped quality signal —
  * documents whose token transitions look nothing like the reference
  * corpus (boilerplate, lorem-ipsum, wrong-language, mangled encodings)
  * score far below the mode and get filtered or down-weighted.
  *
  * `score(d) = mean over bigrams (w1,w2) of d of
  *   ln( (c(w1,w2) + k) / (c(w1·) + k·V) )`
  * where the counts come from the training corpus's bigram stream and V
  * is its distinct-token vocabulary size. Documents with fewer than two
  * alphabetic tokens have no bigrams and are absent from the output.
  *
  * Scale shape: explode → two partial/final hash aggregates (bigram and
  * context counts — vocabulary-bounded, Zipf-distributed), then the
  * scoring stream joins those count tables back ON TOKEN KEYS (AQE
  * broadcasts the vocab side when it fits) and one final per-doc
  * aggregate. No windows, no driver materialization; train and score
  * corpora can both be full-scale tables. Tokenization is lowercased
  * alphabetic runs — deliberately ASCII-conservative so the model is
  * reproducible in plain SQL (the DuckDB oracle replays it verbatim).
  */
object LanguageModel {

  /** Lowercased alphabetic tokens of a string column. */
  private[pipeline] def alphaTokens(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), t => t =!= "")

  /** JVM-side mirror of [[alphaTokens]] (same regex, ROOT-locale
    * lowercase) for the typed hot paths: Catalyst HOFs are interpreted,
    * and an `element_at(split(...), i)` bigram walk re-runs the split per
    * element — O(len²) regex per document, measured 42 s vs 1 s at sf0.1. */
  private[pipeline] def tokenize(t: String): Array[String] =
    t.toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)

  /** Jensen–Shannon divergence between the token distributions of two
    * corpus slices — the distributional drift score for TEXT (the
    * companion of [[graft.agg.Stats.psi]] for numeric features): has one
    * source's vocabulary usage shifted between snapshots, or do two
    * sources speak measurably different languages?
    * `JS(p‖q) = ½·KL(p‖m) + ½·KL(q‖m)`, `m = (p+q)/2`, natural log, so
    * the score is bounded by ln 2 ≈ 0.693 (identical → 0, disjoint
    * vocabularies → ln 2). Zero-share terms contribute 0 by the usual
    * `0·ln 0 = 0` convention — no smoothing constant to pick.
    *
    * Scale shape: one explode → hash-aggregate per slice (vocab-bounded
    * output), a full-outer join of the two vocab frames ON TOKEN, scalar
    * totals by broadcast crossJoin, one final scalar sum. Both slices can
    * be full-scale tables; nothing driver-side. Output: one row
    * (js, vocab_a, vocab_b). */
  def tokenJsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame =
      graft.util.Errors.context("tokenJsDivergence", Seq(textCol)) {
    def counts(df: DataFrame, out: String) = df.na.drop(Seq(textCol))
      .select(explode(alphaTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as(out))
    val joined = counts(a, "n_a").join(counts(b, "n_b"), Seq("tok"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    // totals straight off the sources as scalar aggregates (Σ per-doc
    // token counts ≡ Σ vocab counts): an agg over `joined` would instead
    // re-run both vocab-count pipelines — 4 scans per slice, not 2
    def total(df: DataFrame, out: String) = df.na.drop(Seq(textCol))
      .agg(coalesce(sum(size(alphaTokens(col(textCol)))), lit(0L)).as(out))
    val totals = total(a, "t_a").crossJoin(total(b, "t_b"))
    val p = col("n_a").cast("double") / greatest(col("t_a").cast("double"), lit(1.0))
    val q = col("n_b").cast("double") / greatest(col("t_b").cast("double"), lit(1.0))
    val m = (p + q) / 2
    val term = when(col("n_a") > 0, p * log(p / m)).otherwise(lit(0.0)) * 0.5 +
      when(col("n_b") > 0, q * log(q / m)).otherwise(lit(0.0)) * 0.5
    joined.crossJoin(broadcast(totals))
      .select(term.as("term"),
        when(col("n_a") > 0, 1L).otherwise(0L).as("va"),
        when(col("n_b") > 0, 1L).otherwise(0L).as("vb"))
      .agg(sum("term").as("js"), sum("va").as("vocab_a"), sum("vb").as("vocab_b"))
  }

  /** Mean bigram log-likelihood per document of `df`, under an add-k
    * bigram model trained on `train` (defaults to `df` itself — the
    * "score the corpus against its own statistics" curation pass). Output:
    * (idCol, n_bigrams, lm_score), one row per document with ≥2 tokens. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              addK: Double = 0.5, train: Option[DataFrame] = None): DataFrame = {
    require(addK > 0, s"lmScore needs addK > 0, got $addK")
    graft.util.Errors.context("lmScore", Seq(idCol, textCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    // typed bigram walk: ONE tokenize per document (see tokenize scaladoc)
    def bigramStream(src: DataFrame): DataFrame =
      src.na.drop(Seq(idCol, textCol))
        .select(col(idCol).cast("long"), col(textCol))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val ts = tokenize(text)
          (1 until ts.length).iterator.map(i => (id, ts(i - 1), ts(i)))
        }.toDF("__graft_id", "w1", "w2")
    // self-training uses exactly the rows being scored (id AND text
    // non-null) so the model statistics match the scored stream
    val trainDf = train.getOrElse(df.na.drop(Seq(idCol, textCol)))
    // the train side only needs text (an external reference corpus may
    // carry no id column)
    val tb = trainDf.na.drop(Seq(textCol)).select(col(textCol))
      .as[String].flatMap { text =>
        val ts = tokenize(text)
        (1 until ts.length).iterator.map(i => (ts(i - 1), ts(i)))
      }.toDF("w1", "w2")
    val c2 = tb.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = tb.groupBy("w1").agg(count(lit(1)).as("__c1"))
    // vocabulary = distinct tokens of the training corpus (unigram stream)
    val v = trainDf.na.drop(Seq(textCol))
      .select(explode(alphaTokens(col(textCol))).as("tok"))
      .agg(countDistinct("tok").as("__v"))
    bigramStream(df)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .na.fill(0L, Seq("__c2", "__c1"))
      .crossJoin(broadcast(v))
      .select(col("__graft_id"),
        log((col("__c2") + addK) / (col("__c1") + lit(addK) * col("__v")))
          .as("__ll"))
      .groupBy("__graft_id")
      .agg(count(lit(1)).as("n_bigrams"), avg("__ll").as("lm_score"))
      .select(col("__graft_id").as(idCol), col("n_bigrams"), col("lm_score"))
  } }

  /** Mean TRIGRAM log-likelihood per document — [[lmScore]] with one
    * more order of context:
    *
    *   score(d) = mean over trigrams (w1,w2,w3) of
    *     ln( (c(w1,w2,w3) + k) / (c(w1,w2,·) + k·V) )
    *
    * where c(w1,w2,·) is the CONTEXT count (how often the bigram
    * prefix opens any trigram in the training stream — NOT the raw
    * bigram count: the last bigram of a training document opens
    * nothing) and V is the training vocabulary. Sharper than the
    * bigram score at separating fluent text from shuffled/templated
    * tokens, at the price of a sparser count table — use the bigram
    * score below ~10⁵ training docs. Documents with fewer than three
    * tokens are absent. Output: (idCol, n_trigrams, lm3_score).
    *
    * Scale shape identical to [[lmScore]]: one typed flatMap → two
    * hash aggregates over the training stream (trigram-vocabulary-
    * bounded), token-keyed left joins back to the scoring stream (AQE
    * broadcasts count tables that fit), one per-doc aggregate. */
  def trigramScore(df: DataFrame, idCol: String, textCol: String,
                   addK: Double = 0.5,
                   train: Option[DataFrame] = None): DataFrame = {
    require(addK > 0, s"trigramScore needs addK > 0, got $addK")
    graft.util.Errors.context("trigramScore", Seq(idCol, textCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    def triStream(src: DataFrame): DataFrame =
      src.na.drop(Seq(idCol, textCol))
        .select(col(idCol).cast("long"), col(textCol))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val ts = tokenize(text)
          (2 until ts.length).iterator
            .map(i => (id, ts(i - 2), ts(i - 1), ts(i)))
        }.toDF("__graft_id", "w1", "w2", "w3")
    val trainDf = train.getOrElse(df.na.drop(Seq(idCol, textCol)))
    val tb = trainDf.na.drop(Seq(textCol)).select(col(textCol))
      .as[String].flatMap { text =>
        val ts = tokenize(text)
        (2 until ts.length).iterator
          .map(i => (ts(i - 2), ts(i - 1), ts(i)))
      }.toDF("w1", "w2", "w3")
    val c3 = tb.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("__c3"))
    val cctx = tb.groupBy("w1", "w2").agg(count(lit(1)).as("__cctx"))
    val v = trainDf.na.drop(Seq(textCol))
      .select(explode(alphaTokens(col(textCol))).as("tok"))
      .agg(countDistinct("tok").as("__v"))
    triStream(df)
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(cctx, Seq("w1", "w2"), "left")
      .na.fill(0L, Seq("__c3", "__cctx"))
      .crossJoin(broadcast(v))
      .select(col("__graft_id"),
        log((col("__c3") + addK) / (col("__cctx") + lit(addK) * col("__v")))
          .as("__ll"))
      .groupBy("__graft_id")
      .agg(count(lit(1)).as("n_trigrams"), avg("__ll").as("lm3_score"))
      .select(col("__graft_id").as(idCol), col("n_trigrams"),
        col("lm3_score"))
  } }

  /** Collocation extraction via pointwise mutual information — the
    * word2vec/Gensim-style phrase detector ("new york", "machine
    * learning"): adjacent token pairs that co-occur far more than their
    * unigram frequencies predict.
    * `pmi(w1,w2) = ln( (c12/N2) / ((c1/N1)·(c2/N1)) )` with c12 from the
    * bigram stream (N2 = total bigrams) and c1/c2 from the unigram stream
    * (N1 = total tokens). `minCount` prunes rare pairs BEFORE the count
    * joins — rare-pair PMI is noise (a hapax pair of two hapax tokens
    * maxes the score) and the cut keeps the joined frame vocab-bounded.
    *
    * Scale shape: one typed bigram flatMap → hash aggregate (bigram-
    * vocabulary-bounded, minCount-pruned), one unigram explode → hash
    * aggregate (vocab-bounded), two token-keyed joins (AQE broadcasts the
    * unigram side when it fits), scalar totals as a broadcast crossJoin.
    * No windows, no driver state; the ln-ratio is one fixed expression
    * the oracle replays. Output: (w1, w2, n_pair, pmi). */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"collocations needs minCount >= 1, got $minCount")
    graft.util.Errors.context("collocations", Seq(textCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.na.drop(Seq(textCol))
    val bi = src.select(col(textCol)).as[String].flatMap { text =>
      val ts = tokenize(text)
      (1 until ts.length).iterator.map(i => (ts(i - 1), ts(i)))
    }.toDF("w1", "w2")
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val uni = src.select(explode(alphaTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_w"))
    // scalar totals straight off the source (same shape as
    // tokenJsDivergence): N1 = token mass, N2 = bigram mass
    val totals = src.agg(
      coalesce(sum(size(alphaTokens(col(textCol)))), lit(0L)).as("n1"),
      coalesce(sum(greatest(size(alphaTokens(col(textCol))) - 1, lit(0))),
        lit(0L)).as("n2"))
    c12
      .join(uni.select(col("tok").as("w1"), col("n_w").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("n_w").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_pair"),
        log((col("n_pair").cast("double") / col("n2").cast("double")) /
          ((col("c1").cast("double") / col("n1").cast("double")) *
            (col("c2").cast("double") / col("n1").cast("double"))))
          .as("pmi"))
  } }
}
