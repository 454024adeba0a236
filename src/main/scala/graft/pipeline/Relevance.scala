package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-weighting relevance scores for corpus curation (extension tier —
  * no reference analog): TF-IDF weights for frequency-filtered feature
  * sets and BM25 retrieval scores for "find the documents about X"
  * targeted-subset mining.
  *
  * Scale shape: everything is explode → partial/final hash aggregate.
  * The only joins are (a) per-token document frequencies joined back to
  * the term-frequency stream ON TOKEN — vocab-sized (Zipf-bounded), left
  * to AQE to broadcast or shuffle; (b) scalar corpus aggregates
  * (doc count, mean length) attached by broadcast crossJoin, never a
  * single-partition window. BM25 prunes the token stream to the query
  * terms with a literal `isin` BEFORE any shuffle, so its cost tracks
  * the posting lists of the query terms, not the corpus.
  */
object Relevance {

  /** Per-(doc, token) TF-IDF weights: `tf` is the in-document count,
    * `idf = ln((N+1)/(df+1)) + 1` (smoothed, scikit-learn's
    * `TfidfVectorizer(smooth_idf=True)` convention — never zero, never
    * divides by zero), `tfidf = tf · idf`. N is the count of rows that
    * survive `na.drop(id, text)`; tokens are the engine's standard
    * whitespace split. `minDf` drops tokens in fewer than `minDf` docs
    * (feature-set pruning); raw weights — L2-normalize per doc
    * downstream if a unit-length embedding is wanted. */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
            minDf: Long = 1L): DataFrame = {
    val clean = df.na.drop(Seq(idCol, textCol))
    val toks = clean.select(col(idCol).as("__graft_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("__graft_id", "token")
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, token) pairs, so count(*) per token IS
    // the document frequency — no second distinct pass
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
    val n = clean.agg(count(lit(1)).as("__graft_n"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col("__graft_id").as(idCol), col("token"), col("tf"),
        col("doc_freq"),
        (col("tf") * (log((col("__graft_n") + 1).cast("double") /
          (col("doc_freq") + 1)) + 1)).as("tfidf"))
  }

  /** Class-based TF-IDF (the BERTopic c-TF-IDF weighting): label each
    * CLASS of documents (a cluster, a source, a language) with the
    * terms that distinguish it. All documents of a class count as one
    * concatenated pseudo-document:
    *
    *   w(t, c) = (tf_{t,c} / tokens_c) · ln(1 + A / f_t)
    *
    * with tf_{t,c} the term's in-class count, tokens_c the class's
    * token mass, f_t the term's CORPUS count, and A the mean class
    * token mass — frequent-everywhere terms get idf → ln(1+A/f_t) ≈ 0,
    * class-concentrated terms surface. Returns the top `topK` terms
    * per class by (score desc, token): (classCol, token, tf, f_t,
    * ctfidf, rank). Tokenization is [[LanguageModel.alphaTokens]]
    * (lowercased alphabetic runs — SQL-replayable).
    *
    * Scale shape: one explode → (class, token) hash aggregate, one
    * token-keyed aggregate off it for f_t (AQE broadcasts it back),
    * class totals and A as broadcast scalars, then ONE class-keyed
    * window for the top-k cut. Vocab-bounded everywhere. */
  def classTfidf(df: DataFrame, classCol: String, textCol: String,
                 topK: Int = 10, minCount: Long = 1L): DataFrame = {
    require(topK >= 1, s"classTfidf needs topK >= 1, got $topK")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    graft.util.Errors.context("classTfidf", Seq(classCol, textCol)) {
    val clean = df.na.drop(Seq(classCol, textCol))
    val toks = clean.select(col(classCol).as("__graft_c"),
      explode(LanguageModel.alphaTokens(col(textCol))).as("token"))
    val ctc = toks.groupBy("__graft_c", "token")
      .agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minCount)
    // f_t and class masses derive from the SAME (class, token) counts —
    // no second pass over the corpus
    val full = toks.groupBy("__graft_c", "token")
      .agg(count(lit(1)).as("__tf0"))
    val ft = full.groupBy("token").agg(sum("__tf0").as("f_t"))
    val classMass = full.groupBy("__graft_c")
      .agg(sum("__tf0").as("__mass"))
    val a = classMass.agg(
      (sum("__mass").cast("double") / count(lit(1))).as("__a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__graft_c")
      .orderBy(col("ctfidf").desc, col("token"))
    ctc.join(ft, "token")
      .join(classMass, "__graft_c")
      .crossJoin(broadcast(a))
      .select(col("__graft_c"), col("token"), col("tf"), col("f_t"),
        ((col("tf").cast("double") / col("__mass")) *
          log(lit(1.0) + col("__a") / col("f_t"))).as("ctfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("__graft_c").as(classCol), col("token"), col("tf"),
        col("f_t"), col("ctfidf"), col("rank"))
  } }

  /** BM25 score of every document against a bag of query terms (docs
    * sharing no term are absent — union zeros in if a total ranking is
    * needed). Lucene's non-negative idf variant:
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, score contribution
    * `idf · tf·(k1+1)/(tf + k1·(1 − b + b·len/avgdl))` with `len` the
    * document's token count and `avgdl` the corpus mean. The token
    * stream is pruned to the query terms by a literal predicate before
    * the first shuffle; document lengths ride the same pruned stream's
    * doc ids via one aggregate each. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val clean = df.na.drop(Seq(idCol, textCol))
    val toks = clean.select(col(idCol).as("__graft_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    // per-doc length BEFORE pruning (BM25 normalizes by full doc length) —
    // as a size() PROJECTION, not an explode+groupBy: counting tokens does
    // not need to materialize them (a \s+ split of trimmed text yields no
    // empty interior tokens, so non-empty count = size, with the all-
    // whitespace case guarded to 0 and zero-token docs excluded like the
    // aggregate form's empty groups)
    val trimmed = trim(col(textCol))
    val lens = clean.select(col(idCol).as("__graft_id"),
        when(trimmed === "", lit(0L))
          .otherwise(size(split(trimmed, "\\s+")).cast("long"))
          .as("__graft_len"))
      .filter(col("__graft_len") > 0)
    val scalars = clean.agg(count(lit(1)).as("__graft_n"))
      .crossJoin(broadcast(
        lens.agg(avg(col("__graft_len")).as("__graft_avgdl"))))
    val qtf = toks.filter(col("token").isin(query.distinct: _*))
      .groupBy("__graft_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val idf: Column = log(lit(1.0) +
      (col("__graft_n") - col("doc_freq") + 0.5) / (col("doc_freq") + 0.5))
    val contrib = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("__graft_len") / col("__graft_avgdl")))
    qtf.join(broadcast(dfreq), "token")
      .join(lens, "__graft_id")
      .crossJoin(broadcast(scalars))
      .select(col("__graft_id"), contrib.as("__graft_c"))
      .groupBy("__graft_id").agg(sum(col("__graft_c")).as("score"))
      .select(col("__graft_id").as(idCol), col("score"))
  }
}
