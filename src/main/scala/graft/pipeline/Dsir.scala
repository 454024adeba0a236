package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): select raw-corpus documents whose hashed-n-gram profile looks
  * like a (small, curated) target corpus. The published recipe, which
  * this follows exactly:
  *
  *   1. featurize every document as a bag of hashed n-grams (unigrams +
  *      bigrams hashed into `buckets` cells);
  *   2. fit two smoothed multinomial bucket models — p from the target
  *      corpus, q from the raw corpus;
  *   3. weight each raw document by its importance log-ratio
  *      `log w(x) = Σ_b c_x[b] · (ln p[b] − ln q[b])`;
  *   4. resample without replacement via the Gumbel-top-k trick:
  *      keep the k documents maximizing `log w(x) + g_x`,
  *      `g_x ~ Gumbel(0,1)`.
  *
  * Extension tier — no reference analog (the reference is single-node
  * EDA; importance resampling is a training-data-pipeline operation).
  *
  * Scale shape (the whole point of the hashed feature space): the model
  * state is TWO `buckets`-row count tables — bounded by construction, not
  * by vocabulary — so the weight table `ln p − ln q` is always
  * broadcastable. The raw corpus is read once: explode grams → one hash
  * aggregate to (doc, bucket) counts; the global q counts re-aggregate
  * THAT frame (no second scan). The target corpus gets one explode +
  * aggregate of its own (it is the small side by definition). Scoring is
  * a broadcast join + one per-doc aggregate; no window, no driver
  * materialization, no shuffle wider than the (doc, bucket) stream.
  * Resampling is a TakeOrdered top-k (per-partition heaps + driver merge
  * of k rows), with DETERMINISTIC Gumbel noise derived from
  * `md5(id:seed)` so runs are reproducible and the DuckDB oracle replays
  * the selection bit-for-bit.
  *
  * Tokenization is [[LanguageModel.tokenize]]'s lowercase-alphabetic
  * runs — ASCII-conservative so plain SQL reproduces the stream — and
  * bucket assignment is the first 15 hex chars of md5 (60 bits, fits a
  * signed long) mod `buckets`, the same cross-engine hash basis as
  * [[Dedup.simhashMd5]].
  */
object Dsir {

  /** Bucket of a gram string: 60-bit md5 prefix mod `buckets`.
    * DuckDB twin: `('0x' || substr(md5(g), 1, 15))::UBIGINT % buckets`. */
  private def bucketOf(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(buckets))

  /** (id, gram) stream of a corpus: unigrams + space-joined bigrams (the
    * published DSIR featurization). Tokens are alphabetic so a bigram
    * ("w1 w2") can never collide with a unigram. Typed flatMap — one
    * tokenize per document (see [[LanguageModel.tokenize]] scaladoc for
    * why not a Catalyst HOF walk). */
  private def gramStream(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts = LanguageModel.tokenize(text)
        ts.iterator.map(w => (id, w)) ++
          (1 until ts.length).iterator.map(i => (id, ts(i - 1) + " " + ts(i)))
      }.toDF("__graft_id", "__gram")
  }

  /** Importance log-weight of every raw document with ≥1 token, under
    * hashed-n-gram multinomials fit on `target` (p) and `raw` (q) with
    * add-k smoothing over the `buckets`-cell feature space. Output:
    * (idCol, n_grams, dsir_logw) — logw > 0 ⇔ the document is more
    * probable under the target model than under the raw model. */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 10000,
                 addK: Double = 0.5): DataFrame = {
    require(buckets > 0, s"dsirScores needs buckets > 0, got $buckets")
    require(addK > 0, s"dsirScores needs addK > 0, got $addK")
    graft.util.Errors.context("dsirScores", Seq(idCol, textCol)) {
    // raw corpus: ONE explode, aggregated to the (doc, bucket) counts the
    // scoring pass needs; the global q counts re-aggregate this frame so
    // the raw corpus is scanned once
    val docBuckets = gramStream(raw, idCol, textCol)
      .select(col("__graft_id"), bucketOf(col("__gram"), buckets).as("__b"))
      .groupBy("__graft_id", "__b").agg(count(lit(1)).as("__c"))
    val qCounts = docBuckets.groupBy("__b").agg(sum("__c").as("__cq"))
    val pCounts = gramStream(target, idCol, textCol)
      .select(bucketOf(col("__gram"), buckets).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__cp"))
    // weight table: ≤ `buckets` rows by construction → always broadcast.
    // Raw-side buckets fully cover every scored doc's buckets (a doc's
    // grams ARE raw grams), so a left join from q to p loses nothing.
    val totals = qCounts.agg(sum("__cq").as("__tq")).crossJoin(
      pCounts.agg(sum("__cp").as("__tp")))
    val weights = qCounts.join(pCounts, Seq("__b"), "left")
      .na.fill(0L, Seq("__cp"))
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((col("__cp") + addK) / (col("__tp") + addK * buckets)) -
         log((col("__cq") + addK) / (col("__tq") + addK * buckets)))
          .as("__w"))
    docBuckets.join(broadcast(weights), Seq("__b"))
      .groupBy("__graft_id")
      .agg(sum("__c").as("n_grams"),
        sum(col("__c").cast("double") * col("__w")).as("dsir_logw"))
      .select(col("__graft_id").as(idCol), col("n_grams"), col("dsir_logw"))
  } }

  /** Gumbel-top-k importance resample WITHOUT replacement: the k raw
    * documents maximizing `dsir_logw + g`, where g is Gumbel(0,1) noise
    * derived deterministically from `md5(id ++ ":" ++ seed)` (60-bit
    * uniform → −ln(−ln u)). Equivalent to sampling k docs without
    * replacement with probability ∝ exp(dsir_logw) — the published DSIR
    * selection step — but reproducible across runs and engines. Output:
    * (idCol, n_grams, dsir_logw, gumbel_key), the selected rows. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, buckets: Int = 10000,
                   addK: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(k > 0, s"dsirResample needs k > 0, got $k")
    graft.util.Errors.context("dsirResample", Seq(idCol, textCol)) {
    val scores = dsirScores(raw, target, idCol, textCol, buckets, addK)
    // u in (0, 1]: (h + 1) / 2^60 over the 60-bit md5 prefix; u = 1 maps
    // to g = −ln(−ln 1) = +inf ONLY at h = 2^60 − 1 (probability 2^-60);
    // clamp via least() to keep the column finite and SQL-identical
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      lit(seed.toString)).cast("binary")), 1, 15), 16, 10).cast("double")
    val u = least((h + 1.0) / math.pow(2.0, 60), lit(1.0 - 1e-12))
    val key = col("dsir_logw") - log(-log(u))
    scores.select(col(idCol), col("n_grams"), col("dsir_logw"),
        key.as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  } }
}
