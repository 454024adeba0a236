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

  /** (w1, w2) bigram structs of a token-array column; empty when the
    * document has fewer than two tokens (sequence() would otherwise count
    * DOWN from 0 and fabricate bigrams). */
  private[pipeline] def bigrams(ts: Column): Column =
    when(size(ts) >= 2,
      transform(sequence(lit(0), size(ts) - 2),
        i => struct(element_at(ts, i + 1).as("w1"),
          element_at(ts, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Mean bigram log-likelihood per document of `df`, under an add-k
    * bigram model trained on `train` (defaults to `df` itself — the
    * "score the corpus against its own statistics" curation pass). Output:
    * (idCol, n_bigrams, lm_score), one row per document with ≥2 tokens. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              addK: Double = 0.5, train: Option[DataFrame] = None): DataFrame = {
    require(addK > 0, s"lmScore needs addK > 0, got $addK")
    def bigramStream(src: DataFrame, withId: Boolean): DataFrame = {
      val clean = src.na.drop(if (withId) Seq(idCol, textCol) else Seq(textCol))
      val base = if (withId) clean.select(col(idCol).as("__graft_id"),
          bigrams(alphaTokens(col(textCol))).as("__bgs"))
        else clean.select(bigrams(alphaTokens(col(textCol))).as("__bgs"))
      base.select((if (withId) Seq(col("__graft_id")) else Nil) :+
        explode(col("__bgs")).as("bg"): _*)
        .select((if (withId) Seq(col("__graft_id")) else Nil) ++
          Seq(col("bg.w1").as("w1"), col("bg.w2").as("w2")): _*)
    }
    // self-training uses exactly the rows being scored (id AND text
    // non-null) so the model statistics match the scored stream
    val trainDf = train.getOrElse(df.na.drop(Seq(idCol, textCol)))
    val tb = bigramStream(trainDf, withId = false)
    val c2 = tb.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = tb.groupBy("w1").agg(count(lit(1)).as("__c1"))
    // vocabulary = distinct tokens of the training corpus (unigram stream)
    val v = trainDf.na.drop(Seq(textCol))
      .select(explode(alphaTokens(col(textCol))).as("tok"))
      .agg(countDistinct("tok").as("__v"))
    bigramStream(df, withId = true)
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
  }
}
