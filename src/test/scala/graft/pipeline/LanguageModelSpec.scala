package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {

  test("lmScore matches the closed-form add-k computation") {
    import spark.implicits._
    // corpus: "a b a b" and "a c" → bigrams (a,b),(b,a),(a,b) and (a,c)
    // c2: (a,b)=2, (b,a)=1, (a,c)=1 ; c1: a=3, b=1 ; V = 3 (a,b,c)
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = LanguageModel.lmScore(docs, "doc_id", "text", addK = 0.5)
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val k = 0.5
    val pAB = math.log((2 + k) / (3 + k * 3))
    val pBA = math.log((1 + k) / (1 + k * 3))
    val pAC = math.log((1 + k) / (3 + k * 3))
    assert(got(1L)._2 == 3L)
    assert(math.abs(got(1L)._3 - (2 * pAB + pBA) / 3) < 1e-12)
    assert(got(2L)._2 == 1L)
    assert(math.abs(got(2L)._3 - pAC) < 1e-12)
  }

  test("documents with fewer than two alphabetic tokens are absent") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "single"), (3L, "42 17 99"),
      (4L, "")).toDF("doc_id", "text")
    val ids = LanguageModel.lmScore(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("cross-corpus scoring: unseen bigrams get the smoothed floor") {
    import spark.implicits._
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((9L, "z q")).toDF("doc_id", "text")
    val got = LanguageModel.lmScore(score, "doc_id", "text", addK = 0.5,
        train = Some(train)).select("lm_score").as[Double].head()
    // unseen context AND pair: ln(k / (0 + k·V)) = ln(1/V), V = 2 (a, b)
    assert(math.abs(got - math.log(1.0 / 2.0)) < 1e-12)
  }

  test("tokenization is lowercased alphabetic runs (digits/punct split)") {
    import spark.implicits._
    val docs = Seq((1L, "Hello, WORLD!42foo")).toDF("doc_id", "text")
    // tokens: hello, world, foo → 2 bigrams
    val n = LanguageModel.lmScore(docs, "doc_id", "text")
      .select("n_bigrams").as[Long].head()
    assert(n == 2L)
  }

  test("lmScore on empty input yields an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LanguageModel.lmScore(empty, "doc_id", "text").count() == 0L)
  }
}
