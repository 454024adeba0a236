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

  test("tokenJsDivergence: 0 for identical, ln 2 for disjoint vocabularies") {
    import spark.implicits._
    val a = Seq("the quick brown fox", "jumps over").toDF("text")
    val same = LanguageModel.tokenJsDivergence(a, a, "text").head()
    assert(same.getDouble(0) == 0.0)
    assert(same.getLong(1) == 6L && same.getLong(2) == 6L)
    val b = Seq("voellig andere woerter hier").toDF("text")
    val far = LanguageModel.tokenJsDivergence(a, b, "text").head().getDouble(0)
    assert(math.abs(far - math.log(2.0)) < 1e-12)
  }

  test("tokenJsDivergence matches the closed-form two-token computation") {
    import spark.implicits._
    // p = (3/4, 1/4) over (a, b); q = (1/4, 3/4); m = (1/2, 1/2)
    val x = Seq("a a a b").toDF("text")
    val y = Seq("a b b b").toDF("text")
    val got = LanguageModel.tokenJsDivergence(x, y, "text").head().getDouble(0)
    def kl(p: Seq[Double], m: Seq[Double]) =
      p.zip(m).map { case (pi, mi) => if (pi > 0) pi * math.log(pi / mi) else 0.0 }.sum
    val expect = 0.5 * kl(Seq(0.75, 0.25), Seq(0.5, 0.5)) +
      0.5 * kl(Seq(0.25, 0.75), Seq(0.5, 0.5))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("tokenJsDivergence tolerates an empty side (score = ln 2 regime)") {
    import spark.implicits._
    val a = Seq("some words here").toDF("text")
    val empty = Seq.empty[String].toDF("text")
    val r = LanguageModel.tokenJsDivergence(a, empty, "text").head()
    // only the KL(p‖m) half carries mass: Σ 0.5·p·ln2 = ln(2)/2
    assert(math.abs(r.getDouble(0) - math.log(2.0) / 2) < 1e-12)
    assert(r.getLong(2) == 0L)
  }

  test("collocations: closed-form PMI, minCount prune, phrase beats chance pair") {
    import spark.implicits._
    // "new york" always adjacent (a phrase); "the x" pairs are chance
    val docs = Seq(
      (1L, "new york is big and the city of new york is old"),
      (2L, "the people of new york like the parks"),
      (3L, "of the parks of the city") // extra 'of' mass, no 'of new' pair
    ).toDF("doc_id", "text")
    val r = LanguageModel.collocations(docs, "text", minCount = 2)
      .collect().map(x => (x.getAs[String]("w1"), x.getAs[String]("w2")) ->
        (x.getAs[Long]("n_pair"), x.getAs[Double]("pmi"))).toMap
    // token mass: 12 + 8 + 6 -> N1 = 26; bigrams 11 + 7 + 5 -> N2 = 23
    // "new york": c12 = 3, c(new) = 3, c(york) = 3
    val (nPair, pmi) = r(("new", "york"))
    assert(nPair == 3L)
    val want = math.log((3.0 / 23.0) / ((3.0 / 26.0) * (3.0 / 26.0)))
    assert(math.abs(pmi - want) < 1e-12)
    // pairs occurring once are pruned by minCount = 2
    assert(!r.contains(("is", "big")))
    // "of new" (2 occurrences, of=2 new=3) scores below the phrase
    assert(r(("of", "new"))._2 < pmi)
    intercept[IllegalArgumentException](
      LanguageModel.collocations(docs, "text", minCount = 0))
  }

  test("lmScore on empty input yields an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LanguageModel.lmScore(empty, "doc_id", "text").count() == 0L)
  }

  test("trigramScore matches the closed-form add-k computation and " +
      "uses CONTEXT counts, not raw bigram counts") {
    import spark.implicits._
    // corpus: "a b c a b d" + "a b" — the second doc's (a,b) bigram
    // opens NO trigram, so context count c(a,b,·) = 2 (not 3): the
    // distinction under test
    val df = Seq((1L, "a b c a b d"), (2L, "a b")).toDF("doc_id", "text")
    val k = 0.5
    val got = LanguageModel.trigramScore(df, "doc_id", "text", addK = k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // doc 2 has < 3 tokens -> absent
    assert(got.keySet == Set(1L))
    val v = 4.0 // vocabulary a, b, c, d
    // trigrams of doc 1: (a,b,c), (b,c,a), (c,a,b), (a,b,d)
    // c3 each = 1; contexts: (a,b)->2, (b,c)->1, (c,a)->1
    val exp = Seq(
      math.log((1 + k) / (2 + k * v)), // a b c
      math.log((1 + k) / (1 + k * v)), // b c a
      math.log((1 + k) / (1 + k * v)), // c a b
      math.log((1 + k) / (2 + k * v))  // a b d
    )
    assert(got(1L)._1 == 4L)
    assert(math.abs(got(1L)._2 - exp.sum / exp.length) < 1e-12)
  }

  test("trigramScore cross-corpus: unseen trigrams get the smoothed " +
      "floor from the TRAIN statistics") {
    import spark.implicits._
    val train = Seq((10L, "x y z x y z")).toDF("doc_id", "text")
    val score = Seq((1L, "p q r")).toDF("doc_id", "text")
    val k = 0.5
    val got = LanguageModel.trigramScore(score, "doc_id", "text",
        addK = k, train = Some(train)).head()
    // unseen trigram, unseen context, train vocab = {x, y, z} (V=3)
    val floor = math.log((0 + k) / (0 + k * 3.0))
    assert(got.getLong(1) == 1L)
    assert(math.abs(got.getDouble(2) - floor) < 1e-12)
  }
}
