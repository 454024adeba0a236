package graft.pipeline

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {

  test("tfidf matches the smoothed closed form") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = Relevance.tfidf(docs, "doc_id", "text")
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("token")) ->
        (x.getAs[Long]("tf"), x.getAs[Double]("tfidf"))).toMap
    // N = 2; idf(a) = ln(3/3)+1 = 1 (df 2), idf(b) = idf(c) = ln(3/2)+1
    val idf1 = math.log(3.0 / 2) + 1
    assert(r((1L, "a")) == ((2L, 2.0)))
    assert(math.abs(r((1L, "b"))._2 - idf1) < 1e-12)
    assert(math.abs(r((2L, "c"))._2 - idf1) < 1e-12)
    assert(r.size == 4)
  }

  test("tfidf minDf prunes rare tokens; null rows drop listwise") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, null))
      .toDF("doc_id", "text")
    val r = Relevance.tfidf(docs, "doc_id", "text", minDf = 2L)
    // only "a" survives (df 2); the null-text row contributes nothing to N
    assert(r.select("token").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(r.count() == 2)
  }

  test("bm25 matches a hand-computed score") {
    import spark.implicits._
    val docs = Seq((1L, "x y x z"), (2L, "x q"), (3L, "q q")).toDF("doc_id", "text")
    val got = Relevance.bm25(docs, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N = 3, df(x) = 2, idf = ln(1 + 1.5/2.5); avgdl = (4+2+2)/3
    val idf = math.log(1 + 1.5 / 2.5)
    val avgdl = 8.0 / 3
    def s(tf: Double, len: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl))
    assert(got.keySet == Set(1L, 2L)) // doc 3 shares no term: absent
    assert(math.abs(got(1L) - s(2, 4)) < 1e-12)
    assert(math.abs(got(2L) - s(1, 2)) < 1e-12)
  }

  test("bm25 multi-term scores sum per document") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "y y z")).toDF("doc_id", "text")
    val one = Relevance.bm25(docs, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = Relevance.bm25(docs, "doc_id", "text", Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val yOnly = Relevance.bm25(docs, "doc_id", "text", Seq("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(two(1L) - (one(1L) + yOnly(1L))) < 1e-12)
    assert(math.abs(two(2L) - yOnly(2L)) < 1e-12)
  }

  test("empty and degenerate inputs do not crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Relevance.tfidf(empty, "doc_id", "text").count() == 0)
    assert(Relevance.bm25(empty, "doc_id", "text", Seq("x")).count() == 0)
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Relevance.tfidf(blank, "doc_id", "text").count() == 0)
  }

  test("classTfidf: class-exclusive terms outrank shared boilerplate; " +
      "scores match the closed form") {
    import spark.implicits._
    // 'the' appears in every class (boilerplate); each class has its
    // own exclusive term repeated as often
    val df = Seq(
      ("a", "the the cats cats cats"),
      ("b", "the the dogs dogs dogs"),
      ("c", "the the fish fish fish")).toDF("cls", "text")
    val got = Relevance.classTfidf(df, "cls", "text", topK = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // rank 1 in every class: the exclusive term, not 'the'
    assert(got(("a", 1))._1 == "cats")
    assert(got(("b", 1))._1 == "dogs")
    assert(got(("c", 1))._1 == "fish")
    assert(got(("a", 2))._1 == "the")
    // closed form: mass_c = 5, A = 5, f(cats) = 3, f(the) = 6
    val (_, tf, ft, score) = got(("a", 1))
    assert(tf == 3L && ft == 3L)
    assert(math.abs(score - (3.0 / 5) * math.log(1 + 5.0 / 3)) < 1e-12)
    val sThe = got(("a", 2))._4
    assert(math.abs(sThe - (2.0 / 5) * math.log(1 + 5.0 / 6)) < 1e-12)
    assert(score > sThe)
    // minCount prunes singletons before ranking
    val pruned = Relevance.classTfidf(df, "cls", "text", topK = 5,
      minCount = 3)
    assert(pruned.filter($"token" === "the").count() == 0)
  }
}
