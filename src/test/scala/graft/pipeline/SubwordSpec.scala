package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkSpec {

  // the Sennrich et al. 2016 worked corpus: {low:5, lower:2, newest:6,
  // widest:3} — merge sequence hand-derived under the engine's tie-break
  // (max count, then lexicographically smallest pair)
  private val hist: Array[(String, Long)] =
    Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnFromHistogram reproduces the hand-derived merge sequence") {
    val merges = Subword.learnFromHistogram(hist, numMerges = 8)
    assert(merges.toSeq == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>")))
  }

  test("learnBpe over a DataFrame equals the histogram path") {
    import spark.implicits._
    // expand the histogram into a corpus: counts via repetition
    val docs = hist.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Subword.learnBpe(docs, "text", numMerges = 8)
    assert(merges.toSeq == Subword.learnFromHistogram(hist, 8).toSeq)
  }

  test("encodeWord applies merges greedily by rank") {
    val rank = Subword.learnFromHistogram(hist, 8).zipWithIndex.toMap
    // "lowest" was never a training word but is covered by learned merges
    assert(Subword.encodeWord("lowest", rank).toSeq ==
      Seq("low", "est</w>"))
    // unseen symbols stay as characters
    assert(Subword.encodeWord("xyz", rank).toSeq ==
      Seq("x", "y", "z", "</w>"))
  }

  test("applyBpe: tokens reconstruct each document's words exactly") {
    import spark.implicits._
    val docs = Seq((1L, "low lower"), (2L, "newest widest lowest"))
      .toDF("doc_id", "text")
    val merges = Subword.learnFromHistogram(hist, 8)
    val out = Subword.applyBpe(docs, "doc_id", "text", merges)
    val got = out.select("doc_id", "tokens").as[(Long, Seq[String])]
      .collect().toMap
    // stripping markers and joining reconstructs the original words
    assert(got(1L).mkString.replace(Subword.EndOfWord, " ").trim == "low lower")
    assert(got(2L).mkString.replace(Subword.EndOfWord, " ").trim ==
      "newest widest lowest")
    // trained words encode to few tokens, unseen "lowest" to [low, est</w>]
    assert(got(2L).containsSlice(Seq("low", "est</w>")))
  }

  test("applyBpe: emitted vocabulary is a subset of the learned vocab") {
    import spark.implicits._
    val docs = Seq((1L, "low lower newest"), (2L, "widest lowest wildest"))
      .toDF("doc_id", "text")
    val merges = Subword.learnFromHistogram(hist, 8)
    // learned vocab = single characters + end-of-word + each merge's join
    val vocab = docs.as[(Long, String)].collect()
      .flatMap(_._2.replaceAll("\\s", "").map(_.toString)).toSet ++
      Set(Subword.EndOfWord) ++
      merges.map { case (l, r) => l + r }.toSet
    val emitted = Subword.applyBpe(docs, "doc_id", "text", merges)
      .select(explode(col("tokens")).as("t")).as[String].collect().toSet
    val stray = emitted -- vocab
    assert(stray.isEmpty, s"tokens outside the learned vocab: $stray")
  }

  test("learnBpe stops early when no pairs remain and rejects bad args") {
    import spark.implicits._
    val tiny = Seq("ab").toDF("text")
    // "ab</w>" admits at most 2 merges; asking for 10 returns what exists
    val merges = Subword.learnBpe(tiny, "text", numMerges = 10)
    assert(merges.length <= 2 && merges.nonEmpty)
    intercept[IllegalArgumentException] {
      Subword.learnBpe(tiny, "text", numMerges = 0)
    }
  }

  test("applyBpe on empty input and empty text behaves") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = Subword.applyBpe(docs, "doc_id", "text",
      Subword.learnFromHistogram(hist, 4))
    val got = out.select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 0))
  }
}
