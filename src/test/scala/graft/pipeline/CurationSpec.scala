package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunk-level dedup, weighted sampling, and the corpus-mix report. */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  // ---- chunkDedup ----------------------------------------------------------

  test("chunkDedup keeps only the first corpus-wide occurrence of a chunk") {
    // 2-word chunks; doc 2 repeats doc 1's first chunk and adds a new one
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "x y")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1 keeps both chunks; doc 2 loses "a b"; doc 3 loses its only chunk
    assert(out.toSeq == Seq(
      (1L, "a b c d", 2L, 2L),
      (2L, "x y", 1L, 2L)))
  }

  test("chunkDedup: duplicate chunk WITHIN a document also collapses") {
    val df = Seq((7L, "p q p q p q")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 2)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("p q", 1L, 3L)))
  }

  test("chunkDedup: ragged tail chunk is its own unit and reassembly preserves order") {
    // 3-word chunks over 7 words: chunks "a b c", "d e f", "g"
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "g d e f a b c")).toDF("doc_id", "text") // same words, different chunking
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 2's chunks ("g d e", "f a b", "c") are all novel strings
    assert(out.toSeq == Seq(
      (1L, "a b c d e f g"),
      (2L, "g d e f a b c")))
  }

  test("chunkDedup tolerates empty input and null text") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.chunkDedup(empty, "doc_id", "text", 4).count() == 0)
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, "w1 w2"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(nulls, "doc_id", "text", 4).collect()
    assert(out.length == 1 && out(0).getString(1) == "w1 w2")
  }

  // ---- weighted sampling ---------------------------------------------------

  test("weightedSample is deterministic, monotone in rate, and clamps at 1") {
    val df = (1L to 2000L).map(i => (i, (i % 100) + 1)).toDF("doc_id", "w")
    val a = Sampling.weightedSample(df, "doc_id", "w", rate = 0.004, seed = 1)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df, "doc_id", "w", rate = 0.004, seed = 1)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed+rate must give identical membership")
    val wider = Sampling.weightedSample(df, "doc_id", "w", rate = 0.02, seed = 1)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider), "raising the rate only adds rows")
    // rate high enough that every weight clamps to p=1 keeps everything
    val all = Sampling.weightedSample(df, "doc_id", "w", rate = 2.0, seed = 1)
    assert(all.count() == 2000)
  }

  test("weightedSample keeps heavy rows more often than light rows") {
    // two weight classes, 10x apart, far from the clamp
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) 10 else 1))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedSample(df, "doc_id", "w", rate = 0.02, seed = 3)
      .groupBy(col("w")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // expectations: light 2000*0.02=40, heavy 2000*0.2=400
    assert(kept(10) > 5 * kept(1),
      s"heavy class should dominate ~10x, got $kept")
  }

  test("weightedTopK returns exactly k rows, favors weight, excludes w<=0") {
    val df = (1L to 3000L).map(i => (i, if (i <= 1500) 1.0 else 20.0))
      .toDF("doc_id", "w")
      .unionAll(Seq((9001L, 0.0), (9002L, -5.0)).toDF("doc_id", "w"))
    val top = Sampling.weightedTopK(df, "doc_id", "w", k = 100, seed = 2)
      .collect()
    assert(top.length == 100)
    val ids = top.map(_.getLong(0))
    assert(!ids.contains(9001L) && !ids.contains(9002L))
    val heavy = ids.count(_ > 1500)
    assert(heavy > 80, s"20x-weighted half should dominate the sample, got $heavy/100")
    // deterministic across invocations
    val again = Sampling.weightedTopK(df, "doc_id", "w", k = 100, seed = 2)
      .collect().map(_.getLong(0))
    assert(ids.toSeq == again.toSeq)
  }

  test("weightedTopK with k >= eligible rows returns all eligible rows") {
    val df = Seq((1L, 2.0), (2L, 3.0), (3L, 0.0)).toDF("doc_id", "w")
    val out = Sampling.weightedTopK(df, "doc_id", "w", k = 10)
    assert(out.count() == 2)
  }

  test("stratifiedTopK: k per stratum, same priorities as the global form") {
    val df = (1L to 600L).map(i => (i, if (i % 2 == 0) "a" else "b",
      (i % 7 + 1).toDouble)).toDF("doc_id", "src", "w")
    val out = Sampling.stratifiedTopK(df, "doc_id", "w", Seq("src"), k = 10,
      seed = 3).collect()
    // exactly k from each stratum
    val bySrc = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 10, "b" -> 10))
    // within one stratum the selection equals weightedTopK run on that
    // stratum alone (identical priorities, identical tie-break)
    val aOnly = Sampling.weightedTopK(df.filter($"src" === "a"), "doc_id",
      "w", k = 10, seed = 3).collect().map(_.getLong(0)).toSet
    assert(out.filter(_.getString(1) == "a").map(_.getLong(0)).toSet == aOnly)
    // short stratum: returns what exists, no padding
    val tiny = Seq((1L, "x", 1.0), (2L, "x", 1.0), (3L, "y", 1.0))
      .toDF("doc_id", "src", "w")
    val t = Sampling.stratifiedTopK(tiny, "doc_id", "w", Seq("src"), k = 5)
    assert(t.count() == 3)
  }

  // ---- corpusMix -----------------------------------------------------------

  test("corpusMix computes counts, mass, and shares that sum to 1") {
    val df = Seq(
      ("web", 10L), ("web", 30L), ("books", 40L), ("code", 20L))
      .toDF("source", "n_chars")
    val rows = TextAnalysis.corpusMix(df, "source", "n_chars")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("books", 1L, 40.0, 0.25, 0.4),
      ("code", 1L, 20.0, 0.25, 0.2),
      ("web", 2L, 40.0, 0.5, 0.4)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12)
  }
}
