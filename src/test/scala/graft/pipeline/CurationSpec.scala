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

  test("temperatureSample: per-group keep prob follows min(1, scale*share^(alpha-1))") {
    // 900 "big" rows vs 100 "small": alpha=0.5 upweights the tail group
    val df = (1L to 1000L).map(i => (i, if (i <= 900) "big" else "small"))
      .toDF("doc_id", "source")
    val alpha = 0.5; val scale = 0.1
    val kept = Sampling.temperatureSample(df, "doc_id", "source", alpha, scale,
      seed = 3).collect().map(_.getLong(0)).toSet
    // membership must equal the directly-computed filter per group
    def q(share: Double) = math.min(1.0, scale * math.pow(share, alpha - 1.0))
    val expected = (1L to 1000L).filter { i =>
      val share = if (i <= 900) 0.9 else 0.1
      keyOf(i, 3) < q(share)
    }.toSet
    assert(kept == expected)
    // determinism under repartition
    val kept2 = Sampling.temperatureSample(df.repartition(7), "doc_id",
      "source", alpha, scale, seed = 3).collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
    // tail group kept at ~3x the head group's rate (q ratio = 9^0.5 = 3)
    val keptBig = kept.count(_ <= 900) / 900.0
    val keptSmall = kept.count(_ > 900) / 100.0
    assert(keptSmall > keptBig, "alpha < 1 must upweight the tail group")
  }

  private def keyOf(id: Long, seed: Long): Double = {
    val M = 2147483647L; val A = 48271L
    val x0 = (id % 2147483648L + (id >>> 31) * A) % (M - 1) + 1
    val x3 = (1 to 3).foldLeft(x0)((x, _) => x * A % M)
    val y0 = (x3 + math.floorMod(seed, M - 1)) % (M - 1) + 1
    val y2 = (1 to 2).foldLeft(y0)((x, _) => x * A % M)
    y2.toDouble / M.toDouble
  }

  test("mixPlan: rates realize the target mix, clamp flagged, zero-mass safe") {
    val docs = Seq(
      ("web", 800.0), ("web", 200.0),   // mass 1000
      ("lab", 100.0),                   // mass 100
      ("enc", 0.0)                      // zero-mass group
    ).toDF("source", "w")
    val plan = TextAnalysis.mixPlan(docs, "source", "w",
        Map("web" -> 0.5, "lab" -> 0.5, "enc" -> 0.0), targetTotal = 400.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // web: 200/1000 = 0.2, achievable; lab: 200/100 clamps to 1, flagged
    assert(plan("web") == ((1000.0, 200.0, 0.2, true)))
    assert(plan("lab") == ((100.0, 200.0, 1.0, false)))
    assert(plan("enc") == ((0.0, 0.0, 0.0, true)))
  }

  test("mixPlan: target group absent from the corpus surfaces achievable=false") {
    // "books" has a 0.3 target share but ZERO corpus rows: it must appear
    // with current_mass 0, rate 0, achievable=false — not vanish (the
    // groupBy-only formulation silently dropped it)
    val docs = Seq(("web", 1000.0), ("lab", 100.0)).toDF("source", "w")
    val plan = TextAnalysis.mixPlan(docs, "source", "w",
        Map("web" -> 0.5, "books" -> 0.3), targetTotal = 400.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(plan.keySet == Set("web", "lab", "books"))
    assert(plan("books") == ((0.0, 120.0, 0.0, false)))
    assert(plan("web") == ((1000.0, 200.0, 0.2, true)))
    assert(plan("lab") == ((100.0, 0.0, 0.0, true))) // no target: share 0
  }

  test("lineDedup: first-occurrence lines survive, docs reassemble in order") {
    val docs = Seq(
      (1L, "keep me\nshared banner\nalso mine"),
      (2L, "shared banner\nunique two\n  \nmore two"), // blank line dropped
      (3L, "shared banner")                            // fully duplicated
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("keep me\nshared banner\nalso mine", 3L, 3L)))
    assert(got(2L) == (("unique two\nmore two", 2L, 3L)))
    assert(!got.contains(3L), "fully-duplicated doc must vanish")
  }

  test("zipfFit: exact power law gives slope -1, r2 1; dedupReport rates") {
    // counts 12/6/4/3 at ranks 1/2/3/4: ln(c) = ln(12) - ln(rank) exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, "doc_id", "text").head()
    assert(math.abs(r.getDouble(0) + 1.0) < 1e-12, s"slope ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - math.log(12.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getLong(3) == 4L)

    val docs = Seq(
      (1L, "same", "web"), (2L, "same", "web"), (3L, "other", "web"),
      (4L, "unique", "lab")).toDF("doc_id", "text", "source")
    val rep = Dedup.dedupReport(docs, "text", "source")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(rep("web") == ((3L, 2L, 1.0 / 3.0)))
    assert(rep("lab") == ((1L, 1L, 0.0)))
  }

  test("explainPair: hand-checked triage panel") {
    val df = Seq(
      (1L, "a b c d e"),        // 3-grams: abc bcd cde
      (2L, "a b c x y"),        // 3-grams: abc bcx cxy -> shared: abc
      (3L, "A  b,c d e!")       // normalizes to doc 1's text
    ).toDF("doc_id", "text")
    val r = Dedup.explainPair(df, "doc_id", "text", 1L, 2L).head()
    assert(r.getAs[Long]("grams_a") == 3L && r.getAs[Long]("grams_b") == 3L)
    assert(r.getAs[Long]("shared_grams") == 1L)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 5) < 1e-12)
    assert(!r.getAs[Boolean]("exact_equal") && !r.getAs[Boolean]("norm_equal"))
    // 3 of 5 tokens shared, unit vectors: cos = 3/5 (distinct hash cells)
    assert(r.getAs[Double]("cos") > 0.4 && r.getAs[Double]("cos") < 0.8)
    val n = Dedup.explainPair(df, "doc_id", "text", 1L, 3L).head()
    assert(!n.getAs[Boolean]("exact_equal") && n.getAs[Boolean]("norm_equal"))
    intercept[IllegalArgumentException] {
      Dedup.explainPair(df, "doc_id", "text", 1L, 1L)
    }
  }

  test("hashEmbedCol: per-row path is BIT-identical to the aggregate path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val agg = TextAnalysis.hashEmbed(docs, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val row = docs.na.drop(Seq("doc_id", "text"))
      .select(col("doc_id"),
        TextAnalysis.hashEmbedCol(col("text"), 64).as("vec"))
      .filter(col("vec").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(row.keySet == agg.keySet)
    agg.foreach { case (id, v) =>
      assert(row(id) == v, s"doc $id diverges between paths")
    }
    // null and token-less text -> null vector from the row path
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, "  "))
      .toDF("doc_id", "text")
      .select(TextAnalysis.hashEmbedCol(col("text"), 64).as("v"))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("semanticTextMatchesStream ≡ batch hashEmbed screen (distinct pairs)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-sem-idx")
      .toString + "/idx"
    Curate.writeSemanticTextIndex(corpus, "doc_id", "text", path,
      dim = 64, bits = 4, tables = 4)
    val staged = java.nio.file.Files.createTempDirectory("graft-sem-stream")
    batch.select("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream
      .schema(batch.select("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val q = Curate.semanticTextMatchesStream(stream, "doc_id", "text", path,
        threshold = 0.8)
      .writeStream.format("memory").queryName("sem_matches")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sem_matches")
      .select("batch_id", "corpus_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = VecIndex.dedupAgainst(
        TextAnalysis.hashEmbed(batch, "doc_id", "text", 64),
        "doc_id", "vec", path, threshold = 0.8)
      .select("batch_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == direct)
    assert(streamed.nonEmpty,
      "sf0.001 documents carry near-dups; an empty screen means a broken bridge")
  }

  test("semDedupText: reworded near-dups pair up from text alone") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val reword = ((1 to 57).map(i => s"tok$i") ++ Seq("x", "y", "z"))
      .mkString(" ")
    val other = (100 to 160).map(i => s"other$i").mkString(" ")
    val df = (Seq((1L, base), (2L, reword), (3L, other)) ++
      (10L until 40L).map(i => (i, (0 to 50).map(j => s"f${i}_$j")
        .mkString(" ")))).toDF("doc_id", "text")
    val pairs = graft.pipeline.Curate.semDedupText(df, "doc_id", "text",
        k = 4, threshold = 0.8, dim = 128, probes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"reworded pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint-vocab doc must not pair")
  }

  test("Curate.funnel: hand-built corpus attrition, stage by stage") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")       // 40 words
    val df = Seq(
      (1L, long),                       // survives everything
      (2L, long),                       // exact dup of 1 -> dropped at dedup
      (3L, "short text"),               // dropped at min_words
      (4L, long + " extra tail here"),  // contains benchmark 4-gram? no
      (97L, (1 to 35).map(i => s"b$i").mkString(" ")), // benchmark member
      (5L, "b1 b2 b3 b4 " + (1 to 30).map(i => s"x$i").mkString(" ")),
                                        // shares 4-gram with benchmark
      (6L, null.asInstanceOf[String])). // dropped at input
      toDF("doc_id", "text")
    val bench = df.filter(col("doc_id") % 97 === 0)
    val got = graft.pipeline.Curate.funnel(df, "doc_id", "text", bench,
        minWords = 30, valFraction = 0.15, testFraction = 0.1, seed = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("1_input") == 6L)
    assert(got("2_min_words") == 5L)       // drops 3
    assert(got("3_exact_dedup") == 4L)     // collapses 1/2
    // drops 97 (self-overlap) and 5 (shared "b1 b2 b3 b4"); 4 survives
    // because doc 1's dedup survivor doesn't share any 4-gram with bench
    assert(got("4_decontaminated") == 2L)
    val splits = Seq("5_train", "6_val", "7_test").map(s => got.getOrElse(s, 0L))
    assert(splits.sum == 2L)
    // curated() returns the same survivors with their split labels
    val rows = graft.pipeline.Curate.curated(df, "doc_id", "text", bench,
        minWords = 30).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 4L))
  }

  test("Curate.funnel substring stage: off by default, cuts boilerplate when on") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    // doc 11 = boilerplate + tiny unique tail: after the substring cut
    // it falls under minWords and drops; doc 10 (owner) keeps everything
    val df = Seq(
      (10L, long + " unique ten " + (1 to 20).map(i => s"u$i").mkString(" ")),
      (11L, long + " tail"),
      (12L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val bench = df.filter(col("doc_id") % 97 === 0) // empty benchmark
    val off = graft.pipeline.Curate.funnel(df, "doc_id", "text", bench,
        minWords = 30).collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(!off.contains("3b_substr_rewrite"))
    assert(off("4_decontaminated") == 3L)
    val on = graft.pipeline.Curate.funnel(df, "doc_id", "text", bench,
        minWords = 30, substrMinLen = 60)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(on("3_exact_dedup") == 3L)
    assert(on("3b_substr_rewrite") == 2L) // doc 11's remnant too short
    assert(on("4_decontaminated") == 2L)
    val kept = graft.pipeline.Curate.curated(df, "doc_id", "text", bench,
        minWords = 30, substrMinLen = 60)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L))
  }

  test("lineDedupInDoc: first occurrence kept per doc, no cross-doc state, zero shuffles") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\n  \nbody two\nbody one"),
      (2L, "nav\nnav"),        // collapses to one line — doc 1 unaffected
      (3L, "   \n "),          // all space-blank: row vanishes (SQL trim
                               // strips spaces only — a tab line survives,
                               // same convention as corpus lineDedup)
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.lineDedupInDoc(df, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "nav\nbody one\nbody two", 3L, 5L),
      (2L, "nav", 1L, 2L)))
    // zero-shuffle contract: the plan must contain no Exchange
    val plan = Dedup.lineDedupInDoc(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hashEmbed: unit norm, determinism, and cosine behaves like bag-of-words") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical
      (3L, "the quick brown fox jumps over the lazy cat"), // one word off
      (4L, "zebra yak xylophone walrus vulture"),          // disjoint vocab
      (5L, "   ")).toDF("doc_id", "text")                  // no tokens
    val vecs = TextAnalysis.hashEmbed(df, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // unit norm (vectors already normalized — cos is just the dot)
    Seq(1L, 3L, 4L).foreach { id =>
      assert(math.abs(cos(vecs(id), vecs(id)) - 1.0) < 1e-12, s"doc $id")
    }
    assert(vecs(1L).toSeq == vecs(2L).toSeq, "identical text, same vector")
    assert(cos(vecs(1L), vecs(3L)) > 0.7, "one-word edit stays close")
    assert(math.abs(cos(vecs(1L), vecs(4L))) < 0.5, "disjoint vocab far")
    assert(!vecs.contains(5L), "token-less doc dropped (no cosine exists)")
    // bridges into the embedding tier: brute-force top-1 of doc 1's
    // vector over the others is its exact duplicate
    val corpus = TextAnalysis.hashEmbed(df.filter(col("doc_id") =!= 1L),
      "doc_id", "text", dim = 64)
    val top = Similarity.bruteForceTopK(corpus, "doc_id", "vec",
      vecs(1L), 1).collect()(0)
    assert(top.getLong(0) == 2L && math.abs(top.getDouble(1) - 1.0) < 1e-9)
  }

  test("vocabGrowth: hand-checked curve; heapsFit recovers an exact power law") {
    // doc 1: 3 tokens, 2 new types; doc 2: 2 tokens (one type already
    // seen), 1 new type; doc 3: all repeats; doc 4 (null text) dropped
    val df = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "a c"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 2L, 2L),
      (2L, 2L, 5L, 1L, 3L),
      (3L, 2L, 7L, 0L, 3L)))

    // exact Heaps: cum_types = cum_tokens^(1/2) at every checkpoint.
    // doc i contributes (2i-1) NEW types and enough repeat tokens that
    // cum_tokens = i^4: then V(n) = n^0.5 exactly (k=1, beta=0.5)
    val docs = (1 to 6).map { i =>
      val newTypes = (0 until 2 * i - 1).map(j => s"t${i}_$j")
      val pad = math.pow(i, 4).toLong - math.pow(i - 1, 4).toLong -
        newTypes.size
      (i.toLong, (newTypes ++ Seq.fill(pad.toInt)("t1_0")).mkString(" "))
    }.toDF("doc_id", "text")
    val fit = TextAnalysis.heapsFit(docs, "doc_id", "text").head()
    assert(math.abs(fit.getDouble(0) - 0.5) < 1e-9, s"beta ${fit.getDouble(0)}")
    assert(math.abs(fit.getDouble(1) - 1.0) < 1e-9, s"k ${fit.getDouble(1)}")
    assert(math.abs(fit.getDouble(2) - 1.0) < 1e-9)
    assert(fit.getLong(3) == 6L)
  }

  test("groupOverlap: pair gram-set algebra, hand-checked") {
    val docs = Seq(
      ("web", "a b c d"),     // grams: {abc, bcd}
      ("web", "a b c e"),     // + {abc, bce} → web = {abc, bcd, bce}
      ("lab", "a b c d"),     // lab = {abc, bcd}
      ("enc", "x y z w")      // enc = {xyz, yzw} — disjoint
    ).toDF("source", "text")
    val got = Dedup.groupOverlap(docs, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // lab ∩ web = {abc, bcd}: jaccard 2/3, containment 2/2
    assert(got(("lab", "web")) == ((2L, 2.0 / 3.0, 1.0)))
    // disjoint pairs emit no row (inner join on shared grams)
    assert(!got.contains(("enc", "web")) && !got.contains(("enc", "lab")))
    assert(got.size == 1)
  }

  test("ngramNovelty: first-occurrence ownership, hand-checked") {
    val docs = Seq(
      (1L, "a b c d"),          // grams: "a b c","b c d" — both first here
      (2L, "a b c d"),          // exact dup: novelty 0
      (3L, "b c d e f"),        // "b c d" seen; "c d e","d e f" novel
      (4L, "x y")               // < n tokens: whole text is the one gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(4L) == ((1L, 1L, 1.0)))
  }

  test("tokenBudgetSelect: maximal prefix, brute-force equal, partitioning-independent") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 400L).map(i => (i, rnd.nextInt(1000).toLong, 1L + rnd.nextInt(50)))
    val df = rows.toDF("id", "score", "toks")
    val budget = 3000L
    // brute force: sort by (score desc, id), accumulate, keep cum <= budget
    val want = rows.sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, s, t)) =>
        (id, s, t, cum + t) }
      .drop(1).takeWhile(_._4 <= budget)
      .map { case (id, _, _, cum) => id -> cum }.toMap
    assert(want.nonEmpty && want.size < 400, "budget must bite mid-corpus")
    Seq(df, df.repartition(17)).foreach { d =>
      val got = Sampling.tokenBudgetSelect(d, "id", "score", "toks", budget)
        .select("id", "cum_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
    // degenerate budgets
    assert(Sampling.tokenBudgetSelect(df, "id", "score", "toks", 0L).count() == 0)
    val all = Sampling.tokenBudgetSelect(df, "id", "score", "toks", Long.MaxValue)
    assert(all.count() == 400)
    assert(all.agg(max(col("cum_tokens"))).head.getLong(0) ==
      rows.map(_._3).sum)
  }

  test("tokenBudgetPerGroup: independent per-group prefixes under one budget") {
    val rnd = new scala.util.Random(12)
    val rows = (1L to 300L).map(i =>
      (i, s"s${i % 3}", rnd.nextInt(1000).toLong, 1L + rnd.nextInt(50)))
    val df = rows.toDF("id", "src", "score", "toks")
    val budget = 1200L
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy { case (id, _, s, _) => (-s, id) }
        .scanLeft((0L, 0L)) { case ((_, cum), (id, _, _, t)) => (id, cum + t) }
        .drop(1).takeWhile(_._2 <= budget)
    }.toMap
    assert(want.nonEmpty && want.size < 300)
    val got = Sampling.tokenBudgetPerGroup(
        df.repartition(9), "id", "src", "score", "toks", budget)
      .select("id", "cum_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // every group is present (no group starves under a per-group budget)
    val srcs = Sampling.tokenBudgetPerGroup(df, "id", "src", "score", "toks", budget)
      .select("src").distinct().collect().map(_.getString(0)).toSet
    assert(srcs == Set("s0", "s1", "s2"))
  }

  test("tokenBudgetFromPlan: per-group budgets from the plan; unplanned groups dropped") {
    val rows = (1L to 90L).map(i => (i, s"s${i % 3}", i % 7, 10L))
    val df = rows.toDF("id", "src", "score", "toks")
    val plan = Seq(("s0", 100L), ("s1", 50L)).toDF("src", "token_budget")
    val got = Sampling.tokenBudgetFromPlan(df, "id", "src", "score", "toks", plan)
      .select("id", "src", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // s2 has no plan row -> dropped entirely
    assert(got.forall(_._2 != "s2"))
    // 10 tokens/row: s0 keeps 10 rows (<=100), s1 keeps 5 (<=50)
    assert(got.count(_._2 == "s0") == 10)
    assert(got.count(_._2 == "s1") == 5)
    // kept rows are the score-descending prefix of their group
    val brute = rows.filter(_._2 == "s1").sortBy { case (id, _, s, _) => (-s, id) }
      .take(5).map(_._1).toSet
    assert(got.filter(_._2 == "s1").map(_._1).toSet == brute)
  }

  test("rankNormalize: per-group percent ranks in [0,1], order-faithful, deterministic") {
    val rows = (1L to 60L).map(i => (i, s"s${i % 2}", (i * 37 % 50).toDouble))
    val df = rows.toDF("id", "src", "score")
    val got = Sampling.rankNormalize(df.repartition(7), "id", "src", "score")
      .select("id", "score_pct")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_._2).foreach { case (_, g) =>
      val ordered = g.sortBy { case (id, _, s) => (s, id) }.map(_._1)
      val n = ordered.size
      ordered.zipWithIndex.foreach { case (id, rn) =>
        assert(math.abs(got(id) - rn.toDouble / (n - 1)) < 1e-12,
          s"id $id: expected rank ${rn.toDouble / (n - 1)}, got ${got(id)}")
      }
    }
    assert(got.values.min == 0.0 && got.values.max == 1.0)
  }

  test("epochShuffle: a reproducible permutation that re-deals per epoch") {
    val df = (1L to 500L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, epoch: Int) =
      Sampling.epochShuffle(d, "doc_id", epoch, numShards = 8, seed = 7)
        .select("doc_id", "shard", "pos")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val e0 = run(df, 0).toMap
    // partitioning-independent and re-runnable
    assert(run(df.repartition(13), 0).toMap == e0)
    // (shard, pos) is a bijection onto contiguous per-shard prefixes
    assert(e0.size == 500 && e0.values.toSet.size == 500)
    e0.values.groupBy(_._1).foreach { case (shard, sp) =>
      val ps = sp.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.size).toSeq, s"shard $shard positions not contiguous")
    }
    // within a shard, pos follows the md5-derived order key
    val rows = Sampling.epochShuffle(df, "doc_id", 0, 8, 7)
      .select("shard", "pos", "order_key", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, sh) =>
      val byPos = sh.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(byPos == byPos.sortBy(identity), "pos must follow (order_key, id)")
    }
    // a different epoch re-deals the permutation
    val e1 = run(df, 1).toMap
    assert(e1 != e0)
    assert(e1.size == 500 && e1.values.toSet.size == 500)
  }

  test("dupSizeHistogram buckets clusters by multiplicity exactly") {
    import spark.implicits._
    // 3 uniques, one pair, one triple -> sizes 1/2/3
    val docs = (Seq("u1", "u2", "u3") ++ Seq.fill(2)("pair") ++
      Seq.fill(3)("triple")).toDF("text")
    val got = Dedup.dupSizeHistogram(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(1L -> (3L, 3L), 2L -> (1L, 2L), 3L -> (1L, 3L)))
    // n_docs reconstructs the corpus size
    assert(got.values.map(_._2).sum == 8L)
    // null texts are dropped, not clustered together
    val withNulls = (Seq(Some("x"), None, None)).toDF("text")
    val g2 = Dedup.dupSizeHistogram(withNulls, "text").collect()
    assert(g2.length == 1 && g2(0).getLong(0) == 1L)
  }
}
