package graft.pipeline

import graft.SparkSpec

class SubstrIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-substridx").toString

  private val L = 10
  private val corpus = Seq(
    1L -> "SHARED-BOILERPLATE-HEADER one body",
    2L -> "completely unrelated corpus text here")
  private val batch = Seq(
    10L -> "SHARED-BOILERPLATE-HEADER two body",  // header hits the corpus
    11L -> "nothing in common with anything",
    12L -> "short")                                // below minLen

  /** brute-force: batch windows whose exact L-substring occurs in corpus */
  private def refMatches(c: Seq[(Long, String)], b: Seq[(Long, String)])
      : Set[(Long, Long)] = {
    val corpusSubs = (for {
      (_, t) <- c; if t.length >= L
      p <- 0 to (t.length - L)
    } yield t.substring(p, p + L)).toSet
    (for {
      (id, t) <- b; if t.length >= L
      p <- 0 to (t.length - L)
      if corpusSubs.contains(t.substring(p, p + L))
    } yield (id, (p + 1).toLong)).toSet
  }

  test("matches == brute force; only true equality survives") {
    val path = tmp()
    SubstrIndex.write(corpus.toDF("id", "text"), "id", "text", path,
      minLen = L)
    val got = SubstrIndex.matches(batch.toDF("id", "text"), "id", "text",
        path).as[(Long, Long)].collect().toSet
    assert(got === refMatches(corpus, batch))
    assert(got.nonEmpty && got.forall(_._1 == 10L))
  }

  test("spansAgainst merges the hit windows; removeAgainst cuts them") {
    val path = tmp()
    SubstrIndex.write(corpus.toDF("id", "text"), "id", "text", path,
      minLen = L)
    val spans = SubstrIndex.spansAgainst(batch.toDF("id", "text"),
        "id", "text", path).as[(Long, Long, Long)].collect()
    // doc 10's shared header "SHARED-BOILERPLATE-HEADER " (26 chars wide
    // incl. the trailing space shared before "one"/"two" diverge... the
    // longest shared run) collapses to ONE span starting at 1
    assert(spans.length === 1 && spans.head._1 === 10L &&
      spans.head._2 === 1L)
    val rewritten = SubstrIndex.removeAgainst(batch.toDF("id", "text"),
        "id", "text", path).as[(Long, String)].collect().toMap
    assert(!rewritten(10L).contains("SHARED-BOILERPLATE"))
    assert(rewritten(10L).nonEmpty) // the divergent tail survives
    assert(rewritten(11L) === "nothing in common with anything")
    assert(rewritten(12L) === "short")
    // parity with the non-indexed two-sided formulation: spans found by
    // screening equal the spans the in-memory op assigns batch docs when
    // corpus docs own every shared string (corpus ids < batch ids)
    val both = (corpus ++ batch).toDF("id", "text")
    val inMem = SubstringDedup
      .repeatedSubstringSpans(both, "id", "text", L)
      .as[(Long, Long, Long)].collect().filter(_._1 >= 10L)
      // keep only spans from batch-vs-CORPUS repeats: doc 10 is the only
      // batch doc sharing text with the corpus in this fixture
      .filter(_._1 == 10L)
    assert(inMem.map(s => (s._1, s._2, s._3)).toSet === spans.toSet)
  }

  test("append grows the index; screen-then-append loop") {
    val path = tmp()
    SubstrIndex.write(corpus.toDF("id", "text"), "id", "text", path,
      minLen = L)
    val newDoc = Seq(20L -> "a fresh never-seen document body")
    assert(SubstrIndex.matches(newDoc.toDF("id", "text"), "id", "text",
      path).count() === 0L)
    SubstrIndex.append(newDoc.toDF("id", "text"), "id", "text", path)
    val probe = Seq(30L -> "xx never-seen document yy")
    val got = SubstrIndex.matches(probe.toDF("id", "text"), "id", "text",
        path).as[(Long, Long)].collect().toSet
    assert(got === refMatches(corpus ++ newDoc, probe))
    assert(got.nonEmpty)
  }

  test("matchesStream: per-batch screen equals the batch op (after distinct)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    SubstrIndex.write(corpus.toDF("id", "text"), "id", "text", path,
      minLen = L)
    val input = MemoryStream[(Long, String)]
    val out = SubstrIndex.matchesStream(
      input.toDS().toDF("id", "text"), "id", "text", path)
    val q = out.writeStream.format("memory").queryName("ssidx")
      .outputMode("append").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT id, pos FROM ssidx")
        .as[(Long, Long)].collect().toSet
      val want = SubstrIndex.matches(batch.toDF("id", "text"), "id",
        "text", path).as[(Long, Long)].collect().toSet
      assert(got === want && got.nonEmpty)
      // second micro-batch: the screen keeps working on new rows
      input.addData(100L -> "SHARED-BOILERPLATE tail piece")
      q.processAllAvailable()
      val got2 = spark.sql("SELECT DISTINCT id FROM ssidx")
        .as[Long].collect().toSet
      assert(got2.contains(100L))
    } finally q.stop()
  }

  test("write refuses an existing index unless overwrite") {
    val path = tmp()
    SubstrIndex.write(corpus.toDF("id", "text"), "id", "text", path,
      minLen = L)
    intercept[Exception](SubstrIndex.write(corpus.toDF("id", "text"),
      "id", "text", path, minLen = L))
    SubstrIndex.write(corpus.toDF("id", "text"), "id", "text", path,
      minLen = L, overwrite = true)
    assert(SubstrIndex.matches(batch.toDF("id", "text"), "id", "text",
      path).count() > 0L)
  }
}
