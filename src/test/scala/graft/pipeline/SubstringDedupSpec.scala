package graft.pipeline

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  /** driver reference: windows -> repeated strings -> min-(doc,pos) owner
    * -> non-owner window positions -> merged spans -> rewrite */
  private def ref(docs: Seq[(Long, String)], l: Int)
      : (Set[(Long, Long, Long)], Map[Long, String]) = {
    val wins = for {
      (id, t) <- docs
      if t.length >= l
      p <- 1 to (t.length - l + 1)
    } yield (id, p.toLong, t.substring(p - 1, p - 1 + l))
    val bySub = wins.groupBy(_._3).filter(_._2.size >= 2)
    val removed = bySub.values.flatMap { occ =>
      val owner = occ.map(o => (o._1, o._2)).min
      occ.map(o => (o._1, o._2)).filterNot(_ == owner)
    }.toSeq
    val spans = removed.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).distinct.sorted
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { p =>
        if (acc.nonEmpty && p <= acc.last._2 + 1) {
          val (s0, e0) = acc.last
          acc(acc.length - 1) = (s0, math.max(e0, p + l - 1))
        } else acc += ((p, p + l - 1))
      }
      acc.map { case (s0, e0) => (id, s0, e0) }
    }.toSet
    val rewritten = docs.map { case (id, t) =>
      val cut = spans.filter(_._1 == id).toSeq.sortBy(_._2)
      val sb = new StringBuilder
      var prev = 0L
      cut.foreach { case (_, s0, e0) =>
        if (s0 - 1 > prev) sb.append(t.substring(prev.toInt, (s0 - 1).toInt))
        prev = e0
      }
      if (prev < t.length) sb.append(t.substring(prev.toInt))
      id -> sb.toString
    }.toMap
    (spans, rewritten)
  }

  private def check(docs: Seq[(Long, String)], l: Int): Unit = {
    val df = docs.toDF("doc_id", "text")
    val (wantSpans, wantText) = ref(docs, l)
    val gotSpans = SubstringDedup
      .repeatedSubstringSpans(df, "doc_id", "text", l)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSpans === wantSpans)
    val gotText = SubstringDedup
      .removeRepeatedSubstrings(df, "doc_id", "text", l)
      .as[(Long, String)].collect().toMap
    assert(gotText === wantText)
  }

  test("cross-doc boilerplate removed from every doc but the owner") {
    val boiler = "COMMON LICENSE HEADER TEXT!"
    val docs = Seq(
      1L -> s"${boiler}alpha body one here",
      2L -> s"${boiler}totally different body",
      3L -> "no shared content in this one at all")
    check(docs, l = 10)
    // the owner (doc 1, the min id) keeps the header; doc 2 loses it
    val got = SubstringDedup.removeRepeatedSubstrings(
        docs.toDF("doc_id", "text"), "doc_id", "text", 10)
      .as[(Long, String)].collect().toMap
    assert(got(1L).contains("COMMON"))
    assert(!got(2L).contains("COMMON"))
    assert(got(3L) === "no shared content in this one at all")
  }

  test("within-doc run collapses to its first window") {
    check(Seq(1L -> ("x" * 40 + "tail"), 2L -> "unrelated text"), l = 8)
  }

  test("overlapping and abutting windows merge into one span") {
    // two copies of a 30-char block back-to-back in one doc plus a third
    // copy in another: overlapping repeated windows everywhere
    val block = "abcdefghijklmnopqrstuvwxyz0123"
    check(Seq(1L -> (block + block + "END"), 2L -> ("pre" + block)), l = 10)
  }

  test("doc that is entirely repeated text becomes the empty string") {
    val docs = Seq(1L -> "exactly the same text here",
      2L -> "exactly the same text here")
    val got = SubstringDedup.removeRepeatedSubstrings(
        docs.toDF("doc_id", "text"), "doc_id", "text", 10)
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "exactly the same text here")
    assert(got(2L) === "")
    check(docs, l = 10)
  }

  test("docs shorter than minLen never produce windows or spans") {
    check(Seq(1L -> "tiny", 2L -> "tiny", 3L -> "also small"), l = 10)
  }

  test("repeatedFraction: span mass over doc length, zeros included") {
    val docs = Seq(1L -> "exactly the same text here",
      2L -> "exactly the same text here",
      3L -> "nothing shared in this doc")
    val got = SubstringDedup.repeatedFraction(
        docs.toDF("doc_id", "text"), "doc_id", "text", 10)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((26L, 0L, 0.0)))   // owner keeps everything
    assert(got(2L) === ((26L, 26L, 1.0)))  // full duplicate
    assert(got(3L) === ((26L, 0L, 0.0)))
  }

  test("nulls dropped; minLen validated") {
    val df = Seq((java.lang.Long.valueOf(1L), "some text"),
      (java.lang.Long.valueOf(2L), null)).toDF("doc_id", "text")
    assert(SubstringDedup.repeatedSubstringSpans(df, "doc_id", "text", 5)
      .count() === 0L)
    assert(SubstringDedup.removeRepeatedSubstrings(df, "doc_id", "text", 5)
      .count() === 1L)
    intercept[IllegalArgumentException](
      SubstringDedup.repeatedSubstringSpans(df, "doc_id", "text", 1))
  }
}
