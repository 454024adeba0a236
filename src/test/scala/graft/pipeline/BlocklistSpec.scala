package graft.pipeline

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** naive overlap-counting occurrence count */
  private def naiveCount(text: String, p: String): Long = {
    var n = 0L
    var i = 0
    while (i + p.length <= text.length) {
      if (text.regionMatches(i, p, 0, p.length)) n += 1L
      i += 1
    }
    n
  }

  private val docs = Seq(
    (1L, "table table table key"), // self-overlapping pattern hits
    (2L, "merge batch merge batch scan"),
    (3L, "aaaa"), // nested self-overlap: 'aa' occurs 3x
    (4L, "spark sparkspark"),
    (5L, "nothing here"),
    (6L, "abab ababab")) // 'abab' overlaps itself in 'ababab'
  private val patterns =
    Seq("table table", "merge batch", "aa", "spark", "abab", "scan")

  test("matches counts every overlapping occurrence (vs naive scan)") {
    val df = docs.toDF("id", "text")
    val got = Blocklist.matches(df, "id", "text", patterns)
      .as[(Long, String, Long)].collect().toSet
    val want = (for {
      (id, text) <- docs
      p <- patterns
      n = naiveCount(text, p)
      if n > 0
    } yield (id, p, n)).toSet
    assert(got === want)
  }

  test("suffix-nested patterns all emit (pattern inside pattern)") {
    // 'he' is a suffix of 'she' and a prefix of 'hers' — the AC
    // fail/emit chain must surface all three on 'ushers'
    val df = Seq((1L, "ushers")).toDF("id", "text")
    val got = Blocklist.matches(df, "id", "text", Seq("he", "she", "hers"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "he", 1L), (1L, "she", 1L), (1L, "hers", 1L)))
  }

  test("screen keeps exactly the pattern-free rows, columns intact") {
    val df = docs.toDF("id", "text")
    val kept = Blocklist.screen(df, "id", "text", patterns)
      .as[(Long, String)].collect().toSet
    val want = docs.filter { case (_, t) =>
      patterns.forall(p => naiveCount(t, p) == 0L)
    }.toSet
    assert(kept === want)
    assert(kept.map(_._1) === Set(5L))
  }

  test("null id/text rows are dropped, not matched") {
    val df = Seq((java.lang.Long.valueOf(1L), "spark"),
      (java.lang.Long.valueOf(2L), null),
      (null.asInstanceOf[java.lang.Long], "spark"))
      .toDF("id", "text")
    assert(Blocklist.matches(df, "id", "text", Seq("spark")).count() === 1L)
    assert(Blocklist.screen(df, "id", "text", Seq("zz")).count() === 1L)
  }

  test("automaton rejects empty/duplicate patterns") {
    intercept[IllegalArgumentException](new Blocklist.Automaton(Array("")))
    intercept[IllegalArgumentException](
      new Blocklist.Automaton(Array("a", "a")))
    intercept[IllegalArgumentException](
      new Blocklist.Automaton(Array.empty[String]))
  }
}
