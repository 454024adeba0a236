package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern literal screening with one Aho-Corasick pass per row.
  *
  * The 100-TB shape: a blocklist screen written as `OR contains(text, p)`
  * over P patterns scans every byte P times (and a regex alternation pays
  * the NFA); the automaton scans each byte ONCE regardless of P, and the
  * whole operator is a broadcast (the automaton — KB to low MB for real
  * blocklists) plus a single map pass with NO shuffle. The corpus never
  * moves.
  *
  * Matching is case-sensitive LITERAL substring matching; occurrences are
  * counted at every match END position, so overlapping and self-
  * overlapping occurrences all count ("table table table" contains
  * "table table" twice). Reference scope: handyspark screens text via
  * pandas str ops (handyspark/sql/pandas.py) one pattern at a time; this
  * is the multi-pattern scale form.
  */
object Blocklist {

  /** Aho-Corasick automaton over literal patterns. Built on the driver,
    * broadcast to executors. `emits` is precomputed per node (own pattern
    * ++ suffix-link chain) so the scan never walks fail links for output
    * — worst case Σ|emits| is quadratic in pattern count for deeply
    * nested suffix sets (rare in practice; fine for blocklists). */
  final class Automaton(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "null/empty pattern")
    require(patterns.distinct.length == patterns.length,
      "duplicate patterns")

    // trie: goto maps, fail links, per-node emitted pattern indices
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    private val failBuf = scala.collection.mutable.ArrayBuffer(0)
    private val ownBuf = scala.collection.mutable.ArrayBuffer(-1)

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        val m = gotoMaps(node)
        val nxt = m.get(c)
        node = if (nxt != null) nxt.intValue()
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          failBuf += 0
          ownBuf += -1
          val id = gotoMaps.length - 1
          m.put(c, id)
          id
        }
      }
      ownBuf(node) = pi
    }

    private val fail: Array[Int] = failBuf.toArray
    /** pattern indices emitted at each node (own + all suffix matches) */
    private val emits: Array[Array[Int]] = new Array(gotoMaps.length)

    locally { // BFS: fail links, then emit sets as own ++ emits(fail)
      val queue = new java.util.ArrayDeque[Integer]()
      emits(0) =
        if (ownBuf(0) >= 0) Array(ownBuf(0)) else Array.emptyIntArray
      gotoMaps(0).forEach { (_, child) =>
        fail(child) = 0
        queue.add(child)
      }
      while (!queue.isEmpty) {
        val node = queue.poll().intValue()
        val own = ownBuf(node)
        emits(node) =
          if (own >= 0) own +: emits(fail(node)) else emits(fail(node))
        gotoMaps(node).forEach { (c, child) =>
          var f = fail(node)
          while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
          val fc = gotoMaps(f).get(c)
          fail(child) =
            if (fc != null && fc.intValue() != child.intValue())
              fc.intValue()
            else 0
          queue.add(child)
        }
      }
    }

    @inline private def step(state: Int, c: Char): Int = {
      var s = state
      var nxt = gotoMaps(s).get(c)
      while (nxt == null && s != 0) { s = fail(s); nxt = gotoMaps(s).get(c) }
      if (nxt == null) 0 else nxt.intValue()
    }

    /** Occurrence count per pattern index (overlaps counted). */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var state = 0
      var i = 0
      while (i < text.length) {
        state = step(state, text.charAt(i))
        val em = emits(state)
        var j = 0
        while (j < em.length) { counts(em(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }

    /** True iff any pattern occurs — early-exits at the first match. */
    def containsAny(text: String): Boolean = {
      var state = 0
      var i = 0
      while (i < text.length) {
        state = step(state, text.charAt(i))
        if (emits(state).nonEmpty) return true
        i += 1
      }
      false
    }
  }

  /** Per-document pattern hit counts: (idCol, pattern, hits) for every
    * (doc, pattern) with at least one occurrence. Null id/text rows are
    * dropped. One broadcast + one map pass; the output is bounded by
    * docs × patterns-present, not corpus bytes. */
  def matches(df: DataFrame, idCol: String, textCol: String,
              patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(new Automaton(patterns.toArray))
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ac = bc.value
        val counts = ac.countAll(text)
        Iterator.range(0, counts.length)
          .filter(counts(_) > 0L)
          .map(i => (id, ac.patterns(i), counts(i)))
      }
      .toDF(idCol, "pattern", "hits")
  }

  /** Rows of `df` whose text contains NO blocked pattern — the screen a
    * curation funnel applies. All original columns pass through; rows
    * with a null id or text are dropped (they can't be screened).
    * Zero shuffle: a broadcast automaton + one early-exit filter pass —
    * deliberately NOT matches() + anti-join, which would pay a full
    * count scan and a shuffle for a boolean decision. */
  def screen(df: DataFrame, idCol: String, textCol: String,
             patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(new Automaton(patterns.toArray))
    val clean = udf { text: String => !bc.value.containsAny(text) }
    df.na.drop(Seq(idCol, textCol)).filter(clean(col(textCol).cast("string")))
  }
}
