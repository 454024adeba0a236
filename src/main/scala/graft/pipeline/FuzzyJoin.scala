package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string join: all pairs within Levenshtein edit distance
  * `maxDist`, found EXACTLY via q-gram count filtering (Gravano et al.,
  * VLDB'01) + a `levenshtein` verify — the set-similarity-join shape the
  * engine's other dedup ops use (candidates → verify), applied to edit
  * distance for entity resolution / near-identical key reconciliation.
  *
  * Filter (a theorem, not a knob): one edit destroys at most q of a
  * string's |s|−q+1 positional q-grams, so ed(a,b) ≤ k implies the
  * multiset q-gram intersection is ≥ max(|a|,|b|) − (q−1) − k·q.
  * Multiset semantics come from keying postings on (gram, occurrence
  * ordinal); pairs failing the count bound or the |len(a)−len(b)| ≤ k
  * length bound are pruned BEFORE any levenshtein call. Strings too
  * short for the bound to bite (len ≤ q·(k+1) − 1, including len < q
  * with no grams at all) are paired brute-force among themselves — a
  * pair with one long side always clears the bound or the length filter.
  *
  * SCALE: one shuffle of the posting lists on the (gram, ordinal) key;
  * per-key pair generation costs Σ df², so the operator suits string
  * columns whose q-grams are DIVERSE (names, titles, URLs). A corpus of
  * near-identical long strings (shared boilerplate prefixes) degrades
  * toward all-pairs — the same Σdf² economics as ngramJaccard, see the
  * NOTES round-9 df-cut finding. `maxPostingList` skips over-cap keys
  * (bounded memory, EXACTNESS LOST for pairs whose every shared gram is
  * over-cap) — the same contract as Dedup's maxBucket/maxPostingList.
  * Verify joins are plain shuffled equi-joins; candidates, not the
  * corpus, set their size. */
object FuzzyJoin {

  // private[graft], not private: a fully-private nested case class gets a
  // private bytecode constructor, which Janino-generated deserializer code
  // cannot call (runtime CompileException in the groupByKey stage)
  private[graft] final case class Posting(gram: String, ord: Int,
                                          id: Long, len: Int)

  /** (id, s, len) with nulls dropped, ids cast long. Cached by callers:
    * consumed by postings, the short side, and the verify joins. */
  private def prep(df: DataFrame, idCol: String, strCol: String) =
    df.na.drop(Seq(idCol, strCol))
      .select(col(idCol).cast("long").as("__id"),
        col(strCol).cast("string").as("__s"),
        length(col(strCol)).as("__len"))

  /** Positional q-gram postings: one local pass per string, ordinal =
    * occurrence index of the gram within the string (multiset key). */
  private def postingsOf(strs: DataFrame, q: Int) = {
    val spark = strs.sparkSession
    import spark.implicits._
    strs.filter(col("__len") >= q).as[(Long, String, Int)]
      .flatMap { case (id, s, len) =>
        val seen = new java.util.HashMap[String, Integer]()
        (0 to len - q).iterator.map { i =>
          val g = s.substring(i, i + q)
          val prev = seen.get(g)
          val ord = if (prev == null) 0 else prev.intValue()
          seen.put(g, ord + 1)
          Posting(g, ord, id, len)
        }
      }
  }

  /** Self-join: (id_a, id_b, dist) with id_a < id_b and
    * levenshtein ≤ maxDist. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int, q: Int = 2,
                 maxPostingList: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val spark = df.sparkSession
    import spark.implicits._
    val strs = prep(df, idCol, strCol).cache()
    val k = maxDist
    // count-filtered candidates from the posting lists
    val counted = postingsOf(strs, q)
      .groupByKey(p => (p.gram, p.ord))
      .flatMapGroups { (_, it) =>
        val limit = if (maxPostingList == Int.MaxValue) Int.MaxValue
                    else maxPostingList + 1
        val rows = it.take(limit).toArray
        if (rows.length > maxPostingList) Iterator.empty
        else {
          val out = Array.newBuilder[(Long, Int, Long, Int)]
          java.util.Arrays.sort(rows,
            (a: Posting, b: Posting) => java.lang.Long.compare(a.id, b.id))
          var i = 0
          while (i < rows.length) {
            var j = i + 1
            while (j < rows.length) {
              if (rows(i).id != rows(j).id &&
                  math.abs(rows(i).len - rows(j).len) <= k)
                out += ((rows(i).id, rows(i).len, rows(j).id, rows(j).len))
              j += 1
            }
            i += 1
          }
          out.result().iterator
        }
      }
      .toDF("id_a", "len_a", "id_b", "len_b")
      .groupBy("id_a", "len_a", "id_b", "len_b")
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >=
        greatest(col("len_a"), col("len_b")) - lit(q - 1) - lit(k * q))
      .select("id_a", "id_b")
    // strings the bound can't prune pair only among THEMSELVES within
    // edit distance k (a longer partner forces bound >= 1 or a length
    // gap > k) — brute-force the short set
    val short = strs.filter(col("__len") <= q * (k + 1) - 1)
    val shortPairs = short.select(col("__id").as("id_a"),
        col("__len").as("la"))
      .join(short.select(col("__id").as("id_b"), col("__len").as("lb")),
        col("id_a") < col("id_b") && abs(col("la") - col("lb")) <= k)
      .select("id_a", "id_b")
    verify(counted.unionAll(shortPairs).distinct(), strs, k)
  }

  /** Cross-table join: (id_a from left, id_b from right, dist ≤ maxDist).
    * Same filter; postings of both sides share one shuffle, pairs are
    * emitted across sides only. */
  def fuzzyJoin(left: DataFrame, leftId: String, leftStr: String,
                right: DataFrame, rightId: String, rightStr: String,
                maxDist: Int, q: Int = 2,
                maxPostingList: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val spark = left.sparkSession
    import spark.implicits._
    val k = maxDist
    val ls = prep(left, leftId, leftStr).cache()
    val rs = prep(right, rightId, rightStr).cache()
    val tagged = postingsOf(ls, q).map(p => (p.gram, p.ord, p.id, p.len, 0))
      .unionAll(postingsOf(rs, q).map(p => (p.gram, p.ord, p.id, p.len, 1)))
    val counted = tagged
      .groupByKey(p => (p._1, p._2))
      .flatMapGroups { (_, it) =>
        val limit = if (maxPostingList == Int.MaxValue) Int.MaxValue
                    else maxPostingList + 1
        val rows = it.take(limit).toArray
        if (rows.length > maxPostingList) Iterator.empty
        else {
          val lefts = rows.filter(_._5 == 0)
          val rights = rows.filter(_._5 == 1)
          val out = Array.newBuilder[(Long, Int, Long, Int)]
          lefts.foreach { l =>
            rights.foreach { r =>
              if (math.abs(l._4 - r._4) <= k)
                out += ((l._3, l._4, r._3, r._4))
            }
          }
          out.result().iterator
        }
      }
      .toDF("id_a", "len_a", "id_b", "len_b")
      .groupBy("id_a", "len_a", "id_b", "len_b")
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >=
        greatest(col("len_a"), col("len_b")) - lit(q - 1) - lit(k * q))
      .select("id_a", "id_b")
    val shortL = ls.filter(col("__len") <= q * (k + 1) - 1)
    val shortR = rs.filter(col("__len") <= q * (k + 1) - 1)
    val shortPairs = shortL.select(col("__id").as("id_a"),
        col("__len").as("la"))
      .join(shortR.select(col("__id").as("id_b"), col("__len").as("lb")),
        abs(col("la") - col("lb")) <= k)
      .select("id_a", "id_b")
    verifyCross(counted.unionAll(shortPairs).distinct(), ls, rs, k)
  }

  private def verify(cands: DataFrame, strs: DataFrame, k: Int): DataFrame =
    verifyCross(cands, strs, strs, k)

  private def verifyCross(cands: DataFrame, ls: DataFrame, rs: DataFrame,
                          k: Int): DataFrame =
    cands
      .join(ls.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(rs.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
}
