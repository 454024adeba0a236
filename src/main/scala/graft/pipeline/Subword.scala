package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Learned byte-pair-encoding subword vocabulary (extension tier — no
  * reference analog; the algorithm is Sennrich et al. 2016,
  * arXiv:1508.07909): the real tokenizer-training step of an LLM data
  * pipeline, complementing the `subwordCount` heuristic estimator in
  * [[TextAnalysis]].
  *
  * Scale shape — the textbook split between distributed counting and
  * driver-local learning: merge learning operates on the WORD-TYPE
  * histogram, not the corpus (Heaps' law: ~100 TB of text has tens of
  * millions of word types; the top `maxWordTypes` by frequency carry
  * almost all token mass), so the corpus contributes exactly one
  * explode → partial/final hash aggregate plus a TakeOrdered of the top
  * types. The merge loop then runs on that bounded histogram with an
  * incremental pair-count index (only words containing the merged pair
  * are touched per step). Applying the learned merges back to the corpus
  * is an embarrassingly-parallel map with a per-partition word → tokens
  * memo (Zipf: the memo hit rate is the corpus' type/token ratio).
  */
object Subword {

  /** End-of-word marker, appended as its own symbol (Sennrich
    * convention) so merges never cross word boundaries and a merged
    * token's word-final role stays distinct from its in-word role. */
  val EndOfWord = "</w>"

  /** (word, count) histogram of the whitespace-token stream. */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.na.drop(Seq(textCol))
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` BPE merges from the corpus. Deterministic: the
    * histogram is truncated to the `maxWordTypes` most frequent types
    * (ties by word), and each step merges the most frequent symbol pair
    * (ties by pair, lexicographically) — same corpus, same merges, on
    * any cluster. Returns merges in rank order. */
  def learnBpe(df: DataFrame, textCol: String, numMerges: Int,
               maxWordTypes: Int = 1 << 18): Array[(String, String)] =
    learnBpeDetailed(df, textCol, numMerges, maxWordTypes)
      .map { case (l, r, _) => (l, r) }

  /** [[learnBpe]] with each merge's pair frequency AT SELECTION TIME —
    * the learn-side contract surface (q_bpe_merges): merge #1's pair and
    * frequency are one SQL aggregate over the initial symbol histogram,
    * and the frequency sequence is non-increasing (the argmax at step k
    * picks from pairs whose counts are bounded by step k−1's maximum:
    * surviving pairs only lost count, and a pair created by merging has
    * at most the merged pair's count). */
  def learnBpeDetailed(df: DataFrame, textCol: String, numMerges: Int,
                       maxWordTypes: Int = 1 << 18): Array[(String, String, Long)] = {
    require(numMerges >= 1, s"learnBpe needs numMerges >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = wordHistogram(df, textCol).as[(String, Long)]
      // TakeOrdered — bounded driver materialization, no full sort
      .orderBy(col("n").desc, col("word")).limit(maxWordTypes)
      .collect()
    learnFromHistogramDetailed(hist, numMerges)
  }

  /** The driver-local merge loop, exposed for testing against the
    * published worked examples. */
  private[pipeline] def learnFromHistogram(hist: Array[(String, Long)],
                                           numMerges: Int): Array[(String, String)] =
    learnFromHistogramDetailed(hist, numMerges).map { case (l, r, _) => (l, r) }

  private[pipeline] def learnFromHistogramDetailed(hist: Array[(String, Long)],
                                           numMerges: Int): Array[(String, String, Long)] = {
    // words as mutable symbol arrays; parallel count array
    val words = hist.map { case (w, _) =>
      val cs = w.map(_.toString).toBuffer
      cs += EndOfWord
      cs
    }
    val counts = hist.map(_._2)
    // pair -> total count across word types; pair -> set of word indices
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addPairs(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        val nc = pairCount.getOrElse(p, 0L) + sign * counts(wi)
        if (nc <= 0L) pairCount.remove(p) else pairCount(p) = nc
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))
    val merges = Array.newBuilder[(String, String, Long)]
    var m = 0
    while (m < numMerges && pairCount.nonEmpty) {
      // most frequent pair; ties broken lexicographically for determinism
      var best: (String, String) = null
      var bestN = 0L
      pairCount.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && (best == null ||
            p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestN = n
        }
      }
      merges += ((best._1, best._2, bestN))
      val joined = best._1 + best._2
      val affected = pairWords.getOrElse(best, mutable.BitSet.empty).toArray
      affected.foreach { wi =>
        val w = words(wi)
        var i = 0
        var touched = false
        while (i < w.length - 1) {
          if (w(i) == best._1 && w(i + 1) == best._2) touched = true
          i += 1
        }
        if (touched) {
          addPairs(wi, -1L)
          i = 0
          while (i < w.length - 1) {
            if (w(i) == best._1 && w(i + 1) == best._2) {
              w(i) = joined
              w.remove(i + 1)
            } else i += 1
          }
          addPairs(wi, 1L)
        }
      }
      pairCount.remove(best)
      pairWords.remove(best)
      m += 1
    }
    merges.result()
  }

  /** Tokenize one word with a learned merge ranking: repeatedly apply
    * the LOWEST-RANK applicable merge (leftmost occurrence first) — the
    * standard greedy BPE apply, deterministic. */
  private[pipeline] def encodeWord(word: String,
                                   rank: Map[(String, String), Int]): Array[String] = {
    val w = word.map(_.toString).toBuffer
    w += EndOfWord
    var done = false
    while (!done && w.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < w.length - 1) {
        rank.get((w(i), w(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        w(bestAt) = w(bestAt) + w(bestAt + 1)
        w.remove(bestAt + 1)
      }
    }
    w.toArray
  }

  /** Apply learned merges to every document: (idCol, tokens, n_tokens)
    * with `tokens` the concatenated subword stream of the document's
    * whitespace words. One broadcast of the merge table; per-partition
    * word → encoding memo. */
  def applyBpe(df: DataFrame, idCol: String, textCol: String,
               merges: Array[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val r = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        rows.map { case (id, text) =>
          val out = Array.newBuilder[String]
          TextAnalysis.fastTokens(text).foreach { w =>
            out ++= memo.getOrElseUpdate(w, encodeWord(w, r))
          }
          val toks = out.result()
          (id, toks, toks.length)
        }
      }.toDF(idCol, "tokens", "n_tokens")
  }
}
