package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. Everything
  * is native Catalyst expressions (split / higher-order functions / regexp)
  * — no UDFs, so the whole surface stays inside whole-stage codegen and
  * scales as a pure map over the corpus: no shuffle, no driver data.
  */
object TextAnalysis {

  /** whitespace tokenization (trimmed, collapsed whitespace) */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** A BPE-ish subword count: word count + one extra per 4 chars of long
    * words — a deterministic proxy for tokenizer load estimation. */
  def subwordCount(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, w) => acc + greatest(ceil(length(w) / 4.0).cast("long"), lit(1L)))

  // ---- quality scoring (length / punctuation / stopword ratios) ----------

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and",
    "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))) /
      greatest(length(c), lit(1)).cast("double")

  def stopwordRatio(c: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(tokens(c), t => array_contains(stopArr, t))) /
      greatest(size(tokens(c)), lit(1)).cast("double")
  }

  def meanWordLen(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, w) => acc + length(w)) /
      greatest(size(tokens(c)), lit(1)).cast("double")

  /** Composite quality score in [0,1]: rewards mid-length docs with typical
    * word lengths and some (not too much) punctuation + stopword presence. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c) / lit(500.0), lit(1.0))
    val wordScore = lit(1.0) - least(abs(meanWordLen(c) - lit(5.0)) / lit(5.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * lit(10.0), lit(1.0))
    val stopScore = least(stopwordRatio(c) * lit(4.0), lit(1.0))
    (lenScore + wordScore + punctScore + stopScore) / lit(4.0)
  }

  // ---- language identification (stopword-hit heuristic) -------------------

  /** Per-language marker wordlists (tiny, high-frequency function words). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "del", "por", "con", "para", "como"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不", "这", "中"))

  /** Hit count of language markers among the tokens (zh matched by
    * substring since Chinese text is unsegmented). */
  def langScore(c: Column, lang: String,
                markers: Seq[String]): Column =
    if (lang == "zh")
      markers.map(m => (length(c) - length(regexp_replace(c, m, ""))) / length(lit(m)))
        .reduce(_ + _)
    else {
      val arr = array(markers.map(lit): _*)
      size(filter(tokens(c), t => array_contains(arr, t)))
    }

  /** argmax language by marker hits; ties break by LangMarkers order. */
  def languageId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(c, l, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = scores.reverse.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
    when(c.isNotNull, pred) // null text → null, not "und"
  }

  /** Language ID with the scores MATERIALIZED as columns first. The
    * Column-form above re-evaluates each interpreted filter/aggregate HOF
    * (and the tokenization inside it) once in the `greatest` and again per
    * `when` branch — ~3× redundant work. Three stacked projections (tokens →
    * scores → argmax) are kept apart by Catalyst's CollapseProject non-cheap
    * multi-reference rule, so each score evaluates exactly once. Semantics
    * identical to `languageId`. */
  def withLanguageId(df: DataFrame, textCol: String,
                     out: String = "lang_pred"): DataFrame = {
    val toksCol = "__li_toks"
    val scoreCol = LangMarkers.map { case (l, _) => l -> s"__li_$l" }.toMap
    val withToks = df.withColumn(toksCol, tokens(col(textCol)))
    val withScores = LangMarkers.foldLeft(withToks) { case (d, (l, ms)) =>
      val sc =
        if (l == "zh") langScore(col(textCol), l, ms)
        else {
          val arr = array(ms.map(lit): _*)
          size(filter(col(toksCol), t => array_contains(arr, t)))
        }
      d.withColumn(scoreCol(l), sc)
    }
    val scores = LangMarkers.map { case (l, _) =>
      l -> col(scoreCol(l)).cast("double")
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = scores.reverse.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
    withScores.withColumn(out, when(col(textCol).isNotNull, pred))
      .drop(toksCol +: LangMarkers.map { case (l, _) => scoreCol(l) }: _*)
  }

  // ---- fingerprinting ------------------------------------------------------

  /** 64-bit document fingerprint: rolling rotate-xor hash over token
    * xxhash64s — order-sensitive, whitespace-normalized (documents that
    * differ only in whitespace/trim share a fingerprint). Rotate-xor keeps
    * every step inside the long domain (no ANSI overflow, unlike a
    * polynomial acc*31+h fold). */
  def fingerprint(c: Column): Column =
    aggregate(transform(tokens(c), t => xxhash64(t)), lit(0L),
      (acc, h) => shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
        .bitwiseXOR(h))

  /** Corpus vocabulary: one explode + one grouped agg giving each token's
    * total occurrence count and document frequency (exact distinct — at
    * 100 TB swap `approx_count_distinct` in; token cardinality is
    * Zipf-bounded so the shuffle is small next to the corpus). The vocab
    * builder for tokenizer training / frequency-filtered feature sets. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 1L): DataFrame =
    // internal aliases carry the __graft prefix so an idCol literally
    // named "token" can't make the groupBy ambiguous
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).as("__graft_id"),
        explode(tokens(col(textCol))).as("__graft_token"))
      .filter(col("__graft_token") =!= "")
      .groupBy("__graft_token")
      .agg(count(lit(1)).as("count"),
        countDistinct(col("__graft_id")).as("doc_freq"))
      .filter(col("count") >= minCount)
      .withColumnRenamed("__graft_token", "token")

  /** PII scrubbing for training corpora: emails, IPv4 addresses, and
    * long digit runs (phone/account numbers) replaced with typed
    * placeholder tokens. Pure codegen'd regexp_replace chain — no UDF, no
    * shuffle. Patterns deliberately use only constructs with identical
    * semantics in Java regex and RE2 (character classes, bounded repeats,
    * \d, word boundaries), so the scrub is reproducible outside Spark. */
  def scrubPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{7,}\\b", "<NUM>")
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", table A1):
    * the standard quality filters for removing boilerplate- and
    * repetition-heavy documents from a training corpus. Computed in ONE
    * typed JVM pass per row (tokenize once, hash-map counts) — a pure
    * per-row map with no shuffle; the interpreted-HOF formulation would
    * re-walk the token array per n-gram size. Signals:
    *
    *  - `n_lines`, `dup_line_frac`: trimmed non-empty lines; fraction of
    *    line occurrences beyond the first of their value;
    *  - `dup_line_char_frac`: characters in lines occurring >1 time (all
    *    occurrences) over total line characters;
    *  - `top_{2,3}gram_char_frac`: chars covered by the most frequent
    *    word n-gram (count × n-gram length, ties broken by smallest
    *    n-gram for determinism) over total text length;
    *  - `dup_{5,10}gram_char_frac`: Σ (count−1) × length over n-grams
    *    occurring >1 time, over total text length — a documented
    *    simplification of Gopher's coverage measure (overlapping
    *    occurrences are each charged, not merged).
    *
    * Documents shorter than n tokens contribute 0 for that n-gram signal.
    * All ratios are exact integer quotients — bit-identical to any engine
    * computing the same counts (the DuckDB oracle reproduces them). */
  def repetitionSignals(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        // ---- line signals --------------------------------------------------
        val lines = text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toArray
        val nLines = lines.length
        val lineCounts = new java.util.HashMap[String, Int]()
        var lineChars = 0L
        lines.foreach { l =>
          lineCounts.merge(l, 1, (a, b) => a + b); lineChars += l.length
        }
        var dupLineChars = 0L
        lineCounts.forEach { (l, c) =>
          if (c > 1) dupLineChars += c.toLong * l.length
        }
        val dupLineFrac =
          if (nLines == 0) 0.0
          else (nLines - lineCounts.size).toDouble / nLines
        val dupLineCharFrac =
          if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars
        // ---- n-gram signals ------------------------------------------------
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        val total = text.length.toDouble
        def counts(n: Int): java.util.HashMap[String, Int] = {
          val m = new java.util.HashMap[String, Int]()
          var i = 0
          while (i + n <= toks.length) {
            val sb = new StringBuilder(toks(i))
            var j = 1
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            m.merge(sb.toString, 1, (a, b) => a + b)
            i += 1
          }
          m
        }
        def topFrac(n: Int): Double =
          if (toks.length < n || total == 0) 0.0
          else {
            var bestC = 0
            var bestG: String = null
            counts(n).forEach { (g, c) =>
              if (c > bestC || (c == bestC && (bestG == null || g < bestG))) {
                bestC = c; bestG = g
              }
            }
            bestC.toLong * bestG.length / total
          }
        def dupFrac(n: Int): Double =
          if (toks.length < n || total == 0) 0.0
          else {
            var dup = 0L
            counts(n).forEach { (g, c) =>
              if (c > 1) dup += (c - 1).toLong * g.length
            }
            dup / total
          }
        (id, nLines.toLong, dupLineFrac, dupLineCharFrac,
          topFrac(2), topFrac(3), dupFrac(5), dupFrac(10))
      }
      .toDF(idCol, "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac",
        "dup_5gram_char_frac", "dup_10gram_char_frac")
  }

  /** Convenience: append all analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    withLanguageId(
      df.withColumn("n_tokens", tokenCount(c))
        .withColumn("n_subwords", subwordCount(c))
        .withColumn("punct_ratio", punctRatio(c))
        .withColumn("stopword_ratio", stopwordRatio(c))
        .withColumn("mean_word_len", meanWordLen(c))
        .withColumn("quality", qualityScore(c))
        .withColumn("fingerprint", fingerprint(c)),
      textCol)
  }
}
