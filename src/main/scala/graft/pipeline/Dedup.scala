package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100-TB shape of the problem:
  *
  *  - exact: hash-groupBy on the content — one shuffle keyed by the text
  *    (or its xxhash64 for shorter shuffle keys);
  *  - MinHash + LSH: per-row signature (pure map), explode to `bands`
  *    bucket keys (shuffle of #rows × bands SMALL rows), pairs only within
  *    buckets — never the O(n²) cross join;
  *  - SimHash: per-row 64-bit signature (pure map) + bucket join on
  *    rotated prefixes;
  *  - n-gram Jaccard: exact verify for candidate pairs via token explode;
  *  - embedding cosine: random-hyperplane LSH buckets, exact cosine only
  *    within buckets.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.Dedup")

  // ---- exact ---------------------------------------------------------------

  /** Keep the min-id row per distinct content value. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** ids of rows that would be dropped by exact dedup. */
  def exactDuplicates(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1).drop("__rn")
  }

  /** Canonical text form for normalized exact dedup (the CCNet/Gopher
    * "fuzzy-exact" key): lowercase, every non-[a-z0-9-whitespace] char →
    * space, whitespace runs collapsed, ends trimmed. Catches the
    * re-crawl/re-render duplicates exact dedup misses (case, punctuation,
    * spacing churn) while staying a pure column expression — a native
    * single-pass codegen'd [[graft.expr.NormalizeText]] (byte-identical
    * to the lower→regexp→regexp→trim chain it replaced, which paid two
    * full regex scans per document and was the measured per-row CPU
    * wall of this family), pushing through the same one-shuffle plan as
    * [[exact]]. Deliberately drops accents/non-ASCII letters to spaces;
    * pipe through `graft.expr.RemoveAccents` first when accented text
    * must survive. */
  val normalizeText: Column => Column = c => graft.expr.NormalizeText.of(c)

  /** [[exact]] over the normalized form: keep the min-id row per
    * canonical text, with the surviving row's ORIGINAL text and the
    * normalized key. Same one-shuffle shape as [[exact]] — the min
    * aggregate carries (id, original) as a struct so no second join or
    * window pass is needed. */
  def normalizedDedup(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    df.groupBy(normalizeText(col(textCol)).as("norm_text"))
      .agg(min(struct(col(idCol), col(textCol))).as("__keep"),
        count(lit(1)).as("dup_count"))
      .select(col(s"__keep.$idCol"), col(s"__keep.$textCol"),
        col("norm_text"), col("dup_count"))

  // ---- score-based survivors -----------------------------------------------

  /** Per dedup group keyed by `key`: the FULL row of the highest-score
    * member (ties → min id; null scores rank below every non-null score,
    * so an all-null group falls back to the min-id survivor) plus
    * `dup_count`. One shuffle — `max_by` over a (score, −id) ordering
    * struct partial-aggregates map-side, so a boilerplate key with 10⁶
    * duplicates combines before it moves (the window-function
    * formulation would sort the whole group on one reducer instead).
    * `payloadCols` names the columns carried through (callers pass the
    * pre-labeling column set so internal join keys don't leak). */
  private def keepBestBy(df: DataFrame, key: Column,
                         payloadCols: Seq[String], idCol: String,
                         scoreCol: String): DataFrame = {
    val ord = struct(
      coalesce(col(scoreCol).cast("double"),
        lit(Double.NegativeInfinity)).as("__s"),
      (-col(idCol)).as("__t"))
    df.groupBy(key.as("__key"))
      .agg(max_by(struct(payloadCols.map(col): _*), ord).as("__best"),
        count(lit(1)).as("dup_count"))
      .select(payloadCols.map(c =>
        col("__best").getField(c).as(c)) :+ col("dup_count"): _*)
  }

  /** [[exact]] with a QUALITY survivor: keep the highest-`scoreCol` row
    * per identical content (ties → min id), not the min-id row. The
    * curation shape real pipelines want — when a re-crawl carries better
    * metadata or a cleaner render of the same text, the best copy
    * survives. Output = the surviving rows (all input columns) +
    * `dup_count`. */
  def exactKeepBest(df: DataFrame, idCol: String, contentCol: String,
                    scoreCol: String): DataFrame =
    keepBestBy(df, col(contentCol), df.columns.toSeq, idCol, scoreCol)

  /** [[normalizedDedup]] with the quality survivor — best row per
    * CANONICAL text ([[normalizeText]]). */
  def normalizedKeepBest(df: DataFrame, idCol: String, textCol: String,
                         scoreCol: String): DataFrame =
    keepBestBy(df, normalizeText(col(textCol)), df.columns.toSeq, idCol,
      scoreCol)

  /** [[nearDedupByComponent]] with the quality survivor: given near-dup
    * `pairs` (id_a, id_b, …), keep the highest-score member of each
    * connected component (ties → min id); rows in no pair survive
    * untouched (they are their own singleton component). Unlike the
    * min-id variant this must JOIN the component labels onto the corpus
    * (the survivor identity depends on scores, not labels alone): the
    * label table is collected and broadcast when it holds at most
    * `maxBroadcastRows` ids — its size is the number of PAIR-INVOLVED
    * docs, not the corpus — else it ships as a shuffle join for AQE to
    * plan. Output = surviving rows + `dup_count` (component size among
    * corpus rows). */
  def nearDedupKeepBest(df: DataFrame, idCol: String, pairs: DataFrame,
                        scoreCol: String,
                        maxBroadcastRows: Long = 1L << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val comp = Components.connectedComponents(pairs)
    val labels =
      if (comp.count() <= maxBroadcastRows) {
        val rows = comp.select(col("id"), col("component"))
          .as[(Long, Long)].collect().toSeq
        comp.unpersist(blocking = false)
        broadcast(spark.createDataset(rows).toDF("__cid", "__comp0"))
      } else comp.select(col("id").as("__cid"),
        col("component").as("__comp0"))
    val labeled = df
      .join(labels, col(idCol) === col("__cid"), "left")
      .withColumn("__grp",
        coalesce(col("__comp0"), col(idCol).cast("long")))
    keepBestBy(labeled, col("__grp"), df.columns.toSeq, idCol, scoreCol)
  }

  // ---- shingles / n-grams --------------------------------------------------

  /** word n-gram array via native HOFs: slide a window over the tokens.
    * The token array is bound ONCE through a lambda variable (transform
    * over a 1-element array, then flatten): interpreted HOF evaluation
    * re-runs inline subtrees per element access, so referencing the
    * split from `size` AND every `slice` would otherwise re-tokenize
    * O(len) times per row — the q_lm_score 42 s lesson. */
  def wordNgrams(c: Column, n: Int): Column =
    flatten(transform(array(TextAnalysis.tokens(c)), toks =>
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))))

  // ---- MinHash + LSH -------------------------------------------------------

  /** MinHash signature from a MATERIALIZED shingle-array column: for seed
    * s, min over shingles of xxhash64(shingle, s). The shingle array must
    * be a real column (not an inline expression) — otherwise Catalyst
    * re-evaluates the shingling once per hash seed. Kept as the
    * expression-level form; the hot path below uses the typed variant. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(shingles, sh => xxhash64(sh, lit(s))))
    }: _*)

  /** JVM-side shingling: distinct word n-grams of a text (same semantics
    * as wordNgrams: whitespace tokens, whole text when shorter than n).
    * Tokenizes via [[TextAnalysis.fastTokens]] (hand-rolled scan — the
    * regex split was the measured residual of the whole dedup tier);
    * note `[]` vs split's `[""]` on whitespace-only text folds to the
    * same `Array("")` through the short-text branch below. */
  private[pipeline] def shinglesOf(text: String, n: Int): Array[String] = {
    val toks = TextAnalysis.fastTokens(text)
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val seen = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen += sb.toString
        i += 1
      }
      seen.toArray
    }
  }

  /** (id, shingle-hash) exploded pairs computed in one typed JVM pass — the
    * interpreted HOF pipeline (split→transform→slice→concat_ws→explode)
    * costs ~10× more per row. Shingles are deduped as STRINGS per doc, then
    * emitted as 64-bit hashes: join/shuffle keys shrink from ~25-byte
    * strings to 8-byte longs, and downstream set-intersection joins compare
    * longs. (64-bit collisions across a corpus's distinct shingles are
    * ~1e-8-probable; an exactness-critical caller can switch to
    * `shingledStrings`.) */
  def shingled(df: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "shingled")
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq(idCol, textCol)) // null rows can't shingle or join
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        shinglesOf(text, n).map(sh => (id, hash64(sh)))
      }
      .toDF("__id", "sh")
  }

  /** String-keyed variant of `shingled` for collision-free exact joins. */
  def shingledStrings(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) => shinglesOf(text, n).map(sh => (id, sh)) }
      .toDF("__id", "sh")
  }

  /** 64-bit string hash (two murmur32 halves) — same mix used across the
    * engine's fingerprints. */
  @inline private[pipeline] def hash64(t: String): Long = {
    val hi = scala.util.hashing.MurmurHash3.stringHash(t, 41)
    val lo = scala.util.hashing.MurmurHash3.stringHash(t, 97)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }

  // deterministic 64-bit finalizer (SplitMix64) for seed derivation
  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // deterministic affine mixers for single-hash minhash derivation
  private[pipeline] def mixers(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(i => splitmix(i * 2L + 1) | 1L)
    val b = Array.tabulate(numHashes)(i => splitmix(i * 2L + 2))
    (a, b)
  }

  /** Candidate near-dup pairs via banded LSH over the minhash signature.
    * numHashes must be divisible by bands; rows agreeing on ALL values in
    * at least one band become candidates. Defaults (63 hashes, 21 bands,
    * r=3) put the S-curve threshold at ≈0.36 Jaccard: pairs ≥0.7 are
    * caught with P ≈ 1−4e−7 while j≈0.05 noise pairs collide with
    * P ≈ 2.6e−3 — the candidate set stays linear in corpus size. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 63,
                        bands: Int = 21): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    Similarity.requireIntegralId(df, idCol, "minhashCandidates")
    val rowsPerBand = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._
    val (ma, mb) = mixers(numHashes)
    // one string hash per shingle, numHashes affine derivations (universal
    // hashing) — 60× fewer string hashes than hashing per (shingle, seed),
    // and a tight JIT'd loop instead of interpreted HOF evaluation
    val banded = df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val shs = shinglesOf(text, shingleSize)
        val sig = Array.fill(numHashes)(Long.MaxValue)
        var s = 0
        while (s < shs.length) {
          val h = hash64(shs(s))
          var i = 0
          while (i < numHashes) {
            val v = h * ma(i) + mb(i)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
          s += 1
        }
        // fold each band's r signature values (and the band index) into one
        // bucket key — rows from different bands can never collide on it
        (0 until bands).iterator.map { b =>
          var key = 1125899906842597L + b
          var i = b * rowsPerBand
          while (i < (b + 1) * rowsPerBand) {
            key = key * 31 + sig(i)
            i += 1
          }
          (key, id)
        }
      }
    // posting-list pair generation, deduped across bands
    pairsByKey(banded).distinct()
  }

  /** Ordered (id_a, id_b) pairs of ids sharing a key — posting-list pair
    * generation. One shuffle of the (key, id) rows (a self-join would
    * shuffle BOTH sides), pairs emitted from a JIT'd nested loop per
    * posting list. A key's posting list is materialized, and an f-frequent
    * key emits f²/2 pairs — the same quadratic blowup a self-join has; at
    * scale, stop-list ultra-frequent keys before calling, or bound memory
    * with `maxPostingList` (over-cap lists are SKIPPED — only acceptable
    * for candidate generation, never for exact joins, hence the
    * exact-friendly unbounded default). */
  private[graft] def pairsByKey(keyed: org.apache.spark.sql.Dataset[(Long, Long)],
                                maxPostingList: Int = Int.MaxValue): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val skipAcc = graft.util.SkipMetrics.counter(
      "pairsByKey.skippedPostingLists", spark)
    keyed.groupByKey(_._1).flatMapGroups { (_, it) =>
      // cap + 1 would overflow at the unbounded default — saturate instead
      val limit = if (maxPostingList == Int.MaxValue) Int.MaxValue
                  else maxPostingList + 1
      val ids = it.map(_._2).take(limit).toArray
      if (ids.length > maxPostingList) { skipAcc.add(1L); Iterator.empty }
      else {
        java.util.Arrays.sort(ids)
        // pairs stream from lazy nested iterators — per-group memory is
        // O(f), not O(f²) (the FuzzyJoin.candidatesOf GC-death lesson: an
        // eagerly-built pair Array for an f-frequent key is f²/2 tuples
        // held live per task, ×32 concurrent tasks)
        ids.indices.iterator.flatMap { i =>
          val a = ids(i)
          (i + 1 until ids.length).iterator.map(j => (a, ids(j)))
        }
      }
    }.toDF("id_a", "id_b")
  }

  /** Candidate pairs from the shingle inverted index with an explicit
    * document-frequency stop-list: shingles appearing in more than `maxDf`
    * documents are dropped BEFORE pair generation. An f-frequent shingle
    * emits f²/2 pairs, so one stop-list pass removes the quadratic blowup
    * at its source and recall degrades PREDICTABLY — a pair is missed only
    * when every shingle it shares is stop-listed (i.e. its overlap is pure
    * boilerplate) — unlike `maxPostingList`, which truncates whole keys
    * silently at an arbitrary memory bound. The stop-list itself is tiny by
    * construction (only ultra-frequent shingles exceed a high `maxDf`), so
    * it is applied as a broadcast anti-join: no extra shuffle of the
    * posting stream. */
  /** Drop shingles whose document frequency exceeds `maxDf` via ONE
    * broadcast anti-join (the stop list is tiny by construction — only
    * ultra-frequent shingles exceed a high bound, and `shingled` dedups
    * per doc so count(*) per shingle IS the df). Shared by ngramJaccard
    * and ngramCandidates; input must be cached by the caller since it
    * feeds both the df aggregation and the anti-join. */
  private def stopListed(sh: DataFrame, maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) sh
    else {
      val stop = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDf).select("sh")
      sh.join(broadcast(stop), Seq("sh"), "left_anti")
    }

  def ngramCandidates(df: DataFrame, idCol: String, textCol: String, n: Int,
                      maxDf: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = shingled(df, idCol, textCol, n).cache()
    pairsByKey(stopListed(sh, maxDf)
      .select(col("sh"), col("__id")).as[(Long, Long)]).distinct()
  }

  /** Exact n-gram Jaccard. With `candidates` the verify is CANDIDATE-DRIVEN:
    * shingles are attached to each candidate pair and matched — cost is
    * |candidates| × shingles-per-doc, never the shingle-frequency-quadratic
    * all-pairs join. Without candidates it is the exact all-pairs path
    * (shingle-inverted-index self-join).
    *
    * A finite `maxDf` drops shingles appearing in more than `maxDf` docs
    * from the WHOLE computation — jaccard over the INFORMATIVE shingles
    * (sizes and intersections both exclude boilerplate). An f-frequent
    * shingle emits f²/2 pairs, so this one broadcast-anti-join pass removes
    * the quadratic blowup at its source and recall degrades PREDICTABLY —
    * a pair disappears only when its entire overlap is stop-listed — unlike
    * `maxPostingList`, which truncates whole keys silently at a memory
    * bound. (Routing stop-listed CANDIDATES through the pair-attach verify
    * instead was measured 18× slower at sf0.1: with weak filtering the
    * candidate set approaches all overlapping pairs and the verify join
    * explodes to |pairs|×shingles-per-doc rows.)
    *
    * CACHING: the posting stream (and the candidates frame, when given)
    * feed two consumers each, so they are `.cache()`d — lazy plans would
    * otherwise recompute the generator per consumer. The entries stay in
    * the cache manager until LRU eviction (the result is lazy, so there is
    * no sound place to unpersist inside this method); long-lived sessions
    * doing many dedup calls can `spark.catalog.clearCache()` between
    * batches.
    *
    * EAGER on the exact path: without `candidates` (and with
    * `maxDfFraction < 1`) this method runs Spark jobs at CALL time — the
    * pair-mass guard (and the fractional-df doc count) must aggregate the
    * posting frame before the returned plan exists, so the shingling pass
    * executes even if the caller never materializes the result. */
  /** `maxDfFraction` is the SCALE-STABLE form of the df cut: shingles in
    * more than `maxDfFraction` of the documents being shingled (the whole
    * corpus, or the candidate-pair docs when `candidates` is given) are
    * stop-listed. An absolute `maxDf` changes meaning with corpus size —
    * the sf10 study's own finding: maxDf=100 that trims boilerplate at
    * sf0.1 stop-lists nearly everything at 100× replication — while a
    * fraction tracks the corpus. The effective cut is
    * `max(1, floor(maxDfFraction · nDocs))`, combined with `maxDf` by
    * minimum; 1.0 (the default) is a no-op and skips the doc count. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, n: Int,
                   candidates: Option[DataFrame] = None,
                   maxDf: Int = Int.MaxValue,
                   maxDfFraction: Double = 1.0,
                   maxPairMass: Long = 2000000000L): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    // the candidate frame is consumed TWICE below (the id semi-join and the
    // pair join) — cache it, or its generator (an LSH banding pass) runs
    // once per consumer
    val candCached = candidates.map(_.cache())
    // with candidates: only the docs that appear in a candidate pair get
    // shingled — the verify cost tracks |candidates|, not corpus size
    val source = candCached match {
      case Some(cands) =>
        val ids = cands.select(col("id_a").as("__cid"))
          .unionAll(cands.select(col("id_b"))).distinct()
        df.join(broadcast(ids), col(idCol) === col("__cid"), "left_semi")
      case None => df
    }
    // shingled is consumed by BOTH the pair join and the sizes agg —
    // cache so the shingling pass runs once
    val shAll = shingled(source, idCol, textCol, n)
      .withColumnRenamed("__id", idCol).cache()
    // resolve the fractional cut against the docs actually being shingled
    // (one count on the cached posting frame — only when the knob is set)
    val effectiveMaxDf =
      if (maxDfFraction >= 1.0) maxDf
      else {
        val nDocs = shAll.select(idCol).distinct().count()
        math.min(maxDf.toLong,
          math.max(1L, math.floor(maxDfFraction * nDocs).toLong)).toInt
      }
    val sh = if (effectiveMaxDf == Int.MaxValue) shAll
             else stopListed(shAll, effectiveMaxDf).cache()
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val common = candCached match {
      case Some(cands) =>
        val shA = sh.select(col(idCol).as("id_a"), col("sh"))
        val shB = sh.select(col(idCol).as("id_b"), col("sh"))
        cands.join(shA, "id_a").join(shB, Seq("id_b", "sh"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      case None =>
        val spark = sh.sparkSession
        import spark.implicits._
        // pair-mass guard on the EXACT all-pairs path: an f-frequent
        // shingle emits f·(f−1)/2 pairs, so Σ_s f_s² is the row count of
        // the aggregation below — measurable for one cheap agg over the
        // (cached) posting frame BEFORE committing to it. A small shared
        // vocabulary makes this quadratic in corpus size no matter how
        // the pairs are generated (the sf10d finding: 3-gram jaccard over
        // 500k synthetic docs = 30k distinct shingles, mean df ≈ 850,
        // 12.5 BILLION pairs — hours of hash-agg, twice, in one bench
        // row). Past the cap this refuses loudly: a silent skip would
        // change an exact join's output; the scale paths are the df
        // stop-list (maxDf / maxDfFraction) or minhash candidates.
        // decimal(38,0) accumulation: a Long sum of f·(f−1) is non-ANSI
        // and wraps silently past ~9.2e18 (plausible at petabyte corpora
        // with heavy shingle reuse), which would BYPASS the guard; the
        // decimal sum is exact at any scale.
        // CHEAP PROBE FIRST (r13 VERDICT #3 — the measurement agg was
        // q_ngram_stoplist's 1.96× normalized overhead): under a df
        // stop-list every f ≤ effectiveMaxDf, so
        // mass ≤ postings·(maxDf−1)/2 — one COUNT on the cached posting
        // frame, no per-shingle shuffle agg. Only when that bound
        // exceeds the budget (or no stop-list bounds f at all) does the
        // exact measurement run. maxPairMass = Long.MaxValue disables
        // the guard entirely (the radiusJoin convention).
        val needExactMass =
          maxPairMass != Long.MaxValue && {
            if (effectiveMaxDf == Int.MaxValue) true
            else BigInt(sh.count()) * (effectiveMaxDf - 1) / 2 >
              BigInt(maxPairMass)
          }
        if (needExactMass) {
          val mass = sh.groupBy("sh").agg(count(lit(1)).as("__f"))
            .agg(coalesce(
              sum(col("__f").cast("decimal(38,0)") * (col("__f") - 1)),
              lit(0L).cast("decimal(38,0)")).as("__mass"))
            .head().getDecimal(0).toBigInteger
            .divide(java.math.BigInteger.valueOf(2))
          if (mass.compareTo(java.math.BigInteger.valueOf(maxPairMass)) > 0)
            graft.util.SkipMetrics.refuse("ngramJaccard", df.sparkSession,
              s"ngramJaccard: exact all-pairs mass $mass exceeds " +
                s"maxPairMass=$maxPairMass — stop-list boilerplate shingles " +
                "(maxDf / maxDfFraction), pass minhash candidates, or raise " +
                "maxPairMass if you really want the quadratic join")
        }
        pairsByKey(sh.select(col("sh"), col(idCol).cast("long"))
            .as[(Long, Long)])
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    }
    // sizes is #docs rows (tiny next to the pair stream) — broadcast both
    // copies so the common-pairs frame never shuffles for these joins
    common
      .join(broadcast(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("sz", "sz_a")), "id_a")
      .join(broadcast(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("sz", "sz_b")), "id_b")
      .withColumn("jaccard",
        col("common") / (col("sz_a") + col("sz_b") - col("common")))
  }

  /** Exact asymmetric n-gram CONTAINMENT — the subset/quote detector
    * symmetric Jaccard misses: a short doc fully quoted inside a long one
    * has jaccard ≈ |A|/|B| (tiny) but containment(A in B) = 1.
    * Returns [[ngramJaccard]]'s pair frame extended with
    * `cont_a` = common/sz_a (fraction of A's distinct shingles present in
    * B) and `cont_b` = common/sz_b — a pure projection on the jaccard
    * plan, so the cost and caching behavior are exactly ngramJaccard's.
    *
    * SCALE NOTE: banded-minhash candidates are tuned to the SYMMETRIC
    * S-curve and under-recall high-containment/low-jaccard pairs (the
    * interesting ones here), so don't feed [[minhashCandidates]] in as
    * `candidates` for containment work. The scale lever for this operator
    * is the df stop-list (`maxDfFraction`): containment pairs share the
    * contained doc's shingles verbatim, which a fractional cut preserves
    * while it removes the boilerplate-driven pair blowup. */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, candidates: Option[DataFrame] = None,
                       maxDf: Int = Int.MaxValue,
                       maxDfFraction: Double = 1.0): DataFrame =
    ngramJaccard(df, idCol, textCol, n, candidates, maxDf, maxDfFraction)
      .withColumn("cont_a", col("common") / col("sz_a"))
      .withColumn("cont_b", col("common") / col("sz_b"))

  /** Prefix-filtered containment candidates (the AllPairs/PPJoin prefix
    * principle, Bayardo et al. WWW'07, adapted to asymmetric containment):
    * under ANY fixed total order of the shingle universe, a pair with
    * containment(A in B) ≥ t must share one of A's first
    * `|A| − ⌈t·|A|⌉ + 1` shingles — if B avoided that whole prefix, the
    * intersection would fit inside A's remaining ⌈t·|A|⌉ − 1 shingles,
    * below the t·|A| overlap the containment requires. Ordering by
    * (document frequency asc, shingle asc) makes the prefix the RAREST
    * shingles, so the candidate join costs Σ_prefix-shingle df(s). Recall
    * is EXACT (a theorem, not a tuning knob): every pair with
    * max(cont_a, cont_b) ≥ t appears, both orientations covered because
    * every doc contributes a prefix. Returns ordered (id_a, id_b)
    * candidates for [[ngramContainment]]'s candidate-driven verify.
    *
    * WHEN IT PAYS — measured honestly: the filter wins only when a doc's
    * rarest shingles are DISCRIMINATIVE (df ≈ 1-2, the heavy-tailed
    * shape of real web text, where candidates ≈ true pairs). On the
    * synthetic test corpus the rare-shingle dfs average ~7 and the
    * filter emits 180k candidates for 256 true pairs at sf0.1 — the
    * candidate-driven verify then COSTS MORE than the all-pairs join
    * (measured 5.2 s vs 1.2 s at sf0.1, 214 s vs 27 s at sf1; NOTES
    * round-9 third session). Probe candidate density before committing
    * to this path: `containmentCandidates(...).count()` against the
    * expected pair count — if candidates ≫ pairs, run the all-pairs
    * [[ngramContainment]] (or add a positional filter, the PPJoin
    * refinement this tier deliberately leaves out). */
  def containmentCandidates(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    // posting stream feeds the df count, the prefix ranking, and the
    // full-side join — cache so shingling runs once
    val sh = shingled(df, idCol, textCol, n).cache()
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    val ranked = sh.join(dfreq, "sh")
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("__id")
    val order = byDoc.orderBy(col("__df").asc, col("sh").asc)
    val prefix = ranked
      .withColumn("__rn", row_number().over(order))
      .withColumn("__sz", count(lit(1)).over(byDoc))
      .filter(col("__rn") <=
        col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
      .select(col("sh"), col("__id").as("__pid"))
    prefix.join(sh.select(col("sh"), col("__id").as("__fid")), "sh")
      .filter(col("__pid") =!= col("__fid"))
      .select(least(col("__pid"), col("__fid")).as("id_a"),
        greatest(col("__pid"), col("__fid")).as("id_b"))
      .distinct()
  }

  /** Prefix-filtered candidates + exact candidate-driven verify — the
    * SAME output as the all-pairs [[ngramContainment]] filtered at
    * `threshold` (exact-recall candidates, exact verify;
    * q_containment_prefix pins the equality against the all-pairs
    * oracle). See [[containmentCandidates]]'s WHEN-IT-PAYS note: this is
    * the right path on heavy-tailed real-text df distributions, and the
    * WRONG one when rare shingles aren't discriminative. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9): DataFrame =
      graft.util.Errors.context("containmentPairs", Seq(idCol, textCol)) {
    val cands = containmentCandidates(df, idCol, textCol, n, threshold)
    ngramContainment(df, idCol, textCol, n, Some(cands))
      .filter(col("cont_a") >= threshold || col("cont_b") >= threshold)
  }

  /** Containment victims: docs whose distinct-shingle set is ≥ `threshold`
    * contained in a BIGGER doc. "Bigger" is the strict order
    * (sz, −id): doc B beats doc A iff containment(A in B) ≥ threshold and
    * (sz_b > sz_a, or sz_b = sz_a and id_b < id_a) — a strict partial
    * order, so no removal cycles: survivors are exactly the docs no other
    * doc beats, and at least one member of every mutual-containment clique
    * survives (the min id among the largest). One row per victim:
    * (id, kept_in, containment) with `kept_in` the beating partner of
    * highest containment (ties → smallest partner id) — deterministic for
    * the oracle replay. */
  def containedDocs(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, threshold: Double = 0.9,
                    maxDf: Int = Int.MaxValue,
                    maxDfFraction: Double = 1.0): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    graft.util.Errors.context("containedDocs", Seq(idCol, textCol)) {
    val pairs = ngramContainment(df, idCol, textCol, n, None, maxDf,
      maxDfFraction)
    // orient each ordered pair into (victim, keeper) rows under the strict
    // (sz, -id) order; both orientations can fire on mutual containment of
    // unequal sizes — the window below picks one keeper per victim
    val aLoses = pairs
      .filter(col("cont_a") >= threshold &&
        (col("sz_b") > col("sz_a") ||
          (col("sz_b") === col("sz_a") && col("id_b") < col("id_a"))))
      .select(col("id_a").as("id"), col("id_b").as("kept_in"),
        col("cont_a").as("containment"))
    val bLoses = pairs
      .filter(col("cont_b") >= threshold &&
        (col("sz_a") > col("sz_b") ||
          (col("sz_a") === col("sz_b") && col("id_a") < col("id_b"))))
      .select(col("id_b").as("id"), col("id_a").as("kept_in"),
        col("cont_b").as("containment"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("containment").desc, col("kept_in").asc)
    aLoses.unionAll(bLoses)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  } }

  /** Corpus with containment victims removed — [[containedDocs]]'s
    * complement via one broadcast anti-join (the victim list is bounded by
    * the pair set, tiny next to the corpus). */
  def containmentDedup(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9,
                       maxDf: Int = Int.MaxValue,
                       maxDfFraction: Double = 1.0): DataFrame = {
    val victims = containedDocs(df, idCol, textCol, n, threshold, maxDf,
      maxDfFraction).select(col("id").as("__victim"))
    df.join(broadcast(victims), col(idCol) === col("__victim"), "left_anti")
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact verify →
    * pairs above threshold.
    *
    * The candidate-driven verify costs |candidates| × shingles-per-doc
    * attach rows — the right plan when the banding filters hard. On a
    * DUP-HEAVY corpus (every doc in a large near-dup clique) candidates
    * approach all clique pairs and the verify dominates (measured 325 s
    * at the sf10 replica corpus, where every doc sits in a 100-clique ⇒
    * ~25M true pairs — the output itself is quadratic in clique size).
    * `maxDf` stop-lists ultra-frequent shingles out of the verify
    * (jaccard over the informative shingles — [[ngramJaccard]]'s
    * semantics note) — the right lever when the pair explosion is
    * BOILERPLATE-driven. It is NOT a fix for genuine near-dup cliques:
    * the df cut is absolute, so on a replica-inflated corpus it mostly
    * shrinks the effective problem instead of the cost (measured: 195 s
    * and a 909-pair remnant at sf10 with maxDf=100). When the cliques
    * are real, collapse them first (near-dedup at a lower SF /
    * [[exact]] / [[lineDedup]]) or go straight to the component
    * workflow — the pair set, not the plan, is the cost.
    *
    * Prefer `maxDfFraction` over `maxDf` when the corpus size isn't
    * fixed: the fractional cut keeps its meaning across scale (see
    * [[ngramJaccard]] for the resolution rule). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, numHashes: Int = 63,
                   bands: Int = 21, threshold: Double = 0.7,
                   maxDf: Int = Int.MaxValue,
                   maxDfFraction: Double = 1.0): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleSize, numHashes, bands)
    ngramJaccard(df, idCol, textCol, shingleSize, Some(cands), maxDf,
        maxDfFraction)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Cross-side banded-LSH candidates: a new BATCH against a STANDING
    * corpus — the text companion of [[embeddingDedupAgainst]]. The minhash
    * signature derivation is identical to [[minhashCandidates]] (seeded
    * affine mixers — no stored model, both sides band identically on any
    * cluster), so candidate recall follows the same S-curve. ONE shuffle
    * on the band bucket key; per-bucket loops pair BATCH × CORPUS only —
    * the corpus never pairs with itself, so a huge standing corpus adds
    * linear bucket mass, not quadratic pair work. Ids must be unique
    * across batch ∪ corpus (they key the downstream verify).
    * Returns (id_a = batch id, id_b = corpus id).
    *
    * Band buckets above `maxBucket` rows are SKIPPED (same policy as
    * [[pairsByKey]]'s note): an over-cap bucket is a degenerate
    * boilerplate band signature whose pairs would be quadratic —
    * acceptable for CANDIDATE generation, but it is silent recall loss on
    * boilerplate-heavy corpora. Skips are counted in the Spark
    * accumulator `graft.minhashCandidatesAgainst.skippedBuckets` (visible
    * in the UI / status store for the job that materializes the result,
    * or returned by [[minhashCandidatesAgainstCounted]]); a non-zero
    * count means docs whose only overlap is boilerplate were never
    * candidates. ACCUMULATOR SEMANTICS: the count is updated inside a
    * transformation, so it is an AT-LEAST-ONCE upper bound — task retries
    * and speculative execution can over-count (exact on retry-free runs),
    * and it stays 0 until the result DataFrame is materialized. The
    * zero/non-zero diagnostic signal is reliable either way. */
  def minhashCandidatesAgainst(batch: DataFrame, corpus: DataFrame,
                               idCol: String, textCol: String,
                               shingleSize: Int = 3, numHashes: Int = 63,
                               bands: Int = 21,
                               maxBucket: Int = 1 << 20): DataFrame =
    minhashCandidatesAgainstCounted(batch, corpus, idCol, textCol,
      shingleSize, numHashes, bands, maxBucket)._1

  /** [[minhashCandidatesAgainst]] plus its skipped-bucket accumulator, so
    * a pipeline can assert `acc.value == 0` programmatically after
    * materializing the result (see the accumulator-semantics note there:
    * at-least-once, populated only after an action). */
  def minhashCandidatesAgainstCounted(batch: DataFrame, corpus: DataFrame,
                               idCol: String, textCol: String,
                               shingleSize: Int = 3, numHashes: Int = 63,
                               bands: Int = 21,
                               maxBucket: Int = 1 << 20): (DataFrame, org.apache.spark.util.LongAccumulator) = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    Similarity.requireIntegralId(batch, idCol, "minhashCandidatesAgainst")
    Similarity.requireIntegralId(corpus, idCol, "minhashCandidatesAgainst")
    val rowsPerBand = numHashes / bands
    val spark = batch.sparkSession
    import spark.implicits._
    val skipped = spark.sparkContext.longAccumulator(
      "graft.minhashCandidatesAgainst.skippedBuckets")
    val (ma, mb) = mixers(numHashes)
    def banded(df: DataFrame, isBatch: Boolean) = df
      .na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val shs = shinglesOf(text, shingleSize)
        val sig = Array.fill(numHashes)(Long.MaxValue)
        var s = 0
        while (s < shs.length) {
          val h = hash64(shs(s))
          var i = 0
          while (i < numHashes) {
            val v = h * ma(i) + mb(i)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
          s += 1
        }
        (0 until bands).iterator.map { b =>
          var key = 1125899906842597L + b
          var i = b * rowsPerBand
          while (i < (b + 1) * rowsPerBand) {
            key = key * 31 + sig(i)
            i += 1
          }
          (key, isBatch, id)
        }
      }
    val result = banded(batch, isBatch = true)
      .union(banded(corpus, isBatch = false))
      .groupByKey(_._1).flatMapGroups { (_, it) =>
        val limit = if (maxBucket == Int.MaxValue) Int.MaxValue else maxBucket + 1
        val rows = it.take(limit).toArray
        if (rows.length > maxBucket) { skipped.add(1L); Iterator.empty }
        else {
          val (bs, cs) = rows.partition(_._2)
          val out = Array.newBuilder[(Long, Long)]
          bs.foreach { case (_, _, bid) =>
            cs.foreach { case (_, _, cid) => out += ((bid, cid)) }
          }
          out.result().iterator
        }
      }.toDF("id_a", "id_b").distinct()
    (result, skipped)
  }

  /** Incremental TEXT near-dup screen: batch documents whose n-gram
    * Jaccard against some standing-corpus document reaches `threshold` —
    * [[minhashCandidatesAgainst]] cross-side candidates, exact-verified
    * through the candidate-driven [[ngramJaccard]] path (so, like
    * [[minhashDedup]], the output has NO false positives; recall is the
    * banding S-curve). Completes the incremental-ingestion tier:
    * [[bloomNewRows]] kills exact re-crawls, this kills near-duplicate
    * re-texts, [[nearNewRows]] kills semantic re-embeds.
    * Returns (id_a = batch id, id_b = corpus id, jaccard).
    *
    * CONTRACT — ids must be unique across batch ∪ corpus: the verify
    * unions both sides and keys shingles by id, so an id present on BOTH
    * sides silently doubles that doc's shingle rows (inflated set sizes
    * and intersections → WRONG jaccard values, not an error). Re-key one
    * side (e.g. negate or offset batch ids) before calling when the id
    * spaces can overlap. */
  def minhashDedupAgainst(batch: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          shingleSize: Int = 3, numHashes: Int = 63,
                          bands: Int = 21,
                          threshold: Double = 0.7): DataFrame =
    minhashDedupAgainstCounted(batch, corpus, idCol, textCol,
      shingleSize, numHashes, bands, threshold)._1

  /** [[minhashDedupAgainst]] plus the candidate stage's skipped-bucket
    * accumulator ([[minhashCandidatesAgainstCounted]]'s semantics note) —
    * materialize the result, then assert `acc.value == 0` to prove no
    * over-cap band bucket silently dropped candidates. */
  def minhashDedupAgainstCounted(batch: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          shingleSize: Int = 3, numHashes: Int = 63,
                          bands: Int = 21, threshold: Double = 0.7,
                          maxBucket: Int = 1 << 20): (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val (cands, skipped) = minhashCandidatesAgainstCounted(batch, corpus,
      idCol, textCol, shingleSize, numHashes, bands, maxBucket)
    // the verify only shingles docs appearing in a candidate pair; the
    // union frame exists so one attach pass serves both sides (ids are
    // unique across batch ∪ corpus per the candidates contract)
    val union = batch.select(col(idCol), col(textCol))
      .unionAll(corpus.select(col(idCol), col(textCol)))
    val verified = ngramJaccard(union, idCol, textCol, shingleSize, Some(cands))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    (verified, skipped)
  }

  /** Batch rows with NO text near-dup in the standing corpus — the
    * ingestion filter built on [[minhashDedupAgainst]] (mirror of
    * [[nearNewRows]]); inherits its id-uniqueness contract — an id on
    * both sides corrupts that doc's jaccard (see there), which here can
    * silently pass or drop the wrong batch rows. */
  def textNewRows(batch: DataFrame, corpus: DataFrame, idCol: String,
                  textCol: String, shingleSize: Int = 3,
                  numHashes: Int = 63, bands: Int = 21,
                  threshold: Double = 0.7): DataFrame = {
    val flagged = minhashDedupAgainst(batch, corpus, idCol, textCol,
        shingleSize, numHashes, bands, threshold)
      .select(col("id_a").as("__dup_id")).distinct()
    batch.join(flagged, col(idCol) === col("__dup_id"), "left_anti")
  }

  /** Broadcastable standing-corpus index for [[textScreenStream]]: the
    * banded minhash keys inverted to per-document sorted shingle-hash
    * sets, so a row can be candidate-screened AND exact-verified with no
    * shuffle and no state. Built once on the driver; carries its own
    * banding config so the stream side derives identical signatures. */
  final class TextScreenIndex private[Dedup] (
      private[pipeline] val shingleSize: Int,
      private[pipeline] val numHashes: Int,
      private[pipeline] val bands: Int,
      /** doc index → sorted distinct shingle hashes */
      private[pipeline] val docs: Array[Array[Long]],
      /** band key → indexes of docs holding that band signature */
      private[pipeline] val byBand: java.util.HashMap[java.lang.Long, Array[Int]])
    extends Serializable {
    def nDocs: Int = docs.length
  }

  /** Per-text (band keys, sorted distinct shingle hashes) under the
    * index's banding config — shared by the index build and the screen. */
  private[pipeline] def bandsAndHashes(text: String, shingleSize: Int,
                             numHashes: Int, bands: Int,
                             ma: Array[Long], mb: Array[Long]): (Array[Long], Array[Long]) = {
    val rowsPerBand = numHashes / bands
    val shs = shinglesOf(text, shingleSize)
    val hashes = new Array[Long](shs.length)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shs.length) {
      val h = hash64(shs(s))
      hashes(s) = h
      var i = 0
      while (i < numHashes) {
        val v = h * ma(i) + mb(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    java.util.Arrays.sort(hashes)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 1125899906842597L + b
      var i = b * rowsPerBand
      while (i < (b + 1) * rowsPerBand) { key = key * 31 + sig(i); i += 1 }
      keys(b) = key
      b += 1
    }
    // shinglesOf dedups as strings; 64-bit hash collisions within one doc
    // are ~1e-8-probable — dedup defensively so set sizes stay exact
    var n = 0
    var last = 0L
    var i = 0
    val dedup = new Array[Long](hashes.length)
    while (i < hashes.length) {
      if (n == 0 || hashes(i) != last) { dedup(n) = hashes(i); n += 1 }
      last = hashes(i)
      i += 1
    }
    (keys, java.util.Arrays.copyOf(dedup, n))
  }

  /** Build a [[TextScreenIndex]] from the standing corpus. The index is
    * collected to the driver and broadcast — the same contract as
    * [[Decontaminate.decontaminateStream]]'s gram set, with the same hard
    * guard: it refuses corpora above `maxDocs` INDEXABLE rows (null-text
    * rows can't shingle and are not counted — the probe runs after the
    * na.drop, so a null-heavy corpus isn't refused for rows that would
    * never reach the index). Beyond the bound, screen per micro-batch
    * with `foreachBatch` + [[textNewRows]] instead (the shuffle-based
    * form has no corpus-size ceiling).
    *
    * SIZING: the row count is a proxy — the real broadcast cost is the
    * SHINGLE MASS, ≈ Σ distinct shingles per doc × 8 bytes (plus the band
    * map: docs × bands × ~8 bytes). The default maxDocs = 2M at a typical
    * ~200 shingles/doc is ~3 GB of broadcast — near the practical
    * ceiling; lower `maxDocs` accordingly when documents run long, since
    * a row bound alone cannot see per-doc length. */
  def buildTextScreenIndex(corpus: DataFrame, textCol: String,
                           shingleSize: Int = 3, numHashes: Int = 63,
                           bands: Int = 21,
                           maxDocs: Int = 1 << 21): TextScreenIndex = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spark = corpus.sparkSession
    import spark.implicits._
    val indexable = corpus.na.drop(Seq(textCol))
    val probeLimit = if (maxDocs == Int.MaxValue) maxDocs else maxDocs + 1
    val probe = indexable.limit(probeLimit).count()
    if (probe > maxDocs)
      graft.util.SkipMetrics.refuse("buildTextScreenIndex", spark,
        s"buildTextScreenIndex collects the corpus shingle sets to the " +
          s"driver and refuses corpora above maxDocs=$maxDocs indexable " +
          s"rows; this input has more. Screen per micro-batch with " +
          s"foreachBatch + textNewRows, or raise maxDocs deliberately.")
    val (ma, mb) = mixers(numHashes)
    val rows = indexable
      .select(col(textCol)).as[String]
      .mapPartitions { it =>
        it.map(t => bandsAndHashes(t, shingleSize, numHashes, bands, ma, mb))
      }.collect()
    val byBand = new java.util.HashMap[java.lang.Long,
      scala.collection.mutable.ArrayBuffer[Int]]()
    rows.zipWithIndex.foreach { case ((keys, _), di) =>
      var b = 0
      while (b < keys.length) {
        var l = byBand.get(keys(b))
        if (l == null) {
          l = scala.collection.mutable.ArrayBuffer.empty[Int]
          byBand.put(keys(b), l)
        }
        // the same (band, doc) can repeat only across equal keys from
        // different bands — rare; dedup on insert keeps arrays minimal
        if (l.isEmpty || l.last != di) l += di
        b += 1
      }
    }
    val packed = new java.util.HashMap[java.lang.Long, Array[Int]](byBand.size())
    byBand.forEach((k, v) => packed.put(k, v.toArray))
    new TextScreenIndex(shingleSize, numHashes, bands,
      rows.map(_._2), packed)
  }

  /** STREAMING text near-dup screen — the stateless streaming face of
    * [[textNewRows]]: rows whose n-gram Jaccard against some
    * standing-corpus document reaches `threshold` are dropped; everything
    * else (including null-text rows, which cannot be checked — batch
    * parity) passes. Candidates come from the broadcast index's band
    * buckets and are EXACT-verified by sorted-set intersection on the
    * 64-bit shingle hashes, so false-positive behavior matches the batch
    * screen (hash collisions ~1e-8); recall is the same banding S-curve.
    * One stateless filter: no watermark, no state store — composes with
    * any streaming (or batch) query. */
  def textScreenStream(stream: DataFrame, textCol: String,
                       index: TextScreenIndex,
                       threshold: Double = 0.7): DataFrame = {
    val bc = stream.sparkSession.sparkContext.broadcast(index)
    val (ma, mb) = mixers(index.numHashes)
    val clean = udf { text: String =>
      text == null || {
        val idx = bc.value
        val (keys, hs) = bandsAndHashes(text, idx.shingleSize,
          idx.numHashes, idx.bands, ma, mb)
        val seen = new java.util.HashSet[Integer]()
        var dup = false
        var b = 0
        while (!dup && b < keys.length) {
          val cands = idx.byBand.get(keys(b))
          if (cands != null) {
            var c = 0
            while (!dup && c < cands.length) {
              val di = cands(c)
              if (seen.add(di)) {
                val ds = idx.docs(di)
                // sorted-array intersection (both sides distinct)
                var i = 0; var j = 0; var common = 0
                while (i < hs.length && j < ds.length) {
                  if (hs(i) == ds(j)) { common += 1; i += 1; j += 1 }
                  else if (hs(i) < ds(j)) i += 1
                  else j += 1
                }
                val unionSz = hs.length + ds.length - common
                if (unionSz > 0 &&
                    common.toDouble / unionSz >= threshold) dup = true
              }
              c += 1
            }
          }
          b += 1
        }
        !dup
      }
    }
    stream.filter(col(textCol).isNull || clean(col(textCol)))
  }

  /** Transitive near-dedup: resolve a near-dup PAIR graph into connected
    * components and keep ONE representative (the min id) per component;
    * documents in no pair are untouched. This is the correct "drop the
    * near-dups" semantics — pairwise keep-min drops too much on chains
    * (A~B, B~C, A!~C would lose both B and C).
    *
    * Victims ≤ `maxBroadcastVictims` (the usual case — a near-dup victim
    * set is small next to the corpus) are collected and removed with a
    * broadcast anti-join, so the corpus never shuffles and the component
    * cache is released before returning. The default bound (1M ids ≈
    * ~100 MB of driver Seq + LocalRelation overhead) matches
    * connectedComponents' localThreshold rationale — raise it only with
    * driver memory to spare. A genuinely dup-heavy corpus can make the
    * victim set O(corpus) — above the bound the removal falls back to a
    * shuffle anti-join: the victim set (far smaller than the component
    * frame) is persisted, the component cache is released, and the one
    * surviving cache entry is the victims frame itself
    * (`spark.catalog.clearCache()` releases it once the join is
    * consumed). */
  def nearDedupByComponent(df: DataFrame, idCol: String,
                           pairs: DataFrame,
                           maxBroadcastVictims: Long = 1L << 20): DataFrame = {
    // small-graph tier: recompute-free local data; large-graph tier:
    // eager + persisted (unpersist below is a no-op for the former)
    val comp = Components.connectedComponents(pairs)
    val victims = comp.filter(col("id") =!= col("component"))
      .select(col("id").as("__victim"))
    val nVictims = victims.count() // cheap: comp is cached or local
    if (nVictims <= maxBroadcastVictims) {
      val spark = df.sparkSession
      import spark.implicits._
      val ids = victims.as[Long].collect().toSeq
      comp.unpersist(blocking = false)
      val vdf = spark.createDataset(ids).toDF("__victim")
      df.join(broadcast(vdf), col(idCol) === col("__victim"), "left_anti")
    } else {
      val v = victims.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count() // materialize from the component cache, then release it
      comp.unpersist(blocking = false)
      df.join(v, col(idCol) === col("__victim"), "left_anti")
    }
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash from token hashes: per bit, sign of Σ(±1) over token
    * hashes. One pass per row in a deterministic Scala UDF — the 64-way
    * HOF-aggregate formulation would re-walk the token array per bit;
    * the closure walks it once. xxhash64 keeps it consistent with the
    * engine's other fingerprints. Null text or a token-less
    * (all-whitespace) text → null signature (`na.drop`-able), the same
    * contract as [[simhashMd5]] — without it a whitespace-only doc would
    * get the signature of the single empty token and silently join the
    * candidate stream while token-derived oracles never see it. */
  val simhash: Column => Column = {
    val f = udf { raw: Seq[String] =>
      // drop empty tokens (split of a whitespace-only string yields [""])
      val tokens = if (raw == null) null else raw.filter(_.nonEmpty)
      if (tokens == null || tokens.isEmpty) null.asInstanceOf[java.lang.Long]
      else {
        val counts = new Array[Int](64)
        tokens.foreach { t =>
          val h2 = hash64(t)
          var b = 0
          while (b < 64) {
            if (((h2 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
        java.lang.Long.valueOf(sig)
      }
    }
    c => f(TextAnalysis.tokens(c))
  }

  /** 64-bit SimHash over MD5 token hashes — the ORACLE-REPRODUCIBLE
    * signature basis for [[simhashPairsFromSig]]: both Spark and DuckDB
    * derive each token's 64-bit hash as the first 16 hex chars of
    * md5(token) read big-endian (`('0x' || substr(md5(w),1,16))::UBIGINT`
    * on the DuckDB side — bit b of the signed long here equals bit b of
    * that UBIGINT), so an oracle can rebuild the exact signatures and
    * check emitted pairs against the brute-force Hamming ball. Null text
    * or a token-less (all-whitespace) text → null signature
    * (`na.drop`-able), matching an oracle that derives signatures from
    * exploded tokens (token-less docs never appear there). The
    * xxhash-based [[simhash]] stays the production basis (no MessageDigest
    * per token; same distributional properties). */
  val simhashMd5: Column => Column = {
    val f = udf { raw: Seq[String] =>
      // drop empty tokens (split of a whitespace-only string yields [""])
      // — the oracle's exploded-token stream filters w <> '' identically
      val tokens = if (raw == null) null else raw.filter(_.nonEmpty)
      if (tokens == null || tokens.isEmpty) null.asInstanceOf[java.lang.Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val counts = new Array[Int](64)
        tokens.foreach { t =>
          md.reset()
          val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
        java.lang.Long.valueOf(sig)
      }
    }
    c => f(TextAnalysis.tokens(c))
  }

  /** Hamming distance between two simhash values. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket the 64-bit signature into `chunks`
    * contiguous bit ranges (a pair within Hamming distance ≤ chunks−1
    * shares at least one untouched chunk by pigeonhole), verify with
    * Long.bitCount inside the per-bucket loop — posting-list shaped like
    * the other LSH ops: one shuffle of the (chunkKey, id, signature)
    * rows, pairs emitted filtered, deduped across chunks.
    *
    * COMPLETENESS: with `maxHamming <= chunks - 1` the candidate set is
    * complete, so the output is EXACTLY the Hamming ball — what the
    * q_simhash oracle contract checks. A `maxHamming` beyond that bound
    * trades recall for chunk width: pick `chunks >= maxHamming + 1` for
    * exactness, or keep wide chunks and accept pigeonhole recall.
    *
    * SCALE WALL (measured, r12 sf10d full-suite run): the chunk key is
    * 64/chunks bits wide, so buckets average n / 2^(64/chunks) rows and
    * the per-bucket verify is O(bucket²). chunks=4 (16-bit keys) is
    * scale-safe to ~10⁸ rows; chunks=9 (7-bit keys → 128 buckets per
    * position) degenerates at ~10⁵ docs — 500k sf10d docs gave ~4k-row
    * buckets and an hours-long scorer. Size chunks so
    * 64/chunks ≳ log₂(n) + 4, exact-dedup identical mass first, and
    * let `maxBucket` (surfaced via SkipMetrics `simhash.skippedBuckets`)
    * bound the worst case. */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1 << 20,
                   chunks: Int = 4): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "simhashDedup")
    val sigs = df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long").as("__id"),
        simhash(col(textCol)).as("__sig"))
    simhashPairsFromSig(sigs, maxHamming, maxBucket, chunks)
  }

  /** The chunk-bucket + verify machinery of [[simhashDedup]] over
    * PRE-COMPUTED (id, signature) rows — the first two columns of `sigs`
    * are taken as (long id, long signature). Exposed so a caller can plug
    * any 64-bit signature basis (e.g. the q_simhash oracle contract, which
    * derives signatures from md5 token hashes both Spark and DuckDB can
    * reproduce) into the same distributed pair generation. */
  def simhashPairsFromSig(sigs: DataFrame, maxHamming: Int = 3,
                          maxBucket: Int = 1 << 20,
                          chunks: Int = 4): DataFrame = {
    require(chunks >= 1 && chunks <= 64, s"chunks out of range: $chunks")
    if (maxHamming > chunks - 1)
      log.warn(s"simhash: maxHamming=$maxHamming exceeds the pigeonhole " +
        s"bound of chunks-1=${chunks - 1}; the candidate set is NOT the " +
        "full Hamming ball (recall mode). Pass chunks >= maxHamming + 1 " +
        "for exact-ball output.")
    val spark = sigs.sparkSession
    import spark.implicits._
    val nChunks = chunks
    // POSITIONAL first-two-column take (rename-then-select): name-based
    // resolution would throw on duplicate column names (common after
    // joins) or mis-parse dotted names
    val chunked = sigs
      .toDF(sigs.columns.indices.map(i => s"__c$i"): _*)
      .select("__c0", "__c1")
      .as[(Long, Long)]
      .flatMap { case (id, sh) =>
        (0 until nChunks).iterator.map { i =>
          // chunk i covers bits [i*64/chunks, (i+1)*64/chunks); the chunk
          // index is folded above the value bits (width <= 32 whenever
          // chunks >= 2) so buckets from different chunk positions can
          // never collide; chunks == 1 keys on the whole signature
          val lo = i * 64 / nChunks
          val hi = (i + 1) * 64 / nChunks
          val key =
            if (nChunks == 1) sh
            else {
              val width = hi - lo
              val mask = if (width == 64) -1L else (1L << width) - 1L
              (i.toLong << 32) | ((sh >>> lo) & mask)
            }
          (key, id, sh)
        }
      }
    val skipAcc = graft.util.SkipMetrics.counter(
      "simhash.skippedBuckets", spark)
    chunked.groupByKey(_._1).flatMapGroups { (_, it) =>
      // maxBucket bounds the materialized posting list: an over-cap chunk
      // bucket means a degenerate near-identical mass (exact-dedup it
      // first) and is skipped rather than OOMing the executor
      val limit = if (maxBucket == Int.MaxValue) Int.MaxValue else maxBucket + 1
      val rows = it.take(limit).toArray.sortBy(_._2)
      if (rows.length > maxBucket) { skipAcc.add(1L); Iterator.empty }
      else {
      val out = Array.newBuilder[(Long, Long, Int)]
      var i = 0
      while (i < rows.length) {
        var j = i + 1
        while (j < rows.length) {
          if (rows(i)._2 != rows(j)._2) {
            val h = java.lang.Long.bitCount(rows(i)._3 ^ rows(j)._3)
            if (h <= maxHamming) out += ((rows(i)._2, rows(j)._2, h))
          }
          j += 1
        }
        i += 1
      }
      out.result().iterator
      }
    }.toDF("id_a", "id_b", "hamming").distinct()
  }

  // ---- embedding cosine near-dup -------------------------------------------

  private def asDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Squared L2 norm of an array column. */
  def sqNorm(a: Column): Column = {
    val ad = asDoubleArray(a)
    graft.expr.DotProduct.of(ad, ad)
  }

  /** Exact cosine similarity between two double-array columns, matching
    * DuckDB list_cosine_similarity: dot / sqrt(na*nb). */
  def cosine(a: Column, b: Column): Column =
    cosinePre(a, b, sqNorm(a), sqNorm(b))

  /** cosine when both vectors are already L2-normalized: just the dot. */
  def cosineNormalized(a: Column, b: Column): Column = dotProduct(a, b)

  /** Cosine with PRE-COMPUTED squared norms — use in pairwise joins so the
    * per-vector norms are evaluated once per row, not once per pair.
    * Sequential summation order matches DuckDB list_cosine_similarity
    * bit-for-bit. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dotProduct(a, b) / sqrt(na * nb)

  /** Dot product via the native codegen'd [[graft.expr.DotProduct]]
    * expression — one fused loop in whole-stage codegen. The earlier
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` HOF form evaluated
    * interpreted lambdas per element and materialized the zipped array
    * per row (and an unrolled 64-term element_at tree was 2.5× slower
    * still — codegen depth, per-element null checks). For array<double>
    * inputs the fold order and null semantics match the HOF form, so
    * oracle results are bit-identical. NB narrower inputs are cast to
    * array<double> FIRST, so e.g. array<float> products multiply in
    * double precision — the HOF form multiplied in float then widened,
    * so results on float arrays can differ in the last ulp. */
  def dotProduct(a: Column, b: Column): Column =
    graft.expr.DotProduct.of(asDoubleArray(a), asDoubleArray(b))

  /** Signature-width selector for the hyperplane-LSH tiers: enough bits
    * that the EXPECTED bucket holds ~`targetBucket` vectors
    * (`bits = ceil(log2(n / targetBucket))`, floored at `minBits`,
    * capped so table+signature still fit the long key). The sf10 scale
    * probe is why this must track corpus size: a fixed bits=4 (16
    * cells/table) at 400k vectors concentrates O(100k) rows in single
    * cells — quadratic per-bucket verify work and multi-GB group
    * materialization (OOMed a 48 GB JVM). Each extra bit halves a
    * random pair's per-table collision probability — compensate recall
    * with `tables` (RecallSpec's model: 1−(1−p^bits)^tables). */
  def lshBitsFor(n: Long, targetBucket: Int = 1024, minBits: Int = 4): Int = {
    require(targetBucket >= 1, s"targetBucket must be >= 1, got $targetBucket")
    require(minBits >= 1 && minBits <= 32, s"minBits out of range: $minBits")
    val ratio = math.max(1.0, n.toDouble / targetBucket)
    math.min(32, math.max(minBits,
      math.ceil(math.log(ratio) / math.log(2.0)).toInt))
  }

  /** Deterministic pseudo-random hyperplanes (components uniform in
    * [-0.5, 0.5), seeded from (table, bit, index) — no stored model, any
    * executor can regenerate them). */
  private[graft] def hyperplanes(bits: Int, dim: Int,
                                    table: Int = 0): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (b, i) =>
      (splitmix((table.toLong * 10007L + b) * 1000003L + i) >>> 11) /
        (1L << 53).toDouble - 0.5
    }

  /** Embedding near-dup pairs above a cosine threshold. Buckets first
    * (pure map — signatures + norm in one tight JVM pass per row), then
    * exact cosine ONLY within buckets via a per-bucket nested loop after
    * one shuffle on the bucket key.
    *
    * RECALL is governed by the standard multi-table LSH S-curve: a pair at
    * cosine c collides in one table with p(c)^bits where
    * p(c) = 1 − arccos(c)/π, and is caught by AT LEAST one of `tables`
    * independent signature tables with 1 − (1 − p^bits)^tables. One table
    * of 4 bits catches only ~15% of 0.4-cosine pairs (measured,
    * RecallSpec); 8 tables of 8 bits catch ~99% of 0.95-cosine pairs.
    * `tables` multiplies the shuffled row count — the exact-verify work
    * stays deduped because a pair found in several tables is distinct'd.
    * With tables=1 each pair lives in exactly one bucket and the distinct
    * is skipped. The per-bucket group is materialized: the signature width
    * must bound the expected bucket size (≈ n / 2^bits) — more bits =
    * faster + lower per-table recall (compensate with more tables).
    * Interpreted HOF cosines per candidate pair cost ~50× this loop.
    *
    * `bits = 0` (the DEFAULT) sizes the signature adaptively from the
    * corpus count via [[lshBitsFor]] — the sf10 lesson: a fixed width
    * cannot scale (bits=4 at 400k vectors concentrated O(100k) rows per
    * cell and OOMed a 48 GB JVM). Pass an explicit `bits >= 1` to pin the
    * width (reproducing a spec'd config, or when the caller already
    * knows n). On the bits=0 path `df` is consumed TWICE (the count, then
    * bucket assignment), so the cleaned input is `.cache()`d — same cache
    * lifetime caveat as [[ngramJaccard]]: the result is lazy, so there is
    * no sound unpersist point inside this method; long-lived sessions can
    * `spark.catalog.clearCache()` between batches, or pass explicit bits
    * to skip the cache entirely.
    *
    * DEFAULT CHANGE (round 8): `bits` default moved from a fixed 8 to
    * adaptive 0. Default callers on large corpora now get MORE signature
    * bits (lower per-table recall, no OOM) — raise `tables` to recover
    * recall per the 1−(1−p^bits)^tables model (RecallSpec); results are
    * no longer identical across corpus sizes unless bits is pinned. */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double = 0.95, bits: Int = 0,
                     maxBucket: Int = 1 << 20, tables: Int = 1): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "embeddingDedup")
    require(bits >= 0 && bits <= 32, s"bits out of range: $bits")
    val clean0 = df.na.drop(Seq(idCol, vecCol))
    // bits=0 consumes clean twice (count + assignment) — cache so an
    // expensive upstream pipeline isn't recomputed for the count
    val clean = if (bits == 0) clean0.cache() else clean0
    val sigBits = if (bits == 0) lshBitsFor(clean.count()) else bits
    // key = (table << bits) | signature: table index bits + signature bits
    // must fit a non-negative long
    val tableBits = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1, tables - 1).toLong)
    require(sigBits + tableBits <= 63,
      s"table index + signature must fit a long key (bits=$sigBits tables=$tables)")
    val spark = df.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(
      Array.tabulate(tables)(t => hyperplanes(sigBits, dim, t)))
    val assigned = clean
      .select(col(idCol).cast("long"), transform(col(vecCol), _.cast("double")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val tabs = planes.value
        it.flatMap { case (id, v) =>
          var n2 = 0.0
          var i = 0
          while (i < v.length) { n2 += v(i) * v(i); i += 1 }
          tabs.iterator.zipWithIndex.map { case (ps, t) =>
            var bucket = 0L
            var b = 0
            while (b < ps.length) {
              val p = ps(b)
              var dot = 0.0
              var j = 0
              while (j < v.length) { dot += v(j) * p(j); j += 1 }
              if (dot > 0) bucket |= (1L << b)
              b += 1
            }
            // table index folded above the signature bits: buckets from
            // different tables can never collide
            ((t.toLong << sigBits) | bucket, id, v, n2)
          }
        }
      }
    val skipAcc = graft.util.SkipMetrics.counter(
      "embeddingLsh.skippedBuckets", spark)
    val pairs = assigned.groupByKey(_._1).flatMapGroups { (_, it) =>
      // see simhashDedup: cap bounds per-bucket materialization
      val limit = if (maxBucket == Int.MaxValue) Int.MaxValue else maxBucket + 1
      val rows = it.take(limit).toArray.sortBy(_._2)
      if (rows.length > maxBucket) { skipAcc.add(1L); Iterator.empty }
      else {
      val out = Array.newBuilder[(Long, Long, Double)]
      var i = 0
      while (i < rows.length) {
        val va = rows(i)._3; val na = rows(i)._4
        var j = i + 1
        while (j < rows.length) {
          val vb = rows(j)._3
          var dot = 0.0
          var k = 0
          while (k < va.length) { dot += va(k) * vb(k); k += 1 }
          val cos = dot / math.sqrt(na * rows(j)._4)
          if (cos >= threshold) out += ((rows(i)._2, rows(j)._2, cos))
          j += 1
        }
        i += 1
      }
      out.result().iterator
      }
    }.toDF("id_a", "id_b", "cos")
    if (tables == 1) pairs else pairs.distinct()
  }

  /** Incremental NEAR-dup screen: batch vectors within `threshold` cosine
    * of ANY standing-corpus vector, caught through the same deterministic
    * hyperplane LSH tables as [[embeddingDedup]] (the planes are seeded,
    * so both sides bucket identically with no stored model). Returns
    * (batch_id, corpus_id, cos) candidate matches — exact-verified, so no
    * false positives; recall follows the same multi-table S-curve as
    * embeddingDedup (RecallSpec). The semantic companion of
    * [[bloomNewRows]]: bloom kills exact re-crawls, this kills
    * near-paraphrases of the standing corpus.
    *
    * Scale shape: one typed bucket-assignment pass per side, ONE shuffle
    * on the bucket key, per-bucket batch×corpus verify loops (never
    * batch×batch or corpus×corpus — cross-side only, so a huge standing
    * corpus adds linear bucket mass, not quadratic pair work).
    *
    * `bits = 0` (the DEFAULT) sizes the signature adaptively via
    * [[lshBitsFor]] over the STANDING-CORPUS count — the corpus dominates
    * bucket mass in the incremental-screen shape (batch ≪ corpus), and
    * both sides must band with the SAME width to collide. Explicit
    * `bits >= 1` pins the width. On the bits=0 path the cleaned corpus is
    * consumed twice (count + assignment) and is `.cache()`d — the
    * [[embeddingDedup]] cache-lifetime caveat applies. DEFAULT CHANGE
    * (round 8): bits moved from fixed 8 to adaptive 0; see
    * [[embeddingDedup]]'s note (tables knob, RecallSpec model). */
  def embeddingDedupAgainst(batch: DataFrame, corpus: DataFrame,
                            idCol: String, vecCol: String, dim: Int,
                            threshold: Double = 0.95, bits: Int = 0,
                            maxBucket: Int = 1 << 20,
                            tables: Int = 1): DataFrame = {
    Similarity.requireIntegralId(batch, idCol, "embeddingDedupAgainst")
    Similarity.requireIntegralId(corpus, idCol, "embeddingDedupAgainst")
    require(bits >= 0 && bits <= 32, s"bits out of range: $bits")
    val corpusClean0 = corpus.na.drop(Seq(idCol, vecCol))
    val corpusClean = if (bits == 0) corpusClean0.cache() else corpusClean0
    val sigBits =
      if (bits == 0) lshBitsFor(corpusClean.count())
      else bits
    val tableBits = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1, tables - 1).toLong)
    require(sigBits + tableBits <= 63,
      s"table index + signature must fit a long key (bits=$sigBits tables=$tables)")
    val spark = batch.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(
      Array.tabulate(tables)(t => hyperplanes(sigBits, dim, t)))
    def assign(df: DataFrame, isBatch: Boolean) = df
      .na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"), transform(col(vecCol), _.cast("double")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val tabs = planes.value
        it.flatMap { case (id, v) =>
          var n2 = 0.0
          var i = 0
          while (i < v.length) { n2 += v(i) * v(i); i += 1 }
          tabs.iterator.zipWithIndex.map { case (ps, t) =>
            var bucket = 0L
            var b = 0
            while (b < ps.length) {
              val p = ps(b)
              var dot = 0.0
              var j = 0
              while (j < v.length) { dot += v(j) * p(j); j += 1 }
              if (dot > 0) bucket |= (1L << b)
              b += 1
            }
            ((t.toLong << sigBits) | bucket, isBatch, id, v, n2)
          }
        }
      }
    val skipAcc = graft.util.SkipMetrics.counter(
      "embeddingLshAgainst.skippedBuckets", spark)
    val pairs = assign(batch, isBatch = true)
      .union(assign(corpus, isBatch = false))
      .groupByKey(_._1).flatMapGroups { (_, it) =>
        val limit = if (maxBucket == Int.MaxValue) Int.MaxValue else maxBucket + 1
        val rows = it.take(limit).toArray
        if (rows.length > maxBucket) { skipAcc.add(1L); Iterator.empty }
        else {
          val (bs, cs) = rows.partition(_._2)
          val out = Array.newBuilder[(Long, Long, Double)]
          bs.sortBy(_._3).foreach { case (_, _, bid, bv, bn) =>
            cs.foreach { case (_, _, cid, cv, cn) =>
              var dot = 0.0
              var k = 0
              while (k < bv.length) { dot += bv(k) * cv(k); k += 1 }
              val cos = dot / math.sqrt(bn * cn)
              if (cos >= threshold) out += ((bid, cid, cos))
            }
          }
          out.result().iterator
        }
      }.toDF("batch_id", "corpus_id", "cos")
    if (tables == 1) pairs else pairs.distinct()
  }

  /** Batch rows with NO near-dup in the standing corpus — the incremental
    * ingestion filter built on [[embeddingDedupAgainst]] (inherits its
    * round-8 adaptive-bits default change; see [[embeddingDedup]]). */
  def nearNewRows(batch: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, dim: Int, threshold: Double = 0.95,
                  bits: Int = 0, tables: Int = 1): DataFrame = {
    val flagged = embeddingDedupAgainst(batch, corpus, idCol, vecCol, dim,
        threshold, bits, tables = tables)
      .select(col("batch_id").as("__dup_id")).distinct()
    batch.join(flagged, col(idCol) === col("__dup_id"), "left_anti")
  }

  // ---- exact-substring dedup (sliding window) ------------------------------

  /** Exact-substring dedup in the style of Lee et al. 2021's ExactSubstr:
    * remove every token covered by a `minTokens`-token window whose exact
    * token sequence occurs MORE THAN ONCE in the corpus (cross-doc or
    * within-doc — the corpus-frequency criterion, symmetric across
    * occurrences like the released suffix-array implementation, so the
    * result is order-free and deterministic with no global tie-break).
    * [[chunkDedup]] is the cheap stride-`chunkWords` approximation that
    * keeps first occurrences; this is the surgical stride-1 pass — every
    * window position is checked, so shifted duplicates that straddle
    * chunk boundaries are caught.
    *
    * Scale shape: the posting frame has one row per token position (the
    * honest cost of stride-1 exactness — run the minhash tier first and
    * reserve this for the survivors). Two shuffles over it (window-hash
    * frequency with map-side combine, then the semi-join back) plus one
    * id-keyed aggregate of ONLY the duplicated positions, which joins
    * back to the token frame for the rebuild. The token frame is cached
    * (consumed by postings and rebuild); the result is lazy so there is
    * no sound unpersist point inside — the [[ngramJaccard]] cache-
    * lifetime caveat applies. Window identity is the 64-bit text hash
    * (~1e-8 collision, same contract as the rest of the dedup tier).
    *
    * Output: (id, text, n_removed) with text rebuilt from the kept
    * tokens single-space-joined — CANONICAL whitespace for all rows,
    * also when nothing was removed. Null id/text rows are dropped; docs
    * shorter than `minTokens` tokens pass through canonicalized; a doc
    * that is entirely duplicated windows comes back with empty text and
    * n_removed = its token count. */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     minTokens: Int = 50): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val w = minTokens
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, TextAnalysis.fastTokens(text)) }
      .toDF("id", "__toks")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = toks.as[(Long, Array[String])]
      .flatMap { case (id, t) =>
        if (t.length < w) Iterator.empty
        else (0 to t.length - w).iterator.map { i =>
          val sb = new StringBuilder(t(i))
          var j = 1
          while (j < w) { sb.append(' ').append(t(i + j)); j += 1 }
          (hash64(sb.toString), id, i)
        }
      }
      .toDF("__h", "id", "__pos")
    val dupH = postings.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("__h")
    val dupStarts = postings.join(dupH, "__h")
      .groupBy("id")
      .agg(sort_array(collect_list(col("__pos"))).as("__starts"))
    toks.join(dupStarts, Seq("id"), "left")
      .as[(Long, Array[String], Array[Int])]
      .map { case (id, t, starts) =>
        if (starts == null || starts.isEmpty) (id, t.mkString(" "), 0L)
        else {
          val covered = new Array[Boolean](t.length)
          starts.foreach { s =>
            var k = s; val end = s + w
            while (k < end) { covered(k) = true; k += 1 }
          }
          val kept = new StringBuilder
          var removed = 0L
          var first = true
          var i = 0
          while (i < t.length) {
            if (covered(i)) removed += 1
            else {
              if (!first) kept.append(' ')
              kept.append(t(i))
              first = false
            }
            i += 1
          }
          (id, kept.toString, removed)
        }
      }
      .toDF(idCol, textCol, "n_removed")
  }

  // ---- chunk-level exact dedup ---------------------------------------------

  /** Chunk-level exact dedup (sequence-level dedup in the style of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    * split each document into consecutive `chunkWords`-word chunks, keep
    * only the corpus-wide FIRST occurrence of each distinct chunk (ordered
    * by (id, chunk position)), and reassemble each document from its
    * surviving chunks in order. Unlike whole-document dedup this removes
    * passages repeated ACROSS documents (boilerplate headers, license
    * blocks, templated text) while keeping each document's unique
    * remainder.
    *
    * Scale shape: chunking is pure projection (one HOF slice over the
    * materialized token array — the exploded frame has #chunks rows, not
    * #words). First-occurrence selection is ONE shuffle keyed on the chunk
    * text — the payload IS the text, which reassembly needs, so no smaller
    * sufficient key exists — and reassembly is one hash shuffle back on the
    * id. No global sort, no driver state. Chunk frequency is Zipfian at
    * corpus scale, but the window's per-key work is O(occurrences) with no
    * buffering beyond the run of equal keys, and AQE's skew handling splits
    * oversized partitions.
    *
    * Output: (id, text_dedup, chunks_kept, chunks_total); documents whose
    * every chunk occurred earlier vanish entirely (the fully-duplicated
    * case). */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val n = chunkWords
    val toks = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      // materialize the token array BEFORE the HOF slices (interpreted
      // HOFs re-evaluate inline subexpressions per element)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        ((size(col("__toks")) + lit(n - 1)) / lit(n)).cast("int").as("__nc"))
    val chunks = toks.select(
      col(idCol), col("__nc"),
      posexplode(transform(sequence(lit(0), col("__nc") - 1),
        i => concat_ws(" ", slice(col("__toks"), i * n + 1, lit(n))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val w = Window.partitionBy(col("chunk"))
      .orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
            s => s.getField("chunk"))).as("text_dedup"),
        count(lit(1)).as("chunks_kept"),
        first(col("__nc")).cast("long").as("chunks_total"))
  }

  /** WHY are these two documents near-dups? One diagnostic row for a
    * (idA, idB) pair: distinct n-gram counts per side, shared grams,
    * Jaccard, hashed-TF cosine, and exact / normalized-text equality —
    * the triage panel for a flagged pair ("is this shingle overlap,
    * bag-of-words similarity, or literal re-crawl?").
    *
    * Scale shape: two pushed-down id filters, per-row HOF shingling, a
    * 1×1 crossJoin — the corpus is never scanned beyond the two point
    * lookups (parquet min/max prunes on the id predicate). Shingle
    * semantics mirror [[ngramJaccard]]'s oracle (len < n → whole text,
    * distinct); cosine is the [[TextAnalysis.hashEmbedCol]] dot. */
  def explainPair(df: DataFrame, idCol: String, textCol: String,
                  idA: Long, idB: Long, n: Int = 3,
                  dim: Int = 256): DataFrame = {
    require(idA != idB, "explainPair needs two distinct ids")
    def side(id: Long, tag: String): DataFrame = {
      val t = split(trim(col(textCol)), "\\s+")
      val grams = array_distinct(
        when(size(t) < n, array(concat_ws(" ", t)))
          .otherwise(transform(sequence(lit(0), size(t) - n),
            i => array_join(slice(t, i + lit(1), lit(n)), " "))))
      df.filter(col(idCol) === id && col(textCol).isNotNull)
        .select(lit(id).as(s"id_$tag"), grams.as(s"__g_$tag"),
          TextAnalysis.hashEmbedCol(col(textCol), dim).as(s"__v_$tag"),
          col(textCol).as(s"__t_$tag"))
        .limit(1)
    }
    side(idA, "a").crossJoin(side(idB, "b"))
      .select(col("id_a"), col("id_b"),
        size(col("__g_a")).cast("long").as("grams_a"),
        size(col("__g_b")).cast("long").as("grams_b"),
        size(array_intersect(col("__g_a"), col("__g_b"))).cast("long")
          .as("shared_grams"),
        col("__v_a"), col("__v_b"), col("__t_a"), col("__t_b"))
      .select(col("id_a"), col("id_b"), col("grams_a"), col("grams_b"),
        col("shared_grams"),
        (col("shared_grams").cast("double") /
          (col("grams_a") + col("grams_b") - col("shared_grams")))
          .as("jaccard"),
        coalesce(aggregate(zip_with(col("__v_a"), col("__v_b"),
          (x, y) => x * y), lit(0.0), (acc, x) => acc + x), lit(0.0))
          .as("cos"),
        (col("__t_a") === col("__t_b")).as("exact_equal"),
        (normalizeText(col("__t_a")) === normalizeText(col("__t_b")))
          .as("norm_equal"))
  }

  /** INTRA-document repeated-line removal: within each document keep
    * only the FIRST occurrence of each distinct non-blank line,
    * preserving order — the self-contained cleaning step (listings,
    * chat logs, scraped tables repeat their own boilerplate) that runs
    * BEFORE corpus-wide [[lineDedup]] and needs no cross-document state.
    *
    * Scale shape: pure per-row column expressions — split, blank-filter,
    * first-occurrence filter (array_position == own index), reassemble.
    * ZERO shuffles, embarrassingly parallel at any corpus size; the
    * per-row cost is O(lines²) in the document's own line count, which
    * natural documents keep tiny. Output mirrors [[lineDedup]]:
    * (id, text_dedup, lines_kept, lines_total), rows with no non-blank
    * lines dropped. "Blank" follows SQL trim (spaces only) — the same
    * convention as [[lineDedup]], so the two stages compose without
    * disagreeing about which lines exist. */
  def lineDedupInDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    // first-occurrence filter: array_position is 1-based, the lambda
    // index 0-based. `arr` appears twice (outer + inside the lambda) —
    // interpreted-HOF double compute, bounded by per-doc line count
    val kept = filter(arr, (l, i) =>
      array_position(arr, l) === (i + lit(1)).cast("long"))
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        concat_ws("\n", kept).as("text_dedup"),
        size(kept).cast("long").as("lines_kept"),
        size(arr).cast("long").as("lines_total"))
      .filter(col("lines_total") > 0)
  }

  /** Corpus-wide LINE-level dedup (the C4/RefinedWeb boilerplate-line
    * step): split each document on newlines, keep only the corpus-wide
    * FIRST occurrence of each distinct non-blank line (ordered by
    * (id, line position)), and reassemble documents from their surviving
    * lines. The natural-boundary sibling of [[chunkDedup]]: same
    * first-occurrence window over an exploded unit stream, with lines —
    * nav bars, cookie banners, repeated headers — as the unit.
    *
    * Output: (id, text_dedup, lines_kept, lines_total); documents whose
    * every line occurred earlier vanish entirely. Blank/whitespace lines
    * are dropped (they carry no content and would all collapse onto one
    * global "first blank"). */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val clean = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val lines = clean
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")))
      .withColumnRenamed("pos", "line_idx")
      .withColumnRenamed("col", "line")
      .filter(trim(col("line")) =!= "")
    // totals as a size() PROJECTION off the scan (the bm25 lens lesson):
    // counting non-blank lines doesn't need a second explode + aggregate
    val counts = clean.select(col(idCol),
      size(filter(split(col(textCol), "\n"), l => trim(l) =!= ""))
        .cast("long").as("__nl"))
      .filter(col("__nl") > 0)
    val w = Window.partitionBy(col("line"))
      .orderBy(col(idCol), col("line_idx"))
    lines
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
            s => s.getField("line"))).as("text_dedup"),
        count(lit(1)).as("lines_kept"))
      .join(counts, idCol)
      .withColumnRenamed("__nl", "lines_total")
  }

  /** Cross-group n-gram overlap matrix: for every pair of groups
    * (sources/domains/language slices), the size of the shared distinct
    * n-gram set plus Jaccard and containment — which sources are
    * re-hosting each other's content, and which small source is entirely
    * contained in a big one (the cross-SOURCE companion of the per-pair
    * document dedup tier). Returns (group_a, group_b, n_common, jaccard,
    * containment) with group_a < group_b.
    *
    * Scale shape: one typed shingle pass, then ONE groupBy on the 8-byte
    * gram key folding each gram to its group SET (collect_set dedups, so
    * no separate distinct shuffle); pairs come from a per-gram nested
    * loop over that ≤#groups-sized set and sizes from exploding the same
    * posting frame — the earlier (grams ⋈ grams on sh) self-join re-ran
    * the shingle pass and re-shuffled the full gram stream per side,
    * measured 1.6× slower at sf0.1. Pair order is lexicographic on the
    * group string (UTF-16 code units — agrees with SQL engines' binary
    * UTF-8 order for all BMP text). */
  def groupOverlap(df: DataFrame, groupCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    require(n >= 1, s"groupOverlap needs n >= 1, got $n")
    graft.util.Errors.context("groupOverlap", Seq(groupCol, textCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    val grams = df.na.drop(Seq(groupCol, textCol))
      .select(col(groupCol).cast("string"), col(textCol))
      .as[(String, String)]
      .flatMap { case (g, t) => shinglesOf(t, n).map(s => (g, hash64(s))) }
      .toDF("__g", "sh")
    val postings = grams.groupBy(col("sh"))
      .agg(collect_set(col("__g")).as("__gs"))
    val sizes = postings.select(explode(col("__gs")).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__sz"))
    val common = postings.select(col("__gs")).as[Seq[String]]
      .flatMap { gs =>
        val a = gs.sorted.toArray
        for { i <- a.indices.iterator; j <- (i + 1) until a.length }
          yield (a(i), a(j))
      }
      .toDF("group_a", "group_b")
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.toDF("group_a", "__sza")), "group_a")
      .join(broadcast(sizes.toDF("group_b", "__szb")), "group_b")
      .select(col("group_a"), col("group_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("__sza") + col("__szb") - col("n_common")).cast("double"))
          .as("jaccard"),
        (col("n_common").cast("double") /
          least(col("__sza"), col("__szb")).cast("double"))
          .as("containment"))
  } }

  /** Per-group duplication report: documents, distinct contents, and the
    * duplicate share per group (source/language/domain) — the signal that
    * ranks groups by boilerplate-heaviness and decides where dedup budget
    * goes first. One partial/final aggregate over (group, content) then a
    * per-group rollup — distinct contents shuffle once, nothing else. */
  def dedupReport(df: DataFrame, contentCol: String,
                  groupCol: String): DataFrame = {
    df.na.drop(Seq(groupCol, contentCol))
      .groupBy(col(groupCol), col(contentCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(sum("__n").as("n_docs"),
        count(lit(1)).as("n_distinct"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_distinct")).cast("double") /
          col("n_docs").cast("double"))
  }

  /** Duplicate-cluster SIZE histogram: how many exact-duplicate
    * clusters exist at each multiplicity — the readout that separates
    * "2% dup rate from millions of pairs" from "2% dup rate from one
    * 40k-copy boilerplate page", which [[dedupReport]]'s flat rate
    * cannot. Two hash aggregates (content → cluster size, size →
    * cluster count); n_docs = size·clusters recovers the row mass per
    * bucket. Returns (size, n_clusters, n_docs) ascending; size 1 rows
    * are the unique documents. */
  def dupSizeHistogram(df: DataFrame, contentCol: String): DataFrame = {
    df.na.drop(Seq(contentCol))
      .groupBy(col(contentCol))
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("size") * col("n_clusters"))
      .orderBy("size")
  }

  // ---- incremental (cross-batch) dedup via Bloom filter --------------------

  /** Bloom filter over a key column (id, content hash, fingerprint…) —
    * the incremental-crawl dedup primitive: build ONCE over the standing
    * corpus, then screen every new batch against it WITHOUT touching the
    * corpus again. The build is one aggregation (mergeable per-partition
    * sketches; bit-OR union is order-independent, so the filter is
    * deterministic); the result is `bits ≈ -n·ln(fpp)/ln²2` — e.g. 1.2 GB
    * for 10⁹ keys at 1% — which broadcasts to executors once. */
  def bloomFilterOf(corpus: DataFrame, keyCol: String, expectedItems: Long,
                    fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    require(expectedItems > 0, s"expectedItems must be > 0")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    corpus.na.drop(Seq(keyCol)).stat.bloomFilter(keyCol, expectedItems, fpp)
  }

  /** Rows of `batch` whose key is (probably) NOT in `corpus`: the
    * new-content filter of an incremental ingestion pipeline. Guarantees:
    * NO false survivals (a key present in the corpus never passes — Bloom
    * filters have no false negatives), while ~fpp of genuinely-new rows
    * are wrongly dropped (tune `fpp` to taste; the dropped mass is new
    * content lost, not duplicates admitted). The corpus is read once to
    * build the filter; the batch pass is map-side only — no join, no
    * shuffle of either side. */
  def bloomNewRows(batch: DataFrame, corpus: DataFrame, keyCol: String,
                   expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // integral keys only (ids, xxhash64 content hashes, fingerprints): the
    // membership probe below uses the long hash path, and a string key
    // would silently null-cast
    Similarity.requireIntegralId(batch, keyCol, "bloomNewRows")
    Similarity.requireIntegralId(corpus, keyCol, "bloomNewRows")
    graft.util.Errors.context("bloomNewRows", Seq(keyCol)) {
    // an EMPTY corpus produces a BloomFilter with null bits that NPEs on
    // first use (Spark stat.bloomFilter degenerate case) — and means every
    // batch row is new anyway; the limit(1) probe short-circuits
    if (corpus.na.drop(Seq(keyCol)).limit(1).count() == 0)
      batch.na.drop(Seq(keyCol))
    else {
      val bloom = bloomFilterOf(corpus, keyCol, expectedItems, fpp)
      val spark = batch.sparkSession
      val bc = spark.sparkContext.broadcast(bloom)
      // scala UDF: sketch membership has no Catalyst surface; per-row cost
      // is a few hashes over a broadcast bitset, and the predicate composes
      // with pushed filters on every other column
      val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
      batch.na.drop(Seq(keyCol))
        .filter(!mightContain(col(keyCol).cast("long")))
    }
  } }
}
