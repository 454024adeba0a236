package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate string join: all pairs within Levenshtein edit distance
  * `maxDist`, found EXACTLY via positional q-gram PREFIX filtering
  * (Gravano et al. VLDB'01 count bound + the prefix-filtering lemma as
  * used by Ed-Join, Xiao et al. VLDB'08) + a `levenshtein` verify — the
  * candidates → verify shape the engine's other dedup ops use, applied
  * to edit distance for entity resolution / near-identical key
  * reconciliation.
  *
  * Theorems (exactness is proved, not sampled):
  *  - COUNT BOUND: one edit destroys at most q of a string's |s|−q+1
  *    positional q-grams, so ed(a,b) ≤ k implies the multiset gram
  *    overlap is ≥ max(na,nb) − k·q (na = |a|−q+1 grams).
  *  - PREFIX FILTER: fix any total order on gram keys; if |A∩B| ≥ t
  *    then the first |A|−t+1 elements of A intersect the first |B|−t+1
  *    of B. With t = max(na,nb) − k·q and |Δlen| ≤ k, both prefix
  *    lengths are ≤ q·k + 1. So a valid pair must share a positional
  *    gram that BOTH sides keep among their q·k+1 rarest grams (order =
  *    ascending global df, ties by (gram, ordinal)).
  * Multiset semantics come from keying postings on (gram, occurrence
  * ordinal). Strings too short for the count bound to bite
  * (len ≤ q·(k+1) − 1, including len < q with no grams at all) are
  * paired brute-force among themselves — a pair with one long side
  * always clears the count bound (making its prefix intersect) or the
  * |len(a)−len(b)| ≤ k length filter.
  *
  * SCALE: this is why the prefix filter and not the plain count filter.
  * Boilerplate-prefix corpora ("Supplier#000…", shared URL hosts, form
  * letters) give the COMMON grams huge posting lists — pair generation
  * over full posting lists costs Σ df² and degenerates toward all-pairs
  * (measured 3.6 s on 1k supplier names at sf0.1, quadratic beyond).
  * Sorting each string's grams by ascending GLOBAL df puts exactly those
  * grams last, so they never enter a prefix: candidates come from the
  * rare (discriminative) grams only. Cost: one df aggregate, one
  * per-string prefix selection (groupByKey on id), one pair-generation
  * shuffle on the prefix (gram, ordinal) key — Σ over PREFIX posting
  * lists only. `maxPostingList` skips over-cap prefix keys (bounded
  * memory, EXACTNESS LOST for pairs whose every shared prefix gram is
  * over-cap — same contract as Dedup's maxBucket). Verify joins are
  * plain shuffled equi-joins; candidates, not the corpus, set their
  * size. */
object FuzzyJoin {

  // private[graft], not private: a fully-private nested case class gets a
  // private bytecode constructor, which Janino-generated deserializer code
  // cannot call (runtime CompileException in the groupByKey stage)
  private[graft] final case class Posting(gram: String, ord: Int,
                                          id: Long, len: Int, side: Int)

  /** (id, s, len) with nulls dropped, ids cast long. Cached by callers:
    * consumed by postings, the short side, and the verify joins. */
  private def prep(df: DataFrame, idCol: String, strCol: String) =
    df.na.drop(Seq(idCol, strCol))
      .select(col(idCol).cast("long").as("__id"),
        col(strCol).cast("string").as("__s"),
        length(col(strCol)).as("__len"))

  /** Positional q-gram postings: one local pass per string, ordinal =
    * occurrence index of the gram within the string (multiset key). */
  private def postingsOf(strs: DataFrame, q: Int, side: Int) = {
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
          Posting(g, ord, id, len, side)
        }
      }
  }

  /** Each string's q·k+1 rarest postings in the global ascending
    * (df, gram, ord) order — df computed over ALL sides' postings so
    * cross-table joins see one total order. Strings with fewer grams
    * keep them all (the lemma then reads "whole set", still exact). */
  private def prefixOf(posts: Dataset[Posting], q: Int, k: Int): DataFrame = {
    val spark = posts.sparkSession
    import spark.implicits._
    val dfc = posts.groupBy("gram", "ord").agg(count(lit(1)).as("__df"))
    posts.toDF().join(dfc, Seq("gram", "ord"))
      .select("id", "side", "gram", "ord", "len", "__df")
      .as[(Long, Int, String, Int, Int, Long)]
      .groupByKey(r => (r._2, r._1))
      .flatMapGroups { (_, it) =>
        val arr = it.toArray
        java.util.Arrays.sort(arr,
          (a: (Long, Int, String, Int, Int, Long),
           b: (Long, Int, String, Int, Int, Long)) => {
            val c1 = java.lang.Long.compare(a._6, b._6)
            if (c1 != 0) c1 else {
              val c2 = a._3.compareTo(b._3)
              if (c2 != 0) c2 else Integer.compare(a._4, b._4)
            }
          })
        arr.iterator.take(q * k + 1)
      }
      .map(r => Posting(r._3, r._4, r._1, r._5, r._2))
      .toDF("gram", "ord", "id", "len", "side")
  }

  /** Candidate pairs from the prefix postings: strings sharing a prefix
    * (gram, ord) key, length-filtered. `cross = false` emits id-ordered
    * same-side pairs; `cross = true` emits side-0 × side-1 only.
    *
    * Pairs are emitted LAZILY (nested index iterators over the group's
    * posting array, never a built pair collection): a group's memory is
    * O(posting list), not O(posting list²). The r12 sf10d q_fuzzy_cross
    * JVM death was exactly the eager shape — per-group pair arrays grew
    * with bucket² across 32 concurrent tasks until the executor missed
    * 60 heartbeats in GC and force-exited (probe log, r13 NOTES). */
  private def candidatesOf(pre: DataFrame, k: Int, cross: Boolean,
                           maxPostingList: Int): DataFrame = {
    val spark = pre.sparkSession
    import spark.implicits._
    val skipAcc = graft.util.SkipMetrics.counter(
      "fuzzyPairs.skippedPostingLists", spark)
    pre.select("gram", "ord", "id", "len", "side")
      .as[(String, Int, Long, Int, Int)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_, it) =>
        val limit = if (maxPostingList == Int.MaxValue) Int.MaxValue
                    else maxPostingList + 1
        val rows = it.take(limit).toArray
        if (rows.length > maxPostingList) { skipAcc.add(1L); Iterator.empty }
        else if (cross) {
          val lefts = rows.filter(_._5 == 0)
          val rights = rows.filter(_._5 == 1)
          lefts.iterator.flatMap { l =>
            rights.iterator
              .filter(r => math.abs(l._4 - r._4) <= k)
              .map(r => (l._3, r._3))
          }
        } else {
          rows.indices.iterator.flatMap { i =>
            val a = rows(i)
            (i + 1 until rows.length).iterator.flatMap { j =>
              val b = rows(j)
              if (a._3 != b._3 && math.abs(a._4 - b._4) <= k)
                Iterator.single(
                  if (a._3 < b._3) (a._3, b._3) else (b._3, a._3))
              else Iterator.empty
            }
          }
        }
      }
      .toDF("id_a", "id_b")
  }

  /** Distinct-string representatives of a prepped frame: one row per
    * distinct string, carrying the group's MINIMUM id as the rep id
    * and the group size. Edit distance is a pure function of the
    * strings, so the whole candidates → verify pipeline only ever
    * needs to run on these — see the EXACT-DUPLICATE PRE-COLLAPSE
    * notes on [[fuzzyPairs]]. Returns (reps, anyDuplicates) with the
    * dup test folded into the SAME cached aggregate (one job, not a
    * strs.count + reps.count pair). */
  private def repsOf(strs: DataFrame): (DataFrame, Boolean) = {
    val reps = graft.util.CacheRegistry.cached("fuzzy.reps",
      strs.groupBy("__s", "__len")
        .agg(min(col("__id")).as("__id"), count(lit(1)).as("__g")))
    val anyDups = reps.filter(col("__g") > 1).limit(1).count() > 0
    (reps.select("__id", "__s", "__len"), anyDups)
  }

  /** rep-id → member-id mapping (one row per original row). */
  private def membersOf(strs: DataFrame, reps: DataFrame): DataFrame =
    strs.select(col("__s"), col("__id"))
      .join(reps.select(col("__s"), col("__id").as("__rep")), "__s")
      .select(col("__rep"), col("__id"))

  /** Shared self-join scaffold: prepped rows, reps, whether the corpus
    * collapsed, and the VERIFIED pair frame — at rep level when
    * collapsed (one row per distinct-string pair, the small frame both
    * [[fuzzyPairs]]' expansion and [[entityClusters]]' rep-level CC
    * consume), at row level otherwise. */
  private def selfRepPairs(df: DataFrame, idCol: String, strCol: String,
                           maxDist: Int, q: Int, maxPostingList: Int)
      : (DataFrame, DataFrame, Boolean, DataFrame) = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val k = maxDist
    val strs = graft.util.CacheRegistry.cached("fuzzy.strs",
      prep(df, idCol, strCol))
    val (reps, collapsed) = repsOf(strs)
    val base = if (collapsed) reps else strs
    val counted = candidatesOf(
      prefixOf(postingsOf(base, q, 0), q, k), k, cross = false,
      maxPostingList)
    // strings the bound can't prune pair only among THEMSELVES within
    // edit distance k (a longer partner forces bound >= 1 or a length
    // gap > k) — brute-force the short set
    val short = base.filter(col("__len") <= q * (k + 1) - 1)
    val shortPairs = short.select(col("__id").as("id_a"),
        col("__len").as("la"))
      .join(short.select(col("__id").as("id_b"), col("__len").as("lb")),
        col("id_a") < col("id_b") && abs(col("la") - col("lb")) <= k)
      .select("id_a", "id_b")
    val verified =
      verifyCross(counted.unionAll(shortPairs).distinct(), base, base, k)
    (strs, reps, collapsed, verified)
  }

  /** Self-join: (id_a, id_b, dist) with id_a < id_b and
    * levenshtein ≤ maxDist.
    *
    * EXACT-DUPLICATE PRE-COLLAPSE (r13 — the q_fuzzy_cross sf10d fix):
    * edit distance depends only on the strings, so the q-gram pipeline
    * runs over DISTINCT strings and the verified rep pairs expand back
    * to id pairs afterwards (two output-bound joins), plus the
    * dist-0 pairs within each duplicate group. On a corpus where every
    * string has g exact copies this divides candidate/verify work by g²
    * — the q-gram count filter itself CANNOT prune identical strings
    * (they share every gram), which is exactly how the r12 sf10d
    * replica corpus drove per-bucket pair mass into a GC death spiral.
    * The collapse is adaptive: when the corpus has no duplicate strings
    * (any group size > 1, read off the SAME cached rep aggregate — one
    * job) the pipeline runs directly on the rows and no expansion joins
    * exist, so the duplicate-free case pays one distinct aggregate and
    * nothing else. Output is identical either way: pairs are a pure
    * function of (id, string) and the expansion enumerates exactly the
    * collapsed pairs' preimages. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int, q: Int = 2,
                 maxPostingList: Int = Int.MaxValue): DataFrame = {
    val (strs, reps, collapsed, verified) =
      selfRepPairs(df, idCol, strCol, maxDist, q, maxPostingList)
    if (!collapsed) verified
    else {
      // OPTIMIZATION BARRIER (r13 sf10d jstack finding): without it the
      // planner is free to move the levenshtein verify filter into the
      // same fused stage as the member-expansion joins, re-scoring per
      // EXPANDED row (×g² per pair — 100% of stack samples sat in
      // levenshteinDistance at sf10d). Caching the rep-level pair set
      // (tiny: one row per verified DISTINCT-string pair) pins "verify
      // once at rep level, then expand" as plan structure, not hope.
      val repPairs = graft.util.CacheRegistry.cached("fuzzy.repPairs", verified)
      // members feeds FOUR join legs below (two expansion sides, two
      // dup-pair sides) — cache it or each leg recomputes the
      // strs ⋈ reps join (the r13 sf1d probe measured the recompute at
      // ~4x the useful work; the ngramJaccard two-consumer lesson)
      val members = graft.util.CacheRegistry.cached("fuzzy.members",
        membersOf(strs, reps))
      // cross-group pairs: every member of rep_a × every member of
      // rep_b, re-oriented on the ORIGINAL ids (rep order and member
      // order can disagree)
      val cross = repPairs
        .join(members.select(col("__rep").as("id_a"), col("__id").as("__ia")),
          "id_a")
        .join(members.select(col("__rep").as("id_b"), col("__id").as("__ib")),
          "id_b")
        .select(least(col("__ia"), col("__ib")).as("id_a"),
          greatest(col("__ia"), col("__ib")).as("id_b"), col("dist"))
      // within-group pairs: exact duplicates are distance 0 by identity
      val dup = members.join(
          members.select(col("__rep"), col("__id").as("__id2")), "__rep")
        .filter(col("__id") < col("__id2"))
        .select(col("__id").as("id_a"), col("__id2").as("id_b"),
          lit(0).cast("int").as("dist"))
      cross.unionAll(dup)
    }
  }

  /** Cross-table join: (id_a from left, id_b from right, dist ≤ maxDist).
    * Postings of both sides share one df computation and one prefix
    * shuffle; pairs are emitted across sides only. Both sides get the
    * exact-duplicate pre-collapse ([[fuzzyPairs]] notes) — verified
    * distinct-string pairs expand through each side's rep → member
    * mapping, and sides are disjoint so no re-orientation or dist-0
    * within-group pass exists here (equal strings ACROSS sides are
    * ordinary candidates and verify at distance 0). */
  def fuzzyJoin(left: DataFrame, leftId: String, leftStr: String,
                right: DataFrame, rightId: String, rightStr: String,
                maxDist: Int, q: Int = 2,
                maxPostingList: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val k = maxDist
    val ls = graft.util.CacheRegistry.cached("fuzzy.ls",
      prep(left, leftId, leftStr))
    val rs = graft.util.CacheRegistry.cached("fuzzy.rs",
      prep(right, rightId, rightStr))
    val (lreps, lDups) = repsOf(ls)
    val (rreps, rDups) = repsOf(rs)
    val collapsed = lDups || rDups
    val (lbase, rbase) = if (collapsed) (lreps, rreps) else (ls, rs)
    val tagged = postingsOf(lbase, q, 0).unionAll(postingsOf(rbase, q, 1))
    val counted = candidatesOf(prefixOf(tagged, q, k), k, cross = true,
      maxPostingList)
    val shortL = lbase.filter(col("__len") <= q * (k + 1) - 1)
    val shortR = rbase.filter(col("__len") <= q * (k + 1) - 1)
    val shortPairs = shortL.select(col("__id").as("id_a"),
        col("__len").as("la"))
      .join(shortR.select(col("__id").as("id_b"), col("__len").as("lb")),
        abs(col("la") - col("lb")) <= k)
      .select("id_a", "id_b")
    val verified =
      verifyCross(counted.unionAll(shortPairs).distinct(), lbase, rbase, k)
    if (!collapsed) verified
    else {
      // same optimization barrier as fuzzyPairs: verify at rep level
      // ONCE, never inside the expansion stage
      val repPairs = graft.util.CacheRegistry.cached("fuzzy.repPairs", verified)
      val lm = membersOf(ls, lreps)
      val rm = membersOf(rs, rreps)
      repPairs
        .join(lm.select(col("__rep").as("id_a"), col("__id").as("__ia")),
          "id_a")
        .join(rm.select(col("__rep").as("id_b"), col("__id").as("__ib")),
          "id_b")
        .select(col("__ia").as("id_a"), col("__ib").as("id_b"), col("dist"))
    }
  }

  /** Entity resolution: every row labeled with its ENTITY — the minimal
    * id of its transitive edit-distance-≤k cluster ("Acme Corp" ~
    * "Acme Corp." ~ "Acme Corp,." chain into one entity even when the
    * endpoints are > k apart). The [[fuzzyPairs]] pipeline builds the
    * match graph, [[Components.connectedComponents]] closes it; rows
    * matching nothing are their own entity. Returns (id, entity).
    *
    * On a collapsed corpus ([[fuzzyPairs]]' exact-duplicate
    * pre-collapse) the closure runs AT REP LEVEL — the g²-expanded id
    * pairs are never materialized, because the expansion adds no
    * connectivity: a duplicate group is one node, every member shares
    * its rep's component, and since each rep is its group's MINIMUM id,
    * the component's min rep id IS the min member id (the label
    * contract). A rep in no verified pair labels its whole group with
    * the rep itself — which is exactly "min id of the exact-duplicate
    * cluster" for multi-member groups and "own id" for true singletons.
    * CC input shrinks from Σg² pairs to distinct-string pairs (sf10d:
    * 140M → 13.5k edges). */
  def entityClusters(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int, q: Int = 2,
                     maxPostingList: Int = Int.MaxValue): DataFrame = {
    val (strs, reps, collapsed, verified) =
      selfRepPairs(df, idCol, strCol, maxDist, q, maxPostingList)
    if (!collapsed) {
      val labels = Components.connectedComponents(
        verified.select("id_a", "id_b"))
      strs.select(col("__id").as("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("entity"))
    } else {
      val labels = Components.connectedComponents(
        verified.select("id_a", "id_b"))
      membersOf(strs, reps)
        .join(labels, col("__rep") === col("id"), "left")
        .select(col("__id").as("id"),
          coalesce(col("component"), col("__rep")).as("entity"))
    }
  }

  /** Jaro-Winkler scored pairs (score ≥ `minSim`) under PREFIX BLOCKING:
    * two strings are compared iff their first `blockLen` characters are
    * identical (strings shorter than `blockLen` block on their full
    * text). Unlike [[fuzzyPairs]]' edit-distance tier there is no exact
    * pruning theorem for JW — prefix blocking is the standard ER trade
    * (and the natural one here: the Winkler boost itself rewards shared
    * prefixes, so the pairs blocking discards are exactly the ones the
    * scorer demotes). Recall contract: a pair differing inside the
    * first `blockLen` chars is NOT examined, however similar — callers
    * wanting typo-in-first-char recall should union a second pass
    * blocked on a different key (e.g. [[sortedNeighborhood]]).
    *
    * Scale shape: one shuffle on the block key; pair mass is Σ block² —
    * QUADRATIC in the corpus when the `blockLen` prefix stops
    * discriminating (boilerplate prefixes, a vocabulary-limited first
    * word). Two defenses, both data-driven and deterministic:
    *
    *  - `escalateLen` (> `blockLen`): blocks larger than `maxBlock` rows
    *    RE-BLOCK on the first `escalateLen` characters instead of being
    *    dropped — pairs inside a crowded block now additionally need the
    *    longer shared prefix. This keeps pair mass ≤ n·maxBlock (linear,
    *    cap-bounded) while only demanding extra prefix agreement where
    *    the short key failed. The composite (short, long) key never
    *    crosses level-1 blocks, so escalation is purely a refinement.
    *  - blocks still over `maxBlock` AFTER escalation (or with
    *    escalation off) are SKIPPED — and the skip is DATA, not
    *    documentation: [[jaroWinklerSkippedBlocks]] computes exactly the
    *    dropped (block, level, n_rows) set so recall loss is auditable
    *    (the TextIndex skipped-bucket precedent).
    *
    * Scoring runs in whole-stage codegen via the native
    * [[graft.expr.JaroWinkler]] expression — the candidate stream never
    * leaves the fused loop. Returns (id_a, id_b, jw) with id_a < id_b. */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
                       minSim: Double, blockLen: Int = 2,
                       maxBlock: Int = 100000,
                       escalateLen: Int = 0): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must be in (0,1], got $minSim")
    val kept = jwBlocked(df, idCol, strCol, blockLen, maxBlock,
      escalateLen).filter(col("__bn") <= maxBlock)
    val a = kept.select(col("__blk1"), col("__blk2"),
      col("__id").as("id_a"), col("__s").as("__sa"))
    val b = kept.select(col("__blk1"), col("__blk2"),
      col("__id").as("id_b"), col("__s").as("__sb"))
    a.join(b, Seq("__blk1", "__blk2"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw",
        graft.expr.JaroWinkler.winkler(col("__sa"), col("__sb")))
      .filter(col("jw") >= minSim)
      .select("id_a", "id_b", "jw")
  }

  /** The blocks [[jaroWinklerPairs]] (same arguments) SKIPS — every
    * (block, level, n_rows) whose pair mass was dropped by the
    * `maxBlock` cap, so the recall loss is an auditable report instead
    * of a silent subtraction. `block` is the key actually used (the
    * `blockLen` prefix at level 1, the `escalateLen` prefix at level 2);
    * an empty frame means the pairs output examined every candidate the
    * blocking contract defines. Pure function of the data — the same
    * deterministic size predicate the pairs path evaluates. */
  def jaroWinklerSkippedBlocks(df: DataFrame, idCol: String,
                               strCol: String, blockLen: Int = 2,
                               maxBlock: Int = 100000,
                               escalateLen: Int = 0): DataFrame =
    jwBlocked(df, idCol, strCol, blockLen, maxBlock, escalateLen)
      .filter(col("__bn") > maxBlock)
      .groupBy(col("__level").as("level"),
        when(col("__level") === 1, col("__blk1")).otherwise(col("__blk2"))
          .as("block"))
      .agg(count(lit(1)).as("n_rows"))
      .select("block", "level", "n_rows")

  /** Shared blocking scaffold: rows keyed by (__blk1, __blk2) with the
    * FINAL block's size in __bn and the level that produced it in
    * __level. With escalation off __blk2 is '' and __bn is the level-1
    * size; with escalation on, rows of over-cap level-1 blocks carry the
    * escalateLen prefix in __blk2 and __bn is the (blk1, blk2) sub-block
    * size — a uniform `__bn <= maxBlock` keep-filter on either shape. */
  private def jwBlocked(df: DataFrame, idCol: String, strCol: String,
                        blockLen: Int, maxBlock: Int,
                        escalateLen: Int): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    require(escalateLen == 0 || escalateLen > blockLen,
      s"escalateLen must be 0 (off) or > blockLen, got $escalateLen")
    val strs = prep(df, idCol, strCol)
      .withColumn("__blk1", substring(col("__s"), 1, blockLen))
    val sizes1 = strs.groupBy("__blk1").agg(count(lit(1)).as("__bn1"))
    val j = strs.join(sizes1, "__blk1")
    if (escalateLen == 0)
      j.withColumn("__blk2", lit(""))
        .withColumn("__bn", col("__bn1"))
        .withColumn("__level", lit(1))
    else {
      val keyed = j.withColumn("__blk2",
        when(col("__bn1") > maxBlock,
          substring(col("__s"), 1, escalateLen)).otherwise(lit("")))
      val sizes2 = keyed.groupBy("__blk1", "__blk2")
        .agg(count(lit(1)).as("__bn"))
      keyed.join(sizes2, Seq("__blk1", "__blk2"))
        .withColumn("__level",
          when(col("__bn1") > maxBlock, lit(2)).otherwise(lit(1)))
    }
  }

  /** Sorted-neighborhood near-dup pairs (SNM — the classic ER pass that
    * complements [[jaroWinklerPairs]]' prefix blocking): rows are
    * range-sorted by (`keyCol`, id) and every pair within `window`
    * positions of each other is exact-scored with the native
    * Jaro-Winkler expression; pairs scoring ≥ `minSim` are emitted as
    * (id_a, id_b, jw) with id_a < id_b. Because candidacy is
    * ADJACENCY-in-sort, not key equality, SNM recovers pairs whose keys
    * differ slightly everywhere (the typo-in-first-char case prefix
    * blocking discards by construction) — run it keyed on a sorted-chars
    * or phonetic key and union with the prefix-blocked pass for the
    * standard multi-pass ER recall recipe.
    *
    * Scale shape: ONE range-sort shuffle; the global rank comes from the
    * [[graft.util.RangeCum]] partition-offset scaffold (integer counts —
    * bit-exact, no single-partition window), then a (window−1)-way rank
    * explode equi-joins rank r against r+j — a co-partitioned int-key
    * hash join whose pair mass is n·(window−1), LINEAR in the corpus
    * (the whole point vs block²). Scoring stays in whole-stage codegen.
    * Deterministic end to end: ties in `keyCol` break on the id, so the
    * pair set is a pure function of the data. */
  def sortedNeighborhood(df: DataFrame, idCol: String, strCol: String,
                         keyCol: Column, window: Int,
                         minSim: Double): DataFrame = {
    require(window >= 2 && window <= 1000,
      s"sortedNeighborhood: window must be in [2,1000], got $window")
    require(minSim > 0.0 && minSim <= 1.0,
      s"sortedNeighborhood: minSim must be in (0,1], got $minSim")
    val keyed = prep(df, idCol, strCol)
      .withColumn("__key", keyCol.cast("string"))
      .na.drop(Seq("__key"))
      .withColumn("__ord", struct(col("__key"), col("__id")))
      .withColumn("__one", lit(1.0))
    val ranked = graft.util.RangeCum
      .cumSum(keyed, Nil, "__ord", Seq("__one"))
      .withColumn("__rank", col("__cum___one").cast("long"))
      .select("__id", "__s", "__rank")
    val probes = ranked
      .withColumn("__j", explode(array((1 until window).map(lit): _*)))
      .select(col("__id").as("__ida"), col("__s").as("__sa"),
        (col("__rank") + col("__j")).as("__trank"))
    val targets = ranked.select(col("__id").as("__idb"),
      col("__s").as("__sb"), col("__rank").as("__trank"))
    probes.join(targets, "__trank")
      .withColumn("jw",
        graft.expr.JaroWinkler.winkler(col("__sa"), col("__sb")))
      .filter(col("jw") >= minSim)
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"), col("jw"))
  }

  /** Multi-pass entity resolution: union the pair sets of several
    * blocking passes (each a (id_a, id_b, …) frame from
    * [[jaroWinklerPairs]], [[sortedNeighborhood]], [[fuzzyPairs]], or
    * any custom candidate generator), orient + dedup them, close the
    * union transitively, and label every row of the corpus — the
    * standard ER recipe where each pass covers a failure mode the
    * others miss (prefix blocking vs adjacency-in-sort vs q-gram
    * pruning). Rows matched by no pass are their own entity. Returns
    * (id, entity) with entity = the component's minimum id
    * ([[Components.connectedComponents]]' label convention).
    *
    * Scale shape: the passes' own shuffles + ONE distinct fold of the
    * oriented union + the O(log n)-round CC — nothing here re-scans the
    * corpus beyond the id projection that attaches labels. */
  def multiPassClusters(df: DataFrame, idCol: String, strCol: String,
                        passes: Seq[DataFrame]): DataFrame = {
    require(passes.nonEmpty, "multiPassClusters needs at least one pass")
    val pairs = passes.map(_.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b")))
      .reduce(_ unionByName _)
    val labels = Components.connectedComponents(pairs)
    df.na.drop(Seq(idCol, strCol))
      .select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("entity"))
  }

  /** Survivorship (golden record): collapse each entity cluster to ONE
    * record, picking every attribute independently from the cluster's
    * best row for THAT attribute — non-null beats null, then higher
    * `priorityCol` (source trust / recency), then LOWER `idCol` (a
    * total order, so the golden record is deterministic). The merge
    * step after [[entityClusters]]: attributes from different member
    * rows may combine (that is the point of attribute-level
    * survivorship — the fullest trusted record, not the single best
    * row).
    *
    * Returns (clusterCol, n_members, attrs…).
    *
    * Scale shape: ONE hash aggregate keyed on the cluster — a
    * max_by(attr, (attr IS NOT NULL, priority, −id)) per attribute, all
    * in the same partial/final agg. No window, no per-cluster loop;
    * popular clusters cost their row count, never a sort. */
  def survivorship(df: DataFrame, clusterCol: String, idCol: String,
                   priorityCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "survivorship needs attribute columns")
    val picks = attrCols.map { c =>
      max_by(col(c), struct(col(c).isNotNull.cast("int"),
        col(priorityCol), -col(idCol).cast("long"))).as(c)
    }
    df.na.drop(Seq(clusterCol, idCol, priorityCol))
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"), picks: _*)
  }

  private def verifyCross(cands: DataFrame, ls: DataFrame, rs: DataFrame,
                          k: Int): DataFrame =
    cands
      .join(ls.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(rs.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
}
