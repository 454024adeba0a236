package graft.pipeline

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // substitutions, insertions, deletions, repeats, and SHORT strings
  // (below the count-filter floor) all represented
  private val names = Seq(
    1L -> "alpha-node-17", 2L -> "alpha-node-18", // subst, dist 1
    3L -> "alpha-nodee-17", // insert vs 1, dist 1
    4L -> "alpha-node-1", // delete vs 1, dist 1
    5L -> "beta-node-17", // dist > 1 from alphas at k=1
    6L -> "ab", 7L -> "ac", 8L -> "a", 9L -> "b", // short set
    10L -> "aaaa", 11L -> "aaab", // repeated grams (multiset ordinals)
    12L -> "zzzzzzzzzzzz")

  private def brute(k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      d = lev(sa, sb)
      if d <= k
    } yield (ia, ib, d)).toSet

  test("fuzzyPairs == brute force at k=1 and k=2 (q=2)") {
    val df = names.toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.fuzzyPairs(df, "id", "name", maxDist = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === brute(k), s"k=$k")
    }
  }

  test("fuzzyPairs == brute force at q=3 (different gram width)") {
    val df = names.toDF("id", "name")
    val got = FuzzyJoin.fuzzyPairs(df, "id", "name", maxDist = 1, q = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute(1))
  }

  test("fuzzyJoin (cross-table) == brute force, including short strings") {
    val left = names.toDF("id", "name")
    val right = Seq(100L -> "alpha-node-17", 101L -> "alpha-nod-17",
      102L -> "gamma", 103L -> "ab", 104L -> "aa")
      .toDF("rid", "rname")
    val got = FuzzyJoin.fuzzyJoin(left, "id", "name",
        right, "rid", "rname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (ia, sa) <- names
      (ib, sb) <- Seq(100L -> "alpha-node-17", 101L -> "alpha-nod-17",
        102L -> "gamma", 103L -> "ab", 104L -> "aa")
      d = lev(sa, sb)
      if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got === want)
  }

  test("exact-duplicate pre-collapse: fuzzyPairs == brute on a dup-heavy " +
      "corpus (dist-0 within groups, cross-group expansion, ordering)") {
    // replica-corpus shape (the r12 sf10d q_fuzzy_cross killer): every
    // string carries exact copies; ids deliberately interleave so the
    // rep id (min) is sometimes NOT the smaller member of a pair and
    // the least/greatest re-orientation is exercised
    val dups = Seq(
      10L -> "alpha-node-17", 3L -> "alpha-node-17", 21L -> "alpha-node-17",
      5L -> "alpha-node-18", 30L -> "alpha-node-18",
      7L -> "beta-node-17",
      2L -> "ab", 40L -> "ab", 8L -> "a")
    val df = dups.toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val want = (for {
        (ia, sa) <- dups; (ib, sb) <- dups
        if ia < ib
        d = lev(sa, sb)
        if d <= k
      } yield (ia, ib, d)).toSet
      val got = FuzzyJoin.fuzzyPairs(df, "id", "name", maxDist = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want, s"k=$k")
    }
  }

  test("exact-duplicate pre-collapse: fuzzyJoin == brute with dups on " +
      "both sides (equal strings across sides verify at dist 0)") {
    val l = Seq(1L -> "alpha-node-17", 2L -> "alpha-node-17",
      3L -> "alpha-node-18", 4L -> "ab")
    val r = Seq(100L -> "lpha-node-17", 101L -> "lpha-node-17",
      102L -> "alpha-node-17", 103L -> "b", 104L -> "b")
    val got = FuzzyJoin.fuzzyJoin(l.toDF("id", "name"), "id", "name",
        r.toDF("rid", "rname"), "rid", "rname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (ia, sa) <- l; (ib, sb) <- r
      d = lev(sa, sb)
      if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 0)) // the dist-0 cross-side class fires
  }

  test("maxPostingList skips over-cap keys (bounded, recall documented)") {
    // every string shares gram ("aa",0): cap 2 < 4 strings kills the key;
    // the pairs survive only if another under-cap gram finds them
    val df = Seq(1L -> "aax", 2L -> "aay", 3L -> "aaz", 4L -> "aaw")
      .toDF("id", "name")
    val full = FuzzyJoin.fuzzyPairs(df, "id", "name", maxDist = 1).count()
    val capped = FuzzyJoin.fuzzyPairs(df, "id", "name", maxDist = 1,
      maxPostingList = 2).count()
    assert(full === 6L)
    assert(capped <= full)
  }

  test("boilerplate-prefix corpus (shared long prefix) stays exact") {
    // the shape the prefix filter exists for: every name shares a long
    // constant prefix, so the discriminative grams are the digit tails —
    // the common grams must never enter a prefix yet recall must stay 1.0
    val boiler = (1L to 60L).map(i => i -> f"Item#$i%05d")
    val df = boiler.toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val want = (for {
        (ia, sa) <- boiler; (ib, sb) <- boiler
        if ia < ib
        d = lev(sa, sb)
        if d <= k
      } yield (ia, ib, d)).toSet
      val got = FuzzyJoin.fuzzyPairs(df, "id", "name", maxDist = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want, s"k=$k")
    }
  }

  test("entityClusters: transitive chains merge, singletons self-label") {
    // aaaa ~ aaab ~ aabb chain (each hop distance 1; endpoints distance
    // 2) must land in ONE entity at k=1; the unrelated string stands alone
    val df = Seq(1L -> "aaaa", 2L -> "aaab", 3L -> "aabb",
      4L -> "zzzzzz").toDF("id", "name")
    val got = FuzzyJoin.entityClusters(df, "id", "name", maxDist = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("entityClusters on a dup-heavy corpus: rep-level closure equals " +
      "brute union-find over row-level pairs (chains through dup groups, " +
      "multi-member groups label at min id, true singletons self-label)") {
    // group dups + a chain crossing groups: aaaa(x3) ~ aaab(x2) ~ aabb;
    // ids interleaved so min-id labels are exercised; zzzz is a dup
    // group matching nothing (entity = min member), "q" a true singleton
    val rows = Seq(9L -> "aaaa", 2L -> "aaaa", 30L -> "aaaa",
      5L -> "aaab", 11L -> "aaab", 7L -> "aabb",
      40L -> "zzzzzz", 13L -> "zzzzzz", 50L -> "q")
    val got = FuzzyJoin.entityClusters(rows.toDF("id", "name"),
        "id", "name", maxDist = 1)
      .as[(Long, Long)].collect().toMap
    // brute: union-find over all row pairs with lev <= 1
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
          if lev(sa, sb) <= 1 } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = rows.map(r => r._1 -> find(r._1)).toMap
    assert(got === want)
    assert(got(40L) == 13L && got(50L) == 50L) // dup group min; singleton
  }

  test("jaroWinklerPairs == same-block brute force; blocking is the " +
      "only recall cut") {
    val rows = Seq(1L -> "MARTHA", 2L -> "MARHTA", 3L -> "MARTHA K",
      4L -> "DWAYNE", 5L -> "DUANE", 6L -> "DWAYNE", 7L -> "MA",
      8L -> "M", 9L -> "XARTHA") // 9 ~ 1 but differs in char 1: blocked out
    val df = rows.toDF("id", "name")
    val got = FuzzyJoin.jaroWinklerPairs(df, "id", "name",
        minSim = 0.7, blockLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    def blk(s: String) = s.substring(0, math.min(2, s.length))
    val exp = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && blk(sa) == blk(sb)
      jw = graft.expr.JaroWinkler.jaroWinkler(sa, sb)
      if jw >= 0.7
    } yield (ia, ib, jw)).toSet
    assert(got == exp)
    // the blocked-out near-pair is absent despite a high raw score
    assert(graft.expr.JaroWinkler.jaroWinkler("MARTHA", "XARTHA") > 0.8)
    assert(!got.exists(p => p._1 == 1L && p._2 == 9L))
    // identical strings under the same block score exactly 1
    assert(got.contains((4L, 6L, 1.0)))
  }

  test("jaroWinklerPairs: over-cap blocks are skipped entirely") {
    val big = (1L to 50L).map(i => i -> s"AA-common-$i")
    val small = Seq(100L -> "ZZ-rare-1", 101L -> "ZZ-rare-2")
    val df = (big ++ small).toDF("id", "name")
    val got = FuzzyJoin.jaroWinklerPairs(df, "id", "name",
        minSim = 0.5, blockLen = 2, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L))) // the AA block (50 > 10) is gone
  }

  test("jaroWinklerSkippedBlocks: the dropped blocks (and ONLY them) " +
      "surface as data, mirroring what the pairs pass excluded") {
    val big = (1L to 50L).map(i => i -> s"AA-common-$i")
    val small = Seq(100L -> "ZZ-rare-1", 101L -> "ZZ-rare-2")
    val df = (big ++ small).toDF("id", "name")
    val rep = FuzzyJoin.jaroWinklerSkippedBlocks(df, "id", "name",
        blockLen = 2, maxBlock = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rep.toSeq == Seq(("AA", 1, 50L)))
    // under-cap corpus -> empty report
    assert(FuzzyJoin.jaroWinklerSkippedBlocks(small.toDF("id", "name"),
      "id", "name", blockLen = 2, maxBlock = 10).count() === 0L)
  }

  test("escalation: over-cap blocks re-block on the longer prefix " +
      "instead of dropping; long-prefix pairs survive, cross-sub-block " +
      "pairs do not; still-over-cap sub-blocks skip and report level 2") {
    // one crowded 2-char block "AA" (12 rows > cap 4) containing two
    // 6-char sub-families; a small "ZZ" block untouched by escalation
    val famX = (1L to 6L).map(i => i -> s"AAAXX-$i")
    val famY = (11L to 16L).map(i => i -> s"AAAYY-$i")
    val zz = Seq(100L -> "ZZ-rare-1", 101L -> "ZZ-rare-2")
    val df = (famX ++ famY ++ zz).toDF("id", "name")
    val got = FuzzyJoin.jaroWinklerPairs(df, "id", "name",
        minSim = 0.5, blockLen = 2, maxBlock = 6, escalateLen = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // within-sub-family pairs survive escalation (6-char prefixes agree)
    assert(got.contains((1L, 2L)) && got.contains((11L, 12L)))
    // cross-sub-family pairs need the 6-char prefix now -> excluded
    assert(!got.exists(p => p._1 <= 6L && p._2 >= 11L))
    // the small block never escalated
    assert(got.contains((100L, 101L)))
    // escalated sub-blocks exactly at the cap are kept: nothing skipped
    assert(FuzzyJoin.jaroWinklerSkippedBlocks(df, "id", "name",
      blockLen = 2, maxBlock = 6, escalateLen = 6).count() === 0L)
    // a sub-block still over the cap skips and reports at level 2
    val rep2 = FuzzyJoin.jaroWinklerSkippedBlocks(df, "id", "name",
        blockLen = 2, maxBlock = 4, escalateLen = 6)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(rep2 == Set(("AAAXX-", 2, 6L), ("AAAYY-", 2, 6L)))
    val got2 = FuzzyJoin.jaroWinklerPairs(df, "id", "name",
        minSim = 0.5, blockLen = 2, maxBlock = 4, escalateLen = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((100L, 101L)))
    intercept[IllegalArgumentException](FuzzyJoin.jaroWinklerPairs(
      df, "id", "name", 0.5, blockLen = 4, maxBlock = 4, escalateLen = 3))
  }

  test("null ids/strings dropped; maxDist/q validated") {
    val df = Seq((java.lang.Long.valueOf(1L), "abc"),
      (java.lang.Long.valueOf(2L), null),
      (null.asInstanceOf[java.lang.Long], "abd")).toDF("id", "name")
    assert(FuzzyJoin.fuzzyPairs(df, "id", "name", 1).count() === 0L)
    intercept[IllegalArgumentException](
      FuzzyJoin.fuzzyPairs(df, "id", "name", 0))
    intercept[IllegalArgumentException](
      FuzzyJoin.fuzzyPairs(df, "id", "name", 1, q = 0))
  }

  test("survivorship: non-null beats null, then priority, then lower id") {
    import spark.implicits._
    val df = Seq(
      // cluster 10: phone only on the LOW-priority row — survives anyway
      (10L, 1L, 3L, "Acme Corp", null.asInstanceOf[String]),
      (10L, 2L, 1L, "Acme Corp.", "555-1234"),
      // cluster 20: equal priority → lower id wins
      (20L, 5L, 2L, "Beta", "111"),
      (20L, 6L, 2L, "Beta Inc", "222")
    ).toDF("cluster", "id", "prio", "name", "phone")
    val got = FuzzyJoin.survivorship(df, "cluster", "id", "prio",
        Seq("name", "phone"))
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      // name from prio-3 row, phone from the only non-null row — a MERGED
      // golden record spanning two member rows
      (10L, 2L, "Acme Corp", "555-1234"),
      (20L, 2L, "Beta", "111")))
  }

  test("survivorship: all-null attribute stays null; validation") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, null.asInstanceOf[String]))
      .toDF("cluster", "id", "prio", "name")
    val got = FuzzyJoin.survivorship(df, "cluster", "id", "prio",
      Seq("name")).collect()(0)
    assert(got.isNullAt(2))
    intercept[IllegalArgumentException](
      FuzzyJoin.survivorship(df, "cluster", "id", "prio", Seq.empty))
  }

  test("sortedNeighborhood pairs only within the rank window and " +
      "recovers the typo-in-first-char pair prefix blocking discards") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "smith"/"smyth" prefix-block apart at blockLen 3, but a
    // sorted-chars key puts them adjacent
    val df = Seq(
      (1L, "smith"), (2L, "smyth"),
      (3L, "aaaa"), (4L, "zzzz"))
      .toDF("id", "name")
    val sortedChars = concat_ws("",
      array_sort(split(col("__s"), "")))
    val snm = FuzzyJoin.sortedNeighborhood(df, "id", "name",
        keyCol = sortedChars, window = 2, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snm.contains((1L, 2L)))
    // the prefix-blocked pass misses it (different 3-char prefixes)
    val blocked = FuzzyJoin.jaroWinklerPairs(df, "id", "name",
        minSim = 0.8, blockLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!blocked.contains((1L, 2L)))
    // window = 2 means ONLY rank-adjacent pairs: with 8 sorted rows,
    // no pair can skip over an intermediate rank
    val seq = (1 to 8).map(i => (i.toLong, "row" + i))
    val adj = FuzzyJoin.sortedNeighborhood(seq.toDF("id", "name"),
        "id", "name", keyCol = col("__s"), window = 2, minSim = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adj == (1 to 7).map(i => (i.toLong, i + 1L)).toSet)
    // windows wider than adjacency reach exactly rank-gap <= w-1
    val w3 = FuzzyJoin.sortedNeighborhood(seq.toDF("id", "name"),
        "id", "name", keyCol = col("__s"), window = 3, minSim = 0.01)
      .count()
    assert(w3 == 7 + 6) // gaps 1 and 2
    intercept[IllegalArgumentException](
      FuzzyJoin.sortedNeighborhood(df, "id", "name", col("__s"), 1, 0.5))
    intercept[IllegalArgumentException](
      FuzzyJoin.sortedNeighborhood(df, "id", "name", col("__s"), 2, 0.0))
  }
  test("multiPassClusters: chains crossing pass boundaries merge into " +
      "one entity; unmatched rows self-label") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z"))
      .toDF("id", "name")
    // pass A links 1-2; pass B links 2-3 (reversed orientation on
    // purpose — multiPassClusters must orient before closing)
    val passA = Seq((1L, 2L)).toDF("id_a", "id_b")
    val passB = Seq((3L, 2L)).toDF("id_a", "id_b")
    val got = FuzzyJoin.multiPassClusters(df, "id", "name",
        Seq(passA, passB))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    intercept[IllegalArgumentException](
      FuzzyJoin.multiPassClusters(df, "id", "name", Seq.empty))
  }
}
