package graft

import graft.clean.Clean
import graft.agg.Stats
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over the engine's operators (SURVEY §5):
  * fencing is idempotent; fill leaves non-missing rows unchanged; entropy
  * is non-negative and bounded by log2(#values); mutual information is
  * symmetric and non-negative. Uses raw ScalaCheck generators with fixed
  * seeds (scalatestplus bridge is not on the offline classpath); Spark
  * jobs per case are expensive so each property samples a handful of
  * generated cases.
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val doubles: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)).map(_.take(60))

  // NOTE: Tukey fencing with INTERPOLATED quartiles is not idempotent in
  // general — on tiny samples the q3 interpolation can include an outlier
  // value, so re-fencing the capped data tightens the fences again (this
  // property-test discovery is inherent to quantile_cont semantics, shared
  // by the reference). The guaranteed invariants are the ones below.
  test("property: fastTokens equals the regex split token stream") {
    // includes every Java-\s char, empty/whitespace-only strings, and
    // leading/trailing/multi-space runs
    val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf(wsChars).map(_.toString),
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const(""))
    val strings: Gen[String] = Gen.listOfN(24, piece).map(_.mkString)
    for (text <- samples(strings, 40) ++ Seq("", " ", "\t\n", "a", " a b ")) {
      val expected = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val got = graft.pipeline.TextAnalysis.fastTokens(text).toSeq
      assert(got == expected, s"mismatch on ${text.map(_.toInt).mkString(",")}")
    }
  }

  test("property: posting-list pair generation equals the self-join pairs") {
    import spark.implicits._
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 30L)))
    for (data <- samples(gen, 3)) {
      val keyed = data.distinct // (key, id) — posting lists carry unique ids
      val ds = keyed.toDS()
      val fromLists = graft.pipeline.Dedup.pairsByKey(ds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val df = keyed.toDF("k", "id")
      val a = df.select(col("k"), col("id").as("id_a"))
      val b = df.select(col("k"), col("id").as("id_b"))
      val fromJoin = a.join(b, "k").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fromLists == fromJoin)
    }
  }

  test("property: heap-based topKJoin equals the window-over-cross-join form") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0)))
    for ((vs, it) <- samples(gen, 2).zipWithIndex) {
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding").repartition(5)
      val queries = df.filter(col("vec_id") < 3)
      val fast = graft.pipeline.Similarity
        .topKJoin(df, queries, "vec_id", "embedding", 4)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
          math.rint(r.getDouble(2) * 1e12))).sorted.toSeq
      // reference formulation: score every (corpus, query) pair, rank
      val c = df.select(col("vec_id").as("corpus_id"),
        expr("transform(embedding, x -> cast(x as double))").as("cv"))
      val q = df.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> cast(x as double))").as("qv"))
      val scored = c.crossJoin(q).filter(col("corpus_id") =!= col("query_id"))
        .withColumn("cos", graft.pipeline.Dedup.cosine(col("cv"), col("qv")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cos"), col("corpus_id"))
      val slow = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 4)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rn"),
          r.getAs[Long]("corpus_id"),
          math.rint(r.getAs[Double]("cos") * 1e12))).sorted.toSeq
      assert(fast == slow, s"case $it")
    }
  }

  test("property: df-level language id equals the Column form") {
    import spark.implicits._
    val word = Gen.oneOf("the", "der", "le", "el", "xyz", "und", "la",
      "is", "ist", "es", "dog", "hund", "chien", "perro")
    val gen = Gen.listOfN(30, Gen.listOfN(12, word).map(_.mkString(" ")))
    for (texts <- samples(gen, 2)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      val a = graft.pipeline.TextAnalysis.withLanguageId(df, "t")
        .select("id", "lang_pred").collect()
        .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      val b = df.select(col("id"),
          graft.pipeline.TextAnalysis.languageId(col("t")).as("lang_pred"))
        .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      assert(a == b)
    }
  }

  test("property: simhashDedup equals brute-force chunk-share + hamming") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val gen = Gen.listOfN(25, Gen.listOfN(6, word).map(_.mkString(" ")))
    for (texts <- samples(gen, 2)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val fast = graft.pipeline.Dedup.simhashDedup(df, "id", "t", maxHamming = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      // brute force: local signatures, pairs sharing >= 1 of the 4 chunks
      val sigs = df.select(col("id"),
          graft.pipeline.Dedup.simhash(col("t")).as("sh"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val slow = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.length
        (ida, sa) = sigs(i); (idb, sb) = sigs(j)
        share = (0 until 4).exists(c =>
          ((sa >>> (c * 16)) & 0xFFFFL) == ((sb >>> (c * 16)) & 0xFFFFL))
        h = java.lang.Long.bitCount(sa ^ sb)
        if share && h <= 20
      } yield (ida, idb, h)).sorted.toSeq
      assert(fast == slow)
    }
  }

  test("property: simhashDedup with chunks=maxHamming+1 is exactly the Hamming ball") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val gen = Gen.listOfN(25, Gen.listOfN(6, word).map(_.mkString(" ")))
    for (texts <- samples(gen, 2)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val sigs = df.select(col("id"),
          graft.pipeline.Dedup.simhash(col("t")).as("sh"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      // pigeonhole-complete configs: candidate set == full Hamming ball,
      // including the variable-width chunks (chunks=9 -> 7/7/.../8 bits)
      for ((chunks, maxH) <- Seq((2, 1), (9, 8))) {
        val fast = graft.pipeline.Dedup.simhashDedup(df, "id", "t",
            maxHamming = maxH, chunks = chunks)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .sorted.toSeq
        val slow = (for {
          i <- sigs.indices; j <- (i + 1) until sigs.length
          h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
          if h <= maxH
        } yield (sigs(i)._1, sigs(j)._1, h)).sorted.toSeq
        assert(fast == slow, s"chunks=$chunks maxHamming=$maxH")
      }
    }
  }

  test("property: stop-listed jaccard pairs are a subset over kept shingles") {
    import spark.implicits._
    val words = Gen.listOfN(8, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
      .map(_.mkString(" "))
    for ((texts, seed) <- samples(Gen.listOfN(10, words), 3).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val full = graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 2)
        .filter(col("jaccard") > 0)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      // maxDf = #docs → nothing stop-listed → identical pair set
      val noop = graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 2,
          maxDf = 10)
        .filter(col("jaccard") > 0)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(noop == full, s"seed $seed: maxDf=#docs changed the pair set")
      // tighter maxDf only removes pairs, never invents them
      val tight = graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 2,
          maxDf = 3)
        .filter(col("jaccard") > 0)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(tight.subsetOf(full), s"seed $seed: stop-list invented pairs")
    }
  }

  test("property: multi-table embeddingDedup pairs are a superset of one table") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val one = graft.pipeline.Dedup.embeddingDedup(vecs, "vec_id", "embedding",
        dim = 8, threshold = 0.5, bits = 4, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val four = graft.pipeline.Dedup.embeddingDedup(vecs, "vec_id", "embedding",
        dim = 8, threshold = 0.5, bits = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // table 0's planes are shared, so every single-table pair survives
    assert(one.subsetOf(four), "table-0 pairs lost in the multi-table run")
  }

  test("property: fencing caps into learned fences, preserves in-fence rows") {
    import spark.implicits._
    samples(doubles, 5).filter(_.size >= 4).foreach { vs =>
      val df = vs.toDF("v")
      val once = Clean.fence(df.toHandy, Seq("v"))
      val (lo, hi) = once.state.fences("v")("")
      val capped = once.df.select("v").collect().map(_.getDouble(0)).toSeq
      assert(capped.size == vs.size)
      assert(capped.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9))
      // values already inside the fences are untouched
      vs.filter(v => v >= lo && v <= hi).foreach(v => assert(capped.contains(v)))
    }
  }

  test("property: fill leaves non-missing rows unchanged, removes all nulls") {
    import spark.implicits._
    samples(doubles, 5).foreach { vs =>
      val data: Seq[java.lang.Double] =
        vs.map(java.lang.Double.valueOf) ++ Seq(null, null)
      val df = data.toDF("v")
      val filled = Clean.fill(df.toHandy, Clean.Mean, Seq("v"))
      assert(filled.df.filter(col("v").isNull).count() == 0)
      val kept = filled.df.collect().map(_.getDouble(0)).toSeq
      vs.foreach(v => assert(kept.contains(v)))
    }
  }

  test("property: entropy in [0, log2(#distinct)]") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")), 6).foreach { vs =>
      val df = vs.toDF("c")
      val h = Stats.entropy(df, "c").head().getAs[Double]("c_entropy")
      val k = vs.distinct.size
      assert(h >= -1e-12)
      assert(h <= math.log(k.toDouble) / math.log(2) + 1e-9)
    }
  }

  test("property: ngramNovelty conserves the distinct-gram universe") {
    import spark.implicits._
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(12).mkString(" "))
    samples(Gen.nonEmptyListOf(docGen).map(_.take(8)), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nov = graft.pipeline.TextAnalysis.ngramNovelty(df, "doc_id", "text", 2)
        .collect()
      // every novelty in [0, 1]; novel grams across docs partition the
      // corpus-wide distinct gram set exactly (each gram has ONE owner)
      nov.foreach { r =>
        val v = r.getDouble(3)
        assert(v >= 0.0 && v <= 1.0 + 1e-12, s"novelty $v out of range")
        assert(r.getLong(2) <= r.getLong(1))
      }
      val totalNovel = nov.map(_.getLong(2)).sum
      val universe = texts.flatMap { t =>
        val toks = t.trim.split("\\s+").toSeq
        if (toks.length < 2) Seq(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      }.distinct.size
      assert(totalNovel == universe.toLong,
        s"novel-gram owners ($totalNovel) != distinct grams ($universe)")
    }
  }

  test("property: temperatureSample membership, monotonicity, alpha=1 degeneracy") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "rare" else "base"))
      .toDF("doc_id", "source")
    def kept(alpha: Double, scale: Double) =
      graft.pipeline.Sampling.temperatureSample(df, "doc_id", "source",
        alpha, scale, seed = 5).collect().map(_.getLong(0)).toSet
    val base = kept(0.5, 0.1)
    // membership is a subset of input ids and grows with scale
    assert(base.subsetOf((1L to 400L).toSet))
    assert(base.subsetOf(kept(0.5, 0.3)), "raising scale must only add rows")
    // alpha = 1: group-independent — exactly hashSample at fraction=scale
    val uni = kept(1.0, 0.2)
    val hs = graft.pipeline.Sampling.hashSample(df, "doc_id", 0.2, seed = 5)
      .collect().map(_.getLong(0)).toSet
    assert(uni == hs, "alpha=1 must degenerate to plain hash sampling")
  }

  test("property: groupOverlap bounds (jaccard <= containment <= 1, symmetric universe)") {
    import spark.implicits._
    val wordGen = Gen.oneOf("p", "q", "r", "s")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(8).mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("g1", "g2", "g3"), docGen)).map(_.take(10))
    samples(corpusGen, 5).foreach { rows =>
      val df = rows.toDF("source", "text")
      graft.pipeline.Dedup.groupOverlap(df, "source", "text", n = 2)
        .collect().foreach { r =>
          val (j, c) = (r.getDouble(3), r.getDouble(4))
          assert(r.getString(0) < r.getString(1), "pair not ordered")
          assert(j > 0 && j <= c + 1e-12 && c <= 1.0 + 1e-12,
            s"bounds violated: jaccard $j containment $c")
        }
    }
  }

  test("property: mutual information is symmetric and non-negative") {
    import spark.implicits._
    val pairGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("x", "y"), Gen.oneOf("u", "v", "w")))
    samples(pairGen, 5).foreach { ps =>
      val df = ps.toDF("a", "b")
      val ab = Stats.mutualInfo(df, "a", "b").head().getAs[Double]("mutual_info")
      val ba = Stats.mutualInfo(df, "b", "a").head().getAs[Double]("mutual_info")
      assert(math.abs(ab - ba) < 1e-9)
      assert(ab >= -1e-9)
    }
  }

  test("property: chunkSplit covers every token, respects window/overlap, count closed-form") {
    import spark.implicits._
    val cfg = Gen.zip(Gen.chooseNum(1, 40), Gen.chooseNum(2, 12))
      .flatMap { case (n, w) => Gen.chooseNum(0, w - 1).map(o => (n, w, o)) }
    samples(cfg, 12).foreach { case (n, w, o) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val rows = graft.pipeline.Packing.chunkSplit(
          Seq((1L, text)).toDF("id", "text"), "id", "text", w, o)
        .collect().map(r => (r.getAs[Int]("chunk_id"),
          r.getAs[Int]("start_token"), r.getAs[Int]("n_tokens"),
          r.getAs[String]("chunk"))).sortBy(_._1)
      val stride = w - o
      val wantM = if (n <= w) 1 else 1 + ((n - w + stride - 1) / stride)
      assert(rows.length == wantM, s"n=$n w=$w o=$o")
      // every token index covered; every chunk full-width (or whole doc)
      val covered = rows.flatMap { case (_, s, nt, _) => s until s + nt }.toSet
      assert(covered == (0 until n).toSet, s"n=$n w=$w o=$o")
      rows.foreach { case (_, s, nt, chunk) =>
        assert(nt == (if (n <= w) n else w))
        assert(chunk == (s until s + nt).map(i => s"t$i").mkString(" "))
      }
    }
  }

  test("property: upsample mass = sum of per-row copies; partitioning-independent") {
    import spark.implicits._
    val facs = Gen.chooseNum(0.0, 3.5)
    samples(facs, 6).foreach { f =>
      val rows = (0L until 300L).map(i => (i, i % 7)).toDF("id", "g")
      val up = graft.pipeline.Sampling.upsample(rows, "id", f, seed = 5)
      val perId = up.groupBy("id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every id's copy count is floor(f) or ceil(f)
      val lo = math.floor(f).toLong
      assert(perId.values.forall(c => c == lo || c == lo + 1))
      // repartitioning never changes the decision set
      val up2 = graft.pipeline.Sampling.upsample(rows.repartition(7), "id",
          f, seed = 5)
        .groupBy("id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(up2 == perId, s"factor $f")
    }
  }

  test("property: CountHist merge is associative and order-insensitive") {
    import spark.implicits._
    val gen = Gen.listOfN(90, Gen.chooseNum(-5.0, 15.0))
    samples(gen, 4).foreach { vs =>
      val parts = vs.grouped(30).toSeq
      def sk(xs: Seq[Double]) = graft.agg.CountHist.sketchCol(
        xs.toDF("v"), "v", 0.0, 10.0, 8)
      val whole = sk(vs)
      val abc = sk(parts(0)).merge(sk(parts(1))).merge(sk(parts(2)))
      val cba = sk(parts(2)).merge(sk(parts(0))).merge(sk(parts(1)))
      for (m <- Seq(abc, cba)) {
        assert(m.counts.sameElements(whole.counts))
        assert(m.below == whole.below && m.above == whole.above)
      }
    }
  }

  test("property: exact percentile matches sort-based quantile_cont") {
    import spark.implicits._
    samples(doubles, 6).filter(_.size >= 2).foreach { vs =>
      val df = vs.toDF("v")
      val ps = Seq(0.25, 0.5, 0.75)
      val got = df.agg(graft.expr.ExactPercentile.of(col("v"), ps))
        .head().getSeq[Double](0)
      val sorted = vs.sorted
      val want = ps.map { p =>
        val pos = p * (sorted.size - 1)
        val lo = pos.toInt
        val hi = math.ceil(pos).toInt
        if (lo == hi) sorted(lo)
        else sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
      }
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
  }

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: fuzzy join prefix filter is exact on random small-alphabet strings") {
    import spark.implicits._
    // tiny alphabet maximizes gram collisions and near-miss pairs — the
    // regime where a prefix-filter bug would lose recall
    val strGen: Gen[String] =
      Gen.chooseNum(0, 14).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.listOfN(25, strGen)
    for ((strs, caseIdx) <- samples(corpusGen, 3).zipWithIndex;
         k <- Seq(1, 2)) {
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib
        d = levRef(sa, sb)
        if d <= k
      } yield (ia, ib, d)).toSet
      val got = graft.pipeline.FuzzyJoin
        .fuzzyPairs(rows.toDF("id", "s"), "id", "s", maxDist = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"case $caseIdx k=$k strs=$strs")
    }
  }

  test("property: substring spans and rewrite equal the reference on random docs") {
    import spark.implicits._
    val L = 8
    val docGen: Gen[String] =
      Gen.chooseNum(0, 90).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('x', 'y', ' ')).map(_.mkString))
    val corpusGen = Gen.listOfN(10, docGen)
    for ((docs0, caseIdx) <- samples(corpusGen, 3).zipWithIndex) {
      val docs = docs0.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // reference: windows -> repeated strings -> min owner -> merged spans
      val wins = for {
        (id, t) <- docs; if t.length >= L
        p <- 1 to (t.length - L + 1)
      } yield (id, p.toLong, t.substring(p - 1, p - 1 + L))
      val removed = wins.groupBy(_._3).filter(_._2.size >= 2).values
        .flatMap { occ =>
          val owner = occ.map(o => (o._1, o._2)).min
          occ.map(o => (o._1, o._2)).filterNot(_ == owner)
        }.toSeq
      val wantSpans = removed.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).distinct.sorted
        val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { p =>
          if (acc.nonEmpty && p <= acc.last._2 + 1) {
            val (s0, e0) = acc.last
            acc(acc.length - 1) = (s0, math.max(e0, p + L - 1))
          } else acc += ((p, p + L - 1))
        }
        acc.map { case (s0, e0) => (id, s0, e0) }
      }.toSet
      val df = docs.toDF("doc_id", "text")
      val gotSpans = graft.pipeline.SubstringDedup
        .repeatedSubstringSpans(df, "doc_id", "text", L)
        .as[(Long, Long, Long)].collect().toSet
      assert(gotSpans == wantSpans, s"case $caseIdx spans")
      val wantText = docs.map { case (id, t) =>
        val cut = wantSpans.filter(_._1 == id).toSeq.sortBy(_._2)
        val sb = new StringBuilder
        var prev = 0L
        cut.foreach { case (_, s0, e0) =>
          if (s0 - 1 > prev) sb.append(t.substring(prev.toInt, (s0 - 1).toInt))
          prev = e0
        }
        if (prev < t.length) sb.append(t.substring(prev.toInt))
        id -> sb.toString
      }.toMap
      val gotText = graft.pipeline.SubstringDedup
        .removeRepeatedSubstrings(df, "doc_id", "text", L)
        .as[(Long, String)].collect().toMap
      assert(gotText == wantText, s"case $caseIdx rewrite")
    }
  }

  test("property: rendezvous sharding moves ONLY the removed shard's " +
      "rows when n shrinks; hash-mod moves nearly everything") {
    import spark.implicits._
    val ids = (1L to 400L).toDF("id")
    def assign(n: Int) = graft.pipeline.Sampling
      .rendezvousShard(ids, "id", n)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    val s8 = assign(8)
    val s7 = assign(7)
    assert(s8.values.toSet.size == 8) // every shard used
    // HRW stability: rows NOT on the removed shard 7 keep their shard
    s8.foreach { case (id, sh) =>
      if (sh < 7) assert(s7(id) == sh, s"id $id moved without cause")
      else assert(s7(id) < 7) // evicted rows land somewhere valid
    }
    // contrast: id % n reshuffles most rows on the same shrink
    val modMoved = (1L to 400L).count(id => id % 8 != id % 7)
    assert(modMoved > 300)
    // determinism + seed sensitivity
    assert(assign(8) == s8)
    val seeded = graft.pipeline.Sampling
      .rendezvousShard(ids, "id", 8, seed = "other")
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(seeded != s8)
    intercept[IllegalArgumentException](graft.pipeline.Sampling
      .rendezvousShard(ids, "id", 8, seed = "a:b"))
  }

  test("neymanAllocation weights strata by N_h*S_h; sample follows it") {
    import spark.implicits._
    // stratum A: 100 rows spread 0..99 (big S); B: 100 rows constant-ish
    // (tiny S); C: a single row (weight 0 by contract)
    val rows = (1 to 100).map(i => (i.toLong, "A", i.toDouble * 3)) ++
      (101 to 200).map(i => (i.toLong, "B", 5.0 + (i % 2))) ++
      Seq((201L, "C", 9.0))
    val df = rows.toDF("id", "s", "v")
    val alloc = graft.pipeline.Sampling.neymanAllocation(df, "s", "v", 60)
      .orderBy("stratum").collect()
    val byS = alloc.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(byS("C")._2 == 0.0 && byS("C")._3 == 0.0) // single row starved
    // A's stddev dwarfs B's -> A gets nearly the whole budget
    assert(byS("A")._3 > 10 * byS("B")._3)
    // sequential check of A's fraction: 60 * wA/(wA+wB) / 100
    def sd(xs: Seq[Double]): Double = {
      val n = xs.size; val s = xs.sum; val ss = xs.map(x => x * x).sum
      math.sqrt((ss - s * s / n) / (n - 1))
    }
    val wA = 100 * sd((1 to 100).map(_.toDouble * 3))
    val wB = 100 * sd((101 to 200).map(i => 5.0 + (i % 2)))
    assert(math.abs(byS("A")._3 - 60.0 * wA / (wA + wB) / 100) < 1e-12)
    // the sample realizes the allocation: every kept id obeys the
    // Lehmer membership at its stratum's fraction
    val kept = graft.pipeline.Sampling.neymanSample(
      df, "id", "s", "v", 60, seed = 3)
    val fr = byS.map { case (k, (_, _, f)) => k -> f }
    val ok = kept.select("id", "s").as[(Long, String)].collect()
      .forall { case (id, s) =>
        graft.pipeline.Sampling.hashSample(
          df.filter($"id" === id), "id", fr(s), seed = 3).count() == 1
      }
    assert(ok)
    assert(kept.filter($"s" === "C").count() == 0)
  }

  test("property: NormalizeText equals the regex chain on random " +
      "unicode, driver-evaluated per case") {
    // driver-side replica of the exact chain NormalizeText replaced:
    // UTF8String.toLowerCase is the same routine Spark's lower() calls
    // under UTF8_BINARY; regexp_replace is Java regex; trim strips
    // 0x20 only (after \s+ collapse all boundary whitespace IS 0x20)
    import org.apache.spark.unsafe.types.UTF8String
    def chainRef(s: String): String = {
      val lowered = UTF8String.fromString(s).toLowerCase.toString
      val r2 = lowered.replaceAll("[^a-z0-9\\s]", " ")
        .replaceAll("\\s+", " ")
      var a = 0; var b = r2.length
      while (a < b && r2.charAt(a) == ' ') a += 1
      while (b > a && r2.charAt(b - 1) == ' ') b -= 1
      r2.substring(a, b)
    }
    def norm(s: String): String =
      graft.expr.NormalizeText.normalize(UTF8String.fromString(s)).toString
    // char pool biased toward the decision boundaries: case pairs,
    // digits, every Java-\s member, non-\s whitespace lookalikes,
    // combining marks, case-expanding letters, astral pairs
    val pool: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r').map(_.toString),
      Gen.oneOf("\u00a0", "\u200b", "\u0130", "\u212a", "\u1e9e",
        "\u00c5", "\u0301", "\uff41", "\uff12", "\ud83d\ude00",
        "\uD83D" /* lone high surrogate */, "!", "-", "_", "."))
    val strings: Gen[String] = Gen.listOfN(32, pool).map(_.mkString)
    for (s <- samples(strings, 200) ++ Seq("", " ", "İİ", "A"))
      assert(norm(s) == chainRef(s),
        s"mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
  }
}
