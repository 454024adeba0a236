package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

class ScaleOpsSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    def count(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case _                        => p.children.map(count).sum
      }
      self + inner
    }
    count(df.queryExecution.executedPlan)
  }

  test("skewReport quantifies a planted hot key") {
    import spark.implicits._
    // 90 rows on key 1, one row each on keys 2..11: top1_share = 0.9
    val df = (Seq.fill(90)(1L) ++ (2L to 11L)).map(k => (k, "x"))
      .toDF("k", "v")
    val r = ScaleOps.skewReport(df, Seq("k")).head()
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[Long]("max_key_count") == 90L)
    assert(math.abs(r.getAs[Double]("top1_share") - 0.9) < 1e-12)
    assert(math.abs(r.getAs[Double]("avg_key_count") - 100.0 / 11) < 1e-12)
    // null keys are excluded (they never co-locate in a join anyway)
    val withNull = df.unionAll(Seq((null.asInstanceOf[java.lang.Long], "x"))
      .map(t => (Option(t._1).map(Long.unbox), t._2)).toDF("k", "v"))
    assert(ScaleOps.skewReport(withNull, Seq("k")).head()
      .getAs[Long]("n_rows") == 100L)
  }

  test("bucketed join on bucket keys plans no shuffle") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val right = (1 to 500).map(i => (i.toLong % 100, s"name_$i")).toDF("k", "n")
    ScaleOps.writeBucketed(left, "bk_left", 4, Seq("k"))
    ScaleOps.writeBucketed(right, "bk_right", 4, Seq("k"))
    val joined = ScaleOps.bucketedJoin(spark, "bk_left", "bk_right", Seq("k"))
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
    // co-located join still computes the right answer
    val expected = left.join(right, "k").count()
    assert(joined.count() == expected)
  }

  test("saltedJoin spreads a hot key and preserves join semantics") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong % 50 + 2, "cold"))).toDF("k", "tag")
    val dim = (1 to 60).map(i => (i.toLong, s"d_$i")).toDF("k", "d")
    val plain = fact.join(dim, "k")
    val salted = ScaleOps.saltedJoin(fact, dim, "k", buckets = 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = salted.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("bloomPrunedJoin: exact plain-join results; prune actually drops non-matching rows") {
    import spark.implicits._
    val big = (1L to 5000L).map(i => (i % 500, i)).toDF("k", "v")
    val small = (0L until 50L).map(i => (i, s"d_$i")).toDF("k", "d")
    val plain = big.join(small, "k")
    val pruned = ScaleOps.bloomPrunedJoin(big, small, "k")
    val a = plain.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = pruned.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    // the prune itself: at fpp=0.01 the 450 non-matching keys' rows are
    // ~99% filtered before any join — count the filter's survivors
    val bloom = small.stat.bloomFilter("k", 50, 0.01)
    val survivors = big.filter(udf((k: Long) => bloom.mightContainLong(k))
      .apply(col("k"))).count()
    val matching = big.filter(col("k") < 50).count()
    assert(survivors < matching + (5000 - matching) / 10,
      s"prune too weak: $survivors survivors for $matching true matches")
    // null keys never join, never NPE
    val withNull = big.unionAll(Seq((null.asInstanceOf[java.lang.Long], 0L))
      .map(t => (Option(t._1).map(Long.unbox), t._2)).toDF("k", "v"))
    assert(ScaleOps.bloomPrunedJoin(withNull, small, "k").count() ==
      plain.count())
    // empty small side: empty result, no NPE
    assert(ScaleOps.bloomPrunedJoin(big, small.filter(lit(false)), "k")
      .count() == 0L)
    // string key refused
    intercept[IllegalArgumentException] {
      ScaleOps.bloomPrunedJoin(big.withColumn("k", col("k").cast("string")),
        small.withColumn("k", col("k").cast("string")), "k")
    }
  }

  test("zorderValue matches a reference interleave; dominance is monotone") {
    import spark.implicits._
    def refZ(q1: Long, q2: Long, bits: Int): Long =
      (0 until bits).map(b =>
        (((q1 >> b) & 1L) << (2 * b)) | (((q2 >> b) & 1L) << (2 * b + 1))).sum
    val pts = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", ScaleOps.zorderValue(Seq(col("x"), col("y")), 4))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 4), s"($x,$y)")
    }
    // componentwise dominance implies z-order dominance
    for ((x1, y1) <- pts; (x2, y2) <- Seq((x1 + 1, y1), (x1, y1 + 1), (x1 + 2, y1 + 3)))
      if (x2 <= 15 && y2 <= 15)
        assert(got((x1, y1)) < got((x2, y2)))
  }

  test("withZorder: quantization endpoints, degenerate and null dims; cluster preserves rows") {
    import spark.implicits._
    val df = Seq((1L, 0.0, 10.0), (2L, 100.0, 10.0), (3L, 50.0, 10.0))
      .toDF("id", "x", "c")
    // x: min->cell 0, max->clipped top cell; c degenerate -> 0 bits set
    val z = ScaleOps.withZorder(df, Seq("x", "c"), bits = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    def refZ(q1: Long): Long = // dim 1 contributes nothing (degenerate)
      (0 until 4).map(b => ((q1 >> b) & 1L) << (2 * b)).sum
    assert(z(1L) == refZ(0))
    assert(z(2L) == refZ(15))
    assert(z(3L) == refZ(8)) // (50/100)*16 = 8.0 exactly
    val clustered = ScaleOps.clusterByZorder(df, Seq("x", "c"), bits = 4,
      partitions = 2)
    assert(clustered.columns.toSeq == df.columns.toSeq)
    assert(clustered.count() == 3L)
  }

  test("clusterByZorder tightens per-partition bounding boxes vs arrival order") {
    import spark.implicits._
    // a shuffled grid: arrival order is adversarial to locality
    val rnd = new scala.util.Random(7)
    val pts = rnd.shuffle((for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toDouble, y.toDouble)).toVector)
    val df = pts.toDF("x", "y").repartition(1)
    def maxBoxArea(frame: org.apache.spark.sql.DataFrame): Double = {
      frame.rdd.mapPartitions { it =>
        val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
        val ys = scala.collection.mutable.ArrayBuffer.empty[Double]
        it.foreach { r => xs += r.getDouble(0); ys += r.getDouble(1) }
        if (xs.isEmpty) Iterator.empty
        else Iterator.single((xs.max - xs.min) * (ys.max - ys.min))
      }.collect().maxOption.getOrElse(0.0)
    }
    val naive = df.repartition(16) // round-robin: every partition spans ~everything
    val zed = ScaleOps.clusterByZorder(df, Seq("x", "y"), bits = 5,
      partitions = 16)
    val naiveArea = maxBoxArea(naive)
    val zedArea = maxBoxArea(zed)
    assert(zedArea < naiveArea / 2,
      s"z-clustering should shrink the worst bounding box: $zedArea vs $naiveArea")
  }

  test("z-ordered parquet prunes row groups under a 2-D box filter; round-robin doesn't") {
    import spark.implicits._
    // 64k points on a 256x256 grid, shuffled arrival order
    val rnd = new scala.util.Random(11)
    val pts = rnd.shuffle((for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toDouble, y.toDouble)).toVector)
    val df = pts.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // one row group per file (small files): file-level min/max stats are
    // the pruning unit either way
    ScaleOps.clusterByZorder(df, Seq("x", "y"), bits = 8, partitions = 16)
      .write.mode("overwrite").parquet(s"$base/zed")
    df.repartition(16).write.mode("overwrite").parquet(s"$base/naive")
    // a 32x32 box = 1/64 of the space; measure rows MATERIALIZED from
    // parquet (scan output before the residual filter) — row-group
    // statistics skip whole files only when the layout is clustered.
    // The box is curve-ALIGNED ([64,96) in both dims): a box straddling
    // a high-order quadrant boundary (e.g. 128) touches z-ranges in all
    // four top quadrants and prunes far less — the documented z-order
    // worst case, not a layout defect
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("x") >= 64 && col("x") < 96 &&
          col("y") >= 64 && col("y") < 96)
      // collect() on THIS Dataset so the metrics belong to the executed
      // plan instance (count() would execute a different QueryExecution)
      assert(q.collect().length == 32 * 32) // answer identical in both layouts
      val scans = q.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zed = scanRows(s"$base/zed")
    val naive = scanRows(s"$base/naive")
    assert(naive > 60000, s"round-robin layout should scan ~everything: $naive")
    // repartitionByRange boundaries are SAMPLED, so the box's contiguous
    // z-block straddles a couple of files rather than exactly one —
    // measured ~17k of 65k rows materialized (vs all 65k naive)
    assert(zed < naive / 3,
      s"z-order should prune most row groups: scanned $zed vs $naive")
  }

  test("autoJoin: decision follows the measurements; every branch matches the plain join") {
    import spark.implicits._
    val hotFact = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong % 50 + 2, "cold"))).toDF("k", "tag")
    val flatFact = (1 to 1000).map(i => (i.toLong % 200, "x")).toDF("k", "tag")
    val dim = (1 to 60).map(i => (i.toLong, s"d_$i")).toDF("k", "d")
    // small dim -> broadcast regardless of skew
    assert(ScaleOps.autoJoinDecision(hotFact, dim, "k") == "broadcast")
    // dim over the broadcast bound + hot key -> salted
    assert(ScaleOps.autoJoinDecision(hotFact, dim, "k",
      broadcastRows = 10) == "salted")
    // dim over the bound, balanced keys -> plain
    assert(ScaleOps.autoJoinDecision(flatFact, dim, "k",
      broadcastRows = 10) == "plain")
    // all three execute to the identical result
    val want = hotFact.join(dim, "k").groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    Seq(1000000L, 10L).foreach { br =>
      val got = ScaleOps.autoJoin(hotFact, dim, "k", broadcastRows = br)
        .groupBy("k").count().orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"broadcastRows=$br")
    }
  }

  test("compact: many tiny files collapse; rows intact; same-path refused") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    (1L to 5000L).map(i => (i, s"row $i")).toDF("id", "v")
      .repartition(64) // the small-files pathology
      .write.mode("overwrite").parquet(s"$base/src")
    val r = ScaleOps.compact(spark, s"$base/src", s"$base/dst",
      targetBytes = 1L << 30).head()
    assert(r.getAs[Long]("files_before") == 64L)
    assert(r.getAs[Long]("files_after") == 1L)
    assert(r.getAs[Long]("n_rows") == 5000L)
    val back = spark.read.parquet(s"$base/dst")
    assert(back.count() == 5000L &&
      back.agg(sum("id")).head.getLong(0) == 5000L * 5001 / 2)
    intercept[IllegalArgumentException] {
      ScaleOps.compact(spark, s"$base/src", s"$base/src")
    }
    // tiny target -> several output files
    val r2 = ScaleOps.compact(spark, s"$base/src", s"$base/dst2",
      targetBytes = r.getAs[Long]("bytes") / 4).head()
    assert(r2.getAs[Long]("files_after") >= 3L)
  }

  test("skewReport on empty / all-null-key input is all zeros, not null") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    val r = ScaleOps.skewReport(empty, Seq("k")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0) // top1_share well-defined via the floor
    val nulls = Seq((null.asInstanceOf[java.lang.Long], 1L))
      .toDF("k", "v")
    val r2 = ScaleOps.skewReport(nulls, Seq("k")).head()
    assert(r2.getLong(0) == 0L && r2.getLong(2) == 0L)
  }
}
