package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("chunkedPack lays out the token stream in id order") {
    import spark.implicits._
    val df = Seq((1L, 40L), (2L, 80L), (3L, 0L), (4L, 100L), (5L, 10L))
      .toDF("doc_id", "n")
    val r = Packing.chunkedPack(df, "doc_id", "n", budget = 100)
      .orderBy("doc_id").collect()
    // stream: doc1 [0,40) bin 0; doc2 [40,120) bins 0-1; doc3 [120,120) bin 1;
    // doc4 [120,220) bins 1-2; doc5 [220,230) bin 2
    assert(r.map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4))).toSeq ==
      Seq((1L, 0L, 0L, 0L), (2L, 40L, 0L, 1L), (3L, 120L, 1L, 1L),
          (4L, 120L, 1L, 2L), (5L, 220L, 2L, 2L)))
  }

  test("chunkedPack matches a sequential prefix sum on 1000 rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0L until 1000L).map(i => (i, rnd.nextInt(300).toLong))
    val r = Packing.chunkedPack(data.toDF("doc_id", "n"), "doc_id", "n", 512)
      .orderBy("doc_id").collect()
    var acc = 0L
    data.zipWithIndex.foreach { case ((id, n), i) =>
      assert(r(i).getLong(0) == id)
      assert(r(i).getLong(2) == acc, s"start of doc $id")
      assert(r(i).getLong(3) == acc / 512)
      assert(r(i).getLong(4) == (acc + math.max(n, 1) - 1) / 512)
      acc += n
    }
  }

  test("packGreedy: no bin over budget, all docs kept, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (0L until 500L).map(i => (i, (rnd.nextInt(400) + 1).toLong))
    val df = data.toDF("doc_id", "n")
    val packed = Packing.packGreedy(df, "doc_id", "n", budget = 1024).cache()
    val bins = packed.groupBy("bin").agg(sum("tokens").as("s"))
    assert(bins.filter(col("s") > 1024).count() == 0)
    assert(packed.count() == 500)
    assert(packed.select("doc_id").distinct().count() == 500)
    // determinism: identical assignment on a rerun
    val again = Packing.packGreedy(df, "doc_id", "n", budget = 1024)
    assert(packed.as[(Long, Long, Long)].collect().sorted.toSeq ==
      again.as[(Long, Long, Long)].collect().sorted.toSeq)
    // utilization sanity: wasted space bounded (docs ≤ 400 on 1024 budget)
    val s = Packing.packingSummary(packed, 1024).head()
    assert(s.getAs[Long]("n_overfull") == 0L)
    assert(s.getAs[Double]("utilization") > 0.5)
    packed.unpersist()
  }

  test("packGreedy: oversize docs pack alone and are counted overfull") {
    import spark.implicits._
    val df = Seq((1L, 2000L), (2L, 10L), (3L, 10L)).toDF("doc_id", "n")
    val packed = Packing.packGreedy(df, "doc_id", "n", budget = 100)
    val big = packed.filter(col("doc_id") === 1).head().getLong(2)
    // the oversize doc shares its bin with nobody
    assert(packed.filter(col("bin") === big).count() == 1)
    val s = Packing.packingSummary(packed, 100).head()
    assert(s.getAs[Long]("n_overfull") == 1L)
    assert(s.getAs[Long]("n_docs") == 3L)
    assert(s.getAs[Long]("total_tokens") == 2020L)
  }

  test("chunkSplit: overlap carry, right-aligned tail, full coverage, short docs intact") {
    import spark.implicits._
    // 10 tokens, window 4, overlap 1 (stride 3): m = 1 + ceil(6/3) = 3,
    // starts 0, 3, 6 (tail right-aligns to n-window = 6, here == 2*stride)
    val docs = Seq(
      (0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (1L, "a b c"),                       // n <= window: single chunk
      (2L, "x0 x1 x2 x3 x4 x5 x6 x7")      // n=8: starts 0, 3, 4 (tail aligns)
    ).toDF("doc_id", "text")
    val r = Packing.chunkSplit(docs, "doc_id", "text", window = 4, overlap = 1)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("chunk_id")) ->
        (x.getAs[Int]("start_token"), x.getAs[Int]("n_tokens"), x.getAs[String]("chunk"))).toMap
    assert(r((0L, 0)) == ((0, 4, "t0 t1 t2 t3")))
    assert(r((0L, 1)) == ((3, 4, "t3 t4 t5 t6"))) // first token repeats the previous chunk's last
    assert(r((0L, 2)) == ((6, 4, "t6 t7 t8 t9")))
    assert(r((1L, 0)) == ((0, 3, "a b c")))
    assert(r((2L, 2)) == ((4, 4, "x4 x5 x6 x7"))) // right-aligned, deeper overlap
    // coverage: every token index of doc 0 falls in some chunk
    val covered = r.keys.filter(_._1 == 0L).map(r).flatMap {
      case (s, w, _) => s until s + w }.toSet
    assert(covered == (0 until 10).toSet)
    intercept[IllegalArgumentException](
      Packing.chunkSplit(docs, "doc_id", "text", window = 4, overlap = 4))
    intercept[IllegalArgumentException](
      Packing.chunkSplit(docs, "doc_id", "text", window = 0, overlap = 0))
  }

  test("writeShards: partitioned layout, manifest matches files, round-trip intact") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"doc $i", i * 10)).toDF("doc_id", "text", "n_toks")
    val path = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    val manifest = graft.pipeline.Packing.writeShards(docs, "doc_id", "n_toks",
      path, shardTokens = 2000)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // total mass conserved: 10 * 50*51/2 = 12750 tokens, 50 docs
    assert(manifest.values.map(_._1).sum == 50L)
    assert(manifest.values.map(_._2).sum == 12750L)
    // shard directories exist and each file's rows match its manifest row
    val back = spark.read.parquet(path)
    assert(back.count() == 50L)
    // partition-column inference reads shard= dirs back as INT — cast
    val perDir = back.groupBy(col("shard").cast("long").as("shard"))
      .count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDir == manifest.map { case (k, v) => k -> v._1 })
    // persisted manifest agrees with the returned one
    val stored = spark.read.parquet(s"$path/_graft_manifest")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stored == manifest)
    // no-split invariant: every doc whole, ids unique
    assert(back.select("doc_id").distinct().count() == 50L)
  }
}
