package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the persisted-index amortization claim (TextIndex/VecIndex
  * scaladoc): an ingestion loop screening batch after batch pays the
  * standing-corpus scan ONCE (the index write) instead of once per batch
  * (the in-memory screens).
  *
  * Splits `sfDir` docs/embeddings 80/20 (corpus/batch), then times
  *  - the one-time index writes,
  *  - `screens`× the files-based screen (TextIndex/VecIndex.dedupAgainst),
  *  - `screens`× the in-memory screen (minhashDedupAgainst /
  *    embeddingDedupAgainst)
  * with a warm-up run before each timed group (JIT/classload — same
  * protocol as TimeQuery). Match counts are printed so a result mismatch
  * is visible next to the timing. Spark-side caching is NOT used anywhere
  * so the in-memory screens honestly pay their per-batch corpus pass.
  *
  * `batchMod` sets the corpus:batch ratio (batch = id % batchMod == 0):
  * the index's advantage is the REMOVED corpus term, so it grows with the
  * ratio — at the default 5 the corpus is only 4× the batch and the
  * in-memory corpus pass is cheap; a crawl loop's real ratio is 100-1000×.
  *
  * Usage: runMain graft.tools.IndexProbe <sfDir> [screens] [batchMod] [outBase]
  */
object IndexProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val screens = if (args.length > 1) args(1).toInt else 3
    val batchMod = if (args.length > 2) args(2).toInt else 5
    val outBase = if (args.length > 3) args(3)
      else java.nio.file.Files.createTempDirectory("graft-indexprobe")
        .toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def timedGroup(label: String, n: Int)(f: => Long): Double = {
      // the bits=0 in-memory paths .cache() their cleaned corpus and
      // Spark's CacheManager matches by plan — clear so every run
      // honestly pays its corpus pass (bits are pinned below anyway,
      // but minhash paths cache posting frames too)
      spark.catalog.clearCache()
      f // warm-up, untimed
      val times = (1 to n).map(_ => { spark.catalog.clearCache(); time(f) })
      val total = times.map(_._2).sum
      println(f"$label: ${total / n}%.2f s/screen over $n screens " +
        f"(matches=${times.head._1})")
      total / n
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dBatch = docs.filter(col("doc_id") % batchMod === 0)
    val dCorpus = docs.filter(col("doc_id") % batchMod =!= 0)
    val nC = dCorpus.count(); val nB = dBatch.count()
    println(s"text corpus=$nC batch=$nB screens=$screens")

    val tPath = s"$outBase/text"
    val (_, tWrite) = time(
      graft.pipeline.TextIndex.write(dCorpus, "doc_id", "text", tPath))
    println(f"TextIndex.write: $tWrite%.2f s (one-time)")
    val tIdx = timedGroup("TextIndex.dedupAgainst", screens)(
      graft.pipeline.TextIndex.dedupAgainst(dBatch, "doc_id", "text",
        tPath, threshold = 0.5).count())
    val tMem = timedGroup("minhashDedupAgainst  ", screens)(
      graft.pipeline.Dedup.minhashDedupAgainst(dBatch, dCorpus,
        "doc_id", "text", threshold = 0.5).count())

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val eBatch = embs.filter(col("vec_id") % batchMod === 0)
    val eCorpus = embs.filter(col("vec_id") % batchMod =!= 0)
    println(s"vec corpus=${eCorpus.count()} batch=${eBatch.count()}")

    val vPath = s"$outBase/vec"
    // pin the adaptive width both sides (identical banding, and the
    // explicit-bits in-memory path skips its corpus cache)
    val eBits = graft.pipeline.Dedup.lshBitsFor(
      eCorpus.na.drop(Seq("vec_id", "embedding")).count())
    val (_, vWrite) = time(
      graft.pipeline.VecIndex.write(eCorpus, "vec_id", "embedding",
        dim = 64, vPath, bits = eBits, tables = 4))
    println(f"VecIndex.write: $vWrite%.2f s (one-time, bits=$eBits)")
    val vIdx = timedGroup("VecIndex.dedupAgainst ", screens)(
      graft.pipeline.VecIndex.dedupAgainst(eBatch, "vec_id", "embedding",
        vPath, threshold = 0.4).count())
    val vMem = timedGroup("embeddingDedupAgainst ", screens)(
      graft.pipeline.Dedup.embeddingDedupAgainst(eBatch, eCorpus,
        "vec_id", "embedding", dim = 64, threshold = 0.4, bits = eBits,
        tables = 4).count())

    println(f"""{"text":{"write":$tWrite%.2f,"indexed":$tIdx%.2f,""" +
      f""""inmem":$tMem%.2f},"vec":{"write":$vWrite%.2f,""" +
      f""""indexed":$vIdx%.2f,"inmem":$vMem%.2f},""" +
      f""""break_even_screens":{"text":${math.ceil(tWrite /
        math.max(1e-9, tMem - tIdx)).toLong},"vec":${math.ceil(vWrite /
        math.max(1e-9, vMem - vIdx)).toLong}}}""")
    spark.stop()
  }
}
