package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted embedding index: files-vs-memory parity, append equivalence,
  * pinned adaptive width, cap policy, config self-description. */
class VecIndexSpec extends SparkSpec {

  private def embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-vecindex").toString

  test("indexed screen ≡ embeddingDedupAgainst on the same corpus/config") {
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val path = tmp()
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path,
      bits = 4, tables = 4)
    val indexed = VecIndex.dedupAgainst(batch, "vec_id", "embedding", path,
        threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    val direct = Dedup.embeddingDedupAgainst(batch, corpus, "vec_id",
        "embedding", dim = 64, threshold = 0.4, bits = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(indexed.nonEmpty)
    assert(indexed == direct)
  }

  test("newRows through the index ≡ nearNewRows, and survivors append") {
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val path = tmp()
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path,
      bits = 4, tables = 4)
    val viaIndex = VecIndex.newRows(batch, "vec_id", "embedding", path,
        threshold = 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val direct = Dedup.nearNewRows(batch, corpus, "vec_id", "embedding",
        dim = 64, threshold = 0.4, bits = 4, tables = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == direct)
    // screen-then-append loop: survivors enter the index; a re-screen of
    // the SAME batch flags every survivor as a dup of itself (cos 1.0
    // self-pair) — nothing passes twice
    val survivors = batch.join(
      broadcast(spark.createDataset(viaIndex.toSeq)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("__k")),
      col("vec_id") === col("__k")).drop("__k")
    VecIndex.append(survivors, "vec_id", "embedding", path)
    assert(VecIndex.newRows(batch, "vec_id", "embedding", path,
      threshold = 0.4).count() == 0L)
  }

  test("append(a) then append(b) ≡ write(a ∪ b): same screen result") {
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val a = corpus.filter(col("vec_id") % 2 === 0)
    val b = corpus.filter(col("vec_id") % 2 =!= 0)
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val p1 = tmp(); val p2 = tmp()
    VecIndex.write(a, "vec_id", "embedding", dim = 64, p1,
      bits = 4, tables = 4)
    VecIndex.append(b, "vec_id", "embedding", p1)
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, p2,
      bits = 4, tables = 4)
    def hits(p: String) = VecIndex.dedupAgainst(batch, "vec_id",
        "embedding", p, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits(p1) == hits(p2))
  }

  test("bits=0 resolves via lshBitsFor at write time and is PINNED") {
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val path = tmp()
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path)
    val stored = spark.read.parquet(s"$path/config").head()
    assert(stored.getAs[Int]("bits") ==
      Dedup.lshBitsFor(corpus.na.drop(Seq("vec_id", "embedding")).count()))
    // appends keep the stored width: bucket keys of appended rows stay
    // joinable with the original table's (same key space)
    val extra = embs.filter(col("vec_id") % 5 === 0)
    VecIndex.append(extra, "vec_id", "embedding", path)
    assert(spark.read.parquet(s"$path/config").head()
      .getAs[Int]("bits") == stored.getAs[Int]("bits"))
    // a vector present twice (corpus + append) collides with itself
    val self = VecIndex.dedupAgainst(
      embs.filter(col("vec_id") % 5 === 0), "vec_id", "embedding", path,
      threshold = 0.999999)
    assert(self.filter(col("batch_id") === col("corpus_id")).count() ==
      extra.count())
  }

  test("over-cap buckets are skipped exactly and reported") {
    import spark.implicits._
    // 40 identical vectors: every bucket in every table holds all 40
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val corpus = (1L to 40L).map(i => (i, v)).toDF("id", "vec")
    val batch = Seq((100L, v)).toDF("id", "vec")
    val path = tmp()
    VecIndex.write(corpus, "id", "vec", dim = 8, path, bits = 4)
    assert(VecIndex.candidates(batch, "id", "vec", path,
      maxBucket = 10).count() == 0L)
    assert(VecIndex.skippedBuckets(batch, "id", "vec", path,
      maxBucket = 10).count() > 0L)
    assert(VecIndex.candidates(batch, "id", "vec", path,
      maxBucket = 100).count() == 40L)
    assert(VecIndex.skippedBuckets(batch, "id", "vec", path,
      maxBucket = 100).count() == 0L)
  }

  test("matchesStream over file source ≡ batch screen (distinct pairs)") {
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val path = tmp()
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path,
      bits = 4, tables = 4)
    val staged = java.nio.file.Files.createTempDirectory("graft-vis-stream")
    batch.select("vec_id", "embedding").repartition(3)
      .write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream
      .schema(batch.select("vec_id", "embedding").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val q = VecIndex.matchesStream(stream, "vec_id", "embedding", path,
        threshold = 0.4)
      .writeStream.format("memory").queryName("vis_matches")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("vis_matches")
      .select("batch_id", "corpus_id", "cos").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    val direct = VecIndex.dedupAgainst(batch, "vec_id", "embedding", path,
        threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == direct)
  }

  test("index is self-describing; write refuses to clobber") {
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val path = tmp()
    // non-default config at write time; the screen takes no config args
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path,
      bits = 6, tables = 2)
    val indexed = VecIndex.dedupAgainst(batch, "vec_id", "embedding", path,
        threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.embeddingDedupAgainst(batch, corpus, "vec_id",
        "embedding", dim = 64, threshold = 0.4, bits = 6, tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed == direct)
    intercept[Exception] {
      VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path)
    }
    VecIndex.write(corpus, "vec_id", "embedding", dim = 64, path,
      overwrite = true)
  }
}
