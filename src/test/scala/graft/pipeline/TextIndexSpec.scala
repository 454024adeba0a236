package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted minhash index: files-vs-memory parity, append equivalence,
  * cap policy, config self-description. */
class TextIndexSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-textindex").toString

  test("indexed screen ≡ minhashDedupAgainst on the same corpus/config") {
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val path = tmp()
    TextIndex.write(corpus, "doc_id", "text", path)
    val indexed = TextIndex.dedupAgainst(batch, "doc_id", "text", path,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    val direct = Dedup.minhashDedupAgainst(batch, corpus, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(indexed.nonEmpty)
    assert(indexed == direct)
  }

  test("newRows through the index ≡ textNewRows, and survivors append") {
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val path = tmp()
    TextIndex.write(corpus, "doc_id", "text", path)
    val viaIndex = TextIndex.newRows(batch, "doc_id", "text", path,
        threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = Dedup.textNewRows(batch, corpus, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == direct)
    // the screen-then-append loop: survivors enter the index, and a
    // re-screen of the SAME batch now reports every survivor as a dup of
    // itself (jaccard 1.0 self-pair) — nothing passes twice
    val survivors = batch.join(
      broadcast(spark.createDataset(viaIndex.toSeq)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("__k")),
      col("doc_id") === col("__k")).drop("__k")
    TextIndex.append(survivors, "doc_id", "text", path)
    val second = TextIndex.newRows(batch, "doc_id", "text", path,
        threshold = 0.5)
      .count()
    assert(second == 0L)
  }

  test("append(a) then append(b) ≡ write(a ∪ b): same screen result") {
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val a = corpus.filter(col("doc_id") % 2 === 0)
    val b = corpus.filter(col("doc_id") % 2 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val p1 = tmp(); val p2 = tmp()
    TextIndex.write(a, "doc_id", "text", p1)
    TextIndex.append(b, "doc_id", "text", p1)
    TextIndex.write(corpus, "doc_id", "text", p2)
    def hits(p: String) = TextIndex.dedupAgainst(batch, "doc_id", "text", p,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits(p1) == hits(p2))
  }

  test("over-cap buckets are skipped exactly and reported") {
    import spark.implicits._
    // 40 identical corpus docs: every band bucket has 40 rows
    val corpus = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("id", "text")
    val batch = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("id", "text")
    val path = tmp()
    TextIndex.write(corpus, "id", "text", path)
    // cap below the bucket size: everything skipped, nothing found
    assert(TextIndex.candidates(batch, "id", "text", path,
      maxBucket = 10).count() == 0L)
    assert(TextIndex.skippedBuckets(batch, "id", "text", path,
      maxBucket = 10).count() > 0L)
    // cap above: all 40 candidates, no skips
    assert(TextIndex.candidates(batch, "id", "text", path,
      maxBucket = 100).count() == 40L)
    assert(TextIndex.skippedBuckets(batch, "id", "text", path,
      maxBucket = 100).count() == 0L)
  }

  test("matchesStream over file source ≡ batch screen (distinct pairs)") {
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val path = tmp()
    TextIndex.write(corpus, "doc_id", "text", path)
    // stage the batch as a file-source stream, one file per trigger
    val staged = java.nio.file.Files.createTempDirectory("graft-tis-stream")
    batch.select("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream
      .schema(batch.select("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val q = TextIndex.matchesStream(stream, "doc_id", "text", path,
        threshold = 0.5)
      .writeStream.format("memory").queryName("tis_matches")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // at-least-once per shared band -> compare DISTINCT pairs
    val streamed = spark.table("tis_matches")
      .select("id_a", "id_b", "jaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    val direct = TextIndex.dedupAgainst(batch, "doc_id", "text", path,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == direct)
  }

  test("index is self-describing: screen uses stored banding config") {
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val path = tmp()
    // non-default banding at write time; the screen takes no banding args
    TextIndex.write(corpus, "doc_id", "text", path, shingleSize = 2,
      numHashes = 40, bands = 10)
    val indexed = TextIndex.dedupAgainst(batch, "doc_id", "text", path,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.minhashDedupAgainst(batch, corpus, "doc_id", "text",
        shingleSize = 2, numHashes = 40, bands = 10, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed == direct)
    // write refuses to clobber an existing index unless told to
    intercept[Exception] {
      TextIndex.write(corpus, "doc_id", "text", path)
    }
    TextIndex.write(corpus, "doc_id", "text", path, overwrite = true)
  }
}
