package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED distributed minhash index — the standing-corpus half of the
  * incremental text near-dup screen, amortized across ingestion runs.
  *
  * [[Dedup.minhashDedupAgainst]] re-shingles the WHOLE standing corpus on
  * every batch: correct, but at 100 TB the corpus scan dwarfs the batch
  * work, and it is identical run to run. [[Dedup.buildTextScreenIndex]]
  * amortizes it but collects to the driver (≈2M-doc ceiling — it exists
  * for the streaming screen's stateless broadcast filter). This module is
  * the third point of the design space: the corpus's banded signatures and
  * per-doc sorted shingle-hash sets are written ONCE to parquet, and every
  * future batch screens against the files — no corpus re-scan, no driver
  * ceiling, one broadcast join per screen. New clean batches [[append]]
  * without rebuilding, so a crawl-ingest loop pays O(batch) per cycle.
  *
  * Layout under `path` (self-describing — screens read their banding
  * config from the files, so a caller can't accidentally band the batch
  * side differently from the index):
  * {{{
  *   path/config/  one row: shingle_size, num_hashes, bands_n, version
  *   path/bands/   (band LONG, id LONG)          — banded LSH keys
  *   path/hashes/  (id LONG, hs ARRAY<LONG>)     — sorted distinct shingle hashes
  * }}}
  *
  * Signature derivation is byte-identical to [[Dedup.minhashCandidates]]
  * (same seeded affine mixers, same band-key fold), so with no over-cap
  * buckets the candidate set equals [[Dedup.minhashCandidatesAgainst]]'s
  * on the same corpus — TextIndexSpec pins that parity.
  *
  * SCALE SHAPE: `bands/` holds bands_n rows per doc (21 defaults) and
  * `hashes/` one array per doc (~8 B × distinct shingles). Per screen, the
  * batch's band keys are computed in one pass and BROADCAST against
  * `bands/` — the index never shuffles; join output is Σ (bucket size ×
  * batch hits in bucket), linear in index size in the worst case and tiny
  * in the common one. The verify joins only candidate ids against
  * `hashes/` (broadcast semi-join shape). Over-cap buckets (degenerate
  * boilerplate bands) are dropped by an exact per-bucket count — same
  * policy as [[Dedup.minhashCandidatesAgainst]], but computed from the
  * joined rows, so it stays exact after any number of appends. */
object TextIndex {

  private val Version = 1

  private def cfgOf(spark: SparkSession, path: String): (Int, Int, Int) = {
    val row = spark.read.parquet(s"$path/config").head()
    require(row.getAs[Int]("version") == Version,
      s"TextIndex at $path has version ${row.getAs[Int]("version")}; " +
        s"this build reads version $Version")
    (row.getAs[Int]("shingle_size"), row.getAs[Int]("num_hashes"),
      row.getAs[Int]("bands_n"))
  }

  /** One pass over `df`: (id, band keys, sorted distinct shingle hashes)
    * under the given banding config. Null id/text rows are dropped (they
    * cannot shingle — same policy as the non-indexed screen). */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int, numHashes: Int,
                         bands: Int): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "TextIndex")
    val spark = df.sparkSession
    import spark.implicits._
    val (ma, mb) = Dedup.mixers(numHashes)
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (keys, hs) = Dedup.bandsAndHashes(text, shingleSize, numHashes,
          bands, ma, mb)
        (id, keys, hs)
      }
      .toDF("id", "bands", "hs")
  }

  /** Build the index at `path` from the standing corpus. Fails if `path`
    * already holds an index (use [[append]] to grow one, or pass
    * `overwrite = true` to rebuild). One corpus scan, one write — the scan
    * is shared by both tables via an in-plan persist that is released
    * before returning. */
  def write(corpus: DataFrame, idCol: String, textCol: String, path: String,
            shingleSize: Int = 3, numHashes: Int = 63, bands: Int = 21,
            overwrite: Boolean = false): Unit = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spark = corpus.sparkSession
    val mode = if (overwrite) "overwrite" else "error"
    val sigs = signatures(corpus, idCol, textCol, shingleSize, numHashes,
        bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.select(explode(col("bands")).as("band"), col("id"))
        .write.mode(mode).parquet(s"$path/bands")
      sigs.select(col("id"), col("hs"))
        .write.mode(mode).parquet(s"$path/hashes")
      import spark.implicits._
      Seq((shingleSize, numHashes, bands, Version))
        .toDF("shingle_size", "num_hashes", "bands_n", "version")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
    } finally sigs.unpersist(blocking = false)
  }

  /** Append a batch of NEW documents to an existing index under its stored
    * banding config. Ids must be unique across the index ∪ batch (same
    * contract as [[Dedup.minhashDedupAgainst]] — a duplicated id corrupts
    * that doc's jaccard in later screens, silently). The intended loop is
    * screen-then-append: `newRows` survivors are exactly the batch rows
    * safe to add. Appends are atomic per table only — rerun a failed
    * append from scratch (rebuild) rather than retrying it. */
  def append(batch: DataFrame, idCol: String, textCol: String,
             path: String): Unit = {
    val (shingleSize, numHashes, bands) = cfgOf(batch.sparkSession, path)
    val sigs = signatures(batch, idCol, textCol, shingleSize, numHashes,
        bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.select(explode(col("bands")).as("band"), col("id"))
        .write.mode("append").parquet(s"$path/bands")
      sigs.select(col("id"), col("hs"))
        .write.mode("append").parquet(s"$path/hashes")
    } finally sigs.unpersist(blocking = false)
  }

  /** Candidate pairs (id_a = batch id, id_b = indexed corpus id) whose
    * band signatures collide, from the files alone — the persisted face of
    * [[Dedup.minhashCandidatesAgainst]]. The batch side is computed in one
    * pass and broadcast; buckets above `maxBucket` INDEX rows are dropped
    * by an exact windowed count over the joined rows (recall loss on
    * boilerplate bands only — same policy and rationale as the
    * non-indexed screen; see [[skippedBuckets]] for the diagnostic). */
  def candidates(batch: DataFrame, idCol: String, textCol: String,
                 path: String, maxBucket: Int = 1 << 20): DataFrame =
    joined(batch, idCol, textCol, path)
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy("band", "id_a")))
      .filter(col("__bsz") <= maxBucket)
      .select(col("id_a"), col("id").as("id_b")).distinct()

  /** Distinct band keys a screen of `batch` would SKIP at `maxBucket` —
    * the programmatic form of the non-indexed screen's skipped-bucket
    * accumulator (exact here: it is a plain aggregation, not an
    * accumulator). Empty result ⇒ the screen dropped nothing. */
  def skippedBuckets(batch: DataFrame, idCol: String, textCol: String,
                     path: String, maxBucket: Int = 1 << 20): DataFrame =
    joined(batch, idCol, textCol, path)
      .groupBy("band", "id_a").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select("band").distinct()

  /** batch band keys (broadcast) ⋈ index bands — one row per
    * (index row in bucket × batch doc hitting that bucket). */
  private def joined(batch: DataFrame, idCol: String, textCol: String,
                     path: String): DataFrame = {
    val spark = batch.sparkSession
    val (shingleSize, numHashes, bands) = cfgOf(spark, path)
    val bb = signatures(batch, idCol, textCol, shingleSize, numHashes, bands)
      .select(explode(col("bands")).as("band"), col("id").as("id_a"))
    spark.read.parquet(s"$path/bands")
      .join(broadcast(bb), "band")
  }

  /** Batch docs near-duplicating an indexed doc, exact-verified: candidate
    * pairs whose TRUE n-gram Jaccard (sorted-set intersection over the
    * stored 64-bit shingle hashes — no corpus text access) reaches
    * `threshold`. Returns (id_a = batch id, id_b = corpus id, jaccard);
    * like the whole minhash tier, NO false positives modulo ~1e-8 hash
    * collisions, recall = the banding S-curve. */
  def dedupAgainst(batch: DataFrame, idCol: String, textCol: String,
                   path: String, threshold: Double = 0.7,
                   maxBucket: Int = 1 << 20): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val (shingleSize, numHashes, bands) = cfgOf(spark, path)
    val cands = candidates(batch, idCol, textCol, path, maxBucket)
    val batchHs = signatures(batch, idCol, textCol, shingleSize, numHashes,
        bands)
      .select(col("id").as("id_a"), col("hs").as("__hs_a"))
    val corpusHs = spark.read.parquet(s"$path/hashes")
      .select(col("id").as("id_b"), col("hs").as("__hs_b"))
    val jac = udf { (a: Seq[Long], b: Seq[Long]) =>
      // both sides sorted distinct by construction
      var i = 0; var j = 0; var common = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      val union = a.length + b.length - common
      if (union == 0) 1.0 else common.toDouble / union
    }
    // candidates are small next to hashes/ — broadcast them through the
    // corpus-side join so the big table never shuffles
    corpusHs.join(broadcast(cands), "id_b")
      .join(broadcast(batchHs), "id_a")
      .withColumn("jaccard", jac(col("__hs_a"), col("__hs_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** STREAMING near-dup match stream against the persisted index: for a
    * streaming `stream` (readStream source), emits (id_a = stream id,
    * id_b = indexed corpus id, jaccard) for every stream row whose TRUE
    * n-gram jaccard with an indexed doc reaches `threshold`.
    *
    * This is the third streaming-screen tier: [[Dedup.textScreenStream]]
    * broadcasts a driver-collected index (fast stateless filter, ~2M-doc
    * ceiling); this one is two STREAM-STATIC inner joins (bands, then
    * hashes) against the parquet index — no driver ceiling, no state
    * store, no watermark. The static side's FILE LISTING is captured
    * when this screen is BUILT (InMemoryFileIndex lists once), so
    * [[append]]s land on the next (re)build — e.g. a checkpointed
    * restart, which replays no old rows and sees the grown index
    * (RocksDbStateSpec pins exactly that) — not mid-query.
    *
    * Delivery contract: a pair colliding in k bands is emitted k times
    * (deduplicating inside the stream would need a stateful distinct;
    * at-least-once per shared band is the stateless trade). Run the
    * sink-side `dropDuplicates` in `foreachBatch` — or use the batch
    * [[dedupAgainst]] there instead — when exactly-once pairs matter.
    * Unlike the batch screen there is no over-cap bucket drop (the
    * per-bucket count is an aggregation); screen a corpus with
    * degenerate boilerplate bands through [[Dedup.exact]] first. */
  def matchesStream(stream: DataFrame, idCol: String, textCol: String,
                    path: String, threshold: Double = 0.7): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val (shingleSize, numHashes, bands) = cfgOf(spark, path)
    val (ma, mb) = Dedup.mixers(numHashes)
    val sigs = stream.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val (keys, hs) = Dedup.bandsAndHashes(text, shingleSize,
            numHashes, bands, ma, mb)
          keys.iterator.map(k => (k, id, hs))
        }
      }
      .toDF("band", "id_a", "__hs_a")
    val jac = udf { (a: Seq[Long], b: Seq[Long]) =>
      var i = 0; var j = 0; var common = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      val union = a.length + b.length - common
      if (union == 0) 1.0 else common.toDouble / union
    }
    sigs
      .join(spark.read.parquet(s"$path/bands"), "band")
      .join(spark.read.parquet(s"$path/hashes")
        .select(col("id"), col("hs").as("__hs_b")), "id")
      .withColumn("jaccard", jac(col("__hs_a"), col("__hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id").as("id_b"), col("jaccard"))
  }

  /** Batch rows with NO near-dup in the indexed corpus — the ingestion
    * filter ([[Dedup.textNewRows]] against files). Survivors are exactly
    * the rows safe to [[append]]. */
  def newRows(batch: DataFrame, idCol: String, textCol: String,
              path: String, threshold: Double = 0.7,
              maxBucket: Int = 1 << 20): DataFrame = {
    val flagged = dedupAgainst(batch, idCol, textCol, path, threshold,
        maxBucket)
      .select(col("id_a").as("__dup_id")).distinct()
    batch.join(broadcast(flagged), col(idCol) === col("__dup_id"),
      "left_anti")
  }
}
