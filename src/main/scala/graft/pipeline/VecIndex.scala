package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED hyperplane-LSH embedding index — the semantic companion of
  * [[TextIndex]], and the files-based face of
  * [[Dedup.embeddingDedupAgainst]].
  *
  * [[Dedup.embeddingDedupAgainst]] re-buckets the WHOLE standing corpus on
  * every batch: at 100 TB the corpus pass dominates and is identical run
  * to run. Here the corpus's bucket assignments, vectors, and squared
  * norms are written ONCE to parquet; every future batch computes only
  * its own signatures and screens against the files. New clean batches
  * [[append]] without a rebuild, so a crawl-ingest loop pays O(batch) per
  * cycle.
  *
  * The write-time config ALSO pins the adaptive signature width: `bits=0`
  * resolves via [[Dedup.lshBitsFor]] against the corpus count once, and
  * the resolved width is STORED — screens and appends band at exactly the
  * index's width regardless of how the corpus has grown since, restoring
  * the cross-run reproducibility that the in-memory adaptive default
  * gives up (its width floats with every batch's corpus count).
  *
  * Layout under `path` (self-describing — the hyperplanes are
  * deterministic functions of (table, bit, index), seeded in
  * [[Dedup.hyperplanes]], so no model object is stored):
  * {{{
  *   path/config/   one row: dim, bits, tables_n, version
  *   path/buckets/  (bucket LONG, id LONG, v ARRAY<DOUBLE>, n2 DOUBLE)
  * }}}
  * Vectors are DENORMALIZED into the bucket rows (tables_n copies per
  * vector — the FAISS-style multi-index trade: disk is the cheap resource
  * for an index) so a screen is ONE streaming join with no row ever
  * visited twice.
  *
  * SCALE SHAPE: a screen is a single BroadcastHashJoin — the index scan
  * streams map-side (never shuffles, never materializes a bucket), the
  * batch's exploded signatures broadcast (batch ≪ corpus is the
  * incremental-screen contract), and the exact cosine is the codegen'd
  * [[graft.expr.DotProduct]] evaluated inside the same whole-stage-codegen
  * span as the join, with the same sequential fold as the in-memory
  * verify loop — cosines are bit-identical, no false positives. Only the
  * surviving pairs reach the final distinct (multi-table dedup). An
  * earlier shape (windowed per-bucket counts → materialized candidate
  * pairs → re-join vectors) shuffled the full bucket-join output and was
  * 20× slower than the in-memory screen on a dup-heavy 10× corpus; this
  * one measures ~in-memory speed per screen while skipping the corpus
  * re-bucketing entirely. Over-cap buckets (degenerate near-identical
  * mass) are excluded by an exact per-bucket count computed from the
  * `bucket` column alone — a column-pruned aggregate over longs with
  * map-side combine, bounded by 2^bits·tables_n distinct keys — and stay
  * exact across appends. */
object VecIndex {

  private val Version = 1

  private[pipeline] def cfgOf(spark: SparkSession, path: String): (Int, Int, Int) = {
    val row = spark.read.parquet(s"$path/config").head()
    require(row.getAs[Int]("version") == Version,
      s"VecIndex at $path has version ${row.getAs[Int]("version")}; " +
        s"this build reads version $Version")
    (row.getAs[Int]("dim"), row.getAs[Int]("bits"),
      row.getAs[Int]("tables_n"))
  }

  /** One typed pass over `df`: a (bucket key, id, double vector, squared
    * norm) row per table — the same signature derivation as
    * [[Dedup.embeddingDedupAgainst]] (seeded hyperplanes, table index
    * folded above the signature bits). Null id/vector rows are dropped
    * (same policy as the in-memory screen). */
  private def signatures(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, bits: Int, tables: Int): DataFrame = {
    Similarity.requireIntegralId(df, idCol, "VecIndex")
    val spark = df.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(
      Array.tabulate(tables)(t => Dedup.hyperplanes(bits, dim, t)))
    val sigBits = bits
    df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), _.cast("double")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val tabs = planes.value
        it.flatMap { case (id, v) =>
          var n2 = 0.0
          var i = 0
          while (i < v.length) { n2 += v(i) * v(i); i += 1 }
          val norm = n2
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
            ((t.toLong << sigBits) | bucket, id, v, norm)
          }
        }
      }
      .toDF("bucket", "id", "v", "n2")
  }

  /** Build the index at `path` from the standing corpus. `bits = 0` (the
    * default) resolves the signature width adaptively from the corpus
    * count via [[Dedup.lshBitsFor]] and PINS it in the stored config.
    * Fails if `path` already holds an index (use [[append]] to grow one,
    * or `overwrite = true` to rebuild). */
  def write(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
            path: String, bits: Int = 0, tables: Int = 1,
            overwrite: Boolean = false): Unit = {
    require(bits >= 0 && bits <= 32, s"bits out of range: $bits")
    require(tables >= 1, s"tables must be >= 1, got $tables")
    val spark = corpus.sparkSession
    val clean = corpus.na.drop(Seq(idCol, vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sigBits = if (bits == 0) Dedup.lshBitsFor(clean.count()) else bits
      val tableBits = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1, tables - 1).toLong)
      require(sigBits + tableBits <= 63,
        s"table index + signature must fit a long key " +
          s"(bits=$sigBits tables=$tables)")
      val mode = if (overwrite) "overwrite" else "error"
      storable(signatures(clean, idCol, vecCol, dim, sigBits, tables),
          clean, vecCol)
        .write.mode(mode).parquet(s"$path/buckets")
      import spark.implicits._
      Seq((dim, sigBits, tables, Version))
        .toDF("dim", "bits", "tables_n", "version")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
    } finally clean.unpersist(blocking = false)
  }

  /** Append a batch of NEW vectors to an existing index under its stored
    * config (including the pinned signature width — appending never
    * re-widens). Ids must be unique across index ∪ batch. The intended
    * loop is screen-then-append: [[newRows]] survivors are exactly the
    * rows safe to add. Rebuild after a failed append rather than
    * retrying it. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             path: String): Unit = {
    val (dim, bits, tables) = cfgOf(batch.sparkSession, path)
    storable(signatures(batch, idCol, vecCol, dim, bits, tables),
        batch, vecCol)
      .write.mode("append").parquet(s"$path/buckets")
  }

  /** Stored element type follows the SOURCE column: float sources store
    * ARRAY<FLOAT> — float→double→float round-trips losslessly and
    * double-cast on read reproduces the screen's doubles bit-for-bit, at
    * half the scan bytes (the index scan is the per-screen cost, so this
    * matters tables_n× per vector). Anything else stays ARRAY<DOUBLE>.
    * The verify path casts whatever it reads back to double
    * ([[Dedup.cosinePre]] via DotProduct), so both layouts screen
    * identically. */
  private def storable(sigs: DataFrame, src: DataFrame,
                       vecCol: String): DataFrame =
    src.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
        sigs.withColumn("v", col("v").cast("array<float>"))
      case _ => sigs
    }

  /** Batch-side exploded signatures with over-cap buckets removed — the
    * broadcast side of every screen. The over-cap set is computed from
    * the index's `bucket` column alone (column-pruned scan, map-side
    * combined, ≤ 2^bits·tables_n keys) and is broadcast-anti-joined
    * here, so the screen's main join never sees a capped bucket. */
  private def batchSide(batch: DataFrame, idCol: String, vecCol: String,
                        path: String, maxBucket: Int): DataFrame = {
    val spark = batch.sparkSession
    val (dim, bits, tables) = cfgOf(spark, path)
    val bb = signatures(batch, idCol, vecCol, dim, bits, tables)
      .select(col("bucket"), col("id").as("id_a"),
        col("v").as("__va"), col("n2").as("__na"))
    if (maxBucket == Int.MaxValue) bb
    else bb.join(broadcast(overCap(spark, path, maxBucket)), Seq("bucket"),
      "left_anti")
  }

  private def overCap(spark: SparkSession, path: String,
                      maxBucket: Int): DataFrame =
    spark.read.parquet(s"$path/buckets").select("bucket")
      .groupBy("bucket").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select("bucket")

  /** Candidate pairs (id_a = batch id, id_b = indexed corpus id) sharing
    * a bucket in ANY table, from the files alone. Buckets above
    * `maxBucket` INDEX rows are excluded (recall loss on degenerate
    * near-identical mass only — same policy as the in-memory screen's
    * cap; [[skippedBuckets]] is the diagnostic). */
  def candidates(batch: DataFrame, idCol: String, vecCol: String,
                 path: String, maxBucket: Int = 1 << 20): DataFrame =
    batch.sparkSession.read.parquet(s"$path/buckets")
      .select(col("bucket"), col("id"))
      .join(broadcast(batchSide(batch, idCol, vecCol, path, maxBucket)
        .select("bucket", "id_a")), "bucket")
      .select(col("id_a"), col("id").as("id_b")).distinct()

  /** Distinct bucket keys a screen of `batch` would SKIP at `maxBucket` —
    * exact (a plain aggregation, unlike the in-memory accumulator).
    * Empty result ⇒ the screen dropped nothing. */
  def skippedBuckets(batch: DataFrame, idCol: String, vecCol: String,
                     path: String, maxBucket: Int = 1 << 20): DataFrame = {
    val spark = batch.sparkSession
    val (dim, bits, tables) = cfgOf(spark, path)
    signatures(batch, idCol, vecCol, dim, bits, tables).select("bucket")
      .distinct()
      .join(broadcast(overCap(spark, path, maxBucket)), "bucket")
      .select("bucket")
  }

  /** Batch vectors within `threshold` cosine of an indexed vector,
    * exact-verified against the STORED vectors in one streaming join:
    * returns (batch_id, corpus_id, cos), the same shape as
    * [[Dedup.embeddingDedupAgainst]]. No false positives; recall follows
    * the multi-table S-curve of the stored (bits, tables). */
  def dedupAgainst(batch: DataFrame, idCol: String, vecCol: String,
                   path: String, threshold: Double = 0.95,
                   maxBucket: Int = 1 << 20): DataFrame = {
    val spark = batch.sparkSession
    val (_, _, tables) = cfgOf(spark, path)
    val pairs = spark.read.parquet(s"$path/buckets")
      .join(broadcast(batchSide(batch, idCol, vecCol, path, maxBucket)),
        "bucket")
      .withColumn("cos",
        Dedup.cosinePre(col("__va"), col("v"), col("__na"), col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id_a").as("batch_id"), col("id").as("corpus_id"),
        col("cos"))
    // a pair surviving in several tables is produced once per table; the
    // cos is bit-identical across tables so the row-level distinct works
    if (tables == 1) pairs else pairs.distinct()
  }

  /** STREAMING near-dup match stream against the persisted index: for a
    * streaming `stream`, emits (batch_id = stream id, corpus_id, cos) for
    * every stream vector within `threshold` cosine of an indexed one —
    * the semantic companion of [[TextIndex.matchesStream]]. One stateless
    * stream-static inner join (stream signatures ⋈ buckets) with the
    * codegen'd cosine filter in the same stage: no driver ceiling, no
    * state store. The static side's file listing is captured at BUILD
    * time, so [[append]]s are seen on the next (re)build — a
    * checkpointed restart resumes offsets and sees the grown index
    * (the TextIndex/SubstrIndex RocksDbStateSpec contract) — not
    * mid-query.
    *
    * Delivery contract: a pair within threshold in k tables is emitted k
    * times (a stateless stream cannot distinct; at-least-once per
    * colliding table). `dropDuplicates` sink-side in `foreachBatch` — or
    * the batch [[dedupAgainst]] there — when exactly-once pairs matter.
    * No over-cap bucket drop (that count is an aggregation); exact-dedup
    * degenerate mass out of the corpus before indexing it. */
  def matchesStream(stream: DataFrame, idCol: String, vecCol: String,
                    path: String, threshold: Double = 0.95): DataFrame = {
    val spark = stream.sparkSession
    val (dim, bits, tables) = cfgOf(spark, path)
    signatures(stream, idCol, vecCol, dim, bits, tables)
      .select(col("bucket"), col("id").as("id_a"),
        col("v").as("__va"), col("n2").as("__na"))
      .join(spark.read.parquet(s"$path/buckets"), "bucket")
      .withColumn("cos",
        Dedup.cosinePre(col("__va"), col("v"), col("__na"), col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id_a").as("batch_id"), col("id").as("corpus_id"),
        col("cos"))
  }

  /** Batch rows with NO near-dup in the indexed corpus — the semantic
    * ingestion filter ([[Dedup.nearNewRows]] against files). Survivors
    * are exactly the rows safe to [[append]]. */
  def newRows(batch: DataFrame, idCol: String, vecCol: String,
              path: String, threshold: Double = 0.95,
              maxBucket: Int = 1 << 20): DataFrame = {
    val flagged = dedupAgainst(batch, idCol, vecCol, path, threshold,
        maxBucket)
      .select(col("batch_id").as("__dup_id")).distinct()
    batch.join(broadcast(flagged), col(idCol) === col("__dup_id"),
      "left_anti")
  }
}
