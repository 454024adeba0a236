package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *   path/buckets/  (bucket LONG, id LONG)  — (table<<bits)|signature keys
  *   path/vectors/  (id LONG, v ARRAY<DOUBLE>, n2 DOUBLE)
  * }}}
  *
  * SCALE SHAPE: `buckets/` holds tables_n rows per vector and `vectors/`
  * one row per vector. Per screen, the batch's keys are computed in one
  * typed pass and BROADCAST against `buckets/` — the index never
  * shuffles. The exact-cosine verify joins only candidate ids against
  * `vectors/` (broadcast semi-join shape) and evaluates the codegen'd
  * [[graft.expr.DotProduct]] once per candidate pair — same sequential
  * fold as the in-memory verify loop, so cosines are bit-identical.
  * Over-cap buckets are dropped by an exact per-bucket count over the
  * joined rows (stays exact across appends); [[skippedBuckets]] is the
  * programmatic diagnostic. */
object VecIndex {

  private val Version = 1

  private def cfgOf(spark: SparkSession, path: String): (Int, Int, Int) = {
    val row = spark.read.parquet(s"$path/config").head()
    require(row.getAs[Int]("version") == Version,
      s"VecIndex at $path has version ${row.getAs[Int]("version")}; " +
        s"this build reads version $Version")
    (row.getAs[Int]("dim"), row.getAs[Int]("bits"),
      row.getAs[Int]("tables_n"))
  }

  /** One typed pass over `df`: (id, bucket keys over all tables, double
    * vector, squared norm) under the given config — the same signature
    * derivation as [[Dedup.embeddingDedupAgainst]] (seeded hyperplanes,
    * table index folded above the signature bits). Null id/vector rows
    * are dropped (same policy as the in-memory screen). */
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
        it.map { case (id, v) =>
          var n2 = 0.0
          var i = 0
          while (i < v.length) { n2 += v(i) * v(i); i += 1 }
          val keys = new Array[Long](tabs.length)
          var t = 0
          while (t < tabs.length) {
            val ps = tabs(t)
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
            keys(t) = (t.toLong << sigBits) | bucket
            t += 1
          }
          (id, keys, v, n2)
        }
      }
      .toDF("id", "buckets", "v", "n2")
  }

  /** Build the index at `path` from the standing corpus. `bits = 0` (the
    * default) resolves the signature width adaptively from the corpus
    * count via [[Dedup.lshBitsFor]] and PINS it in the stored config.
    * Fails if `path` already holds an index (use [[append]] to grow one,
    * or `overwrite = true` to rebuild). One corpus scan shared by both
    * tables via an in-plan persist, released before returning. */
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
      val sigs = signatures(clean, idCol, vecCol, dim, sigBits, tables)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        sigs.select(explode(col("buckets")).as("bucket"), col("id"))
          .write.mode(mode).parquet(s"$path/buckets")
        sigs.select(col("id"), col("v"), col("n2"))
          .write.mode(mode).parquet(s"$path/vectors")
        import spark.implicits._
        Seq((dim, sigBits, tables, Version))
          .toDF("dim", "bits", "tables_n", "version")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
      } finally sigs.unpersist(blocking = false)
    } finally clean.unpersist(blocking = false)
  }

  /** Append a batch of NEW vectors to an existing index under its stored
    * config (including the pinned signature width — appending never
    * re-widens). Ids must be unique across index ∪ batch. The intended
    * loop is screen-then-append: [[newRows]] survivors are exactly the
    * rows safe to add. Appends are atomic per table only — rebuild after
    * a failed append rather than retrying it. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             path: String): Unit = {
    val (dim, bits, tables) = cfgOf(batch.sparkSession, path)
    val sigs = signatures(batch, idCol, vecCol, dim, bits, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.select(explode(col("buckets")).as("bucket"), col("id"))
        .write.mode("append").parquet(s"$path/buckets")
      sigs.select(col("id"), col("v"), col("n2"))
        .write.mode("append").parquet(s"$path/vectors")
    } finally sigs.unpersist(blocking = false)
  }

  /** Candidate pairs (id_a = batch id, id_b = indexed corpus id) sharing
    * a bucket in ANY table, from the files alone. Buckets above
    * `maxBucket` INDEX rows are dropped by an exact windowed count over
    * the joined rows (recall loss on degenerate near-identical mass only
    * — same policy as the in-memory screen's cap). */
  def candidates(batch: DataFrame, idCol: String, vecCol: String,
                 path: String, maxBucket: Int = 1 << 20): DataFrame =
    joined(batch, idCol, vecCol, path)
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy("bucket", "id_a")))
      .filter(col("__bsz") <= maxBucket)
      .select(col("id_a"), col("id").as("id_b")).distinct()

  /** Distinct bucket keys a screen of `batch` would SKIP at `maxBucket` —
    * exact (a plain aggregation, unlike the in-memory accumulator).
    * Empty result ⇒ the screen dropped nothing. */
  def skippedBuckets(batch: DataFrame, idCol: String, vecCol: String,
                     path: String, maxBucket: Int = 1 << 20): DataFrame =
    joined(batch, idCol, vecCol, path)
      .groupBy("bucket", "id_a").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select("bucket").distinct()

  /** batch bucket keys (broadcast) ⋈ index buckets — one row per
    * (index row in bucket × batch vector hitting that bucket). */
  private def joined(batch: DataFrame, idCol: String, vecCol: String,
                     path: String): DataFrame = {
    val spark = batch.sparkSession
    val (dim, bits, tables) = cfgOf(spark, path)
    val bb = signatures(batch, idCol, vecCol, dim, bits, tables)
      .select(explode(col("buckets")).as("bucket"), col("id").as("id_a"))
    spark.read.parquet(s"$path/buckets")
      .join(broadcast(bb), "bucket")
  }

  /** Batch vectors within `threshold` cosine of an indexed vector,
    * exact-verified against the STORED vectors (no corpus re-read beyond
    * the candidate ids): returns (batch_id, corpus_id, cos), the same
    * shape as [[Dedup.embeddingDedupAgainst]]. No false positives; recall
    * follows the multi-table S-curve of the stored (bits, tables). */
  def dedupAgainst(batch: DataFrame, idCol: String, vecCol: String,
                   path: String, threshold: Double = 0.95,
                   maxBucket: Int = 1 << 20): DataFrame = {
    val spark = batch.sparkSession
    val (dim, bits, tables) = cfgOf(spark, path)
    val cands = candidates(batch, idCol, vecCol, path, maxBucket)
    val batchV = signatures(batch, idCol, vecCol, dim, bits, tables)
      .select(col("id").as("id_a"), col("v").as("__va"),
        col("n2").as("__na"))
    val corpusV = spark.read.parquet(s"$path/vectors")
      .select(col("id").as("id_b"), col("v").as("__vb"),
        col("n2").as("__nb"))
    // candidates are small next to vectors/ — broadcast them through the
    // corpus-side join so the big table never shuffles; the cosine is the
    // codegen'd sequential dot, bit-identical to the in-memory verify
    corpusV.join(broadcast(cands), "id_b")
      .join(broadcast(batchV), "id_a")
      .withColumn("cos",
        Dedup.cosinePre(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a").as("batch_id"), col("id_b").as("corpus_id"),
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
