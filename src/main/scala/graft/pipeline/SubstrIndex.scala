package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED exact-substring index — the standing-corpus half of
  * [[SubstringDedup]], completing the persisted-index tier
  * ([[TextIndex]] = minhash near-dup, [[VecIndex]] = embedding LSH,
  * this = exact repeated substrings): the corpus's rolling window
  * hashes and texts are written once; each ingest batch is screened
  * against the FILES, so the standing corpus is never recomputed,
  * rescanned for hashing, or held in memory.
  *
  * Layout under `path`:
  *  - `postings/` (h, cid, cpos): EVERY corpus window's rolling hash
  *    with its location — all occurrences, so the verify join can check
  *    true string equality and 64-bit collisions can never cost recall
  *    or precision. ~24 bytes per corpus character: the same order as a
  *    suffix array (8 bytes/char) — the storage bill of exact substring
  *    search, paid in parquet instead of sort memory.
  *  - `docs/` (cid, ctext): the corpus text, read back only to extract
  *    candidate substrings for the exact verify.
  *  - `config/` (min_len, version).
  *
  * Screen semantics: a batch window MATCHES if its exact `minLen`-char
  * string occurs anywhere in the indexed corpus (the corpus copy always
  * wins — no ownership race). Within-batch repeats are out of scope —
  * compose with [[SubstringDedup.removeRepeatedSubstrings]] on the
  * batch for those.
  *
  * Screen plan: batch windows (one rolling pass over the BATCH only)
  * hash-join the postings (batch side broadcasts, postings stream from
  * parquet); matching postings join `docs/` to extract the corpus-side
  * substring, the batch side re-joins its own text, and only TRUE
  * string equality survives. Matching-posting volume is proportional to
  * the batch-vs-corpus duplicated mass, not the corpus — a boilerplate
  * window shared by the whole corpus makes its posting list the whole
  * corpus (the usual Σdf economics); raise `minLen` before reaching for
  * caps. */
object SubstrIndex {

  private val Version = 1

  private def cfgOf(spark: SparkSession, path: String): Int = {
    val row = spark.read.parquet(s"$path/config").head()
    require(row.getAs[Int]("version") == Version,
      s"SubstrIndex at $path has version ${row.getAs[Int]("version")}; " +
        s"this build reads version $Version")
    row.getAs[Int]("min_len")
  }

  /** Build the index at `path`. Fails if `path` already holds an index
    * (use [[append]] to grow one, or `overwrite = true` to rebuild). */
  def write(corpus: DataFrame, idCol: String, textCol: String, path: String,
            minLen: Int = 60, overwrite: Boolean = false): Unit = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val spark = corpus.sparkSession
    val mode = if (overwrite) "overwrite" else "error"
    val docs = SubstringDedup.prep(corpus, idCol, textCol)
    SubstringDedup.windowHashes(docs, minLen)
      .select(col("__h").as("h"), col("__id").as("cid"),
        col("__pos").as("cpos"))
      .write.mode(mode).parquet(s"$path/postings")
    docs.select(col("__id").as("cid"), col("__t").as("ctext"))
      .write.mode(mode).parquet(s"$path/docs")
    import spark.implicits._
    Seq((minLen, Version)).toDF("min_len", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
  }

  /** Append NEW documents under the stored config. Ids must be unique
    * across index ∪ batch (the screen-then-append loop guarantees it:
    * screen first, append the survivors). Appends are atomic per table
    * only — rebuild rather than retry a failed append. */
  def append(batch: DataFrame, idCol: String, textCol: String,
             path: String): Unit = {
    val minLen = cfgOf(batch.sparkSession, path)
    val docs = SubstringDedup.prep(batch, idCol, textCol)
    SubstringDedup.windowHashes(docs, minLen)
      .select(col("__h").as("h"), col("__id").as("cid"),
        col("__pos").as("cpos"))
      .write.mode("append").parquet(s"$path/postings")
    docs.select(col("__id").as("cid"), col("__t").as("ctext"))
      .write.mode("append").parquet(s"$path/docs")
  }

  /** Batch windows whose exact substring occurs in the indexed corpus:
    * (id, pos), 1-based — the raw match stream behind [[spansAgainst]].
    * Exact-verified by string equality; rolling-hash collisions cannot
    * produce a row. */
  def matches(batch: DataFrame, idCol: String, textCol: String,
              path: String): DataFrame = {
    val spark = batch.sparkSession
    val minLen = cfgOf(spark, path)
    val bdocs = SubstringDedup.prep(batch, idCol, textCol)
    val bw = SubstringDedup.windowHashes(bdocs, minLen)
    val hits = bw
      .join(spark.read.parquet(s"$path/postings"),
        col("__h") === col("h"))
      .join(spark.read.parquet(s"$path/docs"), "cid")
      .select(col("__id"), col("__pos"),
        col("ctext").substr(col("cpos").cast("int"), lit(minLen))
          .as("__csub"))
      .join(bdocs, "__id")
      .filter(col("__t").substr(col("__pos").cast("int"), lit(minLen))
        === col("__csub"))
      .select(col("__id").as("id"), col("__pos").as("pos"))
      .distinct()
    hits
  }

  /** STREAMING window-match stream against the files: for a readStream
    * source, emits (id, pos, cid, cpos) for every stream row window whose
    * exact substring exists in the indexed corpus — the fourth streaming
    * screen (minhash [[TextIndex.matchesStream]], embeddings
    * [[VecIndex]], Bloom exact, this = exact substrings). Two
    * stream-static joins; no state store, no watermark. The static
    * side's file listing is captured at BUILD time, so [[append]]s are
    * seen on the next (re)build — a checkpointed restart resumes
    * offsets AND sees the grown index (RocksDbStateSpec) — not
    * mid-query.
    * Delivery contract: a window matching k corpus occurrences is
    * emitted k times (a stateless stream cannot distinct) — run
    * sink-side dropDuplicates("id", "pos") in foreachBatch, or the batch
    * [[spansAgainst]] there, when exactly-once matters. */
  def matchesStream(stream: DataFrame, idCol: String, textCol: String,
                    path: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val minLen = cfgOf(spark, path)
    val wins = stream
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        if (t == null || t.length < minLen) Iterator.empty
        else {
          val hs = SubstringDedup.rollingHashArray(t, minLen)
          hs.iterator.zipWithIndex.map { case (h, i) =>
            (id, (i + 1).toLong, t.substring(i, i + minLen), h)
          }
        }
      }
      .toDF("id", "pos", "__bsub", "__h")
    wins
      .join(spark.read.parquet(s"$path/postings"), col("__h") === col("h"))
      .join(spark.read.parquet(s"$path/docs"), "cid")
      .filter(col("ctext").substr(col("cpos").cast("int"), lit(minLen))
        === col("__bsub"))
      .select(col("id"), col("pos"), col("cid"), col("cpos"))
  }

  /** Island-merged spans of batch text already present in the corpus:
    * (doc_id, span_start, span_end) — [[SubstringDedup]]'s span algebra
    * against the files. */
  def spansAgainst(batch: DataFrame, idCol: String, textCol: String,
                   path: String): DataFrame =
    SubstringDedup.mergeSpans(
      matches(batch, idCol, textCol, path)
        .select(col("id").as("__id"), col("pos").as("__pos")),
      cfgOf(batch.sparkSession, path))

  /** The ingest transform: `batch` with every corpus-repeated span cut
    * out of its text column (docs reduced to nothing become "", rows
    * with no repeats pass through untouched). Screen → removeAgainst →
    * [[append]] the survivors is the standing ingest loop. */
  def removeAgainst(batch: DataFrame, idCol: String, textCol: String,
                    path: String): DataFrame =
    SubstringDedup.cutSpans(batch, idCol, textCol,
      spansAgainst(batch, idCol, textCol, path))
}
