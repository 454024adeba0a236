package graft.agg

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a string stream: fixed-memory approximate
  * frequencies with a one-sided error bound (estimate ≥ true count;
  * overcount ≤ e/width · stream-length with probability 1 − (1/e)^depth
  * — Cormode & Muthukrishnan 2005). Complements [[Frequency]]'s
  * Misra-Gries tier: MG answers "which tokens are heavy", CMS answers
  * "how often is THIS token seen" for any token, without ever shuffling
  * the vocabulary.
  *
  * Scale shape: one `mapPartitions` pass over the token stream folding a
  * per-partition sketch (bounded local combiner so md5 runs once per
  * distinct token per flush epoch, not once per occurrence), then a
  * `treeReduce` of depth·width Long arrays — NO shuffle, state is
  * O(depth·width) regardless of corpus size, and the merged sketch is a
  * few KB on the driver. That is the 100-TB story: the vocabulary tail
  * never moves across the network.
  *
  * Hashing is md5-based SPECIFICALLY so an external engine can reproduce
  * the sketch bit-for-bit: cell(r, token) = first 16 hex chars of
  * md5("r:token") as unsigned 64-bit, mod width — in DuckDB,
  * `('0x' || substr(md5(r || ':' || token), 1, 16))::UBIGINT % width`.
  * The q_cms oracle row checks the full (exact, estimate) table against
  * that reconstruction. A cryptographic hash per distinct token is ~100ns;
  * the combiner keeps it off the per-occurrence path.
  *
  * Reference scope: the reference library (dvgodoy/handyspark) has no
  * sketch tier; this is part of the scale extension alongside
  * Misra-Gries, HLL and GK.
  */
object CountMin {

  /** Row-r hash cell of `token`: first 8 bytes of md5("r:token"),
    * big-endian unsigned, mod width. */
  def cell(row: Int, token: String, width: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(
      (row.toString + ":" + token)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(h, width.toLong).toInt
  }

  /** Mergeable sketch state: depth rows × width counters, flat. */
  final class Sketch(val depth: Int, val width: Int) extends Serializable {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    val counters: Array[Long] = new Array[Long](depth * width)

    def add(token: String, n: Long): Unit = {
      var r = 0
      while (r < depth) {
        counters(r * width + cell(r, token, width)) += n
        r += 1
      }
    }

    def merge(o: Sketch): Sketch = {
      require(o.depth == depth && o.width == width,
        s"sketch shape mismatch: ${depth}x$width vs ${o.depth}x${o.width}")
      var i = 0
      while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
      this
    }

    /** Point estimate: min over rows of the token's cell — always ≥ the
      * true count (counters only ever add). */
    def estimate(token: String): Long = {
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counters(r * width + cell(r, token, width))
        if (c < est) est = c
        r += 1
      }
      est
    }

    /** Total stream length (sum of one counter row — every add lands
      * exactly once per row). */
    def totalCount: Long = {
      var s = 0L
      var i = 0
      while (i < width) { s += counters(i); i += 1 }
      s
    }
  }

  /** Per-partition combiner flush threshold: distinct tokens buffered
    * before hashing them into the sketch. Bounds executor memory while
    * amortizing the md5 over repeated tokens. */
  private val CombinerCap = 1 << 16

  /** One-pass sketch of a Dataset[String] token stream (nulls and empty
    * strings skipped). No shuffle: per-partition sketches treeReduce to
    * the driver. */
  def sketchTokens(tokens: Dataset[String], depth: Int, width: Int): Sketch = {
    val d = depth; val w = width
    tokens.rdd
      .mapPartitions { it =>
        val sk = new Sketch(d, w)
        val local = new java.util.HashMap[String, Long](1024)
        def flush(): Unit = {
          val e = local.entrySet().iterator()
          while (e.hasNext) { val kv = e.next(); sk.add(kv.getKey, kv.getValue) }
          local.clear()
        }
        while (it.hasNext) {
          val t = it.next()
          if (t != null && t.nonEmpty) {
            local.merge(t, 1L, (a, b) => a + b)
            if (local.size() >= CombinerCap) flush()
          }
        }
        flush()
        Iterator.single(sk)
      }
      // treeAggregate, not treeReduce: the zero sketch keeps an EMPTY
      // token stream (0-partition RDD) legal instead of throwing
      .treeAggregate(new Sketch(d, w))(_.merge(_), _.merge(_), depth = 2)
  }

  /** Sketch a whitespace-token stream of `textCol` (the engine's standard
    * `trim` + split-on-`\s+` tokenization — matches the vocabulary and
    * oracle token streams). */
  def sketchText(df: DataFrame, textCol: String,
                 depth: Int = 4, width: Int = 1 << 14): Sketch = {
    val spark = df.sparkSession
    import spark.implicits._
    sketchTokens(
      df.na.drop(Seq(textCol))
        .select(explode(graft.pipeline.TextAnalysis.tokens(col(textCol)))
          .as("__graft_token"))
        .filter(col("__graft_token") =!= "")
        .as[String],
      depth, width)
  }

  /** Estimates for an explicit token list against an already-built
    * sketch — the production query shape ("how frequent are THESE
    * tokens"): no scan, no shuffle, driver-side lookup. */
  def estimateFor(sk: Sketch, tokens: Seq[String])
                 (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    tokens.map(t => (t, sk.estimate(t))).toDF("token", "est")
  }

  /** Persist a sketch as parquet: one row per counter row, (r, counters
    * array). Self-describing (depth/width from the data), mergeable —
    * the frequency analog of the TextIndex/VecIndex persisted screens:
    * token-frequency questions over a GROWING corpus without ever
    * rescanning old batches. */
  def write(sk: Sketch, path: String)
           (implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    (0 until sk.depth).map { r =>
      (r, java.util.Arrays.copyOfRange(sk.counters, r * sk.width,
        (r + 1) * sk.width).toSeq)
    }.toDF("r", "counters").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Read a persisted sketch back. */
  def read(path: String)
          (implicit spark: org.apache.spark.sql.SparkSession): Sketch = {
    val rows = spark.read.parquet(path)
      .select("r", "counters").collect()
      .map(row => row.getInt(0) -> row.getSeq[Long](1).toArray)
      .sortBy(_._1)
    require(rows.nonEmpty, s"CountMin.read: empty sketch at $path")
    val depth = rows.length
    val width = rows(0)._2.length
    val sk = new Sketch(depth, width)
    rows.foreach { case (r, cs) =>
      require(cs.length == width,
        s"CountMin.read: ragged counter rows at $path")
      System.arraycopy(cs, 0, sk.counters, r * width, width)
    }
    sk
  }

  /** Merge a new batch's token stream into the persisted sketch at
    * `path` (read + sketch the batch + add + overwrite). Counters only
    * ever grow, so estimates stay valid upper bounds across any number
    * of appends; the rewrite is depth·width longs, independent of
    * corpus size. */
  def append(df: DataFrame, textCol: String, path: String): Unit = {
    implicit val spark: org.apache.spark.sql.SparkSession = df.sparkSession
    val old = read(path)
    val batch = sketchText(df, textCol, old.depth, old.width)
    write(old.merge(batch), path)
  }

  /** Diagnostic contract table: exact count vs sketch estimate for every
    * token with exact count ≥ minCount. Runs the exact vocabulary
    * aggregate ALONGSIDE the sketch, so this is the verification /
    * calibration facade, not the scale path — use [[sketchText]] +
    * [[estimateFor]] when the corpus is too large to shuffle its
    * vocabulary. Output: (token, cnt, est), est ≥ cnt always. */
  def cmsEstimates(df: DataFrame, idCol: String, textCol: String,
                   depth: Int = 4, width: Int = 1 << 14,
                   minCount: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sk = sketchText(df, textCol, depth, width)
    val bc = spark.sparkContext.broadcast(sk)
    val est = udf { t: String => bc.value.estimate(t) }
    graft.pipeline.TextAnalysis.vocabulary(df, idCol, textCol, minCount)
      .select(col("token"), col("count").cast("long").as("cnt"))
      .withColumn("est", est(col("token")))
  }
}
