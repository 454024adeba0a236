package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up replicator for scaling experiments: writes a `factor`×
  * replica of a testdata directory with keys shifted per replica so key
  * cardinality grows with the data (10 verbatim copies would instead give
  * every row 9 exact duplicates and quadratic pair blowups in the dedup
  * operators — not the shape real growth has).
  *
  *  - key columns get `replica * 100M` added;
  *  - document text gets a per-replica suffix token (keeps replicas from
  *    being exact dups while preserving the shingle distribution);
  *  - embeddings get component 0 nudged by `replica * 0.01` (breaks
  *    cross-replica exact duplicates, preserves within-replica geometry);
  *  - event timestamps shift by one day per replica (grows the session /
  *    window key space);
  *  - dimension tables (region, nation) are copied once.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor> [dupPct]
  *
  * `dupPct` (optional, e.g. 0.05) switches documents to the DUP-RATE-
  * CONTROLLED corpus: the legacy suffix treatment makes EVERY replica a
  * near-dup of its base (100% dup rate, clique = factor — the adversarial
  * shape, kept as the default for stress runs), whereas real corpus
  * growth carries a small near-dup fraction. With dupPct set:
  *  - a deterministic `dupPct` slice of base docs (by xxhash64(doc_id))
  *    gets near-copies (suffix treatment) in replicas 1..4 only —
  *    clique size <= 5 regardless of factor;
  *  - every other replica doc gets its TOKENS DETERMINISTICALLY
  *    PERMUTED (sorted by xxhash64(token, replica)) — same vocabulary,
  *    length and token-frequency profile, but near-zero shingle overlap,
  *    so it is NOT a near-dup of its base at jaccard >= 0.3.
  */
object ScaleUp {

  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val (srcDir, dstDir, factorStr) = (args(0), args(1), args(2))
    val factor = factorStr.toInt
    val dupPct = if (args.length > 3) args(3).toDouble else -1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copyOnce(name: String): Unit =
      spark.read.parquet(s"$srcDir/$name.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")

    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      (0 until factor).map(r => f(src, r)).reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }
    def shiftKeys(keys: String*)(d: DataFrame, r: Int): DataFrame =
      keys.foldLeft(d)((acc, k) =>
        acc.withColumn(k, col(k) + lit(r * Shift)))

    Seq("region", "nation").foreach(copyOnce)
    rep("customer")(shiftKeys("c_custkey"))
    rep("supplier")(shiftKeys("s_suppkey"))
    rep("part")(shiftKeys("p_partkey"))
    rep("orders")(shiftKeys("o_orderkey", "o_custkey"))
    rep("lineitem")(shiftKeys("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events") { (d, r) =>
      // ts arrives as epoch-nanos LONG under nanosAsLong, or as
      // TIMESTAMP(_NTZ) when the source was written at micros precision
      // (see Queries.events) — shift a day per replica either way
      val shifted = shiftKeys("event_id", "user_id")(d, r)
      d.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          shifted.withColumn("ts", col("ts") + lit(r * 86400L * 1000000000L))
        case _ =>
          shifted.withColumn("ts", expr(s"ts + INTERVAL '$r' DAY"))
      }
    }
    rep("documents") { (d, r) =>
      if (r == 0) shiftKeys("doc_id")(d, r)
      else if (dupPct < 0)
        shiftKeys("doc_id")(d, r)
          .withColumn("text", concat(col("text"), lit(s" r$r")))
      else {
        // dup-rate-controlled: isDup selected on the ORIGINAL doc_id so
        // the same base docs are duplicated in every replica (cliques,
        // not chains), capped at replicas 1..4 => clique <= 5
        val isDup = pmod(xxhash64(col("doc_id")), lit(10000L))
          .lt(lit((dupPct * 10000).toLong)).and(lit(r <= 4))
        val toks = split(trim(col("text")), "\\s+")
        // sort key hashes (token, POSITION, replica, doc_id): position makes
        // repeated tokens sort independently (keying on the token alone
        // groups every repeat into a run, so any doc with token X thrice
        // contains the shingle "X X X" — measured df 13k/50k docs, which
        // collapses the minhash signature space into quadratic band
        // buckets), and doc_id decorrelates the permutations of docs that
        // share vocabulary (a shared key ordering lines their common tokens
        // up into identical subsequences — manufactured similarity)
        val shuffled = array_join(
          transform(
            array_sort(transform(toks,
              (t, i) => struct(xxhash64(t, i, lit(r), col("doc_id")).as("h"),
                t.as("t")))),
            s => s.getField("t")),
          " ")
        shiftKeys("doc_id")(
          d.withColumn("text",
            when(isDup, concat(col("text"), lit(s" r$r")))
              .otherwise(shuffled)),
          r)
      }
    }
    rep("embeddings") { (d, r) =>
      val shifted = shiftKeys("vec_id")(d, r)
      // BOUNDED nudge on a per-replica ROTATING component: the original
      // `component 0 += r * 0.01` grew with the replica index — at
      // factor 100 the +0.99 shift dominated every vector's geometry, so
      // all high-replica vectors pointed near e0 and the corpus
      // manufactured ~10^8 above-threshold "near-dup" pairs (measured:
      // q_near_new_op emitted 106M rows at sf10). Rotating the nudged
      // component (r mod 64) and keeping the magnitude at 0.01·(1+r/64)
      // ≤ ~0.03 keeps every replica distinct while preserving the
      // original similarity structure.
      if (r == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"),
          (x, i) => when(i === r % 64, x + lit(((r / 64) + 1) * 0.01f))
            .otherwise(x)))
    }
    spark.stop()
  }
}
