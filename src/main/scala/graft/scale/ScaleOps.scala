package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class utilities (the 100-TB toolbox):
  * bucketed co-located joins and skew-salted joins. These do not change
  * query SEMANTICS — they shape the physical plan.
  */
object ScaleOps {

  /** Key-skew report for a prospective join/aggregation key: the
    * diagnostics that decide BETWEEN the tools in this toolbox (broadcast
    * vs salted vs plain shuffle). One row:
    *   n_rows, n_keys, max_key_count (the heaviest key's rows),
    *   top1_share (that key's fraction of all rows — the straggler-task
    *   share under a hash shuffle), avg_key_count.
    * Read: top1_share ≈ 1/partitions is balanced; top1_share ≫
    * 1/partitions means the heaviest key dominates one task — salt it
    * (`saltedJoin`) or broadcast the other side.
    *
    * Scale shape: one partial/final hash aggregate keyed on the key
    * (vocab-of-keys rows), then a scalar aggregate over the counts —
    * two shuffles of count rows, nothing driver-side. */
  def skewReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "skewReport needs at least one key column")
    val counts = df.na.drop(keys)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    // coalesce: sum/max over zero rows are null — an empty (or all-null-key)
    // frame must yield a well-defined all-zeros report, not NPE the caller
    // making the broadcast/salt decision
    counts.agg(
      coalesce(sum("__n"), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(max("__n"), lit(0L)).as("max_key_count"))
      .select(col("n_rows"), col("n_keys"), col("max_key_count"),
        (col("max_key_count").cast("double") /
          greatest(col("n_rows").cast("double"), lit(1.0))).as("top1_share"),
        (col("n_rows").cast("double") /
          greatest(col("n_keys").cast("double"), lit(1.0))).as("avg_key_count"))
  }

  /** Persist a frame as a bucketed+sorted table so repeated joins and
    * aggregations on `keys` read pre-shuffled data (no Exchange at query
    * time). The write pays one shuffle; every subsequent co-located join
    * on the bucket keys pays none. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — with matching bucket
    * counts Catalyst plans a sort-merge join with NO shuffle on either
    * side. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   left: String, right: String, keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** The broadcast-vs-salt-vs-shuffle DECISION, from measurements:
    * "broadcast" when the dim side is small enough to ship
    * (≤ broadcastRows), else "salted" when [[skewReport]] shows the
    * fact side's heaviest key above `skewThreshold` of all rows, else
    * "plain". Two bounded actions (a dim count, a key-count aggregate)
    * — the price of deciding from evidence instead of folklore. */
  def autoJoinDecision(fact: DataFrame, dim: DataFrame, key: String,
                       broadcastRows: Long = 1000000L,
                       skewThreshold: Double = 0.2): String = {
    require(broadcastRows > 0 && skewThreshold > 0 && skewThreshold <= 1)
    val dimRows = dim.limit(
      if (broadcastRows >= Int.MaxValue) Int.MaxValue
      else (broadcastRows + 1).toInt).count()
    if (dimRows <= broadcastRows) "broadcast"
    else {
      val top1 = skewReport(fact, Seq(key)).head().getAs[Double]("top1_share")
      if (top1 > skewThreshold) "salted" else "plain"
    }
  }

  /** Measured join: run [[autoJoinDecision]] and execute the matching
    * physical shape — `broadcast(dim)` hint, [[saltedJoin]], or the
    * plain equi-join. SEMANTICS are identical in all three branches
    * (inner join on `key`; the q_auto_join gate pins that); only the
    * plan changes. */
  def autoJoin(fact: DataFrame, dim: DataFrame, key: String,
               broadcastRows: Long = 1000000L, skewThreshold: Double = 0.2,
               buckets: Int = 16): DataFrame =
    autoJoinDecision(fact, dim, key, broadcastRows, skewThreshold) match {
      case "broadcast" => fact.join(broadcast(dim), key)
      case "salted"    => saltedJoin(fact, dim, key, buckets)
      case _           => fact.join(dim, key)
    }

  /** Compact a small-files parquet dataset: read `src`, coalesce to
    * ⌈bytes / targetBytes⌉ output files, write to `dst` (a DIFFERENT
    * path — Spark cannot overwrite its own input; swap directories
    * upstream once the write commits). The small-files problem is the
    * classic ingestion pathology: a crawl loop appending 1000 tiny
    * batches leaves 100k files whose open/footer costs dominate every
    * later scan. Returns one row (files_before, files_after, bytes,
    * n_rows).
    *
    * Uses coalesce (not repartition): no shuffle — existing partitions
    * concatenate map-side. Fine for compaction; use
    * [[clusterByZorder]]/repartitionByRange first when the rewrite
    * should ALSO fix the sort order. */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
              dst: String, targetBytes: Long = 128L << 20): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(new org.apache.hadoop.fs.Path(src).toUri.getPath !=
      new org.apache.hadoop.fs.Path(dst).toUri.getPath,
      "compact: dst must differ from src (Spark cannot overwrite its input)")
    val df = spark.read.parquet(src)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = df.inputFiles.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val filesBefore = df.inputFiles.length.toLong
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    df.coalesce(nOut).write.mode("overwrite").parquet(dst)
    val out = spark.read.parquet(dst)
    import spark.implicits._
    Seq((filesBefore, out.inputFiles.length.toLong, bytes, out.count()))
      .toDF("files_before", "files_after", "bytes", "n_rows")
  }

  /** Bloom-pruned join: build a Bloom filter over the SMALL side's join
    * keys (one pass, sketch collected to the driver and broadcast), prune
    * the BIG side map-side BEFORE its shuffle, then run the real join.
    * The result is EXACTLY the plain inner join — Bloom false positives
    * escape the prune and die in the join; false negatives don't exist —
    * only the shuffled volume changes. This is the tool for "join a huge
    * fact stream against a dim too big to broadcast but far smaller than
    * the facts": with a selective key set, most fact rows never leave
    * their input partition.
    *
    * Integral keys only (the probe uses the long hash path). `fpp` trades
    * filter size against the fraction of non-matching rows that still
    * shuffle (they remain CORRECT, just not pruned). */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
                      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    def requireIntegral(df: DataFrame): Unit = {
      val dt = df.schema(key).dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"bloomPrunedJoin needs an integral key, $key is ${dt.typeName}")
    }
    requireIntegral(big); requireIntegral(small)
    val smallClean = small.na.drop(Seq(key))
    // an EMPTY small side NPEs stat.bloomFilter (null bits) — and the join
    // is empty anyway; the limit(1) probe short-circuits
    if (smallClean.limit(1).count() == 0)
      return big.na.drop(Seq(key)).filter(lit(false)).join(smallClean, key)
    // expectedItems=0 -> count the small side (one extra action on the
    // SMALL side only; pass the count when you know it)
    val n = if (expectedItems > 0) expectedItems
            else math.max(1L, smallClean.count())
    val bloom = smallClean.stat.bloomFilter(key, n, fpp)
    val spark = big.sparkSession
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    big.na.drop(Seq(key))
      .filter(mightContain(col(key).cast("long")))
      .join(smallClean, key)
  }

  /** Morton/Z-order interleave of pre-quantized coordinates: bit b of
    * dimension i lands at output bit b·ndims + i. Pure Column arithmetic
    * (shiftleft/and/or, fully unrolled at plan-build time — bits·ndims
    * terms), so it stays inside whole-stage codegen and an external
    * engine can replay it with the same integer ops. */
  def zorderValue(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && bits >= 1 && bits * qs.size <= 63,
      s"zorderValue: need 1..63 output bits, got ${qs.size} dims x $bits")
    val n = qs.size
    val terms = for {
      b <- 0 until bits
      i <- 0 until n
    } yield shiftleft(shiftright(qs(i), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Min-max quantization of `c` onto [0, 2^bits): floor of the scaled
    * position, clipped so x == max lands in the top cell. Double
    * arithmetic written to match an external replay term-for-term
    * (((x − min) / (max − min)) · 2^bits — IEEE doubles are
    * deterministic, so floor agrees bit-for-bit across engines). A
    * degenerate dimension (max == min) quantizes to 0. */
  def zorderQuantize(c: Column, mn: Double, mx: Double, bits: Int): Column =
    if (mx == mn) lit(0L)
    else least(lit((1L << bits) - 1), greatest(lit(0L),
      floor(((c.cast("double") - lit(mn)) / lit(mx - mn)) *
        lit((1L << bits).toDouble)).cast("long")))

  /** Attach a Z-order key over `cols` (min-max quantized to `bits` bits
    * per dimension, then interleaved). One tiny min/max aggregate reaches
    * the driver (2 doubles per column — bounded by construction); the key
    * itself is codegen'd column arithmetic, no shuffle. Null coordinates
    * quantize through greatest/least to cell 0. */
  def withZorder(df: DataFrame, cols: Seq[String], bits: Int = 8,
                 out: String = "zorder"): DataFrame = {
    require(cols.nonEmpty, "withZorder needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val qs = cols.zipWithIndex.map { case (c, i) =>
      // an all-null / empty column yields null min-max -> degenerate dim
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      zorderQuantize(col(c), mn, mx, bits)
    }
    df.withColumn(out, zorderValue(qs, bits))
  }

  /** Cluster a frame along the Z-curve of `cols` for write-time data
    * layout: range-repartition on the Z-key + in-partition sort, so every
    * output file covers a compact hyper-rectangle of the key space and
    * parquet min/max stats prune scans filtered on ANY prefix/subset of
    * the clustered columns — the multi-dimensional generalization of
    * sorting by one column. The Z-key is dropped before write; it only
    * shapes the layout. */
  def clusterByZorder(df: DataFrame, cols: Seq[String], bits: Int = 8,
                      partitions: Int = 0): DataFrame = {
    val keyed = withZorder(df, cols, bits, "__graft_zorder")
    val np = if (partitions > 0) partitions
             else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(np, col("__graft_zorder"))
      .sortWithinPartitions("__graft_zorder")
      .drop("__graft_zorder")
  }

  /** Skew-resistant join of a skewed fact table against a dimension:
    * the fact side gets a deterministic per-row salt in [0, buckets),
    * the dimension is exploded `buckets`× (dims are small — that's the
    * premise of the skew), and the join key becomes (key, salt) — a hot
    * key's rows now spread over `buckets` reducers instead of one.
    *
    * AQE's skew-join handling covers sort-merge joins at runtime; manual
    * salting remains the tool when AQE can't split (e.g. aggregations
    * after the join keyed on the hot key, or stream-static joins). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    // salt from the row's own content via a stable row-hash — deterministic
    // (no rand()), uniform enough to split a hot key
    val factCols = fact.columns.map(col).toSeq
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(buckets.toLong)).cast("int"))
    val dimExploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }
}
