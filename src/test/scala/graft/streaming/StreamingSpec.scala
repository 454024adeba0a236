package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedValueCounts aggregates a memory stream incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.windowedValueCounts(
      input.toDF().toDF("ts", "event_type"), "ts", "event_type",
      windowDur = "1 hour", watermark = "2 hours")
    val q = counts.writeStream.format("memory")
      .queryName("vc").outputMode("complete").start()
    try {
      input.addData(
        (ts("2026-01-01 10:05:00"), "click"),
        (ts("2026-01-01 10:20:00"), "click"),
        (ts("2026-01-01 10:40:00"), "view"),
        (ts("2026-01-01 11:10:00"), "click"))
      q.processAllAvailable()
      val r = spark.sql("SELECT event_type, value_counts FROM vc " +
        "WHERE window.start = '2026-01-01 10:00:00' ORDER BY event_type")
        .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
      assert(r == Seq(("click", 2L), ("view", 1L)))
      // incremental update: new event lands in the same window
      input.addData((ts("2026-01-01 10:55:00"), "view"))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT value_counts FROM vc WHERE " +
        "window.start = '2026-01-01 10:00:00' AND event_type = 'view'")
        .head().getLong(0)
      assert(r2 == 2L)
    } finally q.stop()
  }

  test("windowedHeavyHitters: sketch merges across micro-batches, covers heavy items") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val hh = StreamingOps.windowedHeavyHitters(
      input.toDF().toDF("ts", "v"), "ts", "v", k = 3,
      windowDur = "1 hour", watermark = "2 hours")
    val q = hh.writeStream.format("memory")
      .queryName("hh").outputMode("complete").start()
    try {
      // 40 items in one window across TWO batches: a x20, b x12, c x5,
      // d..f singletons — n/(k+1) = 10, so a (20) and b (12) must survive
      def at(min: Int) = ts(f"2026-01-01 10:${min}%02d:00")
      input.addData((0 until 10).map(i => (at(i), "a")) ++
        (0 until 6).map(i => (at(20 + i), "b")) ++ Seq((at(40), "c")): _*)
      q.processAllAvailable()
      input.addData((0 until 10).map(i => (at(i), "a")) ++
        (0 until 6).map(i => (at(20 + i), "b")) ++
        (0 until 4).map(i => (at(41 + i), "c")) ++
        Seq((at(50), "d"), (at(51), "e"), (at(52), "f")): _*)
      q.processAllAvailable()
      val cands = spark.sql(
        "SELECT explode(candidates) AS c FROM hh " +
          "WHERE window.start = '2026-01-01 10:00:00'")
        .select("c.item", "c.cnt")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cands.size <= 3)
      assert(cands.contains("a") && cands.contains("b"),
        s"items above n/(k+1)=10 must survive the cross-batch merge: $cands")
      assert(cands("a") <= 20 && cands("b") <= 12, "counts are lower bounds")
      assert(20 - cands("a") <= 10 && 12 - cands("b") <= 10,
        "undercount bounded by n/(k+1)")
    } finally q.stop()
  }

  test("streamingNearDedup drops same-signature near-duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingOps.streamingNearDedup(
      input.toDF().toDF("ts", "text"), "ts", "text")
    val q = deduped.writeStream.format("memory")
      .queryName("nd").outputMode("append").start()
    try {
      input.addData(
        (ts("2026-01-01 10:00:00"), "the quick brown fox jumps"),
        (ts("2026-01-01 10:01:00"), "the quick brown fox jumps"), // exact dup
        (ts("2026-01-01 10:02:00"), "a completely different document text"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM nd").head().getLong(0) == 2L)
    } finally q.stop()
  }

  test("textScreenStream drops corpus near-dups from a stream, passes novel text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different content about spark engines")
    ).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.buildTextScreenIndex(corpus, "text")
    assert(index.nDocs == 2)
    val input = MemoryStream[(Timestamp, String)]
    val screened = graft.pipeline.Dedup.textScreenStream(
      input.toDF().toDF("ts", "text"), "text", index, threshold = 0.5)
    val q = screened.writeStream.format("memory")
      .queryName("tss").outputMode("append").start()
    try {
      input.addData(
        (ts("2026-01-01 10:00:00"), "the quick brown fox jumps over the lazy cat"),
        (ts("2026-01-01 10:01:00"), "entirely novel sentence with fresh words"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT text FROM tss").collect()
        .map(_.getString(0)).toSet
      assert(kept == Set("entirely novel sentence with fresh words"))
    } finally q.stop()
  }

  test("textScreenStream on a batch frame equals textNewRows") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc() = (0 until 8).map(_ => words(rnd.nextInt(words.length)))
      .mkString(" ")
    val corpus = (0L until 30L).map(i => (i, doc())).toDF("doc_id", "text")
    val batch = (100L until 130L).map(i => (i, doc())).toDF("doc_id", "text")
    val viaShuffle = graft.pipeline.Dedup.textNewRows(
        batch, corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val index = graft.pipeline.Dedup.buildTextScreenIndex(corpus, "text")
    val viaIndex = graft.pipeline.Dedup.textScreenStream(
        batch, "text", index, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == viaShuffle,
      s"index-screen kept $viaIndex, shuffle-screen kept $viaShuffle")
  }

  test("runningStats keeps Welford state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val stats = StreamingOps.runningStats(input.toDS())
    val q = stats.writeStream.format("memory")
      .queryName("rs").outputMode("update").start()
    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT n, mean FROM rs WHERE key = 'a'")
        .orderBy(desc("n")).head()
      assert(r1.getLong(0) == 2L && r1.getDouble(1) == 2.0)
      // second batch continues from the first batch's state
      input.addData(("a", 5.0))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT n, mean, stddev FROM rs WHERE key = 'a'")
        .orderBy(desc("n")).head()
      assert(r2.getLong(0) == 3L && r2.getDouble(1) == 3.0)
      assert(math.abs(r2.getDouble(2) - 2.0) < 1e-12) // stddev of 1,3,5
    } finally q.stop()
  }

  test("file-source streaming over the real events table matches batch counts") {
    val dir = "/root/testdata/sf0.001"
    // file streams require a DIRECTORY source — stage the file into one
    val staged = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    // ts may arrive as epoch-nanos LONG (TIMESTAMP(NANOS) under
    // nanosAsLong=true), as TIMESTAMP_NTZ (TIMESTAMP(MICROS) files,
    // no timezone annotation), or as a session-tz TIMESTAMP — the
    // watermark below requires TimestampType, so normalize all three
    // (same defensive pattern as Queries.events, plus the NTZ cast)
    def tsNormalized(df: org.apache.spark.sql.DataFrame) =
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions
            .expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", org.apache.spark.sql.functions
            .col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    val batch = tsNormalized(spark.read.parquet(s"$dir/events.parquet"))
    val stream = tsNormalized(spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val counts = StreamingOps.windowedValueCounts(stream, "ts", "event_type",
      windowDur = "1 day", watermark = "2 days")
    val q = counts.writeStream.format("memory")
      .queryName("ev").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT event_type, sum(value_counts) FROM ev GROUP BY 1 ORDER BY 1")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val batched = batch.groupBy("event_type").count().orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(streamed == batched)
    } finally q.stop()
  }

  test("streamingDedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = StreamingOps.streamingDedup(
      input.toDF().toDF("ts", "key"), "ts", Seq("key"))
    val q = dedup.writeStream.format("memory")
      .queryName("dd").outputMode("append").start()
    try {
      input.addData((ts("2026-01-01 10:00:00"), 1L),
        (ts("2026-01-01 10:00:00"), 1L), (ts("2026-01-01 10:01:00"), 2L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dd").head().getLong(0) == 2L)
    } finally q.stop()
  }

  test("hash sampling composes with streams: stateless, replay-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    // Sampling.hashSample is a pure filter — works unchanged on a stream,
    // and the SAME ids survive as in the batch run (membership is keyed on
    // the id, not on partitioning or arrival order)
    val sampled = graft.pipeline.Sampling.hashSample(
      input.toDF().toDF("ts", "doc_id"), "doc_id", 0.5, seed = 9)
    val q = sampled.writeStream.format("memory")
      .queryName("hs").outputMode("append").start()
    try {
      input.addData((0L until 100L).map(i =>
        (ts("2026-01-01 10:00:00"), i)): _*)
      q.processAllAvailable()
      val streamIds = spark.sql("SELECT doc_id FROM hs")
        .collect().map(_.getLong(0)).toSet
      val batchIds = graft.pipeline.Sampling.hashSample(
        (0L until 100L).toDF("doc_id"), "doc_id", 0.5, seed = 9)
        .collect().map(_.getLong(0)).toSet
      assert(streamIds == batchIds, "stream membership diverged from batch")
      assert(streamIds.size > 30 && streamIds.size < 70)
    } finally q.stop()
  }

  test("trailingCounts: exact per-event trailing window across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val counts = StreamingOps.trailingCounts(input.toDS(), windowSec = 3600L)
    val q = counts.writeStream.format("memory")
      .queryName("tc").outputMode("update").start()
    try {
      input.addData(("u1", 100L), ("u1", 200L), ("u2", 150L))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT ts, nWin FROM tc WHERE key = 'u1'")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(r1 == Map(100L -> 1L, 200L -> 2L))
      // second batch: state carries over; 100 ages out of 3701's window
      input.addData(("u1", 3699L), ("u1", 3701L))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT ts, nWin FROM tc WHERE key = 'u1'")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(r2(3699L) == 3L && r2(3701L) == 3L)
    } finally q.stop()
  }

  test("trailingCounts maxState is a documented GRACEFUL FLOOR (the " +
      "silent-cap waiver): over-rate keys degrade to a floor count, " +
      "never drop events or grow state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val counts = StreamingOps.trailingCounts(input.toDS(),
      windowSec = 3600L, maxState = 3)
    val q = counts.writeStream.format("memory")
      .queryName("tc_cap").outputMode("update").start()
    try {
      input.addData(("u", 10L), ("u", 20L), ("u", 30L), ("u", 40L),
        ("u", 50L))
      q.processAllAvailable()
      val r = spark.sql("SELECT ts, nWin FROM tc_cap")
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      // true trailing counts are 1..5; with 3 retained timestamps the
      // 4th/5th events floor at 3 — a lower bound, and EVERY event still
      // emits a row (dropping work here would lose events, not pairs —
      // the cap trades count exactness for bounded state instead)
      assert(r == Map(10L -> 1L, 20L -> 2L, 30L -> 3L, 40L -> 3L,
        50L -> 3L))
    } finally q.stop()
  }

  test("slidingCounts emits overlapping window buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingOps.slidingCounts(
      input.toDF().toDF("ts", "user", "v"), "ts", "user", "v",
      windowDur = "10 minutes", slideDur = "5 minutes",
      watermark = "1 hour")
    val q = agg.writeStream.format("memory")
      .queryName("sc").outputMode("update").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:07:00"), "u", 1.0),
        (Timestamp.valueOf("2024-01-01 00:12:00"), "u", 2.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start, n, value_sum FROM sc")
        .collect().map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      // 00:07 lands in [00:00,00:10) and [00:05,00:15); 00:12 in
      // [00:05,00:15) and [00:10,00:20)
      assert(rows("2024-01-01 00:00:00.0") == ((1L, 1.0)))
      assert(rows("2024-01-01 00:05:00.0") == ((2L, 3.0)))
      assert(rows("2024-01-01 00:10:00.0") == ((1L, 2.0)))
    } finally q.stop()
  }

  test("streamingPsi scores each window against the frozen reference") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    // reference: uniform over [0, 10) in 2 bins → shares (0.5, 0.5)
    val psi = StreamingOps.streamingPsi(
      input.toDF().toDF("ts", "v"), "ts", "v",
      lo = 0.0, width = 5.0, refShares = Array(0.5, 0.5),
      windowDur = "10 minutes", watermark = "1 hour")
    val q = psi.writeStream.format("memory")
      .queryName("sp").outputMode("update").start()
    try {
      // window 1 mirrors the reference (2 low + 2 high); window 2 is all
      // high-bin mass — drifted
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:01:00"), 1.0),
        (Timestamp.valueOf("2024-01-01 00:02:00"), 2.0),
        (Timestamp.valueOf("2024-01-01 00:03:00"), 7.0),
        (Timestamp.valueOf("2024-01-01 00:04:00"), 8.0),
        (Timestamp.valueOf("2024-01-01 00:11:00"), 9.0),
        (Timestamp.valueOf("2024-01-01 00:12:00"), 9.5))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start, psi, n FROM sp")
        .collect().map(r => r.getTimestamp(0).toString -> ((r.getDouble(1), r.getLong(2))))
        .toMap
      val balanced = rows("2024-01-01 00:00:00.0")
      assert(balanced._2 == 4L && math.abs(balanced._1) < 1e-9)
      val drifted = rows("2024-01-01 00:10:00.0")
      // all mass in bin 1 vs (0.5, 0.5): (eps-0.5)ln(eps/0.5)+(1-0.5)ln(2)
      assert(drifted._2 == 2L && drifted._1 > 0.25)
    } finally q.stop()
  }

  test("streamingScoreDrift: in-distribution window ~0, shifted window " +
      "alerts; reference matches the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // model: score = sigmoid(x1 - 1) — features (1.0 bias, x1)
    val w = Array(-1.0, 1.0)
    // training snapshot: x1 ∈ {0, 2} evenly → scores {σ(-1)≈0.27, σ(1)≈0.73}
    val train = Seq(Array(1.0, 0.0), Array(1.0, 2.0), Array(1.0, 0.0),
      Array(1.0, 2.0)).toDF("x")
    val ref = StreamingOps.scoreShares(train, "x", w, bins = 4)
    assert(math.abs(ref.sum - 1.0) < 1e-12)
    assert(ref.toSeq == Seq(0.0, 0.5, 0.5, 0.0)) // 0.27 → bin 1, 0.73 → bin 2
    val input = MemoryStream[(Timestamp, Double)]
    val drift = StreamingOps.streamingScoreDrift(
      input.toDF().toDF("ts", "x1")
        .withColumn("x", array(lit(1.0), col("x1"))),
      "ts", "x", w, ref, windowDur = "10 minutes")
    val q = drift.writeStream.format("memory")
      .queryName("sd").outputMode("update").start()
    try {
      input.addData(
        // window 1: the training mix — no drift
        (Timestamp.valueOf("2024-01-01 00:01:00"), 0.0),
        (Timestamp.valueOf("2024-01-01 00:02:00"), 2.0),
        (Timestamp.valueOf("2024-01-01 00:03:00"), 0.0),
        (Timestamp.valueOf("2024-01-01 00:04:00"), 2.0),
        // window 2: saturated-high inputs the scorer never saw
        (Timestamp.valueOf("2024-01-01 00:11:00"), 9.0),
        (Timestamp.valueOf("2024-01-01 00:12:00"), 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start, psi, n FROM sd")
        .collect().map(r => r.getTimestamp(0).toString ->
          ((r.getDouble(1), r.getLong(2)))).toMap
      val ok = rows("2024-01-01 00:00:00.0")
      assert(ok._2 == 4L && math.abs(ok._1) < 1e-9)
      val bad = rows("2024-01-01 00:10:00.0")
      assert(bad._2 == 2L && bad._1 > 0.25)
    } finally q.stop()
  }

  test("sessionCounts groups events into gap-based sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = StreamingOps.sessionCounts(
      input.toDF().toDF("ts", "user_id"), "ts", "user_id", gap = "30 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("ss").outputMode("complete").start()
    try {
      input.addData(
        (ts("2026-01-01 10:00:00"), 7L), (ts("2026-01-01 10:10:00"), 7L),
        (ts("2026-01-01 12:00:00"), 7L))
      q.processAllAvailable()
      val r = spark.sql("SELECT n_events FROM ss ORDER BY session_window.start")
        .collect().map(_.getLong(0)).toSeq
      assert(r == Seq(2L, 1L)) // two sessions: gap > 30 min
    } finally q.stop()
  }

  test("decontaminateStream drops benchmark-overlapping docs, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("the cat sat on the mat today").toDF("btext")
    val input = MemoryStream[(Long, String)]
    val clean = graft.pipeline.Decontaminate.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), "text", bench, "btext", n = 5)
    val q = clean.writeStream.format("memory")
      .queryName("dc").outputMode("append").start()
    try {
      input.addData(
        (1L, "the cat sat on the mat and then left"), // overlaps
        (2L, "totally unrelated stream document here"),
        (3L, "another clean one without benchmark grams"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM dc ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(2L, 3L))
      // batch parity: the same membership rule on a batch frame; the
      // null-text row must be dropped without an NPE even if the
      // optimizer evaluates the udf before the isNotNull conjunct
      // (ADVICE r3: null handled inside the udf)
      val batch = Seq((1L, Some("the cat sat on the mat and then left")),
        (2L, Some("totally unrelated stream document here")),
        (3L, Option.empty[String])).toDF("doc_id", "text")
      val b = graft.pipeline.Decontaminate.decontaminateStream(
        batch, "text", bench, "btext", n = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(b == Seq(2L))
    } finally q.stop()
  }

  test("bloomNewRows composes with a stream: stateless new-content screen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the standing corpus is batch; the filter is a broadcast-bloom map,
    // so the streaming side needs no state, watermark, or join
    val corpus = (1L to 100L).map(i => (i, i * 13L)).toDF("id", "key")
    val input = MemoryStream[(Long, Long)]
    val screened = graft.pipeline.Dedup.bloomNewRows(
      input.toDF().toDF("id", "key"), corpus, "key",
      expectedItems = 1000L, fpp = 1e-6)
    val q = screened.writeStream.format("memory")
      .queryName("bloomed").outputMode("append").start()
    try {
      input.addData((1L, 13L), (2L, 50 * 13L), (3L, 5000L), (4L, 7001L))
      q.processAllAvailable()
      val kept = spark.sql("SELECT id FROM bloomed ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(3L, 4L)) // corpus keys 13 and 650 never survive
    } finally q.stop()
  }

  test("temperatureSampleWith streams against a static profile, row-parity with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // shares come from the STATIC profile; the per-row decision is the
    // deterministic hash, so stream and batch agree row-for-row
    val profile = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val input = MemoryStream[(Long, String)]
    val sampled = graft.pipeline.Sampling.temperatureSampleWith(
      input.toDF().toDF("doc_id", "source"), profile, "doc_id", "source",
      alpha = 0.5, scale = 0.1, seed = 3)
    val q = sampled.writeStream.format("memory")
      .queryName("ts_stream").outputMode("append").start()
    try {
      val batchRows = (1L to 1000L)
        .map(i => (i, if (i <= 900) "big" else "small"))
      input.addData(batchRows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM ts_stream")
        .collect().map(_.getLong(0)).toSet
      val batchKept = graft.pipeline.Sampling.temperatureSample(
        batchRows.toDF("doc_id", "source"), "doc_id", "source",
        alpha = 0.5, scale = 0.1, seed = 3)
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept && streamed.nonEmpty)
      // self-aggregation on a stream is still (correctly) rejected
      intercept[Exception] {
        val bad = graft.pipeline.Sampling.temperatureSample(
          input.toDF().toDF("doc_id", "source"), "doc_id", "source",
          alpha = 0.5, scale = 0.1, seed = 3)
        val qq = bad.writeStream.format("memory")
          .queryName("ts_reject").outputMode("append").start()
        try qq.processAllAvailable() finally qq.stop()
      }
    } finally q.stop()
  }

  test("streamingLocf fills within a batch like the batch op and carries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.LocfRow]
    val filled = StreamingOps.streamingLocf(input.toDS())
    val q = filled.writeStream.format("memory")
      .queryName("locf").outputMode("update").start()
    try {
      // batch 1: out-of-order arrival within the batch is sorted by
      // (ts, tie) before filling — 'a' ts=30 null fills from ts=20
      input.addData(
        StreamingOps.LocfRow("a", 30L, 3L, None),
        StreamingOps.LocfRow("a", 20L, 2L, Some(5.0)),
        StreamingOps.LocfRow("a", 10L, 1L, None),
        StreamingOps.LocfRow("b", 10L, 4L, Some(9.0)))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT key, ts, value FROM locf").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
      assert(b1(("a", 10L)) == null) // before the key's first observation
      assert(b1(("a", 30L)) == 5.0)
      // batch parity: same rows through the batch operator
      val batchGot = graft.events.Rolling.locfFill(
          Seq(("a", 30L, 3L, Option.empty[Double]),
            ("a", 20L, 2L, Some(5.0)), ("a", 10L, 1L, None),
            ("b", 10L, 4L, Some(9.0))).toDF("key", "ts", "tie", "value"),
          Seq("key"), "ts", "value", "tie")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
      assert(b1 == batchGot)
      // batch 2: the carry survives the batch boundary
      input.addData(StreamingOps.LocfRow("a", 40L, 5L, None),
        StreamingOps.LocfRow("b", 20L, 6L, None))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT key, ts, value FROM locf WHERE ts >= 40 OR key = 'b' AND ts = 20")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(b2(("a", 40L)) == 5.0 && b2(("b", 20L)) == 9.0)
    } finally q.stop()
  }

  test("streamingEwma: in-batch (ts, tie) order, carry across batches, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.EwmaRow]
    val sm = StreamingOps.streamingEwma(input.toDS(), alpha = 0.5)
    val q = sm.writeStream.format("memory")
      .queryName("sewma").outputMode("update").start()
    try {
      // batch 1 arrives out of order; the op must fold 10 -> 20 -> 30
      input.addData(
        StreamingOps.EwmaRow("a", 30L, 3L, 30.0),
        StreamingOps.EwmaRow("a", 10L, 1L, 10.0),
        StreamingOps.EwmaRow("a", 20L, 2L, 20.0),
        StreamingOps.EwmaRow("b", 10L, 4L, 7.0))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT tie, ewma FROM sewma").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(b1(1L) === 10.0)
      assert(b1(2L) === 15.0)
      assert(b1(3L) === 22.5)
      assert(b1(4L) === 7.0)
      // batch parity with the batch operator on the same rows
      val batchGot = graft.events.Rolling.ewma(
          Seq(("a", 30L, 3L, 30.0), ("a", 10L, 1L, 10.0),
            ("a", 20L, 2L, 20.0), ("b", 10L, 4L, 7.0))
            .toDF("key", "tss", "tie", "v")
            .withColumn("ts", col("tss").cast("timestamp")),
          Seq("key"), "ts", "tie", "v", 0.5)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(b1 === batchGot)
      // batch 2: the smoothed value carries over the boundary
      input.addData(StreamingOps.EwmaRow("a", 40L, 5L, 0.0))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT tie, ewma FROM sewma WHERE tie = 5")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(b2(5L) === 0.5 * 0.0 + 0.5 * 22.5)
    } finally q.stop()
  }

  test("streamingHolt: batch parity bit-exact in one batch, level+trend " +
      "carry across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.EwmaRow]
    val sm = StreamingOps.streamingHolt(input.toDS(), alpha = 0.4,
      beta = 0.3)
    val q = sm.writeStream.format("memory")
      .queryName("sholt").outputMode("update").start()
    try {
      val rows = Seq(("a", 10L, 1L, 10.0), ("a", 20L, 2L, 12.0),
        ("a", 30L, 3L, 11.0), ("b", 10L, 4L, 5.0))
      input.addData(rows.map(r =>
        StreamingOps.EwmaRow(r._1, r._2, r._3, r._4)): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT tie, level, trend, forecast FROM sholt")
        .collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).toMap
      val batch = graft.events.TimeSeries.holtLinear(
          rows.toDF("key", "tss", "tie", "v")
            .withColumn("ts", col("tss").cast("timestamp")),
          Seq("key"), "ts", "tie", "v", alpha = 0.4, beta = 0.3)
        .collect()
        .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toMap
      assert(got === batch) // bit-exact parity
      // batch 2: level AND trend carry across the boundary
      input.addData(StreamingOps.EwmaRow("a", 40L, 5L, 11.0))
      q.processAllAvailable()
      val (l3, b3, _) = got(3L)
      val lNew = 0.4 * 11.0 + 0.6 * (l3 + b3)
      val bNew = 0.3 * (lNew - l3) + 0.7 * b3
      val b2 = spark.sql("SELECT level, trend FROM sholt WHERE tie = 5")
        .head()
      assert(b2.getDouble(0) == lNew && b2.getDouble(1) == bNew)
    } finally q.stop()
  }

  test("streamingCusum: batch parity bit-exact; one-sided sums carry " +
      "and alarm across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.EwmaRow]
    val sm = StreamingOps.streamingCusum(input.toDS(), target = 5.0,
      slack = 0.5, h = 6.0)
    val q = sm.writeStream.format("memory")
      .queryName("scusum").outputMode("update").start()
    try {
      val rows = Seq(("a", 10L, 1L, 9.0), ("a", 20L, 2L, 9.0),
        ("a", 30L, 3L, 4.0), ("b", 10L, 4L, 1.0))
      input.addData(rows.map(r =>
        StreamingOps.EwmaRow(r._1, r._2, r._3, r._4)): _*)
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT tie, cusumHi, cusumLo, alarm FROM scusum")
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
      val batch = graft.events.TimeSeries.cusum(
          rows.toDF("key", "tss", "tie", "v")
            .withColumn("ts", col("tss").cast("timestamp")),
          Seq("key"), "ts", "tie", "v", target = 5.0, slack = 0.5,
          h = 6.0)
        .collect().map(r => r.getLong(1) ->
          (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
      assert(got === batch) // bit-exact parity
      assert(got(2L)._3) // hi = 3.5 + 3.5 = 7 > 6 -> alarm
      // batch 2: the positive sum carries (3.5+3.5-1.5=5.5 after 4.0
      // row) and one more high row re-alarms
      input.addData(StreamingOps.EwmaRow("a", 40L, 5L, 6.5))
      q.processAllAvailable()
      val b2 = spark.sql(
        "SELECT cusumHi, alarm FROM scusum WHERE tie = 5").head()
      assert(b2.getDouble(0) == 5.5 + (6.5 - 5.5) && b2.getBoolean(1))
    } finally q.stop()
  }

  test("streamingZscore: pre-update baseline, warm-up None, state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.ZRow]
    val sz = StreamingOps.streamingZscore(input.toDS(), threshold = 2.0)
    val q = sz.writeStream.format("memory")
      .queryName("szsc").outputMode("update").start()
    try {
      input.addData(
        StreamingOps.ZRow("a", 10L, 1L, 10.0),
        StreamingOps.ZRow("a", 20L, 2L, 12.0),
        StreamingOps.ZRow("a", 30L, 3L, 14.0),
        StreamingOps.ZRow("a", 40L, 4L, 100.0))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT tie, z, isAnomaly FROM szsc").collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            r.getBoolean(2)))).toMap
      assert(b1(1L) === ((None, false)))
      assert(b1(2L) === ((None, false))) // one prior event: no variance
      // prior state {10, 12}: mean 11, sd sqrt(2)
      assert(b1(3L)._1.exists(z =>
        math.abs(z - (14.0 - 11.0) / math.sqrt(2.0)) < 1e-12))
      assert(b1(4L)._1.exists(_ > 2.0) && b1(4L)._2)
      // batch 2: the Welford state carried over (now includes the burst)
      input.addData(StreamingOps.ZRow("a", 50L, 5L, 12.0))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT tie, isAnomaly FROM szsc WHERE tie = 5")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(b2(5L) === false) // wide post-burst sd: 12 is ordinary
    } finally q.stop()
  }

  test("streamingRobustZscore: pre-update sketch baseline, burst does " +
      "not mask the next burst, state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.ZRow]
    val sz = StreamingOps.streamingRobustZscore(input.toDS(),
      lo = 0.0, hi = 1000.0, bins = 1000, threshold = 3.5)
    val q = sz.writeStream.format("memory")
      .queryName("srz").outputMode("update").start()
    try {
      // baseline 10,10,10,12 then a 900 burst, then a 200 burst: the
      // ROBUST baseline still flags 200 (median/IQR ignore the 900;
      // a Welford baseline's sd would have exploded)
      val rows = Seq(("a", 10L, 1L, 10.0), ("a", 20L, 2L, 10.0),
        ("a", 30L, 3L, 10.0), ("a", 40L, 4L, 12.0),
        ("a", 50L, 5L, 900.0))
      input.addData(rows.map(r =>
        StreamingOps.ZRow(r._1, r._2, r._3, r._4)): _*)
      q.processAllAvailable()
      input.addData(StreamingOps.ZRow("a", 60L, 6L, 200.0))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT tie, median, iqr, z, isAnomaly FROM srz").collect()
        .map(r => r.getLong(0) -> r).toMap
      // warm-up: < 4 prior events -> null z, never flagged
      assert(got(1L).isNullAt(3) && !got(1L).getBoolean(4))
      assert(got(4L).isNullAt(3) && !got(4L).getBoolean(4))
      // the 900 burst scores against {10,10,10,12}: IQR bound by the
      // sketch cell width (cells are 1-wide, all mass in 2 cells)
      assert(got(5L).getBoolean(4), "first burst must flag")
      // driver replay with the SAME sketch ops = exact parity
      val ref = new graft.agg.CountHist.Sketch(0.0, 1000.0, 1000)
      Seq(10.0, 10.0, 10.0, 12.0, 900.0).foreach(ref.add)
      val expMed = ref.quantile(0.5)
      val expIqr = ref.quantile(0.75) - ref.quantile(0.25)
      val r6 = got(6L)
      assert(r6.getDouble(1) == expMed && r6.getDouble(2) == expIqr)
      val expZ = (200.0 - expMed) / (0.7413 * expIqr)
      assert(math.abs(r6.getDouble(3) - expZ) < 1e-12)
      assert(r6.getBoolean(4), "second burst flags despite the first " +
        "being in-state — the robust baseline is not masked")
    } finally q.stop()
  }

  test("windowedQuantiles: sketch merges across micro-batches, equals batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val wq = StreamingOps.windowedQuantiles(
      input.toDF().toDF("ts", "v"), "ts", "v",
      lo = 0.0, hi = 100.0, bins = 50, ps = Seq(0.5, 0.9),
      windowDur = "1 hour", watermark = "2 hours")
    val q = wq.writeStream.format("memory")
      .queryName("wq").outputMode("complete").start()
    try {
      def at(min: Int) = ts(f"2026-01-01 10:${min % 60}%02d:00")
      // one window, TWO batches (forces a state-store merge), plus
      // out-of-range spill on both sides
      val batch1 = (0 until 300).map(i => (at(i % 60), (i * 53 % 1000) / 10.0))
      val batch2 = (300 until 600).map(i => (at(i % 60), (i * 53 % 1000) / 10.0)) ++
        Seq((at(5), -3.0), (at(6), 250.0))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val r = spark.sql("SELECT n, below, above, quantiles FROM wq " +
        "WHERE window.start = '2026-01-01 10:00:00'").head()
      assert(r.getLong(0) == 600L)
      assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
      // parity: the streamed window equals the batch sketch on its rows
      val sk = new graft.agg.CountHist.Sketch(0.0, 100.0, 50)
      (batch1 ++ batch2).foreach { case (_, v) => sk.add(v) }
      val qs = r.getSeq[Double](3)
      assert(qs == Seq(sk.quantile(0.5), sk.quantile(0.9)))
    } finally q.stop()
  }

  test("streamingDebounce: burst collapses to its head, state crosses batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.DebounceRow]
    val kept = StreamingOps.streamingDebounce(input.toDS(), minGapUs = 10L)
    val q = kept.writeStream.format("memory")
      .queryName("debounce").outputMode("update").start()
    try {
      // batch 1: a burst at 0,4,8,12 — last-SURVIVOR debounce keeps 0
      // (head) and 12 (first event >= 10 after the last KEPT one); the
      // batch predecessor-gap form would keep only 0 (every raw gap is
      // 4) — this row is exactly the semantic difference
      input.addData(
        StreamingOps.DebounceRow("a", 12L, 4L),
        StreamingOps.DebounceRow("a", 0L, 1L),
        StreamingOps.DebounceRow("a", 4L, 2L),
        StreamingOps.DebounceRow("a", 8L, 3L),
        StreamingOps.DebounceRow("b", 5L, 5L))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT key, ts FROM debounce").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(b1 == Set(("a", 0L), ("a", 12L), ("b", 5L)))
      // batch 2: last-kept = 12 carries over — 20 is only 8 later
      // (dropped), 25 is 13 later (kept)
      input.addData(StreamingOps.DebounceRow("a", 20L, 6L),
        StreamingOps.DebounceRow("a", 25L, 7L))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT key, ts FROM debounce WHERE ts >= 20")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(b2 == Set(("a", 25L)))
    } finally q.stop()
  }
}
