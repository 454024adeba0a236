package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming tier under PRODUCTION state-store conditions (r11
  * VERDICT #5): every stateful shape re-runs with
  * `RocksDBStateStoreProvider` (the provider any real deployment uses —
  * the default in-memory HDFSBackedStateStore the other specs exercise
  * never touches the RocksDB row-encoding path), and each
  * flatMapGroupsWithState state shape gets a KILL/RESTART check — stop
  * the query mid-stream, restart from the same checkpoint, and assert
  * the post-restart output could only have been produced by state that
  * survived the round-trip through checkpointed RocksDB files. A state
  * encoder that can't serialize under RocksDB, or a checkpoint format
  * mismatch, fails here and nowhere else in the suite. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Run `body` with the RocksDB provider active, restoring the session
    * default after (providerClass is read per-query at start). */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private def ckptDir(): String =
    java.nio.file.Files.createTempDirectory("rocks_ckpt").toString

  /** One batch in, stop, one batch after restart; returns the rows the
    * POST-RESTART batches emitted. The sink is foreachBatch into a
    * driver buffer (the memory sink refuses checkpoint recovery —
    * "query does not support recovering from checkpoint location");
    * the buffer is cleared at restart so whatever lands in it afterward
    * came from state restored off the checkpointed RocksDB files. */
  private def killRestart[I, T](input: MemoryStream[I], out: Dataset[T],
                                batch1: Seq[I], batch2: Seq[I]): Seq[T] =
    withRocksDb {
      val ckpt = ckptDir()
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[T]()
      def start() = out.writeStream
        .foreachBatch { (df: Dataset[T], _: Long) =>
          df.collect().foreach(sink.add)
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      val q1 = start()
      try { input.addData(batch1: _*); q1.processAllAvailable() }
      finally q1.stop()
      sink.clear()
      val q2 = start()
      try {
        input.addData(batch2: _*)
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        sink.iterator().asScala.toSeq
      } finally q2.stop()
    }

  test("runningStats (Welford) restores n/mean/m2 from a RocksDB " +
      "checkpoint across kill/restart") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val got = killRestart(input, StreamingOps.runningStats(input.toDS()),
      Seq("a" -> 1.0, "a" -> 3.0), Seq("a" -> 5.0))
    // 1,3 before the kill; 5 after: only restored state yields n=3,
    // mean=3, stddev=2 (var ((1-3)^2+(5-3)^2)/2)
    assert(got == Seq(StreamingOps.RunningStat("a", 3L, 3.0, 2.0)))
  }

  test("streamingLocf carry survives kill/restart") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.LocfRow]
    val got = killRestart(input, StreamingOps.streamingLocf(input.toDS()),
      Seq(StreamingOps.LocfRow("k", 1L, 0L, Some(42.0))),
      Seq(StreamingOps.LocfRow("k", 2L, 0L, None)))
    // the null row after restart fills from the pre-kill carry
    assert(got ==
      Seq(StreamingOps.LocfRow("k", 2L, 0L, Some(42.0))))
  }

  test("streamingDebounce lastKept survives kill/restart (post-restart " +
      "row inside the gap is dropped)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.DebounceRow]
    val got = killRestart(input,
      StreamingOps.streamingDebounce(input.toDS(), minGapUs = 100L),
      Seq(StreamingOps.DebounceRow("k", 1000L, 0L)),
      Seq(StreamingOps.DebounceRow("k", 1050L, 0L), // inside gap: dropped
        StreamingOps.DebounceRow("k", 1200L, 0L))) // past gap: kept
    assert(got == Seq(StreamingOps.DebounceRow("k", 1200L, 0L)))
  }

  test("streamingHolt level+trend survive kill/restart bit-exactly") {
    implicit val sqlCtx = spark.sqlContext
    val (alpha, beta) = (0.4, 0.3)
    val input = MemoryStream[StreamingOps.EwmaRow]
    val got = killRestart(input,
      StreamingOps.streamingHolt(input.toDS(), alpha, beta),
      Seq(StreamingOps.EwmaRow("k", 1L, 0L, 10.0),
        StreamingOps.EwmaRow("k", 2L, 0L, 12.0)),
      Seq(StreamingOps.EwmaRow("k", 3L, 0L, 14.0)))
    // replay the recursion sequentially: init (10, 0), then 12, then 14
    var (l, b) = (10.0, 0.0)
    for (v <- Seq(12.0, 14.0)) {
      val lNew = alpha * v + (1.0 - alpha) * (l + b)
      b = beta * (lNew - l) + (1.0 - beta) * b
      l = lNew
    }
    assert(got ==
      Seq(StreamingOps.HoltOut("k", 3L, 0L, l, b, l + b)))
  }

  test("streamingRobustZscore CountHist sketch state survives " +
      "kill/restart (post-restart score uses pre-kill history)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.ZRow]
    def z(ts: Long, v: Double) = StreamingOps.ZRow("k", ts, 0L, v)
    val got = killRestart(input,
      StreamingOps.streamingRobustZscore(input.toDS(), lo = 0.0,
        hi = 100.0, bins = 100),
      Seq(z(1, 10.0), z(2, 12.0), z(3, 14.0), z(4, 16.0)),
      Seq(z(5, 90.0)))
    // 4 pre-kill values -> the n >= 4 gate opens ONLY if the sketch
    // restored; the post-restart outlier must score (median/iqr defined)
    assert(got.length == 1)
    val r = got.head
    assert(r.median.isDefined && r.iqr.exists(_ > 0.0) &&
      r.z.exists(_ > 3.5) && r.isAnomaly,
      s"expected anomalous score from restored sketch state, got $r")
  }

  test("windowedQuantiles (HistCounts imperative aggregate) merges " +
      "across a kill/restart under RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    withRocksDb {
      val ckpt = ckptDir()
      val input = MemoryStream[(Timestamp, Double)]
      val wq = StreamingOps.windowedQuantiles(
          input.toDF().toDF("ts", "v"), "ts", "v",
          lo = 0.0, hi = 100.0, bins = 100, ps = Seq(0.5))
        .selectExpr("n", "quantiles[0] AS median")
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
      def startQ() = wq.writeStream
        .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.collect().foreach(r => sink.add((r.getLong(0), r.getDouble(1))))
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      val q1 = startQ()
      try {
        input.addData((1 to 50).map(i =>
          (ts("2026-01-01 10:05:00"), i.toDouble)): _*)
        q1.processAllAvailable()
      } finally q1.stop()
      sink.clear()
      val q2 = startQ()
      try {
        input.addData((51 to 100).map(i =>
          (ts("2026-01-01 10:06:00"), i.toDouble)): _*)
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val (n, median) = sink.iterator().asScala.toSeq.maxBy(_._1)
        // n=100 only if the window's sketch state merged across the
        // restart; median within the documented 2-cell bound of 50.5
        assert(n == 100L)
        assert(math.abs(median - 50.5) <= 2.0)
      } finally q2.stop()
    }
  }

  test("the non-restart streaming family also runs green under RocksDB " +
      "(dedup + EWMA + CUSUM smoke)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val in1 = MemoryStream[StreamingOps.EwmaRow]
      val e = StreamingOps.streamingEwma(in1.toDS(), alpha = 0.5)
      val q1 = e.writeStream.format("memory").queryName("rocks_ewma")
        .outputMode("update").start()
      try {
        in1.addData(StreamingOps.EwmaRow("k", 1L, 0L, 4.0),
          StreamingOps.EwmaRow("k", 2L, 0L, 8.0))
        q1.processAllAvailable()
        val last = spark.table("rocks_ewma").orderBy("ts")
          .collect().last.getDouble(3)
        assert(last == 6.0) // 0.5*8 + 0.5*4
      } finally q1.stop()
      val in2 = MemoryStream[StreamingOps.EwmaRow]
      val c = StreamingOps.streamingCusum(in2.toDS(), target = 10.0,
        slack = 1.0, h = 5.0)
      val q2 = c.writeStream.format("memory").queryName("rocks_cusum")
        .outputMode("update").start()
      try {
        in2.addData(StreamingOps.EwmaRow("k", 1L, 0L, 18.0))
        q2.processAllAvailable()
        val r = spark.table("rocks_cusum").collect().head
        assert(r.getDouble(4) == 7.0 && r.getBoolean(6)) // hi=18-11, alarm
      } finally q2.stop()
    }
  }

  // ---- stream-static index screens (r12 VERDICT #8) ------------------------
  // TextIndex.matchesStream / SubstrIndex.matchesStream are STATELESS
  // joins, so the kill/restart contract is different from the
  // flatMapGroupsWithState shapes above: nothing needs restoring except
  // the source OFFSETS — the post-restart batch must (a) process only
  // NEW data (batch-1 rows must not re-emit: offsets came back from the
  // RocksDB-provider checkpoint) and (b) see index APPENDS made while
  // the query was down. (b) requires the restart to REBUILD the screen
  // — a real restart is a new driver, which is what rebuilds here; the
  // static side's parquet file listing is captured at build time
  // (writing this spec caught the old scaladoc claiming mid-query
  // append pickup, which the experiment disproved — docs fixed).

  test("TextIndex.matchesStream under RocksDB: restart resumes offsets " +
      "and a rebuilt screen sees an index append made across the kill") {
    implicit val sqlCtx = spark.sqlContext
    val path = ckptDir() + "_textidx"
    val doc1 = "the quick brown fox jumps over the lazy dog again and again"
    val doc2 = "rocksdb checkpoint recovery keeps offsets not join state here"
    graft.pipeline.TextIndex.write(
      Seq(1L -> doc1).toDF("id", "text"), "id", "text", path)
    val input = MemoryStream[(Long, String)]
    def screen() = graft.pipeline.TextIndex.matchesStream(
        input.toDS().toDF("id", "text"), "id", "text", path)
      .select("id_a", "id_b").as[(Long, Long)]
    withRocksDb {
      val ckpt = ckptDir()
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def start(out: Dataset[(Long, Long)]) = out.writeStream
        .foreachBatch { (df: Dataset[(Long, Long)], _: Long) =>
          df.collect().foreach(sink.add)
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val q1 = start(screen())
      try { input.addData(10L -> doc1); q1.processAllAvailable() }
      finally q1.stop()
      import scala.jdk.CollectionConverters._
      assert(sink.iterator().asScala.toSet === Set(10L -> 1L))
      sink.clear()
      // grow the index WHILE THE QUERY IS DOWN; batch 2 only matches it
      graft.pipeline.TextIndex.append(
        Seq(2L -> doc2).toDF("id", "text"), "id", "text", path)
      val q2 = start(screen()) // restart = new driver = rebuilt plan
      try {
        input.addData(20L -> doc2)
        q2.processAllAvailable()
        val got = sink.iterator().asScala.toSet
        // (20, 2) = the appended doc was picked up; no (10, 1) = batch 1
        // was NOT reprocessed (offsets restored from the checkpoint)
        assert(got === Set(20L -> 2L))
      } finally q2.stop()
    }
  }

  test("SubstrIndex.matchesStream under RocksDB: restart resumes " +
      "offsets and a rebuilt screen sees an index append") {
    implicit val sqlCtx = spark.sqlContext
    val path = ckptDir() + "_substridx"
    val c1 = "AAAA-SHARED-WINDOW-ONE padding so the doc is long enough"
    val c2 = "BBBB-OTHER-WINDOW-TWO different corpus content entirely"
    graft.pipeline.SubstrIndex.write(
      Seq(1L -> c1).toDF("id", "text"), "id", "text", path, minLen = 12)
    val input = MemoryStream[(Long, String)]
    def screen() = graft.pipeline.SubstrIndex.matchesStream(
        input.toDS().toDF("id", "text"), "id", "text", path)
      .select("id", "cid").as[(Long, Long)]
    withRocksDb {
      val ckpt = ckptDir()
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def start(out: Dataset[(Long, Long)]) = out.writeStream
        .foreachBatch { (df: Dataset[(Long, Long)], _: Long) =>
          df.collect().foreach(sink.add)
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val q1 = start(screen())
      try {
        input.addData(10L -> "prefix AAAA-SHARED-WINDOW-ONE suffix")
        q1.processAllAvailable()
      } finally q1.stop()
      import scala.jdk.CollectionConverters._
      assert(!sink.isEmpty)
      assert(sink.iterator().asScala.forall(_ == (10L -> 1L)))
      sink.clear()
      graft.pipeline.SubstrIndex.append(
        Seq(2L -> c2).toDF("id", "text"), "id", "text", path)
      val q2 = start(screen())
      try {
        input.addData(20L -> "xx BBBB-OTHER-WINDOW-TWO yy")
        q2.processAllAvailable()
        val got = sink.iterator().asScala.toSet
        assert(got === Set(20L -> 2L)) // appended doc seen; batch 1 not replayed
      } finally q2.stop()
    }
  }
}
