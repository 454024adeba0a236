package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Ad-hoc stage decomposition for the query under diagnosis (scratch —
  * contents change per investigation). Currently: interleaved same-JVM
  * A/B of RangeCum's InternalRow rewrite vs the previous Row-boxed
  * two-pass implementation (inlined below as RangeCumRowAB), on the two
  * shapes the engine actually feeds it: a global continuous-value cell
  * frame (l_extendedprice: distinct ≈ n, the Mann-Whitney/conformal/
  * wasserstein shape) and a keyed strata cell frame (the
  * SortedQuantiles (keys, __qc) shape). Interleaving inside one JVM is
  * the only honest comparison on this container (idle best-of-N across
  * JVMs drifted 25% on identical code within an hour).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.util.CacheRegistry.clear()
      System.gc()
    }

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // global continuous shape: ~distinct-per-row cells
    def cellsGlobal = li
      .groupBy(col("l_extendedprice").cast("double").as("__v"))
      .agg(count(lit(1)).cast("double").as("__c"))
    // keyed strata shape: (returnflag, linestatus) strata over quantity
    def cellsKeyed = li
      .groupBy(col("l_returnflag").as("k1"), col("l_linestatus").as("k2"),
        col("l_quantity").cast("double").as("__v"))
      .agg(count(lit(1)).cast("double").as("__c"))

    def runOne(tag: String, impl: String): Double = {
      clearAll()
      val t0 = System.nanoTime()
      val out = (tag, impl) match {
        case ("global", "new") =>
          graft.util.RangeCum.cumSum(cellsGlobal, Nil, "__v", Seq("__c"))
        case ("global", "old") =>
          RangeCumRowAB.cumSum(cellsGlobal, Nil, "__v", Seq("__c"))
        case ("keyed", "new") =>
          graft.util.RangeCum.cumSum(cellsKeyed, Seq("k1", "k2"), "__v", Seq("__c"))
        case ("keyed", "old") =>
          RangeCumRowAB.cumSum(cellsKeyed, Seq("k1", "k2"), "__v", Seq("__c"))
        case _ => sys.error("bad tag")
      }
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // --- q_payload_dedup anatomy (args(1) == "payload") ----------------
    // Splits the row into UDF-only (PNG encode per row) vs the full
    // group-by-binary dedup, to localize the sf10d variance.
    if (args.length > 1 && args(1) == "payload") {
      def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pngOf = udf((id: Long) =>
        graft.pipeline.Multimodal.syntheticPng(id % 50))
      def payloads = docs.na.drop(Seq("doc_id")).select(col("doc_id"))
        .withColumn("payload", pngOf(col("doc_id")))
      def timeIt(name: String)(body: => Unit): Unit = {
        val ts = (1 to 3).map { _ =>
          clearAll()
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-22s best=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      timeIt("a_udf_only") {
        payloads.write.format("noop").mode("overwrite").save()
      }
      timeIt("b_full_dedup") {
        graft.pipeline.Multimodal.payloadDedup(payloads, "doc_id", "payload")
          .select("keep_id", "dup_count").orderBy("keep_id")
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop(); return
    }

    // --- hashEmbed wide-dim crossover probe (args(1) == "hashdim") -----
    // Times the two cell-sum shapes of TextAnalysis.hashEmbed (pivoted
    // one-aggregate vs two-stage collect_list) at several dims, same
    // expressions as the operator, interleaved in one JVM — evidence for
    // the dim<=512 cutoff (r14 VERDICT #6).
    if (args.length > 1 && args(1) == "hashdim") {
      def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def cellsFor(dim: Int) = {
        val tok = docs.na.drop(Seq("doc_id", "text"))
          .select(col("doc_id").as("__graft_id"),
            explode(graft.pipeline.TextAnalysis.tokens(col("text")))
              .as("__graft_token"))
          .filter(col("__graft_token") =!= "")
          .select(col("__graft_id"),
            md5(col("__graft_token")).as("__graft_md5"))
        val md5c = col("__graft_md5")
        val idx = pmod(conv(substring(md5c, 1, 15), 16, 10).cast("long"),
          lit(dim.toLong)).cast("int")
        val sgn = when(
          conv(substring(md5c, 16, 1), 16, 10).cast("long") % 2 === 0,
          lit(1.0)).otherwise(lit(-1.0))
        tok.select(col("__graft_id"), idx.as("__graft_idx"),
          sgn.as("__graft_sgn"))
      }
      def pivot(dim: Int) = {
        val aggs = (0 until dim).map(i =>
          sum(when(col("__graft_idx") === i, col("__graft_sgn")))
            .as(s"__graft_c$i"))
        cellsFor(dim).groupBy("__graft_id").agg(aggs.head, aggs.tail: _*)
          .select(col("__graft_id"),
            array((0 until dim).map(i =>
              coalesce(col(s"__graft_c$i"), lit(0.0))): _*).as("__graft_raw"))
      }
      def twoStage(dim: Int) =
        cellsFor(dim).groupBy("__graft_id", "__graft_idx")
          .agg(sum("__graft_sgn").as("__graft_v"))
          .groupBy("__graft_id")
          .agg(map_from_entries(collect_list(
            struct(col("__graft_idx"), col("__graft_v")))).as("__graft_m"))
          .select(col("__graft_id"),
            transform(sequence(lit(0), lit(dim - 1)),
              i => coalesce(element_at(col("__graft_m"), i), lit(0.0)))
              .as("__graft_raw"))
      val dims = if (args.length > 2) args(2).split(",").map(_.toInt)
        else Array(256, 512, 1024, 2048)
      dims.foreach { dim =>
        def time(df: => org.apache.spark.sql.DataFrame): Double = {
          clearAll()
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        time(pivot(dim)); time(twoStage(dim)) // warm both
        val p = (1 to 2).map(_ => time(pivot(dim))).min
        val t = (1 to 2).map(_ => time(twoStage(dim))).min
        println(f"dim=$dim%5d pivot=$p%.2fs twoStage=$t%.2fs")
      }
      spark.stop(); return
    }

    // --- q_cc_update job decomposition (args(1) == "ccjobs") -----------
    // Counts Spark jobs + wall seconds for (a) the eager part of
    // updateComponents (labels fold + sub-CC) and (b) the final action,
    // isolating the fixed job-count overhead the r14 verdict named.
    if (args.length > 1 && args(1) == "ccjobs") {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        })
      def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val rounds = if (args.length > 2) args(2).toInt else 3
      (1 to rounds).foreach { round =>
        clearAll()
        val pairs = graft.pipeline.Dedup
          .ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
          .select("id_a", "id_b").cache()
        val base = pairs.filter((col("id_a") + col("id_b")) % 2 === 0)
        val batch = pairs.filter((col("id_a") + col("id_b")) % 2 =!= 0)
        val labels = graft.pipeline.Components.connectedComponents(base)
        Thread.sleep(200) // let listener events drain
        val j0 = jobs.get(); val t0 = System.nanoTime()
        val upd = graft.pipeline.Components.updateComponents(labels, batch)
        Thread.sleep(200)
        val j1 = jobs.get(); val t1 = System.nanoTime()
        upd.orderBy("id").write.format("noop").mode("overwrite").save()
        Thread.sleep(200)
        val j2 = jobs.get(); val t2 = System.nanoTime()
        println(f"round $round: eager fold jobs=${j1 - j0} " +
          f"sec=${(t1 - t0) / 1e9}%.2f; action jobs=${j2 - j1} " +
          f"sec=${(t2 - t1) / 1e9}%.2f")
      }
      spark.stop(); return
    }

    // --- q_curation_funnel_substr anatomy (args(1) == "funnel") --------
    if (args.length > 1 && args(1) == "funnel") {
      def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def timeIt(name: String, runs: Int = 2)(body: => Unit): Unit = {
        clearAll(); body
        val ts = (1 to runs).map { _ =>
          clearAll()
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      import graft.pipeline._
      val idC = "doc_id"; val txt = "text"
      def input = docs.na.drop(Seq(idC, txt))
      def minw = input.filter(TextAnalysis.tokenCount(col(txt)) >= 30)
      def deduped = Dedup.exact(minw, idC, txt)
      timeIt("a_count_input") { input.agg(count(lit(1))).collect() }
      timeIt("b_count_minw") { minw.agg(count(lit(1))).collect() }
      timeIt("c_count_dedup") { deduped.agg(count(lit(1))).collect() }
      timeIt("d_substr_pipeline") {
        SubstringDedup.removeRepeatedSubstrings(deduped, idC, txt, 60)
          .write.format("noop").mode("overwrite").save()
      }
      timeIt("e_substr_persist_cnt") {
        val a = SubstringDedup.removeRepeatedSubstrings(deduped, idC, txt, 60)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.agg(count(lit(1))).collect(); a.unpersist(); ()
      }
      timeIt("f_decont_on_persisted") {
        val bench = docs.filter(col(idC) % 97 === 0)
        val a = SubstringDedup.removeRepeatedSubstrings(deduped, idC, txt, 60)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.agg(count(lit(1))).collect()
        val c = Decontaminate.decontaminate(a, idC, txt, bench, txt, n = 4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.agg(count(lit(1))).collect()
        a.unpersist(); c.unpersist(); ()
      }
      timeIt("g_full_funnel") {
        val bench = docs.filter(col(idC) % 97 === 0)
        Curate.funnel(docs, idC, txt, bench, minWords = 30,
            valFraction = 0.15, testFraction = 0.1, seed = 7,
            substrMinLen = 60)
          .orderBy("stage")
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop(); return
    }

    // parity check first: identical results bit-for-bit
    Seq(("global", Nil), ("keyed", Seq("k1", "k2"))).foreach { case (tag, keys) =>
      val n = runOne(tag, "new"); val o = runOne(tag, "old") // warm both paths
      val newDf = if (tag == "global")
        graft.util.RangeCum.cumSum(cellsGlobal, Nil, "__v", Seq("__c"))
      else graft.util.RangeCum.cumSum(cellsKeyed, keys, "__v", Seq("__c"))
      val oldDf = if (tag == "global")
        RangeCumRowAB.cumSum(cellsGlobal, Nil, "__v", Seq("__c"))
      else RangeCumRowAB.cumSum(cellsKeyed, keys, "__v", Seq("__c"))
      val diff = newDf.exceptAll(oldDf).count() + oldDf.exceptAll(newDf).count()
      println(s"parity $tag: exceptAll diff rows = $diff (warm new=$n old=$o)")
    }

    // interleaved rounds
    val rounds = if (args.length > 1) args(1).toInt else 5
    Seq("global", "keyed").foreach { tag =>
      val ns = scala.collection.mutable.ArrayBuffer[Double]()
      val os = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to rounds).foreach { _ =>
        ns += runOne(tag, "new")
        os += runOne(tag, "old")
      }
      def fmt(xs: Seq[Double]) =
        f"best=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f runs=${xs.map(x => f"$x%.3f").mkString(",")}"
      println(s"$tag NEW ${fmt(ns.toSeq)}")
      println(s"$tag OLD ${fmt(os.toSeq)}")
    }
    spark.stop()
  }
}

/** The pre-r14 Row-boxed RangeCum, frozen for the A/B above. */
object RangeCumRowAB {
  def cumSum(df: DataFrame, keys: Seq[String], orderCol: String,
             sumCols: Seq[String], ascending: Boolean = true,
             maxDriverEntries: Int = 4000000): DataFrame = {
    require(sumCols.nonEmpty, "RangeCum.cumSum needs at least one sum column")
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val ocol = if (ascending) col(orderCol).asc else col(orderCol).desc
    val sortCols = keys.map(col) :+ ocol
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val sumIdx = sumCols.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd
    def rowKey(r: Row): Seq[Any] = keyIdx.toSeq.map(r.get)
    def numAt(r: Row, i: Int): Double =
      if (r.isNullAt(i)) 0.0
      else r.get(i) match {
        case n: java.lang.Number => n.doubleValue()
        case b: Boolean          => if (b) 1.0 else 0.0
        case other => throw new IllegalArgumentException(
          s"RangeCum: non-numeric value $other in sum column")
      }
    val subtotals = rdd.mapPartitionsWithIndex { (pi, it) =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], Array[Double]]
      it.foreach { r =>
        val t = m.getOrElseUpdate(rowKey(r), new Array[Double](sumIdx.length))
        var i = 0
        while (i < sumIdx.length) { t(i) += numAt(r, sumIdx(i)); i += 1 }
      }
      m.iterator.map { case (k, t) => (pi, k, t) }
    }.collect()
    require(subtotals.length <= maxDriverEntries, "too many subtotals")
    val offsets: Map[Int, Map[Seq[Any], Array[Double]]] = {
      val byPart = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.Map[Seq[Any], Array[Double]]]
      subtotals.groupBy(_._2).foreach { case (k, entries) =>
        var acc = new Array[Double](sumIdx.length)
        entries.sortBy(_._1).foreach { case (pi, _, tot) =>
          byPart.getOrElseUpdate(pi,
            scala.collection.mutable.Map.empty)(k) = acc
          val next = new Array[Double](sumIdx.length)
          var i = 0
          while (i < sumIdx.length) { next(i) = acc(i) + tot(i); i += 1 }
          acc = next
        }
      }
      byPart.map { case (pi, m) => pi -> m.toMap }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(schema.fields ++
      sumCols.map(c => StructField(s"__cum_$c", DoubleType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      val partOffsets = bc.value.getOrElse(pi, Map.empty[Seq[Any], Array[Double]])
      var curKey: Seq[Any] = null
      var run: Array[Double] = null
      it.map { r =>
        val k = rowKey(r)
        if (curKey == null || k != curKey) {
          curKey = k
          run = partOffsets.getOrElse(k,
            new Array[Double](sumIdx.length)).clone()
        }
        var i = 0
        while (i < sumIdx.length) { run(i) += numAt(r, sumIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
