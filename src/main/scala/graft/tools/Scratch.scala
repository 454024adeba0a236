package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition for the query under diagnosis (scratch —
  * contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))

    def benchPair(name: String)(mk: => DataFrame): Unit = {
      val pair = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        def once: Double = {
          val t0 = System.nanoTime()
          mk.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once, once)
      }
      println(f"$name%-28s benchmin=${pair.map(t => f"$t%.3f").mkString(",")}")
    }

    def timeU(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    import spark.implicits._
    def typedDocs = docsDf.na.drop(Seq("doc_id", "text"))
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
    def h64(t: String): Long = {
      val hi = scala.util.hashing.MurmurHash3.stringHash(t, 41)
      val lo = scala.util.hashing.MurmurHash3.stringHash(t, 97)
      (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
    }
    // current shape: build shingle strings, murmur-hash each
    timeU("a_shingled_strings")(typedDocs.flatMap { case (id, t) =>
      val toks = t.trim.split("\\s+")
      val out = if (toks.length < 3) Array(toks.mkString(" "))
      else {
        val seen = new scala.collection.mutable.LinkedHashSet[String]
        var i = 0
        while (i + 3 <= toks.length) {
          val sb = new StringBuilder(toks(i))
          sb.append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
          seen += sb.toString
          i += 1
        }
        seen.toArray
      }
      out.map(sh => (id, h64(sh)))
    }.toDF("i", "s").rdd.foreach(_ => ()))
    // candidate: hash tokens once, combine polynomially, dedup longs
    timeU("b_token_hash_combine")(typedDocs.flatMap { case (id, t) =>
      val toks = t.trim.split("\\s+")
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) { th(i) = h64(toks(i)); i += 1 }
      val n = 3
      if (toks.length < n) {
        var h = 1125899906842597L
        var j = 0
        while (j < th.length) { h = h * 1000003L + th(j); j += 1 }
        Iterator.single((id, h))
      } else {
        val seen = new java.util.HashSet[java.lang.Long]()
        val out = Array.newBuilder[(Long, Long)]
        var s = 0
        while (s + n <= toks.length) {
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 1000003L + th(s + j); j += 1 }
          if (seen.add(h)) out += ((id, h))
          s += 1
        }
        out.result().iterator
      }
    }.toDF("i", "s").rdd.foreach(_ => ()))

    time("c_overlap_selfjoin")(graft.pipeline.Dedup.groupOverlap(
      docsDf, "source", "text", 3))
    time("d_overlap_postings") {
      val grams = docsDf.na.drop(Seq("source", "text"))
        .select(col("source").cast("string"), col("text"))
        .as[(String, String)]
        .flatMap { case (g, t) =>
          val toks = t.trim.split("\\s+")
          val th = new Array[Long](toks.length)
          var i = 0
          while (i < toks.length) { th(i) = h64(toks(i)); i += 1 }
          val out = Array.newBuilder[(String, Long)]
          if (toks.length < 3) {
            var h = 1125899906842597L; var j = 0
            while (j < th.length) { h = h * 1000003L + th(j); j += 1 }
            out += ((g, h))
          } else {
            val seen = new java.util.HashSet[java.lang.Long]()
            var s0 = 0
            while (s0 + 3 <= toks.length) {
              var h = 1125899906842597L; var j = 0
              while (j < 3) { h = h * 1000003L + th(s0 + j); j += 1 }
              if (seen.add(h)) out += ((g, h))
              s0 += 1
            }
          }
          out.result().iterator
        }.toDF("__g", "sh")
      val postings = grams.groupBy(col("sh"))
        .agg(collect_set(col("__g")).as("gs"))
      val sizes = postings.select(explode(col("gs")).as("__g"))
        .groupBy("__g").agg(count(lit(1)).as("__sz"))
      val pairs = postings.select(col("gs"))
        .as[Seq[String]]
        .flatMap { gs =>
          val a = gs.sorted.toArray
          for { i <- a.indices.iterator; j <- (i + 1) until a.length }
            yield (a(i), a(j))
        }.toDF("group_a", "group_b")
        .groupBy("group_a", "group_b").agg(count(lit(1)).as("n_common"))
      pairs.join(broadcast(sizes.toDF("group_a", "__sza")), "group_a")
        .join(broadcast(sizes.toDF("group_b", "__szb")), "group_b")
        .select(col("group_a"), col("group_b"), col("n_common"),
          (col("n_common") / (col("__sza") + col("__szb") - col("n_common")))
            .as("jaccard"))
    }
    spark.stop()
  }
}
