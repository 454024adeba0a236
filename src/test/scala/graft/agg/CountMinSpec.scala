package graft.agg

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private def zipfStream(n: Int, types: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val w = (0 until types).map(i => 1.0 / (i + 1))
    val total = w.sum
    val cum = w.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      s"t${cum.indexWhere(u <= _)}"
    }
  }

  /** Brute-force reference: per row, sum exact counts of every token
    * colliding into the query token's cell; estimate = min over rows. */
  private def refEstimate(exact: Map[String, Long], depth: Int, width: Int,
                          token: String): Long =
    (0 until depth).map { r =>
      val c = CountMin.cell(r, token, width)
      exact.collect {
        case (t, n) if CountMin.cell(r, t, width) == c => n
      }.sum
    }.min

  test("cell: md5 basis matches an independent computation and spreads") {
    // independent recomputation of the documented formula
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("2:spark".getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"${b & 0xff}%02x").mkString
    val h = java.lang.Long.parseUnsignedLong(hex, 16)
    assert(CountMin.cell(2, "spark", 512) ==
      java.lang.Long.remainderUnsigned(h, 512L).toInt)
    // different rows decorrelate the same token
    val cells = (0 until 8).map(r => CountMin.cell(r, "spark", 1 << 20))
    assert(cells.distinct.size >= 7)
  }

  test("Sketch: estimate equals the brute-force cell-collision reference") {
    val stream = zipfStream(4000, 300, seed = 11)
    val exact = stream.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val sk = new CountMin.Sketch(3, 64) // narrow width → real collisions
    stream.foreach(sk.add(_, 1L))
    exact.keys.foreach { t =>
      assert(sk.estimate(t) == refEstimate(exact, 3, 64, t),
        s"estimate of $t diverges from the collision reference")
    }
  }

  test("Sketch: one-sided error — estimate >= exact, always") {
    val stream = zipfStream(6000, 500, seed = 12)
    val exact = stream.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val sk = new CountMin.Sketch(4, 256)
    stream.foreach(sk.add(_, 1L))
    exact.foreach { case (t, c) =>
      assert(sk.estimate(t) >= c, s"undercount of $t: ${sk.estimate(t)} < $c")
    }
    assert(sk.totalCount == stream.size.toLong)
  }

  test("Sketch: merge == sketch of concatenated stream; weighted add == repeated add") {
    val s1 = zipfStream(2000, 100, seed = 13)
    val s2 = zipfStream(3000, 100, seed = 14)
    val a = new CountMin.Sketch(4, 128); s1.foreach(a.add(_, 1L))
    val b = new CountMin.Sketch(4, 128); s2.foreach(b.add(_, 1L))
    val whole = new CountMin.Sketch(4, 128); (s1 ++ s2).foreach(whole.add(_, 1L))
    a.merge(b)
    assert(a.counters.sameElements(whole.counters))
    val w1 = new CountMin.Sketch(2, 32); w1.add("x", 5L)
    val w2 = new CountMin.Sketch(2, 32); (1 to 5).foreach(_ => w2.add("x", 1L))
    assert(w1.counters.sameElements(w2.counters))
  }

  test("sketchTokens: distributed pass over 8 partitions matches a local sketch") {
    val spark0 = spark
    import spark0.implicits._
    val stream = zipfStream(5000, 400, seed = 15)
    val local = new CountMin.Sketch(3, 128); stream.foreach(local.add(_, 1L))
    val dist = CountMin.sketchTokens(
      spark.createDataset(stream).repartition(8), 3, 128)
    assert(dist.counters.sameElements(local.counters))
  }

  test("cmsEstimates: est >= cnt on the documents fixture; estimateFor agrees") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = CountMin.cmsEstimates(docs, "doc_id", "text",
      depth = 3, width = 512, minCount = 5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: est ${r.getLong(2)} < cnt ${r.getLong(1)}")
    }
    val sk = CountMin.sketchText(docs, "text", depth = 3, width = 512)
    implicit val s = spark
    val some = out.take(5).map(_.getString(0)).toSeq
    val viaFor = CountMin.estimateFor(sk, some).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.take(5).foreach { r =>
      assert(viaFor(r.getString(0)) == r.getLong(2))
    }
  }

  test("persisted sketch: write/read roundtrip; append == sketch of the union") {
    val spark0 = spark
    import spark0.implicits._
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("cms").toString + "/sk"
    val s1 = zipfStream(2000, 150, seed = 21)
    val s2 = zipfStream(1500, 150, seed = 22)
    val sk1 = CountMin.sketchTokens(spark.createDataset(s1), 3, 128)
    CountMin.write(sk1, dir)
    val back = CountMin.read(dir)
    assert(back.depth == 3 && back.width == 128 &&
      back.counters.sameElements(sk1.counters))
    CountMin.append(spark.createDataset(s2).toDF("t"), "t", dir)
    val merged = CountMin.read(dir)
    val whole = new CountMin.Sketch(3, 128)
    (s1 ++ s2).foreach(whole.add(_, 1L))
    assert(merged.counters.sameElements(whole.counters))
  }

  test("sketchTokens: empty input yields the zero sketch") {
    val spark0 = spark
    import spark0.implicits._
    val sk = CountMin.sketchTokens(spark.emptyDataset[String], 3, 64)
    assert(sk.counters.forall(_ == 0L) && sk.totalCount == 0L)
  }
}
