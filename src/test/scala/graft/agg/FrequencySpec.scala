package graft.agg

import scala.util.Random

import graft.SparkSpec
import graft.expr.MisraGries
import org.apache.spark.sql.functions._

class FrequencySpec extends SparkSpec {

  // Zipf-ish random stream: item i drawn with weight 1/(i+1)
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

  test("MGBuf: single-stream sketch keeps every item above n/(k+1) with bounded undercount") {
    val stream = zipfStream(5000, 200, seed = 1)
    val exact = stream.groupBy(identity).map { case (i, v) => i -> v.size.toLong }
    val k = 20
    val buf = new graft.expr.MGBuf(k)
    stream.foreach(buf.add)
    val bound = stream.size.toDouble / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > bound)
        assert(buf.counts.contains(item), s"$item (count $c > bound $bound) must survive")
    }
    buf.counts.foreach { case (item, est) =>
      val c = exact(item)
      assert(est <= c, s"MG estimate must be a lower bound: $item $est > $c")
      assert(c - est <= bound, s"undercount of $item exceeds n/(k+1): $c - $est > $bound")
    }
  }

  test("MGBuf: merged sketches keep the combined-stream guarantee") {
    val s1 = zipfStream(3000, 150, seed = 2)
    val s2 = zipfStream(4000, 150, seed = 3)
    val k = 25
    val b1 = new graft.expr.MGBuf(k); s1.foreach(b1.add)
    val b2 = new graft.expr.MGBuf(k); s2.foreach(b2.add)
    b1.merge(b2)
    assert(b1.counts.size <= k)
    val all = s1 ++ s2
    val exact = all.groupBy(identity).map { case (i, v) => i -> v.size.toLong }
    val bound = all.size.toDouble / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > bound) assert(b1.counts.contains(item),
        s"$item (combined count $c > bound $bound) must survive the merge")
    }
    b1.counts.foreach { case (item, est) =>
      assert(est <= exact(item) && exact(item) - est <= bound)
    }
  }

  test("MisraGries aggregate: distributed candidates cover the true heavy set") {
    import spark.implicits._
    val stream = zipfStream(20000, 500, seed = 4)
    val df = stream.toDF("v").repartition(7)
    val k = 50
    val cands = Frequency.mgCandidates(df, "v", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands.size <= k)
    val exact = stream.groupBy(identity).map { case (i, v) => i -> v.size.toLong }
    val bound = stream.size.toDouble / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > bound) assert(cands.contains(item),
        s"$item (count $c > bound $bound) missing from distributed sketch")
    }
    cands.foreach { case (item, est) => assert(est <= exact(item)) }
  }

  test("heavyHitters: exact output, independent of partitioning") {
    import spark.implicits._
    val stream = zipfStream(20000, 500, seed = 5)
    val exact = stream.groupBy(identity).map { case (i, v) => i -> v.size.toLong }
    val support = 0.01
    val threshold = math.ceil(support * stream.size).toLong
    val want = exact.filter(_._2 >= threshold)
    assert(want.nonEmpty, "test corpus must have heavy hitters")
    Seq(1, 4, 13).foreach { parts =>
      val got = Frequency.heavyHitters(
          stream.toDF("v").repartition(parts), "v", support)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"at $parts partitions")
    }
  }

  test("heavyHitters: nulls excluded from n and counts; empty input yields empty frame") {
    import spark.implicits._
    // 10 non-null values: "a" x6, "b" x4 -> support .5 keeps only a
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(4)(Some("b")) ++
      Seq.fill(90)(Option.empty[String])).toDF("v")
    val got = Frequency.heavyHitters(df, "v", support = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 6L)))
    val empty = Frequency.heavyHitters(
      Seq.empty[Option[String]].toDF("v"), "v", support = 0.5)
    assert(empty.columns.toSeq == Seq("value", "cnt") && empty.count() == 0)
  }

  test("heavyTokens: matches the vocabulary-based exact answer on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val support = 0.005
    val got = graft.pipeline.TextAnalysis.heavyTokens(docs, "text", support)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = graft.pipeline.TextAnalysis.vocabulary(docs, "doc_id", "text")
      .select(col("token"), col("count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = vocab.values.sum
    val want = vocab.filter(_._2 >= math.ceil(support * n).toLong)
    assert(want.nonEmpty)
    assert(got == want)
  }
}
