package graft.agg

import scala.util.Random

import graft.SparkSpec
import graft.expr.MisraGries
import org.apache.spark.sql.functions._

class FrequencySpec extends SparkSpec {

  test("heavyHittersByGroup: per-group exact counts with the per-group MG guarantee") {
    import spark.implicits._
    // group A: 1000 rows, "hot" 400x (0.4), "warm" 20x (0.02), tail 1x each
    // group B: 100 rows, "hot" 2x (0.02), "b_hot" 50x (0.5), tail 1x each
    val a = Seq.fill(400)("hot") ++ Seq.fill(20)("warm") ++
      (0 until 580).map(i => s"a_$i")
    val b = Seq.fill(2)("hot") ++ Seq.fill(50)("b_hot") ++
      (0 until 48).map(i => s"b_$i")
    val df = (a.map(("A", _)) ++ b.map(("B", _)))
      .toDF("g", "v").repartition(7)
    val got = Frequency.heavyHittersByGroup(df, "g", "v", support = 0.1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // thresholds: A needs >= 100, B needs >= 10
    assert(got == Map(("A", "hot") -> 400L, ("B", "b_hot") -> 50L),
      s"got $got")
    // "hot" is heavy in A only — per-group thresholds, not global
    // lower support keeps warm in A and hot out of B (2 < ceil(0.02*100)=2?
    // no: 2 >= 2 — hot IS heavy in B at support 0.02)
    val fine = Frequency.heavyHittersByGroup(df, "g", "v", support = 0.02)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(fine(("A", "warm")) == 20L && fine(("B", "hot")) == 2L)
    // null group rows are dropped; empty frame yields empty output
    assert(Frequency.heavyHittersByGroup(
      Seq.empty[(String, String)].toDF("g", "v"), "g", "v", 0.1).count() == 0)
  }

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
