package graft

import org.apache.spark.sql.functions._
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{DictCodec, HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.stat.StatTests
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Regression coverage for the round-1 advice findings: clause literal
  * corruption, integer-column SSVs, stratified-mode join loss, degenerate
  * bucket fitting, and optimizer-rule session leakage. */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("clause values containing 'and' / quotes survive replay") {
    val df = Seq(
      ("rock and roll", 10.0), ("rock and roll", Double.NaN),
      ("it's jazz", 1.0), ("it's jazz", Double.NaN)
    ).toDF("genre", "score")

    val sf = StratifiedFrame(df, Seq(ColStratum("genre")))
    val clauses = sf.strata.map(_.clause)
    assert(clauses.contains("""genre == "rock and roll""""))

    // replay each clause as a predicate: must match exactly its own stratum
    for (st <- sf.strata) {
      val n = df.filter(DictCodec.clauseToColumn(st.clause)).count()
      assert(n == 2, s"clause ${st.clause} matched $n rows, expected 2")
    }

    // full imputer round trip keyed by those clauses
    val imp = new HandyImputer().setFillDict(Map(
      "score" -> Map(
        """genre == "rock and roll"""" -> 99.0,
        """genre == "it's jazz"""" -> 7.0)))
    val out = imp.transform(df)
      .groupBy("genre").agg(sum("score").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("rock and roll") == 109.0)
    assert(out("it's jazz") == 8.0)
  }

  test("clause with escaped double quote in value round-trips") {
    val df = Seq(("""say "hi"""", 1.0), ("plain", 2.0)).toDF("k", "v")
    val sf = StratifiedFrame(df, Seq(ColStratum("k")))
    val quoted = sf.strata.map(_.clause).find(_.contains("hi")).get
    assert(df.filter(DictCodec.clauseToColumn(quoted)).count() == 1)
  }

  test("fencing preserves null and NaN values instead of capping them") {
    // greatest/least skip nulls and order NaN above everything — without
    // the guard, null becomes the bound and NaN becomes the upper fence
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, 100.0, null, Double.NaN)
      .toDF("v")
    val fenced = Clean.fence(HandyFrame(df), Seq("v")).df.collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(fenced.count(_ == null) == 1, "null was capped away")
    assert(fenced.count(v => v != null && v.asInstanceOf[Double].isNaN) == 1,
      "NaN was capped away")

    val rep = new HandyFencer().setFenceDict(Map("v" -> Map("" -> ((0.0, 10.0)))))
    val out = rep.transform(df).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.count(_ == null) == 1)
    assert(out.count(v => v != null && v.asInstanceOf[Double].isNaN) == 1)
    assert(out.count(v => v != null && v.asInstanceOf[Double] == 10.0) == 1) // 100 capped
  }

  test("fencer replay leaves non-matching strata untouched") {
    val df = Seq(("a", 100.0), ("b", 100.0)).toDF("k", "v")
    val f = new HandyFencer().setFenceDict(Map(
      "v" -> Map("""k == "a"""" -> ((0.0, 10.0)))))
    val out = f.transform(df).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 10.0)  // capped
    assert(out("b") == 100.0) // untouched
  }

  test("summaryValues and tTestMatrix work on integer columns") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 7))
      .toDF("g", "x")
    val ssv = StatTests.summaryValues(df, "x")
    assert(ssv(Seq()).getMax == 7.0 && ssv(Seq()).getMin == 1.0 &&
      ssv(Seq()).getSum == 22.0)
    val m = StatTests.tTestMatrix(df, "x", Seq("g"))
    assert(m.size == 1 && m.head._3 > 0 && m.head._3 < 1)
  }

  test("stratified Mode fill keeps strata that are all-null for one column") {
    val df = Seq[(String, java.lang.Double, String)](
      ("a", 1.0, null), ("a", 1.0, null), ("a", null, null), // s missing in a
      ("b", 2.0, "x"), ("b", null, "x"), ("b", 2.0, "y")
    ).toDF("g", "num", "s")
    // num's mode exists in both strata; s's mode only in stratum b.
    // Inner-joining the per-column mode frames would drop stratum a entirely
    // and skip its num fill; outer join must keep it.
    val filled = Clean.fill(HandyFrame(df), Clean.Mode, Seq("num", "s"),
      Seq(ColStratum("g"))).df
    val a = filled.filter(col("g") === "a")
    assert(a.filter(col("num").isNull || isnan(col("num"))).count() == 0,
      "stratum a num fill was skipped")
    assert(a.filter(col("s").isNull).count() == 3, "no s mode exists for a")
    val b = filled.filter(col("g") === "b")
    assert(b.filter(col("num").isNull || isnan(col("num"))).count() == 0)
  }

  test("Bucket excludes null values instead of silently bucketing them as 0") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("b", 2.0), ("c", 9.0), ("d", null), ("e", null)
    ).toDF("k", "x")
    val sf = StratifiedFrame(df, Seq(Bucket("x", 2)))
    // null x rows must not appear in any stratum's counts
    val total = sf.agg((d, sc) => d.groupBy(sc.map(col): _*)
      .agg(count(lit(1)).as("n")))
      .na.drop().collect().map(_.getLong(1)).sum
    assert(total == 3, s"null rows leaked into buckets (counted $total)")
  }

  test("Bucket on an all-equal column: single truthful stratum") {
    val df = Seq(("r", 5.0), ("s", 5.0), ("t", 5.0)).toDF("k", "x")
    val sf = StratifiedFrame(df, Seq(Bucket("x", 3)))
    assert(sf.strata.size == 1)
    assert(sf.strata.head.clause == "(x >= 5.0) and (x <= 5.0)")
    val counts = sf.valueCounts("k")
    assert(counts.count() == 3)
  }

  test("Bucket/Quantile on empty and all-null columns: no strata, no crash") {
    val empty = spark.emptyDataset[(String, Double)].toDF("k", "x")
    assert(StratifiedFrame(empty, Seq(Bucket("x", 3))).strata.isEmpty)
    assert(StratifiedFrame(empty, Seq(Quantile("x", 3))).strata.isEmpty)
    assert(StratifiedFrame(empty, Seq(Quantile("x", 3, exact = true)))
      .strata.isEmpty)

    val allNull = Seq(("a", null: java.lang.Double), ("b", null: java.lang.Double))
      .toDF("k", "x")
    assert(StratifiedFrame(allNull, Seq(Bucket("x", 3))).strata.isEmpty)
    assert(StratifiedFrame(allNull, Seq(Quantile("x", 3, exact = true)))
      .strata.isEmpty)
  }

  test("Quantile on an all-equal column collapses to one stratum") {
    val df = Seq.fill(10)(7.5).map(("k", _)).toDF("k", "x")
    val sf = StratifiedFrame(df, Seq(Quantile("x", 4, exact = true)))
    assert(sf.strata.size == 1)
    val st = sf.strata.head.clause
    assert(st.startsWith("(x >= 7.5) and (x <= 7.5)"), st)
  }

  test("histogram guards: all-equal and all-null columns") {
    val eq = Seq(3.0, 3.0, 3.0).toDF("x")
    val h = PlotData.histogram(eq, "x", bins = 10).collect()
    assert(h.length == 1 && h.head.getAs[Long]("cnt") == 3)

    val nulls = Seq[java.lang.Double](null, null).toDF("x")
    val h2 = PlotData.histogram(nulls, "x", bins = 5).collect()
    assert(h2.forall(_.getAs[Long]("cnt") == 0))
  }

  test("autoHistogram: FD bin count, sturges fallback, degenerate guards") {
    // n=8, values 0..7: q1=1.75, q3=5.25, IQR=3.5, width=2*3.5/8^(1/3)=3.5
    // → bins = ceil(7/3.5) = 2
    val df = (0 until 8).map(_.toDouble).toDF("x")
    val h = PlotData.autoHistogram(df, "x").collect()
    assert(h.length == 2 && h.map(_.getAs[Long]("cnt")).sum == 8)
    // zero-IQR but spread data falls back to sturges = ceil(log2 9 + 1) = 5
    val spiky = (Seq.fill(7)(5.0) ++ Seq(0.0, 10.0)).toDF("x")
    assert(PlotData.autoHistogram(spiky, "x").collect().length == 5)
    // all-equal and empty degrade to the single-bucket guard
    assert(PlotData.autoHistogram(Seq(3.0, 3.0).toDF("x"), "x")
      .collect().length == 1)
    assert(PlotData.autoHistogram(
      Seq(3.0).toDF("x").filter(lit(false)), "x").collect().length == 1)
    intercept[IllegalArgumentException](
      PlotData.autoHistogram(df, "x", rule = "scott"))
  }

  test("scatterBins guards: all-equal axis") {
    val df = Seq((1.0, 2.0), (1.0, 2.0)).toDF("x", "y")
    val b = PlotData.scatterBins(df, "x", "y", bins = 10).collect()
    assert(b.length == 1 && b.head.getAs[Double]("proportion") == 1.0)
  }

  test("perStratum and stratified fill on a no-strata input: empty, no crash") {
    val allNull = Seq(("a", null: java.lang.Double), ("b", null: java.lang.Double))
      .toDF("k", "x")
    val sf = StratifiedFrame(allNull, Seq(Bucket("x", 3)))
    val out = sf.perStratum(_.agg(count(lit(1)).as("n")))
    assert(out.columns.toSeq == Seq("n", "__stratum") && out.count() == 0)

    val filled = Clean.fill(HandyFrame(allNull), Clean.Mean, Seq("x"),
      Seq(Bucket("x", 3)))
    assert(filled.df.count() == 2) // rows preserved, nothing fillable
    assert(filled.state.statistics.isEmpty)
  }

  test("corrSpearman treats -0.0 and 0.0 as one tie run") {
    val data = Seq((-0.0, 1.0), (0.0, 2.0), (-0.0, 3.0), (0.0, 4.0),
      (1.0, 5.0), (2.0, 6.0))
    // zeros all share avg rank 2.5; local reference on normalized values
    val got = graft.agg.Stats.corrSpearman(
      data.toDF("x", "y").repartition(3), Seq("x", "y"))
      .head().getAs[Double]("x__y")
    val rx = Map(0.0 -> 2.5, 1.0 -> 5.0, 2.0 -> 6.0)
    val xs = data.map(d => rx(d._1 + 0.0)); val ys = data.map(_._2)
    val mx = xs.sum / 6; val my = ys.sum / 6
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val expected = cov / math.sqrt(
      xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(got - expected) < 1e-12, s"got $got expected $expected")
  }

  test("transformGroups: null key and the string 'null' are distinct groups") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = Seq(("null", 1.0), (null: String, 2.0), ("null", 3.0))
      .toDF("k", "v")
    val outSchema = StructType(Seq(StructField("n", IntegerType)))
    val sizes = graft.core.HandyFrame(df)
      .transformGroups(Seq("k"), outSchema)(rows =>
        Iterator.single(Row(rows.size)))
      .df.collect().map(_.getInt(0)).sorted.toSeq
    assert(sizes == Seq(1, 2), s"got $sizes")
  }

  test("str.join handles newlines; topKJoin rejects k < 1") {
    val r = Seq("a\nb").toDF("s")
      .select(graft.funcs.StringFuncs.joinChars(col("s"), "-"))
      .head().getString(0)
    assert(r == "a-\n-b")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Similarity.topKJoin(
        Seq((1L, Seq(1.0))).toDF("vec_id", "embedding"),
        Seq((1L, Seq(1.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0)
    }
    assert(e.getMessage.contains("k >= 1"))
  }

  test("typed pipeline ops reject non-integral id columns loudly") {
    val df = Seq(("doc-1", "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.shingled(df, "doc_id", "text", 3)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("q_stratify_rewritten does not leak the opt-in conf into the session") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.queries("q_stratify_rewritten")(spark, dir)
    assert(out.count() == 3)
    // the rewrite-everything flag must stay scoped to the query's isolated
    // child session (the soundness guard). The RULE itself may be present —
    // perStratum registers it by design — but it is inert without the flag
    // for sub-threshold unions.
    assert(spark.conf.get("spark.graft.rewriteStrataUnion", "false") == "false")
  }

  test("QueryDef names are unique — a duplicate would silently shadow " +
      "the earlier row in the gate maps") {
    // the guard fires inside queries(); touching it is the assertion
    assert(Queries.queries.size == Queries.defs.size)
    assert(Queries.defs.map(_.name).distinct.size == Queries.defs.size)
  }
}
