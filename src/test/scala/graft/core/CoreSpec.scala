package graft.core

import graft.SparkSpec
import graft._
import graft.core.HandyColumns.ColsOps
import graft.strata.ColStratum
import org.apache.spark.sql.functions._

class CoreSpec extends SparkSpec {

  lazy val df = {
    import spark.implicits._
    (1 to 50).map(i => (i, i.toDouble * 2, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "v", "parity")
  }

  test("column classes partition the schema like the reference") {
    val hf = df.toHandy
    assert(hf.numericalCols == Seq("id", "v"))
    assert(hf.continuousCols == Seq("v"))
    assert(hf.categoricalCols == Seq("id", "parity"))
    assert(hf.stringCols == Seq("parity"))
  }

  test("safety limit bounds collect and safetyOff is one-shot") {
    val hf = df.toHandy.setSafetyLimit(10)
    val (rows, hf2) = hf.safeCollect()
    assert(rows.length == 10)
    val (all, hf3) = hf2.safetyOff().safeCollect()
    assert(all.length == 50)
    val (limited, _) = hf3.safeCollect() // flag reset after one use
    assert(limited.length == 10)
  }

  test("setResponse records classes for categorical response") {
    val hf = df.toHandy.setResponse("parity")
    assert(hf.state.isClassification)
    assert(hf.state.classes.get.toSet == Set("even", "odd"))
    val cont = df.toHandy.setResponse("v")
    assert(!cont.state.isClassification)
  }

  test("setResponse probe-refuses a continuous-ish string label set") {
    import spark.implicits._
    // a string column with one label per row — an id misdeclared as a
    // response must refuse BEFORE an unbounded driver collect
    val wide = spark.range(100)
      .selectExpr("cast(id as string) as label").as[String].toDF("label")
    val e = intercept[IllegalArgumentException] {
      wide.toHandy.setResponse("label", maxClasses = 50)
    }
    assert(e.getMessage.contains("maxClasses"))
    // at exactly the bound it still materializes the full class set
    val ok = wide.toHandy.setResponse("label", maxClasses = 100)
    assert(ok.state.classes.get.size == 100)
  }

  test("cols façade: type-alias selectors and stats") {
    val hf = df.toHandy
    val m = hf.cols("continuous").mean().head()
    assert(m.getDouble(0) == 51.0) // mean of 2..100
    assert(hf.cols("v").nunique().head().getLong(0) > 40)
    val vc = hf.cols("parity").valueCounts().collect()
    assert(vc.map(_.getLong(1)).sum == 50)
  }

  test("genRowIds and loc: contiguous ids, range fetch skips partitions") {
    val hf = df.repartition(4).toHandy
    val ids = hf.genRowIds().df.select("__row_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 50L))
    val slice = hf.loc(10, 15)
    assert(slice.count() == 5)
    assert(slice.columns.toSeq == df.columns.toSeq)
    assert(hf.loc(48, 60).count() == 2) // clamped at the end
    assert(hf.loc(50, 60).count() == 0)
  }

  test("error prettifier frames unknown-column failures with operator context") {
    val hf = df.toHandy
    val e = intercept[graft.util.GraftException] {
      hf.cols("Fare ").mean() // typo'd column, reference's canonical example
    }
    assert(e.summaryText.contains("GRAFT EXCEPTION SUMMARY"))
    assert(e.summaryText.contains("Operator: cols"))
    assert(e.summaryText.contains("Fare "))
    assert(e.summaryText.contains("available: id, v, parity"))
    // Spark resolution is case-insensitive by default: mixed-case selectors
    // for real columns must pass the guard
    assert(hf.cols("V").mean().head().getDouble(0) == 51.0)
    // nested contexts keep the INNERMOST operator's summary
    val nested = intercept[graft.util.GraftException] {
      graft.util.Errors.context("outer")(
        graft.util.Errors.context("inner")(sys.error("boom")))
    }
    assert(nested.summaryText.contains("Operator: inner"))
    // fill names the operator and columns
    val fe = intercept[graft.util.GraftException] {
      graft.clean.Clean.fill(hf, graft.clean.Clean.Mean, Seq("nope"))
    }
    assert(fe.summaryText.contains("Operator: fill(Mean)") &&
      fe.summaryText.contains("nope"))
    // round-5 facades are wrapped too: psi names operator + column
    val pe = intercept[graft.util.GraftException] {
      graft.agg.Stats.psi(df, df, "no_such_col")
    }
    assert(pe.summaryText.contains("Operator: psi") &&
      pe.summaryText.contains("no_such_col"))
  }

  test("printConfusionMatrix renders the Actual/Predicted table") {
    import spark.implicits._
    val scored = Seq((0.9, 1.0), (0.8, 1.0), (0.4, 1.0), (0.7, 0.0),
      (0.2, 0.0), (0.1, 0.0)).toDF("score", "label")
    val s = graft.eval.BinaryMetrics.printConfusionMatrix(
      scored, "score", "label", 0.5)
    val lines = s.split("\n")
    assert(lines.length == 4)
    assert(lines(0).contains("Predicted"))
    assert(lines(1).trim.split("\\s+").toSeq == Seq("0.0", "1.0"))
    assert(lines(2).startsWith("Actual 0.0"))
    assert(lines(2).split("\\s+").takeRight(2).toSeq == Seq("2", "1")) // tn fp
    assert(lines(3).split("\\s+").takeRight(2).toSeq == Seq("1", "2"))
  }

  test("stages counts shuffle exchanges + 1") {
    assert(df.toHandy.stages == 1) // pure scan
    assert(df.groupBy("parity").count().toHandy.stages == 2)
    assert(df.repartition(4).groupBy("parity").count().toHandy.stages == 3)
  }

  test("stratify API: grouped stats carry strata columns") {
    val sf = df.toHandy.stratify(ColStratum("parity"))
    val medians = sf.mean("v").orderBy("parity").collect()
    assert(medians.length == 2)
    val vc = sf.valueCounts("parity").collect()
    assert(vc.map(_.getLong(1)).sum == 50)
  }

  test("transformGroups: grouped-map batch per key") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("parity", StringType), StructField("v_sum", DoubleType),
      StructField("n", IntegerType)))
    // per-group batch: one summary row per key (applyInPandas shape)
    val out = df.toHandy.transformGroups(Seq("parity"), outSchema) { rows =>
      val rs = rows.toSeq
      val parity = rs.head.getAs[String]("parity")
      Iterator.single(Row(parity, rs.map(_.getAs[Double]("v")).sum, rs.size))
    }.df.orderBy("parity").collect()
    assert(out.length == 2)
    assert(out.map(_.getInt(2)).sum == 50)
  }
}
