package graft.clean

import graft.SparkSpec
import graft._
import graft.ml.{HandyFencer, HandyImputer}
import graft.strata.ColStratum
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {

  lazy val df = {
    import spark.implicits._
    Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 3.0), ("a", null), ("b", 10.0), ("b", 20.0),
      ("b", null)).toDF("g", "v")
  }

  test("global mean fill replaces nulls and records statistics") {
    val filled = Clean.fill(df.toHandy, Clean.Mean, Seq("v"))
    assert(filled.df.filter(col("v").isNull).count() == 0)
    val mean = (1.0 + 3 + 10 + 20) / 4
    assert(filled.state.statistics("v")("") == mean)
    assert(filled.df.agg(sum("v")).head().getDouble(0) == 34.0 + 2 * mean)
  }

  test("stratified fill uses per-stratum values keyed by clause") {
    val filled = Clean.fill(df.toHandy, Clean.Mean, Seq("v"),
      Seq(ColStratum("g")))
    val stats = filled.state.statistics("v")
    assert(stats("""g == "a"""") == 2.0)
    assert(stats("""g == "b"""") == 15.0)
    // non-null rows unchanged, nulls filled per stratum
    val a = filled.df.filter(col("g") === "a").agg(sum("v")).head().getDouble(0)
    assert(a == 1.0 + 3.0 + 2.0)
  }

  test("fill leaves non-missing rows unchanged") {
    val filled = Clean.fill(df.toHandy, Clean.Median, Seq("v"))
    val orig = df.filter(col("v").isNotNull).select("v")
      .collect().map(_.getDouble(0)).sorted.toSeq
    val after = filled.df.join(df.filter(col("v").isNotNull), Seq("g", "v"),
      "left_semi").select("v").collect().map(_.getDouble(0)).sorted.toSeq
    assert(orig == after)
  }

  test("imputer replay matches direct fill and survives save/load") {
    val learned = Clean.fill(df.toHandy, Clean.Mean, Seq("v"),
      Seq(ColStratum("g")))
    val imputer = new HandyImputer().setFillDict(learned.state.statistics)
    val tmp = java.nio.file.Files.createTempDirectory("imputer").toString
    imputer.write.overwrite().save(tmp)
    val loaded = HandyImputer.load(tmp)
    val direct = learned.df.orderBy("g", "v").select("g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val replayed = loaded.transform(df).orderBy("g", "v").select("g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(direct == replayed)
  }

  test("fence caps into [lfence, ufence] and is idempotent") {
    import spark.implicits._
    val data = (Seq.fill(20)(5.0) ++ Seq(100.0, -100.0)).toDF("v")
    val fenced = Clean.fence(data.toHandy, Seq("v"))
    val (lo, hi) = fenced.state.fences("v")("")
    val r = fenced.df.agg(min("v"), max("v")).head()
    assert(r.getDouble(0) >= lo && r.getDouble(1) <= hi)
    // idempotent: fencing already-fenced data changes nothing
    val twice = Clean.fence(fenced.df.toHandy, Seq("v"))
    assert(twice.df.agg(sum("v")).head().getDouble(0) ==
      fenced.df.agg(sum("v")).head().getDouble(0))
  }

  test("fencer transformer replays fences on fresh data and survives save/load") {
    import spark.implicits._
    val data = (Seq.fill(20)(5.0) ++ Seq(100.0, -100.0)).toDF("v")
    val learned = Clean.fence(data.toHandy, Seq("v"))
    val fencer = new HandyFencer().setFenceDict(learned.state.fences)
    val tmp = java.nio.file.Files.createTempDirectory("fencer").toString
    fencer.write.overwrite().save(tmp)
    val loaded = HandyFencer.load(tmp)
    val replayed = loaded.transform(data).agg(sum("v")).head().getDouble(0)
    assert(replayed == learned.df.agg(sum("v")).head().getDouble(0))
  }

  test("outlierCounts finds planted outliers per stratum") {
    import spark.implicits._
    val data = ((1 to 20).map(i => ("a", i.toDouble / 10)) ++
      Seq(("a", 1000.0)) ++
      (1 to 20).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r = Clean.outlierCounts(data, Seq("v"), 1.5, Seq("g"))
      .orderBy("g").collect()
    assert(r(0).getLong(1) == 1L) // the planted 1000.0
    assert(r(1).getLong(1) == 0L)
  }

  test("MAD fences: closed form, 50% breakdown robustness, planted outlier counted") {
    import spark.implicits._
    // 1..9 plus one extreme: median 5.5? n=10 values 1..9 + 1000 ->
    // sorted: 1..9,1000; median = (5+6)/2 = 5.5; |x-5.5| = 4.5,3.5,...,
    // 0.5,0.5,...,994.5 -> MAD = median(0.5..4.5,994.5 sorted) = 2.5
    val data = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val f = Clean.calcMadFences(data, Seq("v"), k = 3.0).head()
    assert(f.getString(0) == "v")
    assert(math.abs(f.getDouble(1) - 5.5) < 1e-12)
    assert(math.abs(f.getDouble(2) - 2.5) < 1e-12)
    val spread = 3.0 * 1.4826 * 2.5
    assert(math.abs(f.getDouble(3) - (5.5 - spread)) < 1e-12)
    assert(math.abs(f.getDouble(4) - (5.5 + spread)) < 1e-12)
    // the extreme value does NOT blow the fences up (Tukey's do move):
    // only the planted 1000.0 is outside
    val n = Clean.madOutlierCounts(data, Seq("v"), k = 3.0).head()
    assert(n.getLong(0) == 1L)
    // constant column: mad 0, fences collapse to the median, no outliers
    val const = Seq.fill(8)(7.0).toDF("v")
    val cf = Clean.calcMadFences(const, Seq("v")).head()
    assert(cf.getDouble(2) == 0.0 && cf.getDouble(3) == 7.0 && cf.getDouble(4) == 7.0)
    assert(Clean.madOutlierCounts(const, Seq("v")).head().getLong(0) == 0L)
  }
}
