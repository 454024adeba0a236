package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions needs its own SparkSession (extensions are fixed at
  * session build time), so this suite does not share graft.SparkSpec. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  // getOrCreate would return the extension-less session other suites
  // already built — force a fresh session (same SparkContext) by clearing
  // the active/default session around the build
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prior.foreach(SparkSession.setDefaultSession)
    SparkSession.setActiveSession(s)
    s
  }

  override def afterAll(): Unit = {} // shared JVM; leave sessions

  test("exact_percentile is callable from SQL") {
    import spark.implicits._
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("t")
    val r = spark.sql(
      "SELECT exact_percentile(v, array(0.25, 0.5)) FROM t").head()
    assert(r.getSeq[Double](0) == Seq(25.75, 50.5))
    val one = spark.sql("SELECT exact_percentile(v, 0.5) FROM t").head()
    assert(one.getSeq[Double](0) == Seq(50.5))
  }

  test("remove_accents is callable from SQL and stays in codegen") {
    val r = spark.sql("SELECT remove_accents('café naïve — Ñandú')").head()
    assert(r.getString(0) == "cafe naive — Nandu")
    assert(spark.sql("SELECT remove_accents(CAST(NULL AS STRING))")
      .head().isNullAt(0))
    // null-safe unary scaffolding + doGenCode → inside WholeStageCodegen
    val codegen = spark.range(3)
      .selectExpr("remove_accents(concat('café', id))")
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = codegen.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [remove_accents"), plan)
    assert(codegen.collect().map(_.getString(0)).toSeq ==
      Seq("cafe0", "cafe1", "cafe2"))
  }

  test("normalize_text is callable from SQL and stays in codegen") {
    val r = spark.sql("SELECT normalize_text('  Hello, WORLD!!  42 ')")
      .head()
    assert(r.getString(0) == "hello world 42")
    assert(spark.sql("SELECT normalize_text(CAST(NULL AS STRING))")
      .head().isNullAt(0))
    val codegen = spark.range(3)
      .selectExpr("normalize_text(concat('Doc#', id, '!'))")
    val plan = codegen.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [normalize_text"), plan)
    assert(codegen.collect().map(_.getString(0)).toSeq ==
      Seq("doc 0", "doc 1", "doc 2"))
  }

  test("graft_dot matches the HOF fold bit-for-bit and stays in codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq(1.5, -2.0, 3.25), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))).toDF("a", "b")
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), _ + _)).collect().map(_.getDouble(0))
    val native = df.select(graft.expr.DotProduct.of(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(native.toSeq == hof.toSeq) // identical sequential fp fold
    // null semantics mirror the HOF form: length mismatch / null element /
    // null array are all NULL
    val edge = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (Some(Seq(1.0)), None),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    assert(edge.select(graft.expr.DotProduct.of(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
    // float arrays pass through Dedup.dotProduct's cast
    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(f.select(graft.pipeline.Dedup.dotProduct(col("a"), col("b")))
      .head().getDouble(0) == 11.0)
    // SQL registration + whole-stage codegen
    val viaSql = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head()
    assert(viaSql.getDouble(0) == 11.0)
    val cosSql = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), " +
        "graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D))").head()
    assert(cosSql.getDouble(0) == 1.0 && cosSql.getDouble(1) == 0.0)
    // a Seq-backed frame folds to LocalTableScan; range keeps the Project
    val codegen = spark.range(3).select(graft.expr.DotProduct.of(
      array(col("id").cast("double"), lit(2.0)),
      array(lit(3.0), col("id").cast("double"))))
    val plan = codegen.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(codegen.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 5.0, 10.0))
  }

  test("text-analysis tier is callable from SQL") {
    import spark.implicits._
    Seq(("the cat and the dog sat on the mat together", "x"))
      .toDF("text", "k").createOrReplaceTempView("docs")
    val r = spark.sql(
      """SELECT graft_token_count(text) AS n, graft_lang_id(text) AS lang,
         graft_quality(text) AS q, graft_fingerprint(text) AS fp,
         graft_simhash(text) AS sh FROM docs""").head()
    assert(r.getInt(0) == 10)
    assert(r.getString(1) == "en")
    assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1)
    assert(r.getLong(3) != 0L && r.getLong(4) != 0L)
  }

  test("StrataUnionRewrite collapses per-stratum aggregate union into one grouped agg") {
    import spark.implicits._
    // use a parquet source: a LocalRelation would be folded through the
    // filters by ConvertToLocalRelation before the rule can see the shape
    val tmp = java.nio.file.Files.createTempDirectory("strata").toString
    Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0), ("c", 5.0))
      .toDF("g", "v").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)

    def unionPlan = {
      val children = Seq("a", "b", "c").map { s =>
        df.filter(col("g") === s)
          .agg(sum("v").as("sv"), count(lit(1)).as("n"))
          .withColumn("__stratum", lit(s"""g == "$s""""))
      }
      children.reduce(_.unionAll(_))
    }

    // flag off: 3 aggregates survive in the optimized plan
    spark.conf.set("spark.graft.rewriteStrataUnion", "false")
    val off = unionPlan.queryExecution.optimizedPlan
    val nAggOff = off.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggOff == 3)

    // flag on: single grouped aggregate, same results
    spark.conf.set("spark.graft.rewriteStrataUnion", "true")
    val plan = unionPlan
    val optimized = plan.queryExecution.optimizedPlan
    val aggs = optimized.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected collapsed plan, got:\n$optimized")
    assert(aggs.head.groupingExpressions.nonEmpty)

    val rows = plan.orderBy("__stratum")
      .collect().map(r => (r.getString(2), r.getDouble(0), r.getLong(1))).toSeq
    assert(rows == Seq(
      ("""g == "a"""", 4.0, 2L),
      ("""g == "b"""", 40.0, 2L),
      ("""g == "c"""", 5.0, 1L)))
    spark.conf.set("spark.graft.rewriteStrataUnion", "false")
  }

  test("perStratum auto-collapses to one grouped scan above the threshold") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("strata_auto").toString
    (0 until 40).flatMap(i => Seq((f"k$i%02d", i * 1.0), (f"k$i%02d", i * 2.0)))
      .toDF("g", "v").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val sf = graft.strata.StratifiedFrame(df,
      Seq(graft.strata.ColStratum("g")))
    // 40 strata > default threshold 32: no explicit flag, still ONE scan
    assert(spark.conf.get("spark.graft.rewriteStrataUnion", "false") == "false")
    val out = sf.perStratum(c =>
      c.agg(sum("v").as("sv"), count(lit(1)).as("n")))
    val optimized = out.queryExecution.optimizedPlan
    assert(!optimized.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Union]),
      s"40-stratum union did not auto-collapse:\n$optimized")
    assert(optimized.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size == 1)
    val rows = out.collect()
    assert(rows.length == 40)
    val m = rows.map(r => r.getAs[String]("__stratum") ->
      ((r.getAs[Double]("sv"), r.getAs[Long]("n")))).toMap
    assert(m("""g == "k03"""") == ((9.0, 2L)))
  }

  test("auto-collapse refuses unions whose children carry extra filters") {
    import spark.implicits._
    // presence is only guaranteed for the stratum predicate itself: f's own
    // filter can empty a stratum, where a union of global aggregates emits
    // a (null-agg) row but a grouped aggregate emits none — the AUTO path
    // must leave such plans as authored
    val tmp = java.nio.file.Files.createTempDirectory("strata_guard").toString
    (0 until 40).map(i => (f"k$i%02d", i * 1.0))
      .toDF("g", "v").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val sf = graft.strata.StratifiedFrame(df,
      Seq(graft.strata.ColStratum("g")))
    // v > 5 empties strata k00..k05
    val out = sf.perStratum(c =>
      c.filter(col("v") > 5.0).agg(sum("v").as("sv")))
    assert(out.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Union]),
      "extra-filter union was auto-collapsed (soundness hole)")
    val rows = out.collect()
    assert(rows.length == 40, s"union semantics lost: ${rows.length} rows")
    assert(rows.count(_.isNullAt(0)) == 6) // k00..k05 emptied by the filter
  }

  test("StrataUnionRewrite handles multi-key strata") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("strata2").toString
    Seq(("a", 0, 1.0), ("a", 1, 3.0), ("b", 0, 10.0), ("b", 1, 30.0))
      .toDF("g", "h", "v").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)

    def unionPlan = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).map {
      case (gv, hv) =>
        df.filter(col("g") === gv && col("h") === hv)
          .agg(sum("v").as("sv"))
          .withColumn("__stratum", lit(s"""g == "$gv" and h == $hv"""))
    }.reduce(_.unionAll(_))

    spark.conf.set("spark.graft.rewriteStrataUnion", "true")
    try {
      val plan = unionPlan
      val aggs = plan.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.size == 1,
        s"expected collapse, got:\n${plan.queryExecution.optimizedPlan}")
      assert(aggs.head.groupingExpressions.size == 2)
      val rows = plan.orderBy("__stratum")
        .collect().map(r => (r.getString(1), r.getDouble(0))).toSeq
      assert(rows == Seq(
        ("""g == "a" and h == 0""", 1.0),
        ("""g == "a" and h == 1""", 3.0),
        ("""g == "b" and h == 0""", 10.0),
        ("""g == "b" and h == 1""", 30.0)))
    } finally spark.conf.set("spark.graft.rewriteStrataUnion", "false")
  }

  test("graft_char_entropy is callable from SQL with null propagation") {
    val r = spark.sql("SELECT graft_char_entropy('abcd'), " +
      "graft_char_entropy(''), " +
      "graft_char_entropy(CAST(NULL AS STRING))").head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
  }

  test("graft_jaro / graft_jaro_winkler are callable from SQL, in codegen") {
    val r = spark.sql(
      "SELECT graft_jaro('MARTHA', 'MARHTA'), " +
        "graft_jaro_winkler('MARTHA', 'MARHTA'), " +
        "graft_jaro_winkler('abc', CAST(NULL AS STRING))").head()
    assert(math.abs(r.getDouble(0) - 0.9444444444444445) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.9611111111111111) < 1e-12)
    assert(r.isNullAt(2))
    val codegen = spark.range(3)
      .selectExpr("graft_jaro_winkler(concat('ab', id), 'ab0')")
    val plan = codegen.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_jaro_winkler"), plan)
    assert(codegen.collect().head.getDouble(0) == 1.0)
  }
}
