package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

class ScaleOpsSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    def count(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case _                        => p.children.map(count).sum
      }
      self + inner
    }
    count(df.queryExecution.executedPlan)
  }

  test("skewReport quantifies a planted hot key") {
    import spark.implicits._
    // 90 rows on key 1, one row each on keys 2..11: top1_share = 0.9
    val df = (Seq.fill(90)(1L) ++ (2L to 11L)).map(k => (k, "x"))
      .toDF("k", "v")
    val r = ScaleOps.skewReport(df, Seq("k")).head()
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[Long]("max_key_count") == 90L)
    assert(math.abs(r.getAs[Double]("top1_share") - 0.9) < 1e-12)
    assert(math.abs(r.getAs[Double]("avg_key_count") - 100.0 / 11) < 1e-12)
    // null keys are excluded (they never co-locate in a join anyway)
    val withNull = df.unionAll(Seq((null.asInstanceOf[java.lang.Long], "x"))
      .map(t => (Option(t._1).map(Long.unbox), t._2)).toDF("k", "v"))
    assert(ScaleOps.skewReport(withNull, Seq("k")).head()
      .getAs[Long]("n_rows") == 100L)
  }

  test("bucketed join on bucket keys plans no shuffle") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val right = (1 to 500).map(i => (i.toLong % 100, s"name_$i")).toDF("k", "n")
    ScaleOps.writeBucketed(left, "bk_left", 4, Seq("k"))
    ScaleOps.writeBucketed(right, "bk_right", 4, Seq("k"))
    val joined = ScaleOps.bucketedJoin(spark, "bk_left", "bk_right", Seq("k"))
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
    // co-located join still computes the right answer
    val expected = left.join(right, "k").count()
    assert(joined.count() == expected)
  }

  test("saltedJoin spreads a hot key and preserves join semantics") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong % 50 + 2, "cold"))).toDF("k", "tag")
    val dim = (1 to 60).map(i => (i.toLong, s"d_$i")).toDF("k", "d")
    val plain = fact.join(dim, "k")
    val salted = ScaleOps.saltedJoin(fact, dim, "k", buckets = 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = salted.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("skewReport on empty / all-null-key input is all zeros, not null") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    val r = ScaleOps.skewReport(empty, Seq("k")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0) // top1_share well-defined via the floor
    val nulls = Seq((null.asInstanceOf[java.lang.Long], 1L))
      .toDF("k", "v")
    val r2 = ScaleOps.skewReport(nulls, Seq("k")).head()
    assert(r2.getLong(0) == 0L && r2.getLong(2) == 0L)
  }
}
