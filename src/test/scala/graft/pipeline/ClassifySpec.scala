package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import Classify._

  /** Linearly separable 2-D cloud (plus bias feature): y = [x1 > 0]. */
  private def separable(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val x1 = if (i % 2 == 0) 1.0 + (i % 7) * 0.1 else -1.0 - (i % 5) * 0.1
      val x2 = ((i * 31) % 11 - 5) * 0.1 // noise dim, label-independent
      (i.toLong, Array(1.0, x1, x2), if (x1 > 0) 1.0 else 0.0)
    }.toDF("id", "x", "y")
  }

  test("GD separates a separable cloud: accuracy 1.0, loss non-increasing") {
    val df = separable(200).cache()
    val m = trainLogistic(df, "x", "y", steps = 60, lr = 1.0)
    assert(m.dim == 3)
    assert(math.abs(m.losses.head - math.log(2.0)) < 1e-12) // zero-init loss
    assert(m.losses.sliding(2).forall(w => w(0) >= w(1) - 1e-9),
      m.losses.mkString(","))
    val scored = scoreLogistic(df, "x", m.weights)
    val wrong = scored
      .filter((col("score") >= 0.5).cast("int") =!= col("y").cast("int"))
      .count()
    assert(wrong == 0L)
    // the separating direction dominates the noise dim
    assert(math.abs(m.weights(1)) > 5 * math.abs(m.weights(2)))
    df.unpersist()
  }

  test("scoreColumn reproduces the driver-side sigmoid exactly") {
    import spark.implicits._
    val df = separable(50)
    val w = Array(0.3, -1.2, 0.7)
    val got = scoreLogistic(df, "x", w)
      .select(col("id"), col("score")).as[(Long, Double)].collect().toMap
    separable(50).as[(Long, Array[Double], Double)].collect().foreach {
      case (id, x, _) =>
        val dot = x.indices.map(j => w(j) * x(j)).sum
        val want = 1.0 / (1.0 + math.exp(-dot))
        assert(math.abs(got(id) - want) < 1e-12)
    }
  }

  test("l2 shrinks weights; guards fire on bad input") {
    val df = separable(100).cache()
    val plain = trainLogistic(df, "x", "y", steps = 30, lr = 1.0)
    val reg = trainLogistic(df, "x", "y", steps = 30, lr = 1.0, l2 = 0.5)
    val n2 = (w: Array[Double]) => math.sqrt(w.map(v => v * v).sum)
    assert(n2(reg.weights) < n2(plain.weights))
    intercept[IllegalArgumentException](
      trainLogistic(df, "x", "y", steps = 0))
    intercept[IllegalArgumentException](
      trainLogistic(df.filter(lit(false)), "x", "y", steps = 1))
    import spark.implicits._
    val ragged = Seq((Array(1.0), 0.0), (Array(1.0, 2.0), 1.0)).toDF("x", "y")
    intercept[Exception](trainLogistic(ragged, "x", "y", steps = 1))
    df.unpersist()
  }

  test("posWeight: 1.0 is bit-identical; raising it moves the boundary " +
      "toward recalling positives") {
    import spark.implicits._
    // imbalanced, overlapping cloud: 10% positives shifted only +0.5
    val df = (0 until 300).map { i =>
      val pos = i % 10 == 0
      val base = ((i * 37) % 21 - 10) * 0.2
      (i.toLong, Array(1.0, base + (if (pos) 0.5 else 0.0)),
        if (pos) 1.0 else 0.0)
    }.toDF("id", "x", "y").cache()
    val a = trainLogistic(df, "x", "y", steps = 40, lr = 0.5)
    val b = trainLogistic(df, "x", "y", steps = 40, lr = 0.5, posWeight = 1.0)
    // same code path (default = 1.0); tolerance because treeAggregate's
    // combine ORDER is arrival-dependent across runs — the ×1.0 itself
    // is an exact identity
    assert(a.weights.zip(b.weights).forall { case (u, v) =>
      math.abs(u - v) < 1e-12 })
    assert(a.losses.zip(b.losses).forall { case (u, v) =>
      math.abs(u - v) < 1e-12 })
    val up = trainLogistic(df, "x", "y", steps = 40, lr = 0.5, posWeight = 9.0)
    def recall(w: Array[Double]) = {
      val s = scoreLogistic(df, "x", w)
      s.filter(col("y") === 1.0 && col("score") >= 0.5).count().toDouble /
        s.filter(col("y") === 1.0).count()
    }
    assert(recall(up.weights) > recall(a.weights))
    intercept[IllegalArgumentException](
      trainLogistic(df, "x", "y", posWeight = 0.0))
    df.unpersist()
  }

  test("crossValAuc: separable data scores ~1 on every held-out fold; " +
      "folds partition the data") {
    val df = separable(300).cache()
    val cv = crossValAuc(df, "id", "x", "y", k = 3, steps = 40, lr = 1.0)
      .collect()
    assert(cv.length == 3)
    assert(cv.map(_.getAs[Int]("fold")).toSeq == Seq(0, 1, 2))
    val n = cv.map(r => r.getAs[Long]("pos") + r.getAs[Long]("neg")).sum
    assert(n == 300L)
    cv.foreach { r =>
      assert(r.getAs[Long]("n_train") == 300L - r.getAs[Long]("pos") -
        r.getAs[Long]("neg"))
      assert(r.getAs[Double]("auc_roc") > 0.99,
        s"fold ${r.getAs[Int]("fold")}: ${r.getAs[Double]("auc_roc")}")
    }
    intercept[IllegalArgumentException](
      crossValAuc(df, "id", "x", "y", k = 1))
    df.unpersist()
  }

  test("crossValAuc with components keeps near-dup cliques in one fold") {
    import spark.implicits._
    val df = separable(120).cache()
    // clique {0..9} all map to representative 0
    val comps = (0L to 9L).map(id => (id, 0L)).toDF("id", "component")
    val folded = Sampling.componentSafeKFold(df, comps, "id", k = 3)
    val cliqueFolds = folded.filter(col("id") <= 9)
      .select("fold").distinct().count()
    assert(cliqueFolds == 1L) // the whole clique lands in ONE fold
    val cv = crossValAuc(df, "id", "x", "y", k = 3, steps = 30, lr = 1.0,
      components = Some(comps)).collect()
    assert(cv.length == 3)
    assert(cv.map(r => r.getAs[Long]("pos") + r.getAs[Long]("neg")).sum
      == 120L)
    df.unpersist()
  }

  test("featureImportance: |w|·σ normalized; constant feature scores 0") {
    import spark.implicits._
    // x1 constant; x2 has σ = 2·σ(x3) but half the weight → equal raw
    val df = (0 until 100).map { i =>
      val v = (i % 11 - 5).toDouble
      (i.toLong, Array(1.0, 2.0 * v, v))
    }.toDF("id", "x")
    val fi = featureImportance(df, "x", Array(5.0, 1.0, 2.0))
      .orderBy("dim")
      .as[(Int, Double, Double, Double)].collect()
    assert(fi(0)._4 == 0.0) // constant bias: σ = 0
    assert(math.abs(fi(1)._4 - 0.5) < 1e-12)
    assert(math.abs(fi(2)._4 - 0.5) < 1e-12)
    assert(math.abs(fi.map(_._4).sum - 1.0) < 1e-12)
  }

  test("saveModel/loadModel: exact parquet round-trip") {
    val df = separable(60).cache()
    val m = trainLogistic(df, "x", "y", steps = 10, lr = 0.5)
    val path = java.nio.file.Files
      .createTempDirectory("graft-logreg").toString + "/model"
    saveModel(m, path, spark)
    val back = loadModel(path, spark)
    assert(back.weights.sameElements(m.weights))
    assert(back.losses.sameElements(m.losses))
    // scoring through the reloaded model is identical
    import spark.implicits._
    val a = scoreLogistic(df, "x", m.weights)
      .select("id", "score").as[(Long, Double)].collect().toMap
    val b = scoreLogistic(df, "x", back.weights)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(a == b)
    intercept[Exception](loadModel(path + "-nope", spark))
    df.unpersist()
  }

  test("null labels/features are dropped, not trained on") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(1.0)),
      (None: Option[Array[Double]], Some(0.0)),
      (Some(Array(1.0, -2.0)), None: Option[Double]),
      (Some(Array(1.0, -2.0)), Some(0.0))).toDF("x", "y")
    val clean = Seq((Array(1.0, 2.0), 1.0), (Array(1.0, -2.0), 0.0))
      .toDF("x", "y")
    val a = trainLogistic(df, "x", "y", steps = 5, lr = 0.5).weights
    val b = trainLogistic(clean, "x", "y", steps = 5, lr = 0.5).weights
    assert(a.zip(b).forall { case (u, v) => math.abs(u - v) < 1e-12 })
  }
}
