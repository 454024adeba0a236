package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifier (extension tier — no reference
  * analog): full-batch logistic regression trained by gradient descent,
  * the corpus-filtering primitive behind CCNet/GPT-style "quality
  * classifier" curation — label a few thousand docs good/bad, train,
  * score the whole corpus, keep above a threshold. Pairs with
  * [[TextAnalysis]]'s hashed-TF embeddings or quality-signal columns as
  * the feature source.
  *
  * Scale shape: each step is ONE `treeAggregate` pass folding a
  * (gradient[d], loss, n) partial per partition — no shuffle, no per-row
  * state; the model is d doubles on the driver. Training cost is
  * `steps` scans of the LABELED set (typically tiny next to the corpus —
  * cache it); SCORING the full corpus is a stateless broadcast
  * projection, one map pass. That is the 100-TB story: the corpus is
  * touched once, by the cheap half.
  *
  * Determinism: zero init, fixed partitioning ⇒ fixed double-sum order,
  * no sampling — the trained weights are bit-reproducible for a given
  * input layout, and a fixed small step count is replayable in external
  * SQL (the q_logreg_step oracle replays two full-batch steps exactly,
  * modulo 1e-6 rounding for sum-order ulps).
  */
object Classify {

  /** Trained model: `weights(j)` multiplies feature j; `losses(s)` is the
    * mean log-loss BEFORE step s's update (so losses.head is the loss at
    * the zero init, ln 2). */
  final case class LogisticModel(weights: Array[Double],
                                 losses: Array[Double]) {
    def dim: Int = weights.length
  }

  /** Full-batch gradient-descent logistic regression.
    *
    * w ← w − lr·( (1/n)·Σᵢ (σ(w·xᵢ) − yᵢ)·xᵢ + l2·w ); zero init.
    * `featuresCol` is an array column (cast to double); include a 1.0
    * bias term in the features if an intercept is wanted. Labels must be
    * 0/1. Rows with a null label or features are dropped; all feature
    * vectors must share one length.
    *
    * Each step scans `df` once (treeAggregate) — cache the labeled frame
    * for multi-step training. The mean-gradient form keeps `lr` scale-
    * free in n.
    */
  def trainLogistic(df: DataFrame, featuresCol: String, labelCol: String,
                    steps: Int = 50, lr: Double = 0.5,
                    l2: Double = 0.0): LogisticModel = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(lr > 0.0, s"lr must be > 0, got $lr")
    require(l2 >= 0.0, s"l2 must be >= 0, got $l2")
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.na.drop(Seq(featuresCol, labelCol))
      .select(col(labelCol).cast("double"),
        transform(col(featuresCol), x => x.cast("double")))
      .as[(Double, Array[Double])]
    val dim = {
      val head = data.limit(1).collect()
      require(head.nonEmpty, "trainLogistic: no non-null labeled rows")
      head(0)._2.length
    }
    val w = new Array[Double](dim)
    val losses = new Array[Double](steps)
    var s = 0
    while (s < steps) {
      // partial = (grad sums [dim], loss sum, n)
      val zero = (null: Array[Double], 0.0, 0L)
      val (gs, lossSum, n) = data.rdd.treeAggregate(zero)(
        seqOp = { case ((g0, l0, n0), (y, x)) =>
          require(x.length == dim,
            s"trainLogistic: feature length ${x.length} != $dim")
          val g = if (g0 == null) new Array[Double](dim) else g0
          var dot = 0.0
          var j = 0
          while (j < dim) { dot += w(j) * x(j); j += 1 }
          val p = 1.0 / (1.0 + math.exp(-dot))
          val r = p - y
          j = 0
          while (j < dim) { g(j) += r * x(j); j += 1 }
          // clamp avoids -inf on saturated correct/incorrect rows
          val pc = math.min(math.max(p, 1e-15), 1.0 - 1e-15)
          (g, l0 - (y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc)),
            n0 + 1L)
        },
        combOp = { case ((ga, la, na), (gb, lb, nb)) =>
          if (ga == null) (gb, la + lb, na + nb)
          else if (gb == null) (ga, la + lb, na + nb)
          else {
            var j = 0
            while (j < dim) { ga(j) += gb(j); j += 1 }
            (ga, la + lb, na + nb)
          }
        })
      require(n > 0, "trainLogistic: no non-null labeled rows")
      losses(s) = lossSum / n
      var j = 0
      while (j < dim) {
        w(j) -= lr * (gs(j) / n + l2 * w(j))
        j += 1
      }
      s += 1
    }
    LogisticModel(w, losses)
  }

  /** σ(w·x) as a Column over the array column — a pure codegen'd
    * projection (element_at at LITERAL indexes, no HOF re-evaluation),
    * broadcast-free: the weights inline as literals. Scoring a 100-TB
    * corpus is exactly one map pass over the scan. */
  def scoreColumn(featuresCol: Column, weights: Array[Double]): Column = {
    require(weights.nonEmpty, "scoreColumn: empty weights")
    var dot: Column = lit(0.0)
    var j = 0
    while (j < weights.length) {
      dot = dot + element_at(featuresCol, j + 1).cast("double") * weights(j)
      j += 1
    }
    lit(1.0) / (lit(1.0) + exp(-dot))
  }

  /** Corpus scoring facade: adds `scoreCol` = σ(w·features). */
  def scoreLogistic(df: DataFrame, featuresCol: String,
                    weights: Array[Double],
                    scoreCol: String = "score"): DataFrame =
    df.withColumn(scoreCol, scoreColumn(col(featuresCol), weights))
}
