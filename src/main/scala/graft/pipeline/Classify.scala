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
  * Determinism: zero init, no sampling, per-partition sum order fixed —
  * but treeAggregate COMBINES partials in task-arrival order, so
  * repeated runs agree only to reduce-order ulps (~1e-13 relative), not
  * bit-exactly. A fixed small step count is replayable in external SQL
  * (the q_logreg_step oracle replays two full-batch steps; its 1e-6
  * rounding absorbs the reorder noise).
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
    * free in n. `posWeight` multiplies the positive class's gradient and
    * loss contributions (set ≈ n_neg/n_pos when good docs are rare —
    * the usual shape of a quality-labeling effort); the default 1.0 is
    * an exact no-op.
    */
  def trainLogistic(df: DataFrame, featuresCol: String, labelCol: String,
                    steps: Int = 50, lr: Double = 0.5,
                    l2: Double = 0.0, posWeight: Double = 1.0): LogisticModel = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(lr > 0.0, s"lr must be > 0, got $lr")
    require(l2 >= 0.0, s"l2 must be >= 0, got $l2")
    require(posWeight > 0.0, s"posWeight must be > 0, got $posWeight")
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
          // posWeight scales the positive class's gradient AND loss terms
          // (the standard imbalance correction); 1.0 multiplies exactly,
          // so the default path is bit-identical to unweighted
          val wRow = if (y > 0.5) posWeight else 1.0
          val r = (p - y) * wRow
          j = 0
          while (j < dim) { g(j) += r * x(j); j += 1 }
          // clamp avoids -inf on saturated correct/incorrect rows
          val pc = math.min(math.max(p, 1e-15), 1.0 - 1e-15)
          (g, l0 - wRow * (y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc)),
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

  /** Standardized feature importance: |w_j|·σ_j (weight × feature
    * standard deviation), normalized to sum 1 — the "which quality
    * signal actually drives the filter" readout, comparable across
    * features with different scales. ONE aggregation computes the
    * per-dim stddevs; the rest is driver arithmetic on d doubles.
    * Constant features (σ = 0) get importance 0. */
  def featureImportance(df: DataFrame, featuresCol: String,
                        weights: Array[Double]): DataFrame = {
    require(weights.nonEmpty, "featureImportance: empty weights")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = weights.length
    val stds = df.na.drop(Seq(featuresCol))
      .select((0 until dim).map(j =>
        stddev_samp(element_at(col(featuresCol), j + 1).cast("double"))
          .as(s"s$j")): _*)
      .head()
    val raw = (0 until dim).map { j =>
      val s = if (stds.isNullAt(j)) 0.0 else stds.getDouble(j)
      math.abs(weights(j)) * (if (s.isNaN) 0.0 else s)
    }
    val total = raw.sum
    (0 until dim).map { j =>
      (j, weights(j), raw(j),
        if (total > 0) raw(j) / total else 0.0)
    }.toDF("dim", "weight", "raw_importance", "importance")
  }

  /** Persist a trained model as a self-describing parquet table (one
    * row per weight + a meta row carrying the loss trace length), the
    * [[Quantize.writeIvfPq]] convention: train once, score many ingest
    * cycles later without retraining. */
  def saveModel(model: LogisticModel, path: String,
                spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows = model.weights.zipWithIndex.map { case (w, j) =>
      ("w", j, w) } ++
      model.losses.zipWithIndex.map { case (l, s) => ("loss", s, l) }
    rows.toSeq.toDF("kind", "idx", "value")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[saveModel]]. */
  def loadModel(path: String,
                spark: org.apache.spark.sql.SparkSession): LogisticModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .as[(String, Int, Double)].collect()
    val w = rows.filter(_._1 == "w").sortBy(_._2).map(_._3)
    val l = rows.filter(_._1 == "loss").sortBy(_._2).map(_._3)
    require(w.nonEmpty, s"loadModel: no weights at $path")
    LogisticModel(w, l)
  }

  /** K-fold cross-validated AUC of the logistic classifier — the "does
    * the quality scorer generalize, or did it memorize the labelers'
    * quirks" check run BEFORE scoring a 100-TB corpus. Folds are the
    * deterministic Lehmer assignment ([[Sampling.kFold]] — reproducible
    * across runs and partitionings); each fold's model trains on the
    * other k−1 folds and scores the held-out fold, and one grouped
    * rank-identity AUC pass ([[graft.eval.BinaryMetrics.aucBy]]) scores
    * all folds together. Output: (fold, n_train, pos, neg, auc_roc) —
    * pos+neg = the fold's test rows.
    *
    * Cost: the labeled frame is cached once; training is k·steps
    * treeAggregate passes over it (labeled sets are small — this is
    * driver-paced by design), evaluation one shuffle. The corpus itself
    * is never touched. */
  def crossValAuc(df: DataFrame, idCol: String, featuresCol: String,
                  labelCol: String, k: Int = 5, steps: Int = 50,
                  lr: Double = 0.5, l2: Double = 0.0,
                  posWeight: Double = 1.0, seed: Long = 0L,
                  components: Option[DataFrame] = None): DataFrame = {
    require(k >= 2, s"crossValAuc needs k >= 2, got $k")
    val labeled = df.na.drop(Seq(idCol, featuresCol, labelCol))
    // components: near-dup (id, component) pairs — fold on the component
    // REPRESENTATIVE so a duplicate clique never straddles folds and the
    // held-out AUC can't be inflated by validating on near-copies of
    // training docs (the componentSafeSplit leakage argument, applied
    // to cross-validation)
    val folded = (components match {
      case Some(c) => Sampling.componentSafeKFold(labeled, c, idCol, k, seed)
      case None    => Sampling.kFold(labeled, idCol, k, seed)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = folded.count()
      val scored = (0 until k).map { f =>
        val m = trainLogistic(folded.filter(col("fold") =!= f),
          featuresCol, labelCol, steps, lr, l2, posWeight)
        scoreLogistic(folded.filter(col("fold") === f), featuresCol,
            m.weights)
          .select(col("fold"), col("score"), col(labelCol).as("__graft_y"))
      }.reduce(_ unionAll _)
      val auc = graft.eval.BinaryMetrics.aucBy(scored, "score",
        "__graft_y", "fold")
      // n_train = everything outside the fold (cheap driver arithmetic)
      auc.withColumn("n_train", lit(total) - col("pos") - col("neg"))
        .select(col("fold"), col("n_train"), col("pos"), col("neg"),
          col("auc_roc"))
        .orderBy("fold")
        // the persisted fold frame feeds k+1 jobs lazily — materialize
        // the small result before releasing it
        .localCheckpoint(eager = true)
    } finally folded.unpersist()
  }
}
