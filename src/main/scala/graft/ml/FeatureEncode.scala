package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encodings for model-training pipelines — the
  * standard tabular-ML preprocessing ops (smoothed target encoding,
  * leave-one-out, weight of evidence / information value, one-hot,
  * frequency) expressed as bounded-aggregate + broadcast-join-back
  * plans.
  *
  * Scale shape shared by all: ONE hash aggregate folds the corpus to a
  * per-category frame (bounded by column cardinality), scalar priors
  * ride along as broadcast one-row frames, and the encode itself is a
  * broadcast hash join back onto the corpus (AQE broadcasts the
  * category frame; a 100-TB corpus never shuffles). Nothing here uses
  * a UDF — every encode is a codegen'd projection. */
object FeatureEncode {

  /** Frequency (count) encoding: `outCol` = n_category / N. Nulls get
    * null. */
  def frequencyEncode(df: DataFrame, c: String,
                      outCol: String = ""): DataFrame = {
    val out = if (outCol.isEmpty) s"${c}_freq" else outCol
    val counts = df.filter(col(c).isNotNull).groupBy(col(c).as("__cat"))
      .agg(count(lit(1)).as("__cn"))
    val total = counts.agg(sum("__cn").cast("double").as("__tot"))
    val table = counts.crossJoin(broadcast(total))
      .select(col("__cat"), (col("__cn") / col("__tot")).as(out))
    df.join(broadcast(table), df(c) === table("__cat"), "left").drop("__cat")
  }

  /** Per-category smoothed-mean table for `targetCol`:
    * enc = (Σy_c + m·prior) / (n_c + m) with prior the global target
    * mean — the additive-smoothing target encoding (m = `smoothing`
    * pseudo-observations of the prior). Returns the bounded TABLE
    * (category, n, enc); join it back with [[targetEncode]] or inspect
    * it directly. Null categories/targets are excluded. */
  def targetEncodeTable(df: DataFrame, c: String, targetCol: String,
                        smoothing: Double = 20.0): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val y = col(targetCol).cast("double")
    val clean = df.filter(col(c).isNotNull && y.isNotNull)
    val g = clean.groupBy(col(c).as("category"))
      .agg(count(lit(1)).as("n"), sum(y).as("__sum"))
    val prior = clean.agg((sum(y) / count(lit(1))).as("__prior"))
    g.crossJoin(broadcast(prior))
      .withColumn("enc",
        (col("__sum") + lit(smoothing) * col("__prior")) /
          (col("n") + lit(smoothing)))
      .drop("__sum", "__prior")
  }

  /** Adds `outCol` = the smoothed target encoding of `c` to every row
    * (broadcast join against [[targetEncodeTable]]); unseen/null
    * categories fall back to the global prior. */
  def targetEncode(df: DataFrame, c: String, targetCol: String,
                   smoothing: Double = 20.0,
                   outCol: String = ""): DataFrame = {
    val out = if (outCol.isEmpty) s"${c}_enc" else outCol
    val y = col(targetCol).cast("double")
    val prior = df.filter(col(c).isNotNull && y.isNotNull)
      .agg((sum(y) / count(lit(1))).as("__prior"))
    val table = targetEncodeTable(df, c, targetCol, smoothing)
      .withColumnRenamed("category", "__cat")
      .withColumnRenamed("enc", out).drop("n")
    df.join(broadcast(table), df(c) === col("__cat"), "left")
      .drop("__cat")
      .crossJoin(broadcast(prior))
      .withColumn(out, coalesce(col(out), col("__prior")))
      .drop("__prior")
  }

  /** Leave-one-out target encoding: each row's own target is excluded
    * from its category mean — the standard train-side variant that
    * avoids leaking y_i into its own feature:
    * enc_i = (Σy_c − y_i + m·prior) / (n_c − 1 + m). With m = 0 a
    * singleton category yields null (0/0 guarded); any m > 0 keeps it
    * defined. Rows with null category or target get the prior. */
  def targetEncodeLoo(df: DataFrame, c: String, targetCol: String,
                      smoothing: Double = 20.0,
                      outCol: String = ""): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val out = if (outCol.isEmpty) s"${c}_enc" else outCol
    val y = col(targetCol).cast("double")
    val clean = df.filter(col(c).isNotNull && y.isNotNull)
    val g = clean.groupBy(col(c).as("__cat"))
      .agg(count(lit(1)).cast("double").as("__cn"), sum(y).as("__sum"))
    val prior = clean.agg((sum(y) / count(lit(1))).as("__prior"))
    val joined = df.join(broadcast(g), df(c) === col("__cat"), "left")
      .crossJoin(broadcast(prior))
    val denom = col("__cn") - 1 + lit(smoothing)
    joined
      .withColumn(out,
        when(col("__cat").isNull || y.isNull, col("__prior"))
          .when(denom > 0,
            (col("__sum") - y + lit(smoothing) * col("__prior")) / denom))
      .drop("__cat", "__cn", "__sum", "__prior")
  }

  /** Weight-of-evidence table for a binary label: per category,
    * woe = ln(((pos_c + eps)/(pos_tot + 2·eps)) /
    *          ((neg_c + eps)/(neg_tot + 2·eps)))
    * with `eps` the half-count Laplace guard against empty cells, plus
    * the category's IV term (pos_share − neg_share)·woe. Sum the iv
    * column for the column's information value, or use
    * [[informationValue]] for the multi-column single-shuffle form. */
  def woeTable(df: DataFrame, c: String, labelCol: String,
               eps: Double = 0.5): DataFrame = {
    val lab = col(labelCol).cast("double")
    val clean = df.filter(col(c).isNotNull && lab.isNotNull)
    val g = clean.groupBy(col(c).as("category"))
      .agg(sum(lab).as("__pos"), (count(lit(1)) - sum(lab)).as("__neg"))
    val tot = g.agg(sum("__pos").as("__pt"), sum("__neg").as("__nt"))
    val posShare = (col("__pos") + eps) / (col("__pt") + 2 * eps)
    val negShare = (col("__neg") + eps) / (col("__nt") + 2 * eps)
    g.crossJoin(broadcast(tot))
      .withColumn("n_pos", col("__pos").cast("long"))
      .withColumn("n_neg", col("__neg").cast("long"))
      .withColumn("woe", log(posShare / negShare))
      .withColumn("iv", (posShare - negShare) * log(posShare / negShare))
      .select("category", "n_pos", "n_neg", "woe", "iv")
  }

  /** Information value of EVERY column in `cols` against the label in
    * ONE corpus pass: the (column, value) pairs are exploded from a map
    * projection, so k columns cost one shuffle of the per-(col, value)
    * counts, not k aggregate jobs. Returns (column, n_categories, iv),
    * one row per input column. IV rule of thumb: <0.02 useless,
    * 0.1-0.3 medium, >0.5 suspicious. */
  def informationValue(df: DataFrame, cols: Seq[String], labelCol: String,
                       eps: Double = 0.5): DataFrame = {
    require(cols.nonEmpty, "informationValue needs at least one column")
    val lab = col(labelCol).cast("double")
    val pairs = df.filter(lab.isNotNull)
      .select(lab.as("__y"),
        explode(map(cols.flatMap(c =>
          Seq(lit(c), col(c).cast("string"))): _*)).as(Seq("__col", "__val")))
      .filter(col("__val").isNotNull)
    val g = pairs.groupBy("__col", "__val")
      .agg(sum("__y").as("__pos"), (count(lit(1)) - sum("__y")).as("__neg"))
    val tot = g.groupBy("__col")
      .agg(sum("__pos").as("__pt"), sum("__neg").as("__nt"),
        count(lit(1)).as("n_categories"))
    val posShare = (col("__pos") + eps) / (col("__pt") + 2 * eps)
    val negShare = (col("__neg") + eps) / (col("__nt") + 2 * eps)
    g.join(broadcast(tot), "__col")
      .withColumn("__iv", (posShare - negShare) * log(posShare / negShare))
      .groupBy(col("__col").as("column"))
      .agg(max("n_categories").as("n_categories"), sum("__iv").as("iv"))
  }

  /** One-hot encodes `c` into `prefix`_<category> 0/1 integer columns
    * for the EXPLICIT category list (data-independent schema — the only
    * kind that survives a distributed setting without a dictionary
    * pass); values outside the list, including null, get all zeros.
    * Pure projection: no shuffle, no job. */
  def oneHot(df: DataFrame, c: String, categories: Seq[String],
             prefix: String = ""): DataFrame = {
    require(categories.nonEmpty, "oneHot needs an explicit category list")
    require(categories.distinct.size == categories.size,
      "oneHot categories must be distinct")
    val p = if (prefix.isEmpty) c else prefix
    categories.foldLeft(df) { (acc, cat) =>
      acc.withColumn(s"${p}_$cat",
        when(col(c) === cat, 1).otherwise(0))
    }
  }
}
