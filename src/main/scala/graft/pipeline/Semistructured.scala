package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured (JSON string column) tier: profile the keys actually
  * present, extract typed fields through one parse, and infer a full
  * schema from a bounded sample. Event streams routinely carry a
  * free-form `props` JSON column; at 100 TB the discipline is (1) learn
  * the schema from a SAMPLE, (2) parse the full scan ONCE with an
  * explicit schema (`from_json` is codegen'd and a single parse feeds
  * every extracted field), never per-field `get_json_object` re-parses.
  */
object Semistructured {

  /** Per-top-level-key profile of a JSON column: for each key that
    * appears in any row — `key, cnt` (rows carrying the key),
    * `share` (cnt / rows with non-null JSON), `n_distinct` (distinct
    * values as text), `n_numeric` (values parseable as double),
    * `avg_num` (mean of the numeric ones; null if none).
    *
    * The generic parse is `from_json` to `MAP<STRING,STRING>` — one
    * pass, no per-key path probing, works with an unknown key universe.
    * Scalar JSON values arrive as their text form (`87` → "87"), which
    * is exactly what a profile needs: distinctness over text, numeric
    * share via try-cast.
    *
    * Scale shape: one projection + explode (rows × keys-per-row), one
    * hash aggregate keyed on `key` (vocab-of-keys result rows), plus a
    * broadcast scalar count for `share`. No driver collection. */
  def jsonProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val present = df.filter(col(jsonCol).isNotNull)
    val kv = present.select(
      explode(from_json(col(jsonCol), MapType(StringType, StringType)))
        .as(Seq("key", "value")))
    val total = present.agg(count(lit(1)).as("__total"))
    // try_cast, not cast: under ANSI (Spark 4 default) a bare cast on a
    // non-numeric value string would fail the whole scan
    val num = expr("try_cast(value AS double)")
    kv.groupBy("key").agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("value")).as("n_distinct"),
        count(num).as("n_numeric"),
        avg(num).as("avg_num"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), col("n_distinct"), col("n_numeric"),
        col("avg_num"),
        (col("cnt").cast(DoubleType) /
          greatest(col("__total").cast(DoubleType), lit(1.0))).as("share"))
  }

  /** Extract typed fields from a JSON column in ONE parse: `fields` maps
    * output column name → (top-level key, Spark type). The whole frame
    * is preserved; extracted columns are appended. Missing keys and
    * type-mismatched values yield null (from_json's PERMISSIVE mode) —
    * the right contract for dirty event streams.
    *
    * Plan shape: a single `from_json` to a struct; Catalyst's
    * OptimizeJsonExprs collapses the struct field accesses so only the
    * requested paths are materialized. Pure projection — no shuffle. */
  def extractFields(df: DataFrame, jsonCol: String,
                    fields: Seq[(String, String, DataType)]): DataFrame = {
    require(fields.nonEmpty, "extractFields needs at least one field")
    val schema = StructType(fields.map { case (_, key, t) =>
      StructField(key, t) })
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    parsed.select(
      df.columns.map(col) ++
        fields.map { case (out, key, _) => col(s"__j.`$key`").as(out) }: _*)
  }

  /** Schema-drift report between two snapshots of a JSON column: which
    * top-level keys appeared, disappeared, or changed shape. One row
    * per key seen in either side — (key, status ∈ added/removed/common,
    * cnt_old, cnt_new, share_old, share_new, n_distinct_old,
    * n_distinct_new), counts coalesced to 0 on the absent side. The
    * JSON sibling of [[Snapshot.schemaDiff]]: parquet columns are
    * declared, JSON keys are only discoverable by scanning — this is
    * the scan.
    *
    * Scale shape: two [[jsonProfile]] passes (one per snapshot — each
    * a single parse + key-keyed aggregate) and one full-outer join on
    * the key, a vocab-of-keys-sized frame. */
  def jsonProfileDiff(old: DataFrame, neu: DataFrame,
                      jsonCol: String): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      jsonProfile(df, jsonCol).select(col("key"),
        col("cnt").as(s"cnt_$sfx"), col("share").as(s"share_$sfx"),
        col("n_distinct").as(s"n_distinct_$sfx"))
    side(old, "old").join(side(neu, "new"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("cnt_old").isNull, "added")
          .when(col("cnt_new").isNull, "removed")
          .otherwise("common").as("status"),
        coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
        coalesce(col("cnt_new"), lit(0L)).as("cnt_new"),
        coalesce(col("share_old"), lit(0.0)).as("share_old"),
        coalesce(col("share_new"), lit(0.0)).as("share_new"),
        coalesce(col("n_distinct_old"), lit(0L)).as("n_distinct_old"),
        coalesce(col("n_distinct_new"), lit(0L)).as("n_distinct_new"))
  }

  /** Infer a full (possibly nested) schema for a JSON column from a
    * bounded sample of `sampleN` rows, using Spark's own JSON schema
    * inference. The sample is bounded by `limit` (one small job); the
    * returned StructType is then the explicit schema to feed
    * `extractFields`/`from_json` on the FULL scan — inference never
    * touches the whole corpus. */
  def inferJsonSchema(df: DataFrame, jsonCol: String,
                      sampleN: Int = 10000): StructType = {
    val spark = df.sparkSession
    val sample = df.select(col(jsonCol)).na.drop().limit(sampleN)
      .as[String](Encoders.STRING)
    spark.read.json(sample).schema
  }
}
