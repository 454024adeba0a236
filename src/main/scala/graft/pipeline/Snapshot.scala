package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing: what changed between two crawls/exports of
  * the same id space — the op that decides how much incremental work a
  * re-crawl actually created (feed `added`/`changed` ids into the
  * incremental dedup screens, skip the rest).
  *
  * Both sides reduce to (id, 128-bit content fingerprint) projections
  * before the single full-outer shuffle join on id, so the join carries
  * two slim columns regardless of document width — at 100 TB the cost
  * is two scans plus one sort-merge join on the id key, never a
  * text-width shuffle. Contract: `idCol` is unique WITHIN each snapshot
  * (the usual primary-key contract of the incremental tier); duplicate
  * ids would cross-product in the join.
  */
object Snapshot {

  /** Per-id change status between `old` and `neu`: one row per id seen
    * in either snapshot, status ∈ added (new side only) / removed (old
    * side only) / changed (both, different `textCol` content) /
    * unchanged. Null text fingerprints as the empty string, so
    * null == null compares unchanged (and null vs text compares
    * changed) instead of poisoning the equality with SQL null. */
  def diff(old: DataFrame, neu: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    Similarity.requireIntegralId(old, idCol, "Snapshot.diff")
    Similarity.requireIntegralId(neu, idCol, "Snapshot.diff")
    graft.util.Errors.context("Snapshot.diff", Seq(idCol, textCol)) {
    def side(df: DataFrame, fp: String) =
      df.na.drop(Seq(idCol))
        .select(col(idCol).cast("long").as("__graft_id"),
          coalesce(md5(col(textCol).cast("binary")), lit("")).as(fp))
    side(old, "__graft_fp_old")
      .join(side(neu, "__graft_fp_new"), Seq("__graft_id"), "full_outer")
      .select(col("__graft_id").as(idCol),
        when(col("__graft_fp_old").isNull, "added")
          .when(col("__graft_fp_new").isNull, "removed")
          .when(col("__graft_fp_old") === col("__graft_fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  } }

  /** One-row-per-status counts of [[diff]] — the "how big is the delta"
    * number an incremental pipeline branches on (one extra agg). */
  def diffReport(old: DataFrame, neu: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    diff(old, neu, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** Schema drift between two frames — the row-content companion above
    * answers "which documents changed"; this answers "did the UPSTREAM
    * change shape" (a crawler adding a field, a type widening, a column
    * silently dropped), the check an ingestion job runs BEFORE touching
    * data. Pure driver-side StructType comparison — no job, no scan.
    * One row per column in either schema: (column, status ∈ added /
    * removed / type_changed / nullability_changed / unchanged,
    * type_old, type_new). Column order is ignored (parquet readers
    * resolve by name); `added` means present only in `neu`. */
  def schemaDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val a = old.schema.map(f => f.name -> f).toMap
    val b = neu.schema.map(f => f.name -> f).toMap
    (a.keySet ++ b.keySet).toSeq.sorted.map { name =>
      (a.get(name), b.get(name)) match {
        case (None, Some(f)) =>
          (name, "added", null: String, f.dataType.sql)
        case (Some(f), None) =>
          (name, "removed", f.dataType.sql, null: String)
        case (Some(fa), Some(fb)) if fa.dataType != fb.dataType =>
          (name, "type_changed", fa.dataType.sql, fb.dataType.sql)
        case (Some(fa), Some(fb)) if fa.nullable != fb.nullable =>
          (name, "nullability_changed", fa.dataType.sql, fb.dataType.sql)
        case (Some(fa), Some(fb)) =>
          (name, "unchanged", fa.dataType.sql, fb.dataType.sql)
      }
    }.toDF("column", "status", "type_old", "type_new")
  }
}
