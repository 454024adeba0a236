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

  /** Apply a CDC change batch to a snapshot (SCD TYPE-1 upsert/delete
    * merge — the MERGE INTO of the incremental tier): `changes` carries
    * (idCol, opCol ∈ {"U","D"}, seqCol, payloadCols…); for each id the
    * HIGHEST-seq change wins (ties broken by the full (seq, op,
    * payload…) struct order, so the result is deterministic even under
    * seq collisions), then: winning op "D" removes the id, "U" upserts
    * the winning payload (insert if the id was absent), ids without
    * changes pass through from `snapshot` verbatim.
    *
    * Contract: `idCol` unique within `snapshot` (the snapshot-tier
    * primary-key contract); `snapshot` must contain exactly
    * (idCol, payloadCols…)-compatible columns.
    *
    * Scale shape: one hash aggregate over the CHANGE BATCH (batch-
    * bounded — one max(struct) winner per changed id, no window), then
    * one outer join keyed on id; the 100-TB snapshot shuffles once (or
    * not at all when AQE broadcasts the batch-sized winner side). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, idCol: String,
                   opCol: String, seqCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "applyChanges needs payload columns")
    graft.util.Errors.context("Snapshot.applyChanges",
        Seq(idCol, opCol, seqCol) ++ payloadCols) {
    val winner = changes.na.drop(Seq(idCol, opCol, seqCol))
      .groupBy(col(idCol).as("__graft_cid"))
      .agg(max(struct(
        (col(seqCol) +: col(opCol) +: payloadCols.map(col)): _*))
        .as("__graft_w"))
      .select(col("__graft_cid"), col(s"__graft_w.$opCol").as("__graft_op"),
        struct(payloadCols.map(c => col(s"__graft_w.$c").as(c)): _*)
          .as("__graft_payload"))
    snapshot.select(col(idCol) +: payloadCols.map(col): _*)
      .join(winner, col(idCol) === col("__graft_cid"), "full_outer")
      .filter(coalesce(col("__graft_op"), lit("U")) =!= "D")
      .select(
        coalesce(col(idCol), col("__graft_cid")).as(idCol) +:
          payloadCols.map(c =>
            when(col("__graft_op").isNotNull, col(s"__graft_payload.$c"))
              .otherwise(col(c)).as(c)): _*)
  } }

  /** One-row-per-status counts of [[diff]] — the "how big is the delta"
    * number an incremental pipeline branches on (one extra agg). */
  def diffReport(old: DataFrame, neu: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    diff(old, neu, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** Slowly-changing-dimension TYPE-2 history from a versioned record
    * stream: given rows (key, version, tracked columns), collapse runs
    * of consecutive versions with unchanged tracked values and emit one
    * validity interval per run — (key, tracked…, valid_from, valid_to,
    * n_versions, is_current), where `valid_from` is the run's first
    * version, `valid_to` the NEXT run's first version (null on the
    * current run — the standard half-open SCD2 interval), and
    * `n_versions` the collapsed run length. The warehouse op that turns
    * an append-only change log (or a stack of snapshots tagged with
    * their snapshot id) into queryable history.
    *
    * Change detection compares the tracked tuple itself null-safely
    * (struct <=> lag(struct)) — exact, no fingerprint collisions; a
    * tracked value changing A→B→A yields three intervals, as SCD2
    * requires. CONTRACT: (key, version) pairs are unique — duplicate
    * versions within a key make the lag order, and therefore the run
    * boundaries, nondeterministic. Rows with null key or version are
    * dropped.
    *
    * Scale shape: two windows and one aggregate, ALL keyed on the
    * record key (one shuffle; the second window and the agg reuse the
    * first's partitioning) — nothing global, interval count bounded by
    * the version count. */
  def scd2(df: DataFrame, keyCol: String, versionCol: String,
           tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "no tracked columns")
    require(!tracked.contains(keyCol) && !tracked.contains(versionCol),
      "tracked columns must not include the key or version column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(versionCol)
    val t = struct(tracked.map(col): _*)
    val seg = df.na.drop(Seq(keyCol, versionCol))
      .withColumn("__t", t)
      .withColumn("__chg",
        when(lag("__t", 1).over(w).isNull ||
          !(col("__t") <=> lag("__t", 1).over(w)), 1).otherwise(0))
      .withColumn("__seg", sum("__chg").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val runs = seg
      .groupBy(col(keyCol) +: col("__seg") +: tracked.map(col): _*)
      .agg(min(col(versionCol)).as("valid_from"),
        count(lit(1)).as("n_versions"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("valid_from")
    runs
      .withColumn("valid_to", lead("valid_from", 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__seg")
  }

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
