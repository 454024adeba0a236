package graft.joins

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-time (backward as-of) join — for every left row, attach the
  * LATEST right row with `right.ts <= left.ts` within the same key.
  * Spark has no native operator for this shape (kdb `aj`, pandas
  * `merge_asof`, DuckDB `ASOF JOIN` all treat it as first-class); the SQL
  * formulation (`ON l.k = r.k AND l.ts >= r.ts` + max-per-group) plans as
  * a range join that is O(|L|·|R|) per key.
  *
  * Plan shape here: tag + align both inputs, ONE hash repartition on the
  * key, one in-partition Tungsten sort by (key, ts, tag), then a single
  * carry-forward merge scan per partition — cost is sort + one pass,
  * independent of match fan-out. Right rows AT the left row's exact
  * timestamp DO match (the tag orders right before left on ties —
  * DuckDB/pandas inclusive semantics). LEFT-join semantics for null keys
  * and timestamps: left rows with a null key or ts are RETAINED with null
  * value columns (they can match nothing — a null ts is neither "before"
  * nor "after"), exactly like `ASOF LEFT JOIN`; right rows with null
  * key/ts are dropped.
  *
  * At 100 TB: one shuffle keyed on the join key, partition-local
  * sort+scan, no state beyond one carried row per key — the same shape a
  * sort-merge join has, minus the second sort (both sides union into one).
  */
object AsofJoin {

  /** @param valueCols right-side columns carried onto matches (must not
    *                  clash with left's column names)
    * @param tsCol     ordering column, present in BOTH frames (numeric or
    *                  timestamp) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, tsCol, valueCols, forward = false)

  /** Backward as-of with a MAX-GAP bound (pandas
    * `merge_asof(tolerance=...)`): a match older than `tolerance` (in
    * `tsCol` units — seconds for timestamps, raw difference for
    * numerics) is DROPPED, leaving the left row with null value columns.
    * `rightTsValueCol` names the valueCols entry carrying the matched
    * right row's ts (the gap being bounded). Applied as one projection
    * over the merge-scan output — the plan cost is [[asofJoin]]'s. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
                        keys: Seq[String], tsCol: String,
                        valueCols: Seq[String], rightTsValueCol: String,
                        tolerance: Double): DataFrame =
    withTolerance(
      asofImpl(left, right, keys, tsCol, valueCols, forward = false),
      col(tsCol).cast("double") - col(rightTsValueCol).cast("double"),
      valueCols, rightTsValueCol, tolerance)

  /** Forward as-of with a max-gap bound — see [[asofJoinTolerance]]. */
  def asofJoinForwardTolerance(left: DataFrame, right: DataFrame,
                               keys: Seq[String], tsCol: String,
                               valueCols: Seq[String],
                               rightTsValueCol: String,
                               tolerance: Double): DataFrame =
    withTolerance(
      asofImpl(left, right, keys, tsCol, valueCols, forward = true),
      col(rightTsValueCol).cast("double") - col(tsCol).cast("double"),
      valueCols, rightTsValueCol, tolerance)

  private def withTolerance(joined: DataFrame, gap: org.apache.spark.sql.Column,
                            valueCols: Seq[String], rightTsValueCol: String,
                            tolerance: Double): DataFrame = {
    require(valueCols.contains(rightTsValueCol),
      s"rightTsValueCol '$rightTsValueCol' must be one of valueCols")
    require(tolerance >= 0.0, s"tolerance must be >= 0, got $tolerance")
    val keep = col(rightTsValueCol).isNotNull && gap <= tolerance
    joined.select(joined.columns.map {
      case c if valueCols.contains(c) => when(keep, col(c)).as(c)
      case c => col(c)
    }.toIndexedSeq: _*)
  }

  /** FORWARD as-of: for every left row, attach the EARLIEST right row
    * with `right.ts >= left.ts` within the key — the "next reading after
    * the event" direction (label-at-horizon joins, next-heartbeat
    * attribution) that backward as-of can't express. Same plan as
    * [[asofJoin]] — one repartition, one in-partition sort, one merge
    * scan — just DESCENDING in ts: scanning from the future backward,
    * the carried right row at each left row is the last one seen, i.e.
    * the smallest right ts still ≥ the left ts. Ties at the exact
    * timestamp match (inclusive, mirroring the backward tier); null
    * key/ts semantics identical. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      tsCol: String, valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, tsCol, valueCols, forward = true)

  /** NEAREST as-of (pandas `merge_asof(direction='nearest')`): attach
    * whichever of the backward / forward matches lies closer in ts; ties
    * go BACKWARD (pandas convention). Composition of the two one-pass
    * scans plus one id-keyed join of their (slim) outputs — `idCol` must
    * uniquely identify left rows, and `rightTsValueCol` names the
    * valueCols entry carrying the matched right row's ts (the distance
    * the pick compares). One side missing ⇒ the other wins; both
    * missing ⇒ nulls (ASOF LEFT semantics). */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      tsCol: String, valueCols: Seq[String], idCol: String,
                      rightTsValueCol: String): DataFrame = {
    require(valueCols.contains(rightTsValueCol),
      s"rightTsValueCol '$rightTsValueCol' must be one of valueCols")
    val back = asofImpl(left, right, keys, tsCol, valueCols, forward = false)
    val fwd = asofImpl(left, right, keys, tsCol, valueCols, forward = true)
      .select((col(idCol).as("__nid") +:
        valueCols.map(c => col(c).as(s"__f_$c"))): _*)
    val bDist = col(tsCol) - col(rightTsValueCol)
    val fDist = col(s"__f_$rightTsValueCol") - col(tsCol)
    val pickBack = col(rightTsValueCol).isNotNull &&
      (col(s"__f_$rightTsValueCol").isNull || bDist <= fDist)
    back.join(fwd, col(idCol) === col("__nid"))
      .select(back.columns.filterNot(valueCols.contains).map(col) ++
        valueCols.map(c =>
          when(pickBack, col(c)).otherwise(col(s"__f_$c")).as(c)): _*)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valueCols: Seq[String],
               forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(valueCols.nonEmpty, "asofJoin needs right-side value columns")
    val clash = valueCols.filter(left.columns.contains)
    require(clash.isEmpty, s"value columns clash with left: ${clash.mkString(", ")}")
    require(!left.columns.contains("__tag") && !right.columns.contains("__tag"),
      "__tag is reserved by asofJoin")

    val leftPayload = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    val valueTypes = valueCols.map(c => right.schema(c).dataType)

    val l2 = left.na.drop(keys :+ tsCol).select(
      keys.map(col) ++
        Seq(col(tsCol), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        valueCols.zip(valueTypes).map { case (c, t) => lit(null).cast(t).as(c) }: _*)
    val r2 = right.na.drop(keys :+ tsCol).select(
      keys.map(col) ++
        Seq(col(tsCol), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)

    val spark = left.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    // forward = the same scan from the future backward: ts DESC puts
    // later rows first, and __tag ASC still lets an equal-ts right row
    // land before its left row (inclusive ties in both directions)
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val sorted = l2.unionAll(r2)
      .repartition(np, keys.map(col): _*)
      .sortWithinPartitions((keys.map(col) :+ tsOrder :+ col("__tag")): _*)

    val k = keys.length
    val tagIdx = k + 1
    val payloadStart = k + 2
    val valueStart = payloadStart + leftPayload.length
    val nVals = valueCols.length
    val outSchema = StructType(
      keys.map(c => left.schema(c)) ++
        Seq(left.schema(tsCol)) ++
        leftPayload.map(c => left.schema(c)) ++
        valueCols.zip(valueTypes).map { case (c, t) =>
          StructField(c, t, nullable = true)
        })
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val matched = sorted.mapPartitions { rows =>
      // repartition routes every row of a key to ONE partition, so the
      // carried latest-right state is partition-local
      var curKey: Array[Any] = null
      var carry: Array[Any] = null
      // field-wise compare straight off the row — no per-row Seq
      // allocation, and Array[Byte] (BinaryType) keys compare by CONTENT
      // (Seq/== would be reference equality there: every row would look
      // like a new key and silently reset the carry)
      def sameKey(r: Row): Boolean =
        curKey != null && (0 until k).forall { i =>
          (r.get(i), curKey(i)) match {
            case (a: Array[Byte], b: Array[Byte]) =>
              java.util.Arrays.equals(a, b)
            case (a, b) => a == b
          }
        }
      rows.flatMap { r =>
        if (!sameKey(r)) { curKey = Array.tabulate(k)(r.get); carry = null }
        if (r.getInt(tagIdx) == 0) {
          carry = Array.tabulate(nVals)(i => r.get(valueStart + i))
          None
        } else {
          val vals =
            if (carry == null) Seq.fill[Any](nVals)(null) else carry.toSeq
          Some(Row.fromSeq(
            curKey.toSeq ++ Seq(r.get(k)) ++
              (0 until leftPayload.length).map(i => r.get(payloadStart + i)) ++
              vals))
        }
      }
    }(enc)
    // ASOF LEFT JOIN semantics: left rows whose key/ts is null can match
    // nothing but are still emitted, with null value columns
    val nullKeyLeft = left
      .filter((keys :+ tsCol).map(c => col(c).isNull).reduce(_ || _))
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
        valueCols.zip(valueTypes).map { case (c, t) =>
          lit(null).cast(t).as(c)
        }: _*)
    matched.unionByName(nullKeyLeft)
  }
}
