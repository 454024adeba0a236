package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Serializable learn-then-replay transformers (reference ml/base.py:62-156):
  * the learned clause-keyed dictionaries are persisted as a JSON string
  * Param (exactly as the reference stores dicts via json.dumps,
  * ml/base.py:35-59) and replayed as literal-folded CASE WHEN expressions —
  * a pure projection, no shuffle, no join, valid at any scale.
  *
  * Dictionary shape: {column -> {filterClause -> value}}; the empty clause
  * "" means unconditional (global fill/fence).
  */
object DictCodec {
  implicit val formats: Formats = DefaultFormats

  def encodeFill(d: Map[String, Map[String, Any]]): String =
    Serialization.write(d.map { case (c, m) =>
      c -> m.map { case (k, v) => k -> v.toString }
    })

  def decode(json: String): Map[String, Map[String, String]] =
    JsonMethods.parse(json).extract[Map[String, Map[String, String]]]

  def encodeFence(d: Map[String, Map[String, (Double, Double)]]): String =
    Serialization.write(d.map { case (c, m) =>
      c -> m.map { case (k, (lo, hi)) => k -> s"$lo,$hi" }
    })

  /** A clause like `l_returnflag == "R" and (x >= 1.0) and (x < 2.0)` back
    * into a Column predicate. Spark SQL natively accepts `==`, lowercase
    * `and`, and double-quoted string literals (with backslash escapes, which
    * is what StratifiedFrame.clause emits), so the clause parses verbatim —
    * no text rewriting, which would corrupt values containing the words
    * being rewritten (e.g. a stratum value `"rock and roll"`). */
  def clauseToColumn(clause: String): Column =
    if (clause.isEmpty) lit(true) else expr(clause)
}

/** Replays recorded imputation values (reference HandyImputer,
  * ml/base.py:62-106). */
class HandyImputer(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("handyImputer"))

  final val fillDict: Param[String] =
    new Param[String](this, "fillDict", "JSON {col -> {clause -> value}}")
  setDefault(fillDict, "{}")
  def setFillDict(json: String): this.type = set(fillDict, json)
  def setFillDict(d: Map[String, Map[String, Any]]): this.type =
    set(fillDict, DictCodec.encodeFill(d))
  def getFillDict: Map[String, Map[String, String]] =
    DictCodec.decode($(fillDict))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    getFillDict.foldLeft(df) { case (d, (c, byClause)) =>
      val dt = d.schema(c).dataType
      val chain = byClause.toSeq.sortBy(_._1).foldLeft[Option[Column]](None) {
        case (acc, (clause, v)) =>
          val cond = graft.core.HandyFrame.isMissing(d, c) &&
            DictCodec.clauseToColumn(clause)
          val value = lit(v).cast(dt)
          Some(acc.fold(when(cond, value))(_.when(cond, value)))
      }
      chain.fold(d)(ch => d.withColumn(c, ch.otherwise(col(c))))
    }
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): HandyImputer = defaultCopy(extra)
}

object HandyImputer extends DefaultParamsReadable[HandyImputer]

/** Replays recorded Tukey fences as greatest/least capping (reference
  * HandyFencer, ml/base.py:109-156). */
class HandyFencer(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("handyFencer"))

  final val fenceDict: Param[String] =
    new Param[String](this, "fenceDict", "JSON {col -> {clause -> 'lo,hi'}}")
  setDefault(fenceDict, "{}")
  def setFenceDict(json: String): this.type = set(fenceDict, json)
  def setFenceDict(d: Map[String, Map[String, (Double, Double)]]): this.type =
    set(fenceDict, DictCodec.encodeFence(d))
  def getFenceDict: Map[String, Map[String, (Double, Double)]] =
    DictCodec.decode($(fenceDict)).map { case (c, m) =>
      c -> m.map { case (k, v) =>
        val Array(lo, hi) = v.split(","): @unchecked
        k -> ((lo.toDouble, hi.toDouble))
      }
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    getFenceDict.foldLeft(df) { case (d, (c, byClause)) =>
      val chain = byClause.toSeq.sortBy(_._1).foldLeft[Option[Column]](None) {
        case (acc, (clause, (lo, hi))) =>
          // null/NaN values stay put: greatest/least skip nulls (the raw
          // fold would turn a null into the fence bound) and order NaN
          // above everything (least(NaN, hi) = hi)
          val cond = !graft.core.HandyFrame.isMissing(d, c) &&
            DictCodec.clauseToColumn(clause)
          val capped = least(greatest(col(c), lit(lo)), lit(hi))
          Some(acc.fold(when(cond, capped))(_.when(cond, capped)))
      }
      chain.fold(d)(ch => d.withColumn(c, ch.otherwise(col(c))))
    }
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): HandyFencer = defaultCopy(extra)
}

object HandyFencer extends DefaultParamsReadable[HandyFencer]
