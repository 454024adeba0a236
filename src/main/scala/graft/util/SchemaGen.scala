package graft.util

import org.apache.spark.sql.types._

/** Programmatic schema synthesis (reference generate_schema,
  * handyspark/sql/schema.py:25-61): build a StructType from name→typeName
  * pairs with per-column or global nullability. Type names accept both
  * Spark simple strings ("int", "bigint", "array<double>") and the
  * reference's python/numpy aliases. */
object SchemaGen {

  private val aliases: Map[String, DataType] = Map(
    "str" -> StringType, "string" -> StringType,
    "int" -> IntegerType, "int32" -> IntegerType, "integer" -> IntegerType,
    "int64" -> LongType, "long" -> LongType, "bigint" -> LongType,
    "int16" -> ShortType, "short" -> ShortType,
    "int8" -> ByteType, "byte" -> ByteType,
    "float" -> FloatType, "float32" -> FloatType,
    "float64" -> DoubleType, "double" -> DoubleType,
    "bool" -> BooleanType, "boolean" -> BooleanType,
    "bytes" -> BinaryType, "binary" -> BinaryType,
    "date" -> DateType, "datetime" -> TimestampType,
    "timestamp" -> TimestampType)

  def parseType(name: String): DataType =
    aliases.getOrElse(name.toLowerCase.trim,
      DataType.fromDDL(name)) // "array<double>", "map<string,int>", …

  def generate(fields: Seq[(String, String)],
               nullable: Set[String] = Set.empty,
               nullableAll: Boolean = false): StructType =
    StructType(fields.map { case (n, t) =>
      StructField(n, parseType(t), nullableAll || nullable.contains(n))
    })
}
