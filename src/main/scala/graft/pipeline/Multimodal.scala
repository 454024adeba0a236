package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-batched transforms (`mapPartitions` — the JVM analog of
  * `mapInPandas`: one buffer per batch, no per-row driver round-trips).
  *
  * The actual codec calls are STUBBED (this container ships no image/audio
  * libraries): `decodeStub` produces deterministic fake features derived
  * from the payload bytes. The Spark-side contract — schema, batch shape,
  * partitioning, null handling — is real and tested; swap `decodeStub`
  * for a real codec (JavaCV, TwelveMonkeys, ffmpeg-cli) to productionize.
  */
object Multimodal {

  /** metadata struct carried next to every payload */
  val MetadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", MetadataType)))

  /** Wrap raw binary + metadata into the canonical media frame. */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
                   format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(lit(format).as("format"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * Real implementation would decode pixels and pool; the contract
    * (dim-`dim` double array, null payload → null features) is identical. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Double] =
    if (payload == null) null
    else Array.tabulate(dim) { i =>
      var h = 1125899906842597L // FNV-ish deterministic fold
      var j = i
      while (j < payload.length) { h = h * 31 + payload(j); j += dim }
      (h % 1000L).toDouble / 1000.0
    }

  /** Batched feature extraction over the payload column. Runs as
    * mapPartitions: rows stream through per-partition, features computed
    * batch-local, schema appended — the exact shape a Pandas-UDF
    * `mapInPandas` decode would have. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = decodeStub(r.getAs[Array[Byte]](payloadIdx), dim)
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc)
  }

  /** STUB resize: records the requested geometry in the metadata (a real
    * impl would transcode the payload); pure projection. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.format").as("format"), lit(w).as("width"),
      lit(h).as("height"), col("meta.n_frames").as("n_frames")))

  /** Frame sampling for video payloads: emit one row per sampled frame
    * index — a generator (explode), distributing frames across the
    * cluster for downstream per-frame decode. */
  def sampleFrames(df: DataFrame, everyNth: Int, maxFrames: Int = 32): DataFrame = {
    val n = coalesce(col("meta.n_frames"), lit(maxFrames))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), least(n - 1, lit(maxFrames - 1)),
          lit(everyNth))))
  }
}
