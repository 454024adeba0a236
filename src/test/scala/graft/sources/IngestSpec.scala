package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("ingest_spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeLines(dir: String, name: String,
                         lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  test("readJsonl: inferred schema from a bounded sample; data reads " +
      "whole and typed") {
    val dir = tmpDir()
    writeLines(dir, "a.jsonl", Seq(
      """{"id": 1, "name": "alpha", "score": 0.5}""",
      """{"id": 2, "name": "beta", "score": 1.5}"""))
    val got = Ingest.readJsonl(spark, dir)
    // inferred: id long, name string, score double (+ appended corrupt col)
    assert(got.schema("id").dataType === LongType)
    assert(got.schema("score").dataType === DoubleType)
    assert(got.schema.fieldNames.contains("_corrupt_record"))
    assert(got.select("id", "name").orderBy("id").as[(Long, String)]
      .collect().toSeq === Seq(1L -> "alpha", 2L -> "beta"))
    intercept[IllegalArgumentException](
      Ingest.readJsonl(spark, dir, mode = "NONSENSE"))
    intercept[IllegalArgumentException](
      Ingest.inferJsonlSchema(spark, dir, sampleN = 0))
  }

  test("PERMISSIVE carries the broken line in the corrupt column; " +
      "corruptReport reduces it to one damage row; DROPMALFORMED drops " +
      "it; FAILFAST throws") {
    val dir = tmpDir()
    writeLines(dir, "a.jsonl", Seq(
      """{"id": 1, "v": "ok"}""",
      """{BROKEN not json""",
      """{"id": 3, "v": "fine"}"""))
    val schema = Some(StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val perm = Ingest.readJsonl(spark, dir, schema)
    val rows = perm.orderBy(col("id").asc_nulls_last).collect()
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 1L && rows(0).isNullAt(2))
    assert(rows(2).isNullAt(0) &&
      rows(2).getString(2).startsWith("{BROKEN"))
    val rep = Ingest.corruptReport(perm).as[(Long, Long, Long)]
      .collect().head
    assert(rep === ((3L, 1L, 2L))) // n_rows, n_corrupt, n_good
    val dropped = Ingest.readJsonl(spark, dir, schema,
      mode = "DROPMALFORMED")
    assert(dropped.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L))
    val ff = Ingest.readJsonl(spark, dir, schema, mode = "FAILFAST")
    intercept[org.apache.spark.SparkException](ff.collect())
    // corruptReport refuses a frame without the corrupt column
    intercept[IllegalArgumentException](Ingest.corruptReport(dropped))
  }

  test("compressed shards read by extension (gzip written by Spark, " +
      "mixed with a plain shard)") {
    val dir = tmpDir()
    Seq("""{"id": 10}""", """{"id": 11}""").toDF("value")
      .coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").text(s"$dir/gz")
    writeLines(s"$dir", "gz_extra.jsonl", Seq("""{"id": 12}"""))
    // move the plain shard into the same directory as the gz part files
    val src = java.nio.file.Paths.get(dir, "gz_extra.jsonl")
    val dst = java.nio.file.Paths.get(dir, "gz", "extra.jsonl")
    java.nio.file.Files.move(src, dst)
    val got = Ingest.readJsonl(spark, s"$dir/gz",
      Some(StructType(Seq(StructField("id", LongType)))))
    assert(got.select("id").as[Long].collect().sorted.toSeq ===
      Seq(10L, 11L, 12L))
  }

  test("readCsv: bounded-sample inference; corruptReport judges the " +
      "FULL schema (type mismatch AND short arity both malformed), " +
      "while a pruned single-column DROPMALFORMED read keeps rows whose " +
      "projected column parsed — the documented pruning caveat") {
    val dir = tmpDir()
    writeLines(dir, "a.csv", Seq(
      "id,name,score",
      "1,alpha,0.5",
      "garbage-not-a-long,beta,0.7", // type mismatch on id -> corrupt
      "3,gamma",                     // short arity -> malformed (full schema)
      "4,delta,2.5"))
    val inferred = Ingest.inferCsvSchema(spark, dir)
    assert(inferred("score").dataType === DoubleType)
    val schema = Some(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))
    val perm = Ingest.readCsv(spark, dir, schema)
    val rep = Ingest.corruptReport(perm).as[(Long, Long, Long)]
      .collect().head
    // BOTH damaged rows count under the full schema — a one-column
    // projection would have read (4, 1, 3), missing the short row
    assert(rep === ((4L, 2L, 2L)))
    // PERMISSIVE still fills the short row's parsed prefix (id = 3)
    assert(perm.filter(col("id") === 3L).select("score")
      .collect().head.isNullAt(0))
    // the pruning caveat, demonstrated: DROPMALFORMED with only `id`
    // consumed keeps row 3 (id parsed fine) — malformation is judged
    // against PROJECTED columns, per the readCsv scaladoc
    val dropped = Ingest.readCsv(spark, dir, schema,
      mode = "DROPMALFORMED")
    assert(dropped.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 4L))
    intercept[IllegalArgumentException](
      Ingest.readCsv(spark, dir, schema, mode = "BOGUS"))
  }

  test("zstd shards read by extension IF libhadoop carries zstd " +
      "(skip-with-message otherwise — the scaladoc's codec contract)") {
    val zstdAvailable =
      try {
        val k = Class.forName("org.apache.hadoop.io.compress.ZStandardCodec")
        val codec = org.apache.hadoop.util.ReflectionUtils.newInstance(
          k, spark.sparkContext.hadoopConfiguration)
        val bos = new java.io.ByteArrayOutputStream()
        val os = k.getMethod("createOutputStream", classOf[java.io.OutputStream])
          .invoke(codec, bos).asInstanceOf[java.io.OutputStream]
        os.write("probe".getBytes); os.close(); true
      } catch { case _: Throwable => false }
    assume(zstdAvailable, "libhadoop built without zstd support in this " +
      "sandbox — .zst text/JSONL shards cannot resolve (parquet zstd is " +
      "separate, via zstd-jni); codec contract documented in Ingest")
    val dir = tmpDir()
    Seq("""{"id": 20}""", """{"id": 21}""").toDF("value")
      .coalesce(1).write.mode("overwrite")
      .option("compression", "zstd").text(s"$dir/zst")
    val got = Ingest.readJsonl(spark, s"$dir/zst",
      Some(StructType(Seq(StructField("id", LongType)))))
    assert(got.select("id").as[Long].collect().sorted.toSeq ===
      Seq(20L, 21L))
  }

  test("inferCsvSchema over a MULTI-FILE directory: header comes from " +
      "the lexicographically first file's first line, and other shards' " +
      "header lines don't demote numeric columns (r12 ADVICE)") {
    val dir = tmpDir()
    // two headered shards; any limit()-order sample that treated shard
    // b's header line as data would demote id/score to string, and a
    // sample whose first row came from shard b would mis-name columns
    writeLines(dir, "a.csv", Seq("id,name,score", "1,alpha,0.5"))
    writeLines(dir, "b.csv", Seq("id,name,score", "2,beta,1.5",
      "3,gamma,2.5"))
    val inferred = Ingest.inferCsvSchema(spark, dir)
    assert(inferred.fieldNames.toSeq === Seq("id", "name", "score"))
    assert(inferred("id").dataType === IntegerType ||
      inferred("id").dataType === LongType)
    assert(inferred("score").dataType === DoubleType)
    val got = Ingest.readCsv(spark, dir)
    assert(got.filter(col("name").isin("alpha", "beta", "gamma")).count()
      === 3L)
  }

  test("corruptReport judges the FULL schema: a row malformed only in " +
      "the LAST column still counts corrupt (column pruning would hide " +
      "it under a one-column projection — r12 ADVICE)") {
    val dir = tmpDir()
    writeLines(dir, "a.csv", Seq(
      "1,alpha,0.5",
      "2,beta,not-a-double", // only column 3 is malformed
      "3,gamma,2.5"))
    val schema = Some(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))
    val perm = Ingest.readCsv(spark, dir, schema, header = false)
    val rep = Ingest.corruptReport(perm).as[(Long, Long, Long)]
      .collect().head
    assert(rep === ((3L, 1L, 2L))) // row 2 flagged despite id parsing fine
  }

  test("readTextDocs: one doc per line, (file, offset) ids exact and " +
      "unique, offsets restore in-file order across multiple shards") {
    val dir = tmpDir()
    writeLines(dir, "s1.txt", Seq("first doc", "second doc", "third"))
    writeLines(dir, "s2.txt", Seq("other shard A", "other shard B"))
    val got = Ingest.readTextDocs(spark, dir)
    assert(got.count() === 5L)
    assert(got.select("file", "offset").distinct().count() === 5L)
    // byte offsets are a property of the bytes: "first doc\n" is 10
    // bytes, so s1's lines sit at 0, 10, 21
    val s1 = got.filter(col("file").endsWith("s1.txt"))
      .orderBy("offset").select("offset", "text")
      .as[(Long, String)].collect().toSeq
    assert(s1 === Seq(0L -> "first doc", 10L -> "second doc",
      21L -> "third"))
    // per-file order restored by the id itself — no window was involved
    val s2 = got.filter(col("file").endsWith("s2.txt"))
      .orderBy("offset").select("text").as[String].collect().toSeq
    assert(s2 === Seq("other shard A", "other shard B"))
  }
}
