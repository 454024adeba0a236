package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Raw-corpus ingestion — the pipeline stage BEFORE everything else in
  * this engine: real crawls arrive as JSONL shards (often gzip/zstd) and
  * newline-delimited text, not parquet. The reference only ever reads
  * CSV in its tests (reference conftest.py:13); this tier is the
  * extension a production corpus needs, built on Spark's own JSON/text
  * data sources so compression codecs (.gz, .bz2 always; .zst when
  * libhadoop carries zstd — see [[readJsonl]]) resolve from
  * file extensions and splits/partition sizing follow
  * `spark.sql.files.maxPartitionBytes` like any other scan.
  *
  * Design rules, all scale-driven:
  *  - schema inference NEVER touches the whole corpus: a bounded
  *    `sampleN`-line sample feeds Spark's JSON inference once, and the
  *    resulting explicit schema drives the full scan (the
  *    Semistructured.inferJsonSchema contract).
  *  - malformed input is DATA, not a log line: PERMISSIVE reads carry
  *    the corrupt record in `corruptCol` and [[corruptReport]] reduces
  *    it to one (n_rows, n_good, n_corrupt) row — the skipped-work
  *    surfacing rule every bounded knob in this engine follows.
  *  - line identity is (file, byte offset) from the Hadoop reader —
  *    exact, stable under any partitioning/split plan, no window and no
  *    monotonically_increasing_id ordering assumptions.
  */
object Ingest {

  val Modes: Set[String] = Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")

  /** Infer a JSONL schema from a bounded sample: one small text scan of
    * `sampleN` lines into Spark's JSON inference. The returned schema is
    * what a full [[readJsonl]] scan should be given explicitly —
    * inference cost is O(sampleN) regardless of corpus size. */
  def inferJsonlSchema(spark: SparkSession, path: String,
                       sampleN: Int = 10000): StructType = {
    require(sampleN > 0, s"sampleN must be positive, got $sampleN")
    import spark.implicits._
    val sample: Dataset[String] =
      spark.read.text(path).limit(sampleN).as[String]
    spark.read.json(sample).schema
  }

  /** Read newline-delimited JSON with an explicit corrupt-record policy.
    *
    *  - `schema = None` → bounded-sample inference ([[inferJsonlSchema]];
    *    pass an explicit schema in production so shards with drifting
    *    fields fail loudly instead of re-inferring per run).
    *  - `mode = "PERMISSIVE"` (default): unparseable lines become rows
    *    with every data field null and the raw line in `corruptCol`
    *    (appended to the schema) — feed the result to [[corruptReport]]
    *    to surface the damage as data.
    *  - `mode = "DROPMALFORMED"`: unparseable lines are dropped; pair
    *    with a PERMISSIVE [[corruptReport]] pass when the drop count
    *    matters (it usually does).
    *  - `mode = "FAILFAST"`: first malformed line kills the scan.
    *
    * Compression is by extension per Hadoop codec resolution — a mixed
    * directory of plain and compressed shards reads fine. .gz and .bz2
    * are always available; .zst resolves ONLY when libhadoop was built
    * with zstd support (this sandbox's was not — IngestSpec probes and
    * skips; parquet zstd is unaffected, it uses zstd-jni, not the Hadoop
    * codec). One scan, no shuffle; filters/pruning push into the scan as
    * with any DataSource. */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[StructType] = None,
                mode: String = "PERMISSIVE",
                corruptCol: String = "_corrupt_record",
                sampleN: Int = 10000): DataFrame = {
    require(Modes.contains(mode),
      s"readJsonl: mode must be one of ${Modes.mkString("/")}, got $mode")
    val base = schema.getOrElse(inferJsonlSchema(spark, path, sampleN))
    require(!schema.exists(_.fieldNames.contains(corruptCol)) ||
      schema.get(corruptCol).dataType == StringType,
      s"readJsonl: explicit $corruptCol must be a string column")
    val full =
      if (mode == "PERMISSIVE" && !base.fieldNames.contains(corruptCol))
        base.add(StructField(corruptCol, StringType, nullable = true))
      else base
    spark.read
      .schema(full)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Reduce a PERMISSIVE [[readJsonl]]/[[readCsv]] frame to ONE damage
    * row: (n_rows, n_corrupt, n_good). A corrupt-column-only scan from a
    * raw JSON/CSV source is disallowed by Spark (UNSUPPORTED_FEATURE.
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN — the relation can't prove
    * corruption without parsing a data field), and a plain aggregate
    * PRUNES any data column we project down to exactly that illegal
    * shape; the documented workaround is .cache(), which is wrong at
    * corpus scale. Instead the count runs as a typed per-partition fold
    * — the object deserializer pins the projection into the required
    * schema, one pass, one tiny (n, c) row per partition, no cache.
    *
    * The fold projects ALL data columns, not just the first: CSV column
    * pruning (spark.sql.csv.parser.columnPruning, default on) parses
    * only the projected columns, so a record malformed ONLY in an
    * unprojected column would never be flagged corrupt under a
    * one-column projection and the report would undercount (r12 ADVICE
    * finding). Full projection makes the parser exercise the whole
    * schema — the report counts malformation under the SCHEMA, which is
    * the contract a damage report wants. (JSON parses the whole line
    * regardless; the full projection costs it nothing extra beyond
    * column decode.) */
  def corruptReport(df: DataFrame,
                    corruptCol: String = "_corrupt_record"): DataFrame = {
    require(df.schema.fieldNames.contains(corruptCol),
      s"corruptReport: no $corruptCol column — read with PERMISSIVE")
    val dataCols = df.schema.fieldNames.filterNot(_ == corruptCol)
    require(dataCols.nonEmpty,
      "corruptReport: frame has only the corrupt column")
    val spark = df.sparkSession
    import spark.implicits._
    val corruptIdx = dataCols.length
    df.select(dataCols.map(col).toIndexedSeq :+ col(corruptCol): _*)
      .mapPartitions { it =>
        var n = 0L
        var c = 0L
        it.foreach { r => n += 1; if (!r.isNullAt(corruptIdx)) c += 1 }
        Iterator((n, c))
      }
      .toDF("__n", "__c")
      .agg(coalesce(sum("__n"), lit(0L)).as("n_rows"),
        coalesce(sum("__c"), lit(0L)).as("n_corrupt"),
        coalesce(sum("__n") - sum("__c"), lit(0L)).as("n_good"))
  }

  /** Infer a CSV schema from a bounded sample — the CSV face of
    * [[inferJsonlSchema]] (Spark's `inferSchema` option re-scans the
    * whole input; this stays O(sampleN)).
    *
    * `header = true` reads column names from the DETERMINISTIC header:
    * the first line (byte offset 0) of the lexicographically first file,
    * via the same (file, offset) identity [[readTextDocs]] uses — NOT
    * "the first row limit() happens to return", which Spark does not
    * order (r12 ADVICE finding: over a multi-file directory the old
    * sample could pick another shard's line as the header, mis-naming
    * every column). Each shard's own header line is then filtered out
    * of the type-inference sample by text equality, so repeated headers
    * in a multi-file directory can no longer demote numeric columns to
    * string. (A data row that happens to equal the header byte-for-byte
    * is also dropped — from a bounded SAMPLE feeding inference, not from
    * any read.) Names come from a one-line CSV parse of the header (so
    * quoting/escapes follow CSV rules); types from inference over the
    * filtered sample. */
  def inferCsvSchema(spark: SparkSession, path: String,
                     header: Boolean = true, delimiter: String = ",",
                     sampleN: Int = 10000): StructType = {
    require(sampleN > 0, s"sampleN must be positive, got $sampleN")
    import spark.implicits._
    if (!header) {
      val sample: Dataset[String] =
        spark.read.text(path).limit(sampleN).as[String]
      spark.read
        .option("header", false).option("delimiter", delimiter)
        .option("inferSchema", true)
        .csv(sample).schema
    } else {
      val lines = readTextDocs(spark, path)
      val headerText = lines.orderBy("file", "offset")
        .select("text").as[String].head()
      val sample: Dataset[String] = lines
        .filter(col("text") =!= lit(headerText))
        .limit(sampleN).select("text").as[String]
      // re-attach the deterministic header as the union's FIRST
      // partition (a 1-row local dataset; union concatenates partitions
      // in operand order and the CSV reader takes its header from the
      // first row), then let Spark's own header-based inference name and
      // type the columns — names follow CSV quoting rules, ragged
      // sample rows follow CSV fill/parse rules, nothing is re-split by
      // hand
      val withHeader = Seq(headerText).toDS().union(sample)
      spark.read
        .option("header", true).option("delimiter", delimiter)
        .option("inferSchema", true)
        .csv(withHeader).schema
    }
  }

  /** Read CSV with the same explicit corrupt-record policy surface as
    * [[readJsonl]] — the reference's own test-data format
    * (reference conftest.py:13 reads CSV), completing the ingestion
    * trio (JSONL / text / CSV). Schema `None` → bounded-sample
    * inference; PERMISSIVE appends `corruptCol` carrying unparseable
    * lines (wrong arity, type mismatch); DROPMALFORMED/FAILFAST as in
    * Spark. Compression by extension, one scan, pushdown-friendly.
    *
    * CSV column-pruning caveat (spark.sql.csv.parser.columnPruning,
    * default on): malformation is judged against the PROJECTED columns
    * only — under DROPMALFORMED, a query that selects one column keeps
    * rows that are malformed only in unprojected columns. Project every
    * column (or take corruptReport's complement, which pins the full
    * schema) when the whole-schema drop count is what you mean. */
  def readCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None,
              header: Boolean = true, delimiter: String = ",",
              mode: String = "PERMISSIVE",
              corruptCol: String = "_corrupt_record",
              sampleN: Int = 10000): DataFrame = {
    require(Modes.contains(mode),
      s"readCsv: mode must be one of ${Modes.mkString("/")}, got $mode")
    val base = schema.getOrElse(
      inferCsvSchema(spark, path, header, delimiter, sampleN))
    val full =
      if (mode == "PERMISSIVE" && !base.fieldNames.contains(corruptCol))
        base.add(StructField(corruptCol, StringType, nullable = true))
      else base
    spark.read
      .schema(full)
      .option("header", header).option("delimiter", delimiter)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
  }

  /** Read newline-delimited text as one document per line with an EXACT,
    * partitioning-independent identity: (file, byte offset of the line's
    * first byte) straight from Hadoop's TextInputFormat reader. No
    * window, no monotonically_increasing_id (whose ordering depends on
    * how splits were packed into partitions), no shuffle — the id is a
    * property of the bytes on disk, so re-reads, different split plans,
    * and different cluster sizes all agree. Returns (file, offset, text).
    *
    * Note: a line's offset is its start position, so (file, offset) is
    * unique and sorting by it within a file restores document order —
    * the "id = file+offset" contract for corpora shipped as text
    * shards. */
  def readTextDocs(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
    val rows = rdd
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, it) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        it.map { case (off, line) => (file, off.get, line.toString) }
      }
    spark.createDataFrame(rows).toDF("file", "offset", "text")
  }
}
