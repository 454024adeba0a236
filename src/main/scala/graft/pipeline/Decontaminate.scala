package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and remove) training documents that
  * share word n-grams with an evaluation/benchmark set — the standard
  * guard against test-set leakage into a training corpus (the GPT-3 paper
  * removed 13-gram overlaps; n is a parameter here).
  *
  * Scale shape: the BENCHMARK side is tiny next to a training corpus
  * (thousands of eval items vs billions of documents), so its distinct
  * n-gram set is collected into a broadcast hash relation and the corpus
  * side is a map-side semi/anti join over its shingle stream — the corpus
  * never shuffles. Shingles travel as 64-bit hashes ([[Dedup.hash64]]):
  * 8-byte keys, and a false positive needs a 64-bit collision that also
  * splits across the two sides (~1e-8 per corpus-scale shingle set). An
  * exactness-critical caller can verify flagged docs with
  * [[Dedup.shingledStrings]] — the flagged set is small by construction.
  */
object Decontaminate {

  /** Distinct hashed word n-grams of the benchmark, deduped across ALL
    * benchmark rows — one tiny frame fit for broadcast. */
  private def benchGrams(benchmark: DataFrame, benchTextCol: String,
                         n: Int): DataFrame = {
    val withId = benchmark.select(col(benchTextCol))
      .withColumn("__bid", monotonically_increasing_id())
    Dedup.shingled(withId, "__bid", benchTextCol, n)
      .select(col("sh")).distinct()
  }

  /** (id, overlap) for every document sharing at least one word n-gram
    * with the benchmark set; `overlap` counts the distinct shared
    * n-grams. Documents with no overlap are absent. */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   benchmark: DataFrame, benchTextCol: String,
                   n: Int = 13): DataFrame =
    Dedup.shingled(docs, idCol, textCol, n)
      .join(broadcast(benchGrams(benchmark, benchTextCol, n)), Seq("sh"))
      .groupBy("__id")
      .agg(count(lit(1)).as("overlap")) // shingled dedups per doc → distinct
      .withColumnRenamed("__id", idCol)

  /** Documents with NO n-gram overlap against the benchmark — the clean
    * training corpus. A broadcast anti-join on the benchmark's n-gram
    * set applied to the corpus shingle stream; rows whose text is null
    * are dropped (they cannot be checked). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 13): DataFrame = {
    val bad = contaminated(docs, idCol, textCol, benchmark, benchTextCol, n)
      .select(col(idCol).as("__contaminated_id"))
    docs.join(broadcast(bad), col(idCol) === col("__contaminated_id"),
      "left_anti")
  }
}
