package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring deduplication (the "ExactSubstr" half of
  * Lee et al. 2022, arXiv:2107.06499 — the other half, document-level
  * near-dup, is [[Dedup]]): every maximal character span whose
  * fixed-length windows all occur elsewhere in the corpus is removed,
  * keeping the globally-first occurrence. Catches the cross-document
  * boilerplate (license headers, navigation chrome, quoted passages)
  * that document-level jaccard misses because the rest of the document
  * differs.
  *
  * Semantics (deterministic, engine-independent):
  *  - a WINDOW is a `minLen`-char substring at 1-based position p;
  *  - a window is REPEATED if its exact string occurs at >= 2 (doc, pos)
  *    positions corpus-wide (within-doc repeats count);
  *  - the OWNER of a repeated string is its minimal (doc, pos); every
  *    other occurrence marks [p, p+minLen-1] for removal;
  *  - per doc, marked windows merge into maximal spans (overlap OR
  *    abutment); [[removeRepeatedSubstrings]] cuts the spans out.
  *
  * PLAN (all declarative, one logical pass per stage):
  *  1. window hashes: ONE Rabin-Karp rolling pass per doc (O(doc), no
  *     per-window substring allocation) exploded to (id, pos, h);
  *  2. dup-hash set: one count aggregate on the 8-byte hash (map-side
  *     combine; this shuffle is O(corpus windows) — the same asymptotic
  *     bill a distributed suffix array pays, paid here in shuffle bytes
  *     with an 8-byte key instead of sort memory);
  *  3. candidate (id, pos) rows from the dup-hash join (at realistic dup
  *     rates small -> AQE broadcasts), then substrings extracted for
  *     CANDIDATES ONLY by a broadcast join back over the streamed docs —
  *     the corpus never shuffles and never materializes its windows;
  *  4. EXACT verify: window over the actual substring (count + min
  *     owner) — rolling-hash collisions die here, so the hash is an
  *     optimization, never a correctness input;
  *  5. island merge per doc (running-max window), then segment algebra
  *     for the rewrite.
  *
  * 100-TB notes: stages 2-3 carry (hash) and (hash, id, pos) only; the
  * only stage keyed on strings is 4, whose input is candidate windows —
  * proportional to the DUPLICATED mass, not the corpus. A boilerplate-
  * saturated corpus degrades stage 4 toward the corpus size; raise
  * `minLen` (fewer, more specific repeats) before reaching for caps. */
object SubstringDedup {

  private[pipeline] def prep(df: DataFrame, idCol: String, textCol: String) =
    df.na.drop(Seq(idCol, textCol))
      .select(col(idCol).cast("long").as("__id"),
        col(textCol).cast("string").as("__t"))

  /** Rolling window hashes (id, pos, h), one O(doc-length) Rabin-Karp
    * pass per doc — no per-window substring allocation (measured: the
    * substr-per-window formulation spent 2×1.4 s of q_substr_spans'
    * 5.6 s at sf0.1 just materializing 60-char strings twice). Base-31
    * polynomial mod 2⁶⁴; collisions are harmless — the verify stage
    * groups on true substrings. */
  /** Base-31 polynomial rolling hashes of every `minLen`-char window of
    * `t`, index i ↔ 1-based position i+1 — one O(|t|) pass. */
  private[pipeline] def rollingHashArray(t: String, minLen: Int): Array[Long] = {
    val n = t.length
    if (n < minLen) Array.empty[Long]
    else {
      val B = 31L
      var pow = 1L // B^(minLen-1)
      var j = 1
      while (j < minLen) { pow *= B; j += 1 }
      val out = new Array[Long](n - minLen + 1)
      var h = 0L
      var i = 0
      while (i < minLen) { h = h * B + t.charAt(i); i += 1 }
      out(0) = h
      while (i < n) {
        h = (h - t.charAt(i - minLen) * pow) * B + t.charAt(i)
        out(i - minLen + 1) = h
        i += 1
      }
      out
    }
  }

  private[pipeline] def windowHashes(docs: DataFrame, minLen: Int): DataFrame = {
    val roll = udf { t: String => rollingHashArray(t, minLen) }
    docs.filter(length(col("__t")) >= minLen)
      .select(col("__id"), posexplode(roll(col("__t"))))
      .select(col("__id"), (col("pos") + 1).cast("long").as("__pos"),
        col("col").as("__h"))
  }

  /** Maximal removal spans: (doc_id, span_start, span_end), 1-based
    * inclusive. Docs with nothing repeated produce no rows. */
  def repeatedSubstringSpans(df: DataFrame, idCol: String, textCol: String,
                             minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val docs = prep(df, idCol, textCol)
    val wins = windowHashes(docs, minLen)
    // dup-hash prefilter: count on the 8-byte hash only
    val dupH = wins.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__h")
    // candidate (id, pos) rows — at realistic dup rates a small frame;
    // substrings are extracted for CANDIDATES ONLY by a join back to the
    // docs (cand broadcasts, the corpus streams — no corpus shuffle)
    val cand = wins.join(dupH, "__h")
      .join(docs, "__id")
      .select(col("__id"), col("__pos"),
        col("__t").substr(col("__pos").cast("int"), lit(minLen)).as("__sub"))
    // exact verify + ownership on the true substring
    val bySub = Window.partitionBy("__sub")
    val removed = cand
      .withColumn("__n", count(lit(1)).over(bySub))
      .withColumn("__own",
        min(struct(col("__id").as("i"), col("__pos").as("p"))).over(bySub))
      .filter(col("__n") >= 2 &&
        !(col("__own.i") === col("__id") && col("__own.p") === col("__pos")))
      .select("__id", "__pos")
    mergeSpans(removed, minLen)
  }

  /** Island merge over marked windows (__id, __pos): break where pos
    * exceeds the running max end (exclusive), then one group per island →
    * (doc_id, span_start, span_end), 1-based inclusive. */
  private[pipeline] def mergeSpans(removed: DataFrame,
                                   minLen: Int): DataFrame = {
    val byDoc = Window.partitionBy("__id").orderBy("__pos")
    val prevEnd = max(col("__pos") + lit(minLen.toLong))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    removed
      .withColumn("__brk",
        when(col("__pos") > coalesce(prevEnd, lit(0L)), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__grp", sum(col("__brk")).over(byDoc))
      .groupBy(col("__id"), col("__grp"))
      .agg(min(col("__pos")).as("span_start"),
        (max(col("__pos")) + lit(minLen.toLong - 1)).as("span_end"))
      .select(col("__id").as("doc_id"), col("span_start"), col("span_end"))
  }

  /** Per-doc repeated-character fraction — the quality signal version of
    * the span pipeline (rank docs by how much of them is corpus-repeated
    * boilerplate instead of rewriting them): (doc_id, n_chars,
    * repeated_chars, repeated_frac) for EVERY doc, zero for docs with
    * nothing repeated; empty docs report fraction 0. One rollup over
    * [[repeatedSubstringSpans]]. */
  def repeatedFraction(df: DataFrame, idCol: String, textCol: String,
                       minLen: Int): DataFrame = {
    val spans = repeatedSubstringSpans(df, idCol, textCol, minLen)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + lit(1L))
        .as("repeated_chars"))
    prep(df, idCol, textCol)
      .select(col("__id").as("doc_id"),
        length(col("__t")).cast("long").as("n_chars"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("repeated_chars"), lit(0L)).as("repeated_chars"),
        when(col("n_chars") > 0,
          coalesce(col("repeated_chars"), lit(0L)).cast("double") /
            col("n_chars"))
          .otherwise(lit(0.0)).as("repeated_frac"))
  }

  /** `df` with every removal span cut out of the text column: the
    * segment algebra (kept = gaps between spans + head + tail) runs as
    * lag windows + one ordered concat aggregate; docs without spans pass
    * through untouched, docs removed entirely become the empty string.
    * Other columns pass through. */
  def removeRepeatedSubstrings(df: DataFrame, idCol: String, textCol: String,
                               minLen: Int): DataFrame =
    cutSpans(df, idCol, textCol,
      repeatedSubstringSpans(df, idCol, textCol, minLen))

  /** `df` with the given (doc_id, span_start, span_end) spans cut out of
    * the text column — the shared segment algebra behind the in-memory
    * rewrite and the indexed screen.
    *
    * Spans per doc fold to ONE sorted array row, and the kept segments
    * (gap before each span + the tail after the last) are rebuilt by a
    * single expression over that array at the ONE join with the corpus.
    * (r14: the previous shape consumed `spans` three times and joined
    * the corpus three times — before-gaps window, after-tail join, piece
    * extraction join — re-running the span pipeline's post-shuffle tail
    * per consumer and re-scanning the docs per join; measured 4.45 s →
    * ~2.9 s at sf0.1 for q_substr_dedup's rewrite stage. The HOF walk is
    * interpreted but runs only on docs that HAVE spans.) Both callers
    * pass [[mergeSpans]] output, so spans are sorted, non-overlapping,
    * non-abutting islands; the rebuild keeps the same left-to-right
    * segment order the piece sort produced. */
  private[pipeline] def cutSpans(df: DataFrame, idCol: String,
                                 textCol: String,
                                 spans: DataFrame): DataFrame = {
    // one row per doc with spans: sorted [(start, end), ...]
    val segs = spans.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(
        col("span_start").cast("long").as("s"),
        col("span_end").cast("long").as("e")))).as("__graft_sp"))
    val docs = prep(df, idCol, textCol)
    val t = col("__t")
    val sp = col("__graft_sp")
    // gap before span i (0-based): (prev end + 1) .. (start - 1); the
    // i = 0 gap is the head segment. Zero-length gaps contribute "".
    val gaps = transform(sp, (s, i) => {
      val prevEnd = when(i === 0, lit(0L))
        .otherwise(get(sp, i - 1).getField("e"))
      val gapLen = s.getField("s") - lit(1L) - prevEnd
      when(gapLen > 0,
        t.substr((prevEnd + lit(1L)).cast("int"), gapLen.cast("int")))
        .otherwise(lit(""))
    })
    val lastEnd = element_at(sp, size(sp)).getField("e")
    val tailLen = length(t).cast("long") - lastEnd
    val tailPiece = when(tailLen > 0,
      t.substr((lastEnd + lit(1L)).cast("int"), tailLen.cast("int")))
      .otherwise(lit(""))
    // Rebuild on the JOIN'S BUILD SIDE — one inner join restricted to
    // docs that HAVE spans, projected to (doc_id, rebuilt text). The
    // final attach below then carries PRE-COMPUTED strings, so a
    // downstream range sort's boundary-sampling job re-executes only a
    // scan + hash probe, not the substr/concat walk (r14: with the
    // rebuild inlined in the final projection, q_substr_dedup's
    // orderBy evaluated it twice — 12.8 -> 22.5 s at sf1d; this shape
    // restores the one-evaluation property the old piece-aggregate had).
    val rewritten = docs
      .join(segs, docs("__id") === segs("doc_id"))
      .select(col("doc_id").as("__rid"),
        concat(array_join(gaps, ""), tailPiece).as("__new"))
    // rename the join key: the caller's idCol may itself be "doc_id"
    val out = df.na.drop(Seq(idCol, textCol))
      .join(rewritten, col(idCol).cast("long") === col("__rid"), "left")
    out.select(df.columns.map {
      case c if c == textCol =>
        coalesce(col("__new"), col(textCol)).as(c)
      case c => col(c)
    }.toIndexedSeq: _*)
  }
}
