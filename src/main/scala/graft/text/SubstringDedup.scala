package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document exact substring deduplication — the "remove long verbatim
  * spans shared across otherwise-distinct documents" training-data operator
  * (the suffix-array dedup of Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better", re-expressed Spark-first).
  *
  * A suffix array is a single-machine index; the distributed equivalent that
  * Catalyst can plan is gram-anchored span assembly:
  *
  *   1. slide a fixed-length character window over every document
  *      (`gramLen`, stride `stride`) — a narrow Generate, no shuffle;
  *   2. find grams occurring in ≥ `minDocs` DISTINCT documents — one
  *      hash aggregation keyed on the gram;
  *   3. keep each document's positions covered by a shared gram — a
  *      semi-join back on the gram key (same key → AQE-coalesced exchange);
  *   4. merge overlapping/adjacent gram intervals into maximal spans with
  *      the gaps-and-islands pattern INSIDE each document (window
  *      partitioned by doc — parallel), keep spans ≥ `minSpan` chars.
  *
  * Every shuffle is keyed on gram or doc_id — never doc×doc, never a global
  * sort. At 100 TB the stride-1 gram stream is a ~gramLen× amplification of
  * the corpus; the scale knobs are (a) `stride` > 1 — cheap, but a shared
  * span is only caught when both documents anchor the SAME gram, i.e. the
  * copies are stride-aligned, so recall < 1 on arbitrary offsets — or
  * (b) content-defined anchors (the winnowing kernel, graft.functions
  * `WinnowFingerprints`), which select identical positions inside identical
  * text regardless of alignment: winnow-anchor, then span-verify exactly as
  * here. The oracled registry query keeps stride = 1 (exhaustive, recall 1)
  * so the DuckDB n-gram self-join formulation is exactly equivalent.
  *
  * Grams are grouped by their literal text, not a hash: cross-engine
  * oracle exactness, and no collision caveat. A 100 TB run would key on
  * xxhash64(gram) to shrink the shuffle — collisions only ever ADD
  * candidate positions, which the (cheap) span verification absorbs.
  */
object SubstringDedup {

  /** Maximal shared spans per document: (doc_id, span_start, span_end,
    * span_len, n_grams), 1-based inclusive character positions. A span is
    * the union of overlapping `gramLen`-char windows each of which appears
    * verbatim in at least `minDocs` distinct documents.
    */
  def sharedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramLen: Int = 40,
      minSpan: Int = 60,
      minDocs: Int = 2,
      stride: Int = 1,
  ): DataFrame = {
    require(gramLen >= 2 && stride >= 1 && minSpan >= gramLen,
      s"need gramLen>=2, stride>=1, minSpan>=gramLen; got ($gramLen, $stride, $minSpan)")
    val grams = gramStream(docs, idCol, textCol, gramLen, stride)
    val shared = grams
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("gram")
    val hits = grams.join(shared, Seq("gram"), "left_semi").select("doc_id", "pos")
    // Gaps-and-islands over each doc's hit positions: a new span starts
    // where the previous gram's window [p, p+gramLen-1] no longer touches
    // this one (pos > prev + gramLen). Per-doc window — parallel.
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(byDoc) + gramLen, 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "grp")
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(gramLen - 1)).as("span_end"),
        count(lit(1)).as("n_grams"),
      )
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .filter(col("span_len") >= minSpan)
      .select("doc_id", "span_start", "span_end", "span_len", "n_grams")
  }

  /** Sliding `gramLen`-char windows at `stride`: (doc_id, pos, gram) with
    * 1-based pos. Pure projection + Generate — no shuffle, codegen'd.
    */
  def gramStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramLen: Int,
      stride: Int,
  ): DataFrame = {
    val text = col(textCol)
    val lastStart = (length(text) - lit(gramLen - 1)).cast("long")
    // sequence(a, b) counts DOWN when b < a — guard short documents.
    val starts = when(lastStart >= 1L, sequence(lit(1L), lastStart, lit(stride.toLong)))
      .otherwise(array().cast("array<bigint>"))
    docs.select(
      col(idCol).as("doc_id"),
      explode(transform(starts, i =>
        struct(i.as("pos"), text.substr(i.cast("int"), lit(gramLen)).as("gram")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
  }
}
