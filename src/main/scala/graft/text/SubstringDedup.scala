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
  *   2+3. keep each document's positions covered by a gram occurring in
  *      ≥ `minDocs` DISTINCT documents — for minDocs = 2 a single
  *      gram-partitioned min≠max window (the gram stream shuffles ONCE);
  *      for higher thresholds a countDistinct aggregate + semi-join;
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
    // Shared-gram detection. minDocs == 2 (the operator's natural setting)
    // has a one-pass plan: "≥2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id)
    // over a gram-partitioned window — the gram stream (the corpus ×
    // gramLen amplification, the expensive thing here) is generated and
    // shuffled ONCE, vs twice for the aggregate + semi-join shape. min/max
    // window frames are O(1) state per row — no per-gram set, no skew bomb
    // on a mega-hot gram. Higher thresholds take the two-pass exact-
    // countDistinct path.
    val hits =
      if (minDocs == 2) {
        val byGram = Window.partitionBy("gram")
        grams
          .withColumn("multi", min(col("doc_id")).over(byGram) =!= max(col("doc_id")).over(byGram))
          .filter(col("multi"))
          .select("doc_id", "pos")
      } else {
        val shared = grams
          .groupBy("gram")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= minDocs)
          .select("gram")
        grams.join(shared, Seq("gram"), "left_semi").select("doc_id", "pos")
      }
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

  /** The REMOVAL half of the operator: cut every shared span from every
    * document except its canonical first occurrence, and return the
    * scrubbed corpus — what a training-data pipeline actually ships.
    *
    * Ownership policy: spans are grouped by their exact text; the copy in
    * the (min doc_id, min span_start) position survives, every other copy
    * is spliced out. A maximal span whose exact text no other document
    * reproduces (e.g. one doc's span merged two overlapping regions shared
    * with different partners) has no co-owner and is conservatively KEPT —
    * the policy never cuts text it cannot prove duplicated verbatim.
    *
    * The splice is relational, not procedural: per-doc cut intervals are
    * disjoint by construction (islands), so the retained text is the
    * ordered concat of the between-cut segments — a lag window + one
    * per-doc aggregation, both partitioned by doc. The ownership window
    * keys on the span text itself (exact, oracle-checkable); the spans
    * table holds only the duplicated regions — tiny next to the corpus —
    * so the wide key is affordable; a 100 TB run would key the window on
    * xxhash64(span_text) and carry the text only to tie-break collisions.
    */
  def removeShared(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramLen: Int = 40,
      minSpan: Int = 60,
      stride: Int = 1,
  ): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val spans = sharedSpans(d, "doc_id", "text", gramLen, minSpan, minDocs = 2, stride = stride)
      .join(d, Seq("doc_id"))
      .withColumn("span_text", col("text").substr(col("span_start").cast("int"), col("span_len").cast("int")))
    val owner = Window.partitionBy("span_text").orderBy(col("doc_id"), col("span_start"))
    val cuts = spans
      .withColumn("occ", row_number().over(owner))
      // rank within the span-text group decides survival; a group of size
      // 1 has only occ=1 (the no-co-owner case) and cuts nothing.
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("span_text")))
      .filter(col("occ") > 1 && col("n_occ") > 1)
      .select(col("doc_id"), col("span_start"), col("span_end"), col("span_len"))
    // Between-cut segments: [prev_end+1, start-1] per cut, plus the tail.
    val byDoc = Window.partitionBy("doc_id").orderBy("span_start")
    val segs = cuts
      .withColumn("seg_from", coalesce(lag(col("span_end"), 1).over(byDoc), lit(0L)) + 1)
      .join(d, Seq("doc_id"))
      // text is functionally dependent on doc_id — grouping by both keeps
      // it addressable inside the aggregation without a first() wrapper.
      .groupBy("doc_id", "text")
      .agg(
        count(lit(1)).as("n_cuts"),
        sum(col("span_len")).as("chars_removed"),
        concat(
          // segments before each cut, in order…
          array_join(transform(
            sort_array(collect_list(struct(col("span_start"), col("seg_from")))),
            s => expr("text").substr(
              s.getField("seg_from").cast("int"),
              (s.getField("span_start") - s.getField("seg_from")).cast("int"))), ""),
          // …then the tail after the last cut.
          expr("text").substr((max(col("span_end")) + 1).cast("int"), length(expr("text")))
        ).as("text_clean"),
      )
      .drop("text")
    d.join(segs, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("text_clean"), col("text")).as("text_clean"),
        coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
        coalesce(col("chars_removed"), lit(0L)).as("chars_removed"),
      )
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
