package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication (RefinedWeb / C4-style).
  *
  * Web boilerplate ("all rights reserved", cookie banners, nav menus)
  * repeats VERBATIM as whole lines across millions of pages. Gram-level
  * substring dedup (text/SubstringDedup.scala) catches it but pays a
  * position-keyed gram stream; when duplication respects line boundaries
  * — the common case for boilerplate — deduping AT the line key is far
  * cheaper: one narrow split projection, one map-side-combining aggregate
  * on the line, one key join, one per-doc reassembly. No gram explosion,
  * no windows over corpus-wide keys.
  *
  * Semantics (Lee et al. 2022 exact-dedup at line granularity, Penedo et
  * al. 2023 RefinedWeb line filtering): a line occurring in ≥ `minDocs`
  * DISTINCT documents is boilerplate; every occurrence is dropped except
  * the single earliest one (min doc id, then min line number within that
  * doc), preserving one copy of the content corpus-wide. Documents are
  * reassembled in original line order; a doc whose every line is dropped
  * yields the empty string rather than disappearing.
  *
  * Scale shape, in plan order:
  *   1. `posexplode(split(text))` — narrow, inside the scan's codegen
  *      stage; amplification is line count, not gram count.
  *   2. `groupBy(line)` with count-distinct + min-struct owner — partial
  *      aggregation collapses each line to one state row per map
  *      partition, so a mega-hot boilerplate line costs one row per
  *      partition, not a window over its full occurrence list.
  *   3. The lines⋈shared join carries only lines above the threshold on
  *      the build side; at web scale that set is the boilerplate corpus
  *      (≪ distinct lines), so AQE sizes it to broadcast, and probe-side
  *      hot keys never co-locate. (If line text dominates shuffle bytes,
  *      key this join by `md5(line)` — same plan, 32-byte keys; kept as
  *      raw text here so the DuckDB oracle can replicate it verbatim.)
  *   4. `groupBy(doc)` reassembly — collect_list of (line_no, line)
  *      structs, sorted in-memory per doc: bounded by document size.
  */
object LineDedup {

  /** Dedup `textCol` line-wise across the corpus; returns one row per
    * document: (id, clean_text, n_lines, n_dropped).
    */
  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
      sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("line_no", "line")))
    // Blank/whitespace-only lines are exempt: paragraph separators and
    // trailing newlines occur in essentially every document, and treating
    // "" as boilerplate would strip paragraph structure corpus-wide
    // (RefinedWeb/C4 line dedup only targets non-trivial repeated lines).
    val shared = lines
      .filter(trim(col("line")) =!= "")
      .groupBy("line")
      .agg(
        countDistinct(col(idCol)).as("ndocs"),
        min(struct(col(idCol).as("d"), col("line_no").as("p"))).as("owner"))
      .filter(col("ndocs") >= minDocs)
      .select(col("line"), col("owner"))
    val flagged = lines
      .join(shared, Seq("line"), "left")
      .withColumn("keep",
        col("owner").isNull ||
          (col("owner.d") === col(idCol) && col("owner.p") === col("line_no")))
    flagged
      .groupBy(col(idCol))
      .agg(
        // collect_list skips nulls: the when() collects kept lines only.
        sort_array(collect_list(when(col("keep"),
          struct(col("line_no"), col("line"))))).as("ls"),
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
      .select(
        col(idCol),
        array_join(transform(col("ls"), x => x.getField("line")), sep).as("clean_text"),
        col("n_lines"),
        col("n_dropped"))
  }

  /** The shared-line (boilerplate) table itself: (line, ndocs, owner doc,
    * owner line_no) for every line crossing the threshold — the audit
    * artifact pipelines persist alongside the scrubbed corpus.
    */
  def sharedLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
      sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    docs
      .select(col(idCol), posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("line_no", "line")))
      .filter(trim(col("line")) =!= "") // blank lines exempt (see dedupLines)
      .groupBy("line")
      .agg(
        countDistinct(col(idCol)).as("ndocs"),
        min(struct(col(idCol).as("d"), col("line_no").as("p"))).as("owner"))
      .filter(col("ndocs") >= minDocs)
      .select(col("line"), col("ndocs"),
        col("owner.d").as("owner_doc"), col("owner.p").as("owner_line"))
  }
}
