package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling for arbitrary schemas — the dynamic-schema
  * cousin of Qc: row count, null count, exact distinct count, and
  * stringified min/max per column, computed in a SINGLE aggregation job
  * and melted to one row per column.
  *
  * The reference profiles inputs with ad-hoc count()/distinct() actions
  * scattered through the parsers (SURVEY §2.5 A5); this folds the whole
  * audit into one scan. Exact countDistinct expands the aggregate per
  * column (Spark's Expand operator) — at 100 TB swap in
  * approx_count_distinct(col, rsd) per column, same shape, one pass,
  * mergeable sketches.
  */
object Profile {

  /** Profile the named columns (default: all). Min/max are cast to
    * string for type-uniform output; cast non-exact types (double) to a
    * fixed-scale decimal FIRST if the profile must be engine-portable
    * (double→string formatting is engine-specific).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    // Source columns are resolved as exact (backtick-quoted, inner
    // backticks doubled) names, and the melt is built with the Column
    // API (explode over structs), so no column name is ever spliced into
    // SQL text — names containing quotes, backticks, or dots profile fine.
    val aggs = names.zipWithIndex.flatMap { case (c, i) =>
      val src = df(s"`${c.replace("`", "``")}`")
      Seq(
        sum(when(src.isNull, 1L).otherwise(0L)).as(s"__p${i}_nulls"),
        countDistinct(src).as(s"__p${i}_distinct"),
        min(src).cast("string").as(s"__p${i}_min"),
        max(src).cast("string").as(s"__p${i}_max"),
      )
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col(s"__p${i}_nulls").as("nulls"),
        col(s"__p${i}_distinct").as("n_distinct"),
        col(s"__p${i}_min").as("min_s"),
        col(s"__p${i}_max").as("max_s"),
      )
    }
    one
      .select(col("__n"), explode(array(rows: _*)).as("r"))
      .select(col("r.column_name"), col("__n").as("n"),
        col("r.nulls"), col("r.n_distinct"), col("r.min_s"), col("r.max_s"))
  }
}
