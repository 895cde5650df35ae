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
    val aggs = names.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
      )
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one.selectExpr(
      "__n",
      s"stack(${names.length}, $stackArgs) AS (column_name, nulls, n_distinct, min_s, max_s)")
      .select(col("column_name"), col("__n").as("n"),
        col("nulls"), col("n_distinct"), col("min_s"), col("max_s"))
  }
}
