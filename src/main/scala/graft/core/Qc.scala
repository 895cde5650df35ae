package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime data-QC assertions — the reference's test strategy (SURVEY.md
  * §5.2): expected row-count windows (`AzGeneBurden.py:126-132`, 28k–30k;
  * `GenebassGeneBurden.py:64-68`), invariant checks (no zero p-values
  * after repair `AzGeneBurden.py:120-124`; key uniqueness
  * `IMPC.py:295-296`), fraction windows (`ChEMBL.py:59-63`).
  *
  * Each helper triggers ONE action and fails loudly. At scale, prefer
  * calling several on a persisted DataFrame, or fold invariants into a
  * single `agg` pass like [[assertAll]].
  */
object Qc {

  final case class QcException(msg: String) extends RuntimeException(msg)

  def assertCountBetween(df: DataFrame, lo: Long, hi: Long, what: String = "rows"): Long = {
    val n = df.count()
    if (n < lo || n > hi) throw QcException(s"$what count $n outside expected [$lo, $hi]")
    n
  }

  /** Key-uniqueness invariant (`IMPC.py:295-296`) in one aggregate pass. */
  def assertUniqueKey(df: DataFrame, keys: Seq[String]): Unit = {
    val cols = keys.map(col)
    val r = df.agg(count(lit(1)).as("n"), countDistinct(cols.head, cols.tail: _*).as("d")).head()
    if (r.getLong(0) != r.getLong(1))
      throw QcException(s"key ${keys.mkString(",")} not unique: ${r.getLong(0)} rows, ${r.getLong(1)} distinct")
  }

  /** No-values-matching invariant, e.g. zero p-values after repair. */
  def assertNone(df: DataFrame, predicate: org.apache.spark.sql.Column, what: String): Unit = {
    val n = df.filter(predicate).count()
    if (n != 0) throw QcException(s"$n rows violate invariant: $what")
  }

  /** Fraction-in-window check (`ChEMBL.py:59-63`: stopped-trial share
    * 8–15%) as a single pass.
    */
  def assertFractionBetween(
      df: DataFrame,
      predicate: org.apache.spark.sql.Column,
      lo: Double,
      hi: Double,
      what: String,
  ): Double = {
    val r = df.agg(
      sum(when(predicate, 1L).otherwise(0L)).as("m"),
      count(lit(1)).as("n")).head()
    val frac = if (r.getLong(1) == 0) 0.0 else r.getLong(0).toDouble / r.getLong(1)
    if (frac < lo || frac > hi)
      throw QcException(f"$what fraction $frac%.4f outside [$lo, $hi]")
    frac
  }

  /** Zero-cost QC via `Dataset.observe`: metrics accumulate DURING the
    * pipeline's own action instead of re-scanning with a separate
    * count()/agg() job (every helper above, like the reference's eager
    * QC asserts, pays one extra pass — at 100 TB that is a second full
    * scan). Attach near the scan, run the normal write, then validate
    * with [[observedMetrics]].
    */
  def observed(df: DataFrame, name: String, metrics: org.apache.spark.sql.Column*): DataFrame = {
    require(metrics.nonEmpty, "observed needs at least one metric column")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Metrics recorded by [[observed]] for the LAST completed action that
    * ran this Dataset's own QueryExecution (collect/foreach/toLocalIterator;
    * empty before any such action). `df.write` builds a NEW QueryExecution,
    * so for writes read the metrics from a `QueryExecutionListener` (the
    * listener receives every execution, including writes) — or in
    * streaming, from `StreamingQueryProgress.observedMetrics`.
    */
  def observedMetrics(df: DataFrame): Map[String, org.apache.spark.sql.Row] =
    df.queryExecution.observedMetrics

  /** Several boolean invariants in ONE job: each predicate is counted in a
    * single aggregate pass; returns violation counts keyed by label.
    */
  def assertAll(df: DataFrame, invariants: Seq[(String, org.apache.spark.sql.Column)]): Unit = {
    // coalesce: sum over ZERO rows is null; an empty DataFrame has zero
    // violations and must pass, not NPE.
    val aggs = invariants.map { case (label, pred) =>
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(label)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = invariants.zipWithIndex.collect {
      case ((label, _), i) if row.getLong(i) != 0 => s"$label=${row.getLong(i)}"
    }
    if (bad.nonEmpty) throw QcException(s"invariant violations: ${bad.mkString(", ")}")
  }
}
