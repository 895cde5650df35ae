package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — beyond-reference scope.
  *
  * Spark has no ASOF JOIN primitive. The naive formulation — range
  * theta-join (`l.key = r.key && r.t <= l.t`) followed by a per-row top-1
  * window — materializes every (left row × earlier right row) pair before
  * pruning: quadratic per key, hopeless at 100 TB.
  *
  * This is the union-and-window construction instead: tag both inputs,
  * union them on a shared (key, time) axis, sort each key's timeline once,
  * and carry the right side's payload forward with
  * `last(payload, ignoreNulls) over (partition by key order by t, side
  * rows unbounded preceding)`. One shuffle on the key, one sort, zero pair
  * blowup — the same plan shape Flink/KDB use for as-of semantics.
  *
  * Right rows sort before left rows at equal timestamps (`side` tiebreak),
  * giving inclusive `r.t <= l.t` semantics, matching DuckDB `ASOF JOIN ...
  * ON l.t >= r.t`.
  *
  * Determinism: callers must ensure at most one right row per (key, time)
  * (pre-aggregate otherwise) — with ties the "most recent" row is
  * undefined in any engine.
  *
  * Skew: a hot key serializes through one task (window partitioning). If
  * one key dominates, pre-split its timeline into time-range chunks,
  * as-of join within chunks seeded with each chunk's carry-in row, and
  * union — the same salting idea `core.Layout` applies to joins.
  */
object AsOf {

  /** @param left      probe side; every row is preserved (left-outer)
    * @param right     build side carrying `payload` columns
    * @param leftKey   equi-key column name on `left`
    * @param leftTime  numeric/orderable time column name on `left`
    * @param rightKey  equi-key column name on `right`
    * @param rightTime time column on `right`, same scale as `leftTime`
    * @param payload   columns of `right` to carry onto matching left rows
    *                  (names must not collide with `left`'s columns)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
  ): DataFrame = {
    val lCols = left.columns.toSeq
    require(payload.intersect(lCols).isEmpty, s"payload collides with left columns: ${payload.intersect(lCols)}")
    val reserved = Set("_k", "_t", "_side", "_lrow", "_pay", "_asof")
    val clash = (lCols ++ right.columns).filter(reserved)
    require(clash.isEmpty, s"input columns collide with asOfJoin internals: $clash")
    val lrowType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    val payType = right.select(struct(payload.map(col): _*)).schema.head.dataType

    val l = left.select(
      col(leftKey).as("_k"),
      col(leftTime).as("_t"),
      lit(1).as("_side"),
      struct(lCols.map(col): _*).as("_lrow"),
      lit(null).cast(payType).as("_pay"),
    )
    val r = right
      // SQL as-of semantics: a right row with a NULL key or NULL time can
      // never match (equality/inequality with NULL is never true). The
      // window would otherwise group NULL keys together and sort NULL
      // times first — silently carrying unmatchable rows.
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("_k"),
        col(rightTime).as("_t"),
        lit(0).as("_side"),
        lit(null).cast(lrowType).as("_lrow"),
        struct(payload.map(col): _*).as("_pay"),
      )
    val w = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((lCols.map(c => col(s"_lrow.$c")) ++ payload.map(p => col(s"_asof.$p"))): _*)
  }

  /** [[asOfJoin]] through the injected PHYSICAL operator
    * ([[graft.plans.AsOfJoinPlan]] → `AsOfJoinExec`): same inclusive
    * left-outer semantics, but one streaming merge per co-partition with
    * O(1) state instead of the union-window construction — no null-padded
    * union rows, no window frame, and the output keeps the left side's
    * clustering and (key, time) order. Requires the session built with
    * `GraftExtensions` (the strategy is injected there); an AsOfJoinPlan
    * reaching the planner without it fails loudly as an unplanned node.
    *
    * `forward = true` flips the direction (pandas merge_asof
    * direction='forward'): the EARLIEST right row with `r.time >=
    * l.time` — DuckDB `ASOF JOIN ... ON l.t <= r.t`. Same merge pass,
    * peek instead of carry.
    *
    * `toleranceNs` bounds the match distance (merge_asof tolerance —
    * the stale-quote guard): a candidate farther than `toleranceNs`
    * from the left time yields null payload instead. Requires LONG
    * time columns (arithmetic, not just ordering).
    */
  def asOfJoinExec(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      forward: Boolean = false,
      toleranceNs: Option[Long] = None,
  ): DataFrame = {
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload collides with left columns: ${payload.intersect(left.columns.toSeq)}")
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side through fresh exprIds so a self-join can
    // never alias attributes across the two legs
    val rPlan = right
      .select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
      .queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String, side: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asOfJoinExec: no column '$n' on $side side"))
    val (lk, lt) = (attr(lPlan, leftKey, "left"), attr(lPlan, leftTime, "left"))
    val (rk, rt) = (attr(rPlan, rightKey, "right"), attr(rPlan, rightTime, "right"))
    require(lk.dataType == rk.dataType,
      s"asOfJoinExec: key types differ (${lk.dataType} vs ${rk.dataType})")
    require(lt.dataType == rt.dataType,
      s"asOfJoinExec: time types differ (${lt.dataType} vs ${rt.dataType})")
    val pay = payload.map(attr(rPlan, _, "right"))
    org.apache.spark.sql.GraftShim.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt, pay, forward, toleranceNs))
  }
}
