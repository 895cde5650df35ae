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

  /** [[asOfJoinExec]] with the HOT-KEY (skew) cure implemented: the key
    * space is salted into `chunks` time-range buckets and the SAME
    * physical operator merges on the composite (key, chunk) struct, so a
    * key holding 50%+ of the rows spreads across up to `chunks` tasks
    * instead of serializing through one.
    *
    * Exactness argument (the reason ONE seed row per chunk suffices):
    * the bucketizer is MONOTONE in time (equal-width ranges over the
    * left side's [min, max] span), so for a left row in chunk c every
    * earlier-chunk right row is strictly before c's start. The best of
    * those is therefore the same row for every left row in c — the
    * per-(key, chunk) "seed": the LATEST right row from chunks < c
    * (backward; earliest from chunks > c for forward). Each chunk's
    * right side is its own-bucket rows plus that one seed, and the merge
    * inside the chunk is the unsalted merge verbatim — AsOfSpec pins
    * value identity against both [[asOfJoin]] and [[asOfJoinExec]].
    *
    * Cost: one bounded driver action (left time min/max — two longs), a
    * per-(key, chunk) boundary aggregation of the right side (≤ `chunks`
    * rows per key), and ≤ `chunks` seed replicas per key — O(keys ×
    * chunks) extra rows, independent of row count. Requires LONG time
    * columns (the bucketizer does arithmetic), like `toleranceNs`.
    *
    * When to use: this is the explicit skew path; the unsalted
    * [[asOfJoinExec]] stays preferable when keys are well-distributed
    * (no seed fan-out, no composite-key compare in the merge).
    */
  def asOfJoinExecSalted(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      forward: Boolean = false,
      toleranceNs: Option[Long] = None,
      chunks: Int = 8,
  ): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    require(chunks >= 2, s"asOfJoinExecSalted: chunks must be >= 2, got $chunks")
    val lCols = left.columns.toSeq
    require(payload.intersect(lCols).isEmpty,
      s"payload collides with left columns: ${payload.intersect(lCols)}")
    val reserved = Set("_kc", "_chunk", "_bk", "_row", "_tc")
    val clash = (lCols ++ right.columns).filter(reserved)
    require(clash.isEmpty, s"input columns collide with asOfJoinExecSalted internals: $clash")
    require(left.schema(leftTime).dataType == LongType &&
      right.schema(rightTime).dataType == LongType,
      "asOfJoinExecSalted requires LONG time columns (time-range bucketizer)")
    val keyDt = left.schema(leftKey).dataType

    // one bounded driver action: the left span — two longs, any scale
    val bounds = left.agg(min(col(leftTime)), max(col(leftTime))).head()
    if (bounds.isNullAt(0))
      // no non-null left time can match anything; the unsalted exec
      // already handles the all-null-payload outcome
      return asOfJoinExec(left, right, leftKey, leftTime, rightKey, rightTime,
        payload, forward, toleranceNs)
    val tmin = bounds.getLong(0)
    val tmax = bounds.getLong(1)
    // ALL bucket arithmetic in double space: a LONG subtraction here
    // ((rt - tmin) with rt far from the left span, or a left span wider
    // than Long.MaxValue) wraps negative and would clamp a POST-span
    // right row into chunk 0 — for a forward join that breaks the
    // monotonicity invariant the seed proof needs (the misplaced row
    // never seeds later chunks → wrong NULL payloads). Doubles lose
    // low-bit precision past 2^53 but long→double is monotone
    // non-decreasing, which is ALL the exactness argument requires of
    // the bucketizer; ties collapsing into one chunk are still correct.
    val span = math.max(1.0, tmax.toDouble - tmin.toDouble + 1.0)
    // monotone, clamped: rights before the left span land in chunk 0,
    // after it in chunk chunks-1 — monotonicity is all exactness needs.
    // Clamp BEFORE the int cast: the quotient can exceed Int range.
    def bucket(tc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      greatest(lit(0.0), least(lit((chunks - 1).toDouble),
        floor((tc.cast("double") - lit(tmin.toDouble)) / lit(span) * chunks))).cast("int")
    // identical struct TYPE on both sides (field names + nullability),
    // or the exec's key-type equality check rejects the pair
    val kcType = StructType(Seq(
      StructField("_k", keyDt, nullable = true),
      StructField("_c", IntegerType, nullable = true)))

    val l2 = left
      .withColumn("_chunk",
        when(col(leftTime).isNull, lit(0)).otherwise(bucket(col(leftTime))))
      .withColumn("_kc",
        struct(col(leftKey).as("_k"), col("_chunk").as("_c")).cast(kcType))

    // rights with null key/time can never match; dropping them here also
    // keeps the composite struct non-null-field so a null-key LEFT row
    // (struct(null, 0) is a non-null struct) finds no partner
    val rBase = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("_chunk", bucket(col(rightTime)))
    val rDataCols = right.columns.toSeq
    // per (key, chunk) boundary row: latest for backward (the row a later
    // chunk would carry in), earliest for forward (the row an earlier
    // chunk would peek)
    val boundaryRow = struct(rDataCols.map(col): _*)
    val pick: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (forward) min_by else max_by
    val perChunk = rBase
      .groupBy(col(rightKey).as("_bk"), col("_chunk"))
      .agg(pick(boundaryRow, col(rightTime)).as("_row"))
    // fan each boundary row out to every chunk it can seed; Spark's
    // sequence() runs DESCENDING when start > stop, so guard the empty case
    val targets =
      if (forward)
        when(col("_chunk") > 0, sequence(lit(0), col("_chunk") - 1))
          .otherwise(lit(Array.empty[Int]))
      else
        when(col("_chunk") < chunks - 1, sequence(col("_chunk") + 1, lit(chunks - 1)))
          .otherwise(lit(Array.empty[Int]))
    val seedPick: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (forward) min_by else max_by
    val seeds = perChunk
      .select(col("_bk"), col("_chunk"), col("_row"), explode(targets).as("_tc"))
      .groupBy(col("_bk"), col("_tc"))
      // nearest donor chunk wins: max source chunk for backward, min for
      // forward — (key, source-chunk) rows are unique, so no tie exists
      .agg(seedPick(col("_row"), col("_chunk")).as("_row"))
      .select((rDataCols.map(c => col(s"_row.$c").as(c)) :+ col("_tc").as("_chunk")): _*)
    val r2 = rBase.select((rDataCols.map(col) :+ col("_chunk")): _*)
      .unionByName(seeds)
      .withColumn("_kc",
        struct(col(rightKey).as("_k"), col("_chunk").as("_c")).cast(kcType))

    asOfJoinExec(l2, r2, "_kc", leftTime, "_kc", rightTime, payload,
      forward, toleranceNs)
      .select((lCols.map(col) ++ payload.map(col)): _*)
  }
}
