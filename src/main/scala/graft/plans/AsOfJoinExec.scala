package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** AS-OF JOIN as a first-class plan node — the rung-(c) extension path:
  * custom `LogicalPlan` + `SparkStrategy` + physical `SparkPlan`,
  * injected via `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics (inclusive, left-outer): for every left row, the payload of
  * the LATEST right row with the same key and `r.time <= l.time` — DuckDB
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`. Callers keep at most
  * one right row per (key, time); null keys/times never match (SQL
  * equality/inequality semantics), but null-key left rows are preserved
  * with null payload (left-outer).
  *
  * Why a physical operator when [[graft.core.AsOf.asOfJoin]] already
  * avoids the quadratic pair blowup: the union-and-window construction
  * pays for (a) a UNION row wide enough to carry BOTH sides' payloads
  * (null-padded structs on every row), (b) a window operator whose
  * `last(_, ignoreNulls)` frame scan re-touches each partition, and
  * (c) a post-filter dropping the right-side rows back out. This
  * operator shuffles each side ONLY on its key, sorts each side by
  * (key, time) — both steps supplied by `EnsureRequirements` from the
  * declared distribution/ordering, so AQE still plans the exchanges —
  * and then streams ONE merge pass per co-partition with O(1) state
  * (the single carried right row). Nothing is ever null-padded, no
  * window frame exists, and the output preserves the left side's
  * partitioning and ordering for downstream reuse.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false,
    toleranceNs: Option[Long] = None)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, pay, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, pay, fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children arrive clustered on their keys and
  * sorted by (key, time) — declared, not hand-built, so the planner owns
  * the exchanges — and each co-partition merges in one forward pass.
  * The only retained state is the most recent matching right row (one
  * `copy()` per consumed right row), so memory is O(1) per partition
  * regardless of key cardinality or time-series length. A hot key
  * serializes through one task exactly like any clustered operator —
  * the IMPLEMENTED cure is [[graft.core.AsOf.asOfJoinExecSalted]]:
  * time-chunked composite keys carried through THIS exec unchanged
  * (the struct-key ordering and the InternalRow carry-copy below are
  * what make that path safe).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false,
    toleranceNs: Option[Long] = None)
    extends BinaryExecNode {
  // tolerance needs time arithmetic, not just ordering — long times only
  toleranceNs.foreach { t =>
    require(t >= 0, s"asOfJoin tolerance must be >= 0, got $t")
    require(leftTime.dataType == org.apache.spark.sql.types.LongType,
      s"asOfJoin tolerance requires LONG time columns, got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // the merge is left-driven and order-preserving: downstream operators
  // keep both the clustering and the (key, time) sort for free
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyE = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTimeE = BindReferences.bindReference(leftTime: Expression, left.output)
    val rKeyE = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTimeE = BindReferences.bindReference(rightTime: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val payloadAttrs = payload
    val rightOutput = right.output
    val leftOutput = left.output
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val payProj = UnsafeProjection.create(
        payloadAttrs.map(a => BindReferences.bindReference(a: Expression, rightOutput)))
      // bind against NULLABLE payload attrs: the unmatched-row nullPay
      // fields must go through the BoundReference null check (a
      // non-nullable binding would read primitive zeros instead)
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => BindReferences.bindReference(
          a: Expression, leftOutput ++ payloadAttrs.map(_.withNullability(true)))))
      val nullPay = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow
      // O(1) state: the latest matching right row (payload-projected and
      // copied out of the iterator's reused buffer) and its key
      var carryPay: InternalRow = null
      var carryKey: Any = null
      var carryTime: Long = 0L
      val tol = toleranceNs.getOrElse(Long.MaxValue)
      val unbounded = toleranceNs.isEmpty

      lIter.map { lRow =>
        val lk = lKeyE.eval(lRow)
        val lt = lTimeE.eval(lRow)
        numOutputRows += 1
        if (lk == null || lt == null) {
          // SQL semantics: null key/time matches nothing; row preserved
          resultProj(joined(lRow, nullPay))
        } else if (!forward) {
          // BACKWARD (default): latest right row with rt <= lt — consume
          // everything at or before (lk, lt), carrying the last match
          var done = false
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyE.eval(head)
            val rt = rTimeE.eval(head)
            if (rk == null || rt == null) {
              rBuf.next() // unmatchable; discard
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) {
                // keys are ascending on both sides: a right key below the
                // current left key can never match any later left row
                rBuf.next()
              } else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                carryPay = payProj(head).copy()
                // the evaluated key may be a VIEW into the iterator's
                // reused row buffer (UTF8String, or an InternalRow for
                // struct keys — the salted composite-key path) — copy it
                // out or the carried key silently mutates under us
                carryKey = rk match {
                  case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
                  case r: InternalRow => r.copy()
                  case v => v
                }
                if (!unbounded) carryTime = rt.asInstanceOf[Long]
                rBuf.next()
              } else {
                done = true
              }
            }
          }
          val matched = carryPay != null && keyOrd.compare(carryKey, lk) == 0 &&
            (unbounded || lt.asInstanceOf[Long] - carryTime <= tol)
          if (matched) numMatched += 1
          resultProj(joined(lRow, if (matched) carryPay else nullPay))
        } else {
          // FORWARD: earliest right row with rt >= lt — discard strictly-
          // before rows (left times ascend, so they can never match a
          // later left row either) and PEEK the head without consuming
          // (one right row may serve many left rows)
          var done = false
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyE.eval(head)
            val rt = rTimeE.eval(head)
            if (rk == null || rt == null) rBuf.next()
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0 || (c == 0 && timeOrd.compare(rt, lt) < 0)) rBuf.next()
              else done = true
            }
          }
          val matched = rBuf.hasNext && {
            val rk = rKeyE.eval(rBuf.head)
            rk != null && keyOrd.compare(rk, lk) == 0 &&
              (unbounded ||
                rTimeE.eval(rBuf.head).asInstanceOf[Long] - lt.asInstanceOf[Long] <= tol)
          }
          if (matched) numMatched += 1
          resultProj(joined(lRow, if (matched) payProj(rBuf.head) else nullPay))
        }
      }
    }
  }
}
