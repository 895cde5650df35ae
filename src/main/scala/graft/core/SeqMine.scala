package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequent SEQUENCE mining over sessionized event streams — the
  * gap-allowed generalization of q_event_paths' adjacent transitions
  * (GSP/PrefixSpan's bounded-length core): which ordered type patterns
  * A→B and A→B→C occur — with ANY events in between — in at least
  * `minSupport` sessions?
  *
  * The classic miners grow a pattern lattice; over a SMALL alphabet
  * (event types, not items) the lattice is the fixed T²+T³ candidate
  * set and existence per session folds to ORDER STATISTICS — no
  * per-session subsequence scan, no pattern-growth recursion:
  *   A→B   exists  iff  min t(A)  <  max t(B)
  *   A→B→C exists  iff  max t(C)  >  min{ t(B) : t(B) > min t(A) }
  * (both sides exact integer µs; a same-type repeat A→A needs two
  * events by the same identity). Each support is then one count per
  * candidate over per-(session, type) aggregate rows.
  *
  * Scale shape: sessionization is ONE user-keyed window Exchange (the
  * q_sessionize idiom — lag + running sum share the sort); the bounds
  * table collapses events to (session, type) rows — corpus × nothing;
  * the only alphabet-proportional step is the B-after-A pass, which
  * joins raw events to per-session type minima: |E|·T rows, partial
  * min-aggregated map-side. Nothing is ever sessions × patterns
  * materialized beyond (session, A, B) triples — T²-bounded per
  * session. Supports are exact longs; no float anywhere.
  *
  * Split into [[sessionize]] → [[sessionPatterns]] → count so the
  * streaming appender (EventsStream.seqMiningAppender) mines CLOSED
  * sessions per micro-batch with the identical per-session stage and
  * only the final count becomes an incremental fold.
  */
object SeqMine {

  /** Gap-based sessionization to (u, sid, t, a, tb): one user-keyed
    * window (lag + running sum share the Exchange and sort).
    */
  private[graft] def sessionize(e: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("u").orderBy("t", "tb")
    e.withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("brk",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("u"), col("sid"), col("t"), col("a"), col("tb"))
  }

  /** Per-session pattern existence rows (u, sid, pattern, k) for every
    * 2- and 3-sequence the session witnesses — the order-statistic
    * folding above, support aggregation left to the caller (batch:
    * count; streaming: incremental count over closed sessions).
    */
  private[graft] def sessionPatterns(sessIn: DataFrame): DataFrame = {
    val sess = sessIn.localCheckpoint(eager = false) // bounds + B-after pass
    val bounds = sess.groupBy(col("u"), col("sid"), col("a"))
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      .localCheckpoint(eager = false) // three consumers below
    val p2 = bounds.select(col("u"), col("sid"), col("a").as("a1"), col("mn"))
      .join(bounds.select(col("u"), col("sid"), col("a").as("a2"), col("mx")),
        Seq("u", "sid"))
      .filter(col("mn") < col("mx"))
      .select(col("u"), col("sid"),
        concat_ws(">", col("a1"), col("a2")).as("pattern"), lit(2).as("k"))
    val mba = sess
      .join(bounds.select(col("u"), col("sid"), col("a").as("a1"), col("mn")),
        Seq("u", "sid"))
      .filter(col("t") > col("mn"))
      .groupBy(col("u"), col("sid"), col("a1"), col("a").as("a2"))
      .agg(min(col("t")).as("m2"))
    val p3 = mba
      .join(bounds.select(col("u"), col("sid"), col("a").as("a3"), col("mx")),
        Seq("u", "sid"))
      .filter(col("mx") > col("m2"))
      .select(col("u"), col("sid"),
        concat_ws(">", col("a1"), col("a2"), col("a3")).as("pattern"), lit(3).as("k"))
    p2.unionByName(p3)
  }

  def frequentSequences(
      events: DataFrame,
      user: Column,
      tsUs: Column,
      typ: Column,
      tieBreak: Column,
      gapUs: Long,
      minSupport: Long,
  ): DataFrame = {
    val e = events.select(user.as("u"), tsUs.as("t"), typ.as("a"), tieBreak.as("tb"))
    sessionPatterns(sessionize(e, gapUs))
      .groupBy(col("pattern"), col("k"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** [[frequentSequences]] with a RELATIVE threshold — support ≥
    * ceil(frac · total sessions), the scale-stable way to say "frequent"
    * (an absolute count silently empties at smaller corpora and stops
    * discriminating at larger ones). The session total rides in as a
    * broadcast 1-row cross join (in-plan scalar, no collected count).
    */
  def frequentSequencesFrac(
      events: DataFrame,
      user: Column,
      tsUs: Column,
      typ: Column,
      tieBreak: Column,
      gapUs: Long,
      minSupportFrac: Double,
  ): DataFrame = {
    val e = events.select(user.as("u"), tsUs.as("t"), typ.as("a"), tieBreak.as("tb"))
    val sess = sessionize(e, gapUs).localCheckpoint(eager = false) // patterns + count
    val nSess = sess.select(col("u"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    sessionPatterns(sess)
      .groupBy(col("pattern"), col("k"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nSess))
      .filter(col("support") >=
        ceil(lit(minSupportFrac) * col("n_sessions").cast("double")).cast("long"))
      .select(col("pattern"), col("k"), col("support"))
  }
}
