package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance — delta-maintained aggregates and joins.
  *
  * The standing-pipeline complement of [[Scd]] (history intervals) and
  * q_cdc_diff (snapshot deltas): given yesterday's MATERIALIZED view state
  * and today's delta batch, produce today's view state WITHOUT rescanning
  * history. This is the core move that makes a daily 100 TB pipeline
  * O(|delta|) instead of O(|corpus|): the corpus-sized inputs appear only
  * as standing, already-partitioned state tables; every maintenance step
  * shuffles delta-sized data (plus one state-sized co-partitioned merge).
  *
  * Three maintenance classes, in increasing generality:
  *  - append-only distributive/algebraic aggregates ([[aggState]] /
  *    [[mergeAggStates]]): count, sum, min, max (and anything derivable —
  *    mean, variance via moments) merge by re-aggregation; min/max are
  *    safe because nothing is ever removed.
  *  - signed multiset aggregates ([[signedAggState]] /
  *    [[mergeSignedStates]]): rows carry a multiplicity op (+1 insert,
  *    -1 retract); count and sum maintain under retraction by signed
  *    re-aggregation (the counting algorithm of Blakeley et al.,
  *    SIGMOD 1986; the same delta algebra DBToaster and every streaming
  *    changelog engine use). Keys whose support reaches zero leave the
  *    view. min/max are NOT signed-maintainable — retracting the current
  *    minimum needs the runner-up, which the scalar state no longer has.
  *  - support-table extrema ([[supportState]] / [[mergeSupportStates]] /
  *    [[extremaFromSupport]]): the classic fix — keep per (key, value)
  *    signed support counts and read min/max off values with support > 0.
  *    State size is bounded by the number of DISTINCT values per key
  *    (here: days, categories — not raw rows), which is what makes it
  *    viable at corpus scale.
  *
  * Join maintenance ([[joinDelta]]): for view J = A ⋈ B under append-only
  * deltas ΔA, ΔB, the new matches are exactly
  * ΔJ = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB) — three joins whose
  * smaller side is always a delta, so each is broadcast-able or prunes to
  * the delta's key range against a state table bucketed on the join key.
  * J_new = J_old ∪ ΔJ needs no join at all.
  *
  * Merge mechanics: every merge here is `unionByName` + re-aggregate
  * rather than a full-outer join — partial aggregation pre-combines
  * map-side, and when the standing state is bucketed on the key the union
  * re-agg needs no extra exchange for the state side. Callers folding many
  * batches should checkpoint (or persist/write) the state between steps,
  * exactly as a real pipeline persists yesterday's state table; the fold
  * is otherwise one ever-deepening union tree.
  *
  * Determinism doctrine: sums run through decimal casts supplied by the
  * caller (see q_ivm_* in SparkEntry for the cross-engine idiom); the
  * state schema carries sums as decimals end-to-end so a fold over K
  * batches is bit-identical to a one-shot aggregation in ANY batch order.
  */
object Ivm {

  /** Per-key append-only aggregate state of one batch:
    * (keys..., n, sum_v, min_v, max_v). `valueCol` must already be the
    * deterministic (decimal-cast) form — it is summed as-is.
    */
  def aggState(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold a delta batch's state into the standing state (append-only).
    * Union + re-agg: count/sum add, min/max combine — every column's
    * combinator is its own partial-merge, so state(A ∪ B) ≡
    * merge(state(A), state(B)) exactly.
    */
  def mergeAggStates(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Signed multiset state of one delta batch: rows carry `opCol` ∈
    * {+1, -1}. Retractions must refer to previously-inserted rows — the
    * view is a multiset, and negative support is a pipeline bug upstream
    * (a delete for a row never inserted), checked on read in
    * [[finishSigned]].
    */
  def signedAggState(batch: DataFrame, keys: Seq[String], valueCol: String,
      opCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        sum(col(opCol).cast("long")).as("n"),
        sum(col(opCol).cast("decimal(4,0)") * col(valueCol)).as("sum_v"))

  /** Fold a signed delta state into the standing signed state. Keys are
    * KEPT at n = 0 inside the fold (a later batch may re-insert them);
    * [[finishSigned]] drops them when the view is read.
    */
  def mergeSignedStates(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))

  /** Read the signed view: zero-support keys vanish; negative support
    * fails loudly (retraction of a row never inserted) instead of
    * silently emitting negative counts downstream.
    */
  def finishSigned(state: DataFrame): DataFrame =
    state
      .withColumn("n",
        when(col("n") < 0, raise_error(concat(
          lit("Ivm.finishSigned: negative support for key — a retraction " +
            "arrived for a row never inserted; state n="),
          col("n").cast("string"))))
          .otherwise(col("n")))
      .filter(col("n") > 0)

  /** Signed support table of one delta batch over DISTINCT values:
    * (keys..., value, support). The extrema-under-retraction state —
    * rows are (key, value) pairs, so its size is the per-key distinct
    * value count, not the row count.
    */
  def supportState(batch: DataFrame, keys: Seq[String], valueCol: String,
      opCol: String): DataFrame =
    batch.groupBy((keys :+ valueCol).map(col): _*)
      .agg(sum(col(opCol).cast("long")).as("support"))

  /** Fold a delta support table into the standing one. Zero-support
    * values are dropped EAGERLY here (unlike [[mergeSignedStates]]):
    * the support table exists only to answer extrema over support > 0,
    * and re-insertion re-creates the row — keeping tombstones would grow
    * the state with the retraction history. Negative support is checked
    * at read time in [[extremaFromSupport]].
    */
  def mergeSupportStates(state: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    state.unionByName(delta)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(sum(col("support")).as("support"))
      .filter(col("support") =!= 0)

  /** Positive-support reader with the loud negative-support check shared
    * by every support-table view.
    */
  private def positiveSupport(state: DataFrame, what: String): DataFrame =
    state
      .withColumn("support",
        when(col("support") < 0, raise_error(concat(
          lit(s"Ivm.$what: negative support — a retraction " +
            "arrived for a value never inserted; support="),
          col("support").cast("string"))))
          .otherwise(col("support")))
      .filter(col("support") > 0)

  /** Current min/max per key off the support table — only values whose
    * support survived retraction count. This is why retracting the
    * current minimum is safe: the runner-up is still a row here.
    */
  def extremaFromSupport(state: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    positiveSupport(state, "extremaFromSupport")
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"))

  /** Current per-key DISTINCT-value count off the support table — the
    * textbook non-distributive aggregate IVM makes maintainable: the
    * support rows ARE the distinct (key, value) pairs, so the live
    * distinct count is one count of support > 0 rows. Retraction only
    * removes a value when its LAST copy is retracted (support hits 0),
    * which a scalar count could never know.
    */
  def distinctFromSupport(state: DataFrame, keys: Seq[String]): DataFrame =
    positiveSupport(state, "distinctFromSupport")
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))

  /** Maintained per-key EXACT quantiles off the support table — the
    * order-statistics member of the support-table family. The sketch
    * path ([[graft.functions.QuantileSketchAgg]]) is the append-only
    * 100 TB shape, but sketches cannot retract; with a (key, value,
    * support) table the live distribution IS the state, so any quantile
    * is exact under arbitrary insert/delete churn. Type-1 (lower)
    * quantile, the deterministic convention: smallest value whose
    * cumulative support ≥ ceil(f · N) — engine-identical arithmetic, so
    * the cross-engine gate can hash it. The per-key window runs over the
    * SUPPORT TABLE (distinct values per key — days, buckets, integer
    * grains — not live rows): state-sized, the same bound as
    * [[extremaFromSupport]]'s groupBy.
    */
  def quantileFromSupport(state: DataFrame, keys: Seq[String],
      valueCol: String, quantiles: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val whole = Window.partitionBy(keys.map(col): _*)
    val aggs = quantiles.map { case (name, f) =>
      min(when(col("cum") >= ceil(lit(f) * col("tot")), col(valueCol))).as(name)
    }
    positiveSupport(state, "quantileFromSupport")
      .withColumn("cum", sum(col("support")).over(byVal))
      .withColumn("tot", sum(col("support")).over(whole))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Maintained per-key EXACT top-k leaderboard off an ID-GRAIN support
    * table (keys..., value, id, support) — build it with [[supportState]]
    * at grain `keys :+ valueCol` and "value" column = the row id, so a
    * retraction removes exactly the row that was inserted. Retracting the
    * reigning #1 is safe for the same reason [[extremaFromSupport]] is:
    * every live candidate is still a support row, so the runner-up
    * promotes on read.
    *
    * State-size honesty: exact top-k under ARBITRARY retraction requires
    * the live row set as state (any row can become top-k after enough
    * deletes) — the same contract as [[distinctFromSupport]], not the
    * bounded ≤k scalar state of the append-only leaderboard fold
    * (q_topk_incremental). What stays bounded is the READ: the
    * [[graft.functions.TopKAgg]] aggregate carries ≤k (value, id) pairs
    * per key per exchange — a partial-combining agg, never a window sort
    * of the live set — so a skewed key costs k pairs per map partition,
    * not a single-reducer sort of its millions of live rows. Maintenance
    * stays O(|delta| + |state-merge|) per batch like every fold here.
    *
    * Output: (keys..., rank, id, value) in the canonical exact order
    * (value DESC, id ASC), rank 1-based — bit-identical to a one-shot
    * window ranking of the live rows.
    */
  def topKFromSupport(state: DataFrame, keys: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    import graft.functions.GraftFunctions
    positiveSupport(state, "topKFromSupport")
      .groupBy(keys.map(col): _*)
      .agg(GraftFunctions.topK(col(valueCol), col(idCol), k).as("st"))
      .select((keys.map(col) :+
        explode(GraftFunctions.topKEntries(col("st"))).as("e")): _*)
      .select((keys.map(col) :+ col("e.rank").as("rank") :+
        col("e.id").as(idCol) :+ col("e.v").as(valueCol)): _*)
  }

  // ---- bounded-state top-k under retraction -------------------------

  /** State of the BOUNDED top-k-under-retraction view: `buffer` holds the
    * top min(B, live) rows per key as plain (keys..., id, value) rows
    * (B = k·m), `meta` the per-key live-row count (keys..., n_live). The
    * hidden-count d = n_live − |buffer| is always derived, never stored.
    */
  final case class TopKBoundedState(buffer: DataFrame, meta: DataFrame)

  /** Bounded-state top-k under retraction — the compacting complement of
    * [[topKFromSupport]]'s exact contract. The support table is exact
    * under ARBITRARY retraction but its state IS the live row set; this
    * variant keeps only the top B = k·m rows per key (the k answers plus
    * an (m−1)·k overflow buffer) and a live-row counter, trading
    * unbounded-churn exactness for state ≪ live set:
    *
    *  - inserts/deletes that touch the buffer maintain it directly;
    *  - deletes below the buffer's watermark only decrement the hidden
    *    count (they can never affect the top k while the buffer holds
    *    ≥ k rows);
    *  - inserts below the watermark (while rows remain hidden) only
    *    increment it — the buffer invariant "every hidden row sorts
    *    below every buffered row" is what keeps reads exact;
    *  - only when deletes gnaw the buffer below k rows WHILE hidden rows
    *    remain ([[topKBoundedUnderflowKeys]] non-empty) is the answer
    *    unknowable from bounded state — the classic bounded-IVM trade:
    *    rebuild exactly those keys from the changelog
    *    ([[topKBoundedRebuild]]) and continue.
    *
    * Reads ([[topKFromBounded]]) are bit-identical to a one-shot window
    * ranking of the live rows whenever no key is in underflow — IvmSpec
    * pins equality through heavy churn and the q_ivm_topk_bounded oracle
    * recomputes it from scratch in DuckDB.
    *
    * Contracts: (key, id) unique among live rows (the changelog grain);
    * ids LONG, values DOUBLE ([[graft.functions.TopKAgg]]'s heap); one
    * batch never inserts and deletes the same (key, id) — split such
    * churn across batches like any changelog. `m ≥ 2` (m = 1 leaves no
    * slack and underflows on the first in-buffer delete).
    */
  def topKBoundedInit(batch: DataFrame, keys: Seq[String], valueCol: String,
      idCol: String, k: Int, m: Int): TopKBoundedState = {
    import graft.functions.GraftFunctions
    require(k >= 1 && m >= 2, s"topKBounded: need k >= 1, m >= 2; got k=$k m=$m")
    val b = k * m
    val buffer = batch
      .groupBy(keys.map(col): _*)
      .agg(GraftFunctions.topK(col(valueCol), col(idCol), b).as("st"))
      .select((keys.map(col) :+
        explode(GraftFunctions.topKEntries(col("st"))).as("e")): _*)
      .select((keys.map(col) :+ col("e.id").as(idCol) :+ col("e.v").as(valueCol)): _*)
    val meta = batch.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_live"))
    TopKBoundedState(buffer, meta)
  }

  /** Fold a signed delta batch (rows carry `opCol` ∈ {+1, −1}; deletes
    * identified by (keys, id)) into the bounded state. O(|delta| +
    * |buffer-merge|) per batch; the buffer side never exceeds B rows per
    * key in or out. A retraction reaching below even the hidden count
    * fails loudly at the next read (negative derived d), matching the
    * support-table family's discipline.
    */
  def topKBoundedMerge(st: TopKBoundedState, delta: DataFrame, keys: Seq[String],
      valueCol: String, idCol: String, opCol: String, k: Int, m: Int): TopKBoundedState = {
    import graft.functions.GraftFunctions
    val b = k * m
    val kc = keys.map(col)
    val ins = delta.filter(col(opCol) === 1).select((kc :+ col(idCol) :+ col(valueCol)): _*)
    val dels = delta.filter(col(opCol) === -1).select((kc :+ col(idCol)): _*)

    // per-key buffer size + watermark (worst buffered entry under the
    // (value DESC, id ASC) total order): min of struct(value, -id)
    val stats = st.buffer.groupBy(kc: _*).agg(
      count(lit(1)).as("_nbuf"),
      min(struct(col(valueCol).as("_wv"), (-col(idCol)).as("_wni"))).as("_wm"))
    // hidden deletes: not present in the buffer, so they must be among
    // the d hidden rows — they only lower the derived d
    val dh = dels.join(st.buffer.select((kc :+ col(idCol)): _*),
        keys :+ idCol, "left_anti")
      .groupBy(kc: _*).agg(count(lit(1)).as("_dh"))
    // routing view: d' = hidden count AFTER hidden deletes; inserts below
    // the watermark stay hidden only while d' > 0 (otherwise the buffer
    // must absorb everything — nothing is hidden to sort above them)
    val routing = st.meta
      .join(stats, keys, "left")
      .join(dh, keys, "left")
      .select(kc ++ Seq(
        (col("n_live") - coalesce(col("_nbuf"), lit(0L))
          - coalesce(col("_dh"), lit(0L))).as("_dprime"),
        col("_wm._wv").as("_wmv"), (-col("_wm._wni")).as("_wmi")): _*)
    val insBuf = ins.join(routing, keys, "left")
      .filter(coalesce(col("_dprime"), lit(0L)) <= 0 ||
        !(col(valueCol) < col("_wmv") ||
          (col(valueCol) === col("_wmv") && col(idCol) > col("_wmi"))))
      .select((kc :+ col(idCol) :+ col(valueCol)): _*)

    val merged = st.buffer.join(dels, keys :+ idCol, "left_anti")
      .unionByName(insBuf)
      .groupBy(kc: _*)
      .agg(GraftFunctions.topK(col(valueCol), col(idCol), b).as("st"))
      .select((kc :+ explode(GraftFunctions.topKEntries(col("st"))).as("e")): _*)
      .select((kc :+ col("e.id").as(idCol) :+ col("e.v").as(valueCol)): _*)
    // live count is a plain signed fold — the derived d absorbs every
    // hidden/overflow movement without bookkeeping
    // zero-count keys are KEPT (a later batch may re-insert; reads emit
    // nothing for them anyway) — same convention as mergeSignedStates
    val meta = st.meta.unionByName(
        delta.groupBy(kc: _*).agg(sum(col(opCol).cast("long")).as("n_live")))
      .groupBy(kc: _*).agg(sum(col("n_live")).as("n_live"))
    TopKBoundedState(merged, meta)
  }

  /** Keys whose bounded state can no longer answer top-k exactly: buffer
    * shrunk below k while rows remain hidden. Empty ⇒ the next
    * [[topKFromBounded]] is exact; non-empty ⇒ rebuild those keys from
    * the changelog ([[topKBoundedRebuild]]).
    */
  def topKBoundedUnderflowKeys(st: TopKBoundedState, keys: Seq[String],
      k: Int): DataFrame = {
    val nbuf = st.buffer.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_nbuf"))
    st.meta.join(nbuf, keys, "left")
      .select((keys.map(col) :+ coalesce(col("_nbuf"), lit(0L)).as("_nbuf") :+
        col("n_live")): _*)
      .filter(col("_nbuf") < k && col("n_live") > col("_nbuf"))
      .select(keys.map(col): _*)
  }

  /** Rebuild exactly the underflowed keys from the changelog's live rows
    * (the caller's retained source of truth) and graft them back into
    * the bounded state — the O(|underflow-keys' rows|) escape hatch, not
    * an O(corpus) rescan: `liveRows` is pre-filtered by a semi-join on
    * the (few) underflowed keys.
    */
  def topKBoundedRebuild(st: TopKBoundedState, liveRows: DataFrame,
      keys: Seq[String], valueCol: String, idCol: String, k: Int, m: Int): TopKBoundedState = {
    val bad = topKBoundedUnderflowKeys(st, keys, k)
    val rebuilt = topKBoundedInit(
      liveRows.join(bad, keys, "left_semi"), keys, valueCol, idCol, k, m)
    TopKBoundedState(
      st.buffer.join(bad, keys, "left_anti").unionByName(rebuilt.buffer),
      st.meta.join(bad, keys, "left_anti").unionByName(rebuilt.meta))
  }

  /** Read the bounded view: (keys..., rank, id, value), rank 1-based in
    * the canonical (value DESC, id ASC) order — bit-identical to a
    * one-shot window ranking of the live rows. Loud on both invalid
    * states: negative derived d (retraction of a row never inserted) and
    * underflow (answer unknowable from bounded state — rebuild first).
    */
  def topKFromBounded(st: TopKBoundedState, keys: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    import graft.functions.GraftFunctions
    val nbuf = st.buffer.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_nbuf"))
    val checked = st.meta.join(nbuf, keys, "left")
      .select((keys.map(col) :+ coalesce(col("_nbuf"), lit(0L)).as("_nbuf") :+
        col("n_live")): _*)
      .withColumn("_ok",
        when(col("n_live") < col("_nbuf"), raise_error(concat(
          lit("Ivm.topKFromBounded: negative hidden count — a retraction " +
            "arrived for a row never inserted; n_live="),
          col("n_live").cast("string"))))
          .when(col("_nbuf") < k && col("n_live") > col("_nbuf"), raise_error(concat(
            lit("Ivm.topKFromBounded: buffer underflow (buffered="),
            col("_nbuf").cast("string"), lit(" of k="), lit(k).cast("string"),
            lit(" with rows hidden) — rebuild the key from the changelog " +
              "(topKBoundedRebuild) before reading"))))
          .otherwise(lit(1)))
      .filter(col("_ok") === 1) // forces the check columns to evaluate
      .select(keys.map(col): _*)
    st.buffer
      .groupBy(keys.map(col): _*)
      .agg(GraftFunctions.topK(col(valueCol), col(idCol), k).as("st"))
      .select((keys.map(col) :+
        explode(GraftFunctions.topKEntries(col("st"))).as("e")): _*)
      .select((keys.map(col) :+ col("e.rank").as("rank") :+
        col("e.id").as(idCol) :+ col("e.v").as(valueCol)): _*)
      .join(checked, keys, "left_semi")
  }

  /** Append-only join-view delta: the three new-match terms. Old states
    * appear once each, joined against a delta — with the state tables
    * bucketed on `usingKeys`, each term is a delta-pruned (or broadcast)
    * join; nothing re-pairs old against old. The caller unions the result
    * onto the standing J.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame, bOld: DataFrame,
      bDelta: DataFrame, usingKeys: Seq[String]): DataFrame =
    aDelta.join(bOld, usingKeys)
      .unionByName(aOld.join(bDelta, usingKeys))
      .unionByName(aDelta.join(bDelta, usingKeys))
}
