package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) construction from a change-event
  * stream — the warehouse-side complement of [[AsOf]] (point-in-time
  * lookup) and q_cdc_diff (snapshot delta): turn "attribute observations
  * over time" into validity intervals.
  */
object Scd {

  /** Compress a per-key observation stream into SCD2 validity intervals.
    *
    * Rows are ordered per key by (ts, tiebreak); consecutive repeats of
    * the same attribute value collapse into one interval (null-safe
    * comparison, so a null→null run also collapses); each surviving
    * change opens an interval [valid_from, valid_to) half-open at the
    * NEXT change's timestamp, with the live interval's valid_to null and
    * is_current true. `version` numbers a key's intervals from 1.
    *
    * Plan shape: one shuffle on `key` — the change-detection lag, the
    * interval lead, and the version row_number all declare the same
    * partitioning, and the filter between them preserves sort order, so
    * Catalyst plans a single exchange + sort feeding three window
    * operators back-to-back. No self-join (the naive formulation joins
    * the stream to itself on "next change"), no driver state: at 100 TB
    * this is a linear scan per key.
    *
    * Determinism: `tiebreak` must make (key, ts, tiebreak) unique —
    * same-instant observations otherwise make "which value wins the
    * interval" partition-order-dependent.
    */
  def scd2(
      df: DataFrame,
      key: Column,
      attr: Column,
      ts: Column,
      tiebreak: Column,
  ): DataFrame = {
    val base = df.select(key.as("k"), attr.as("attr"), ts.as("ts"), tiebreak.as("tb"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("ts"), col("tb"))
    base
      .withColumn("prev", lag(col("attr"), 1).over(wOrd))
      .withColumn("prev_seen", lag(lit(1), 1).over(wOrd))
      .filter(col("prev_seen").isNull || !(col("attr") <=> col("prev")))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(wOrd))
      .withColumn("version", row_number().over(wOrd))
      .select(
        col("k"), col("attr"), col("valid_from"), col("valid_to"),
        col("version"), col("valid_to").isNull.as("is_current"))
  }

  /** Fold a NEW batch of observations into a standing SCD2 table without
    * recomputing old intervals — the SCD2 member of the incremental
    * family (the buildBm25Index/appendToPqIndex discipline applied to a
    * warehouse dimension): closed intervals are immutable, only each
    * affected key's LIVE row can close, and the batch compresses against
    * the live attribute exactly as [[scd2]] compresses consecutive
    * repeats (a batch opening with the live value collapses into the
    * open interval — no spurious version).
    *
    * PRECONDITION (the append-only CDC contract): every batch (ts, tb)
    * for a key sorts strictly after all that key's already-folded
    * observations — under it, fold(current, batch) ≡ a full recompute
    * over (history ∪ batch), which is exactly what the q_scd2_incremental
    * oracle asserts.
    *
    * Plan shape: the batch pays one exchange on `key` (lag + lead +
    * row_number, as in [[scd2]]); the standing table is touched only by
    * a broadcast-size join of per-key close timestamps — at 100 TB the
    * dimension history is never re-shuffled, the batch is.
    */
  def scd2Increment(
      current: DataFrame,
      batch: DataFrame,
      key: Column,
      attr: Column,
      ts: Column,
      tiebreak: Column,
  ): DataFrame = {
    val b = batch.select(key.as("k"), attr.as("attr"), ts.as("ts"), tiebreak.as("tb"))
    val live = current.filter(col("is_current"))
      .select(col("k"), col("attr").as("live_attr"), col("version").as("live_version"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("ts"), col("tb"))
    val changes = b
      .withColumn("prev", lag(col("attr"), 1).over(wOrd))
      .withColumn("prev_seen", lag(lit(1), 1).over(wOrd))
      .join(live, Seq("k"), "left")
      .filter(
        when(col("prev_seen").isNull,
          col("live_version").isNull || !(col("attr") <=> col("live_attr")))
          .otherwise(!(col("attr") <=> col("prev"))))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(wOrd))
      .withColumn("version",
        (coalesce(col("live_version"), lit(0)) + row_number().over(wOrd)).cast("int"))
    val newIntervals = changes.select(
      col("k"), col("attr"), col("valid_from"), col("valid_to"),
      col("version"), col("valid_to").isNull.as("is_current"))
    val firstChange = changes.groupBy(col("k")).agg(min(col("valid_from")).as("close_ts"))
    val updated = current
      .join(firstChange, Seq("k"), "left")
      .select(col("k"), col("attr"), col("valid_from"),
        when(col("is_current") && col("close_ts").isNotNull, col("close_ts"))
          .otherwise(col("valid_to")).as("valid_to"),
        col("version"),
        (col("is_current") && col("close_ts").isNull).as("is_current"))
    updated.unionByName(newIntervals)
  }
}
