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
}
