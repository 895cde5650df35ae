package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB design (SURVEY.md §4, "Big
  * joins/aggs shuffle on their keys … bucketing for co-located joins,
  * salting for skew").
  *
  * None of the reference's workloads need these at its data sizes — they
  * exist so the same pipelines keep working when the fact tables do not
  * fit a broadcast and a repeated join key starts dominating a partition.
  */
object Layout {

  /** Persist a DataFrame bucketed+sorted by join key. Two tables bucketed
    * the same way join with ZERO shuffle (SortMergeJoin reads co-located
    * buckets); aggregations on the bucket key skip their exchange too.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned layout: one directory per distinct value of
    * the partition columns. Readers filtering on those columns prune
    * whole directories at planning time (PartitionFilters in the scan) —
    * the primary 100 TB data-layout lever for time/source-sliced tables.
    * Keep partition cardinality moderate (≤ ~10k dirs) and combine with
    * in-file ordering for rowgroup min/max skipping.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random-ish deterministic salt in [0, saltFactor); the small side is
    * replicated saltFactor times. The hot key's rows then spread over
    * saltFactor partitions instead of one straggler.
    *
    * Deterministic: salt derives from a hash of the whole large-side row
    * (via monotonically stable columns), not from rand(), so reruns give
    * identical partitioning.
    *
    * Note Spark's AQE skew-join handling (on by default here) covers most
    * cases at runtime; explicit salting remains for deterministic layout
    * control and for aggregations AQE cannot split.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner",
  ): DataFrame = {
    // Replicating the small side is only sound when its unmatched rows
    // are never emitted: right/full outer would surface each unmatched
    // replica saltFactor times.
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedLarge = large.withColumn(
      "__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-stage (partial → final) aggregation for skewed group keys:
    * first aggregate on (key, salt) — spreading the hot key — then
    * combine the partials. Works for algebraic aggregates (sum/count/
    * min/max); the caller supplies both stages.
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
