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

  /** Bit-spread of the low 16 bits of `c` into the even bit positions of
    * a 32-bit lane (0b…abc → 0b…0a0b0c) via the classic magic-mask
    * doubling ladder — four shift/or/and rounds, all built-in codegen'd
    * integer ops, no UDF and no custom expression needed.
    */
  private def spread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) value interleaving the low 16 bits of two integer
    * dimensions: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Sorting by this value clusters rows so that any consecutive
    * run covers a TIGHT RECTANGLE in (x, y) space — the multi-dimension
    * data-layout lever `writePartitioned`'s single-dim ordering lacks.
    * At 100 TB: write with [[zOrderWrite]] and point/range predicates on
    * EITHER dimension prune most files via parquet min/max footers,
    * where a single-dim sort serves only its leading column (LayoutSpec
    * quantifies the difference on testdata).
    *
    * Caller maps raw dims into 16-bit range first (bucket ids, day
    * numbers, coarse quantiles); values wider than 16 bits alias by
    * masking, so pre-bucket rather than truncate. The dims must also be
    * scaled to COMPARABLE magnitude: interleaving an 8-bit column with a
    * 12-bit one puts the wide column's bits alone in the z prefix and the
    * layout degenerates to a single-dim sort of the wide column
    * (LayoutSpec demonstrates both the failure and the scaled fix) —
    * Delta/Iceberg z-order normalizes via range-bucketing for the same
    * reason.
    */
  def zValue2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Hilbert-curve index of two integer dimensions, appended to `df` as
    * `out` — the locality-OPTIMAL alternative to [[zValue2]]: where the
    * Morton curve makes a long diagonal jump at every quadrant seam
    * (consecutive z values can be up to 2^bits apart in space), every
    * pair of consecutive Hilbert values is Manhattan-ADJACENT, so a
    * consecutive run of rows covers an even tighter region and parquet
    * min/max footers prune harder on both dims (LayoutSpec pins the
    * adjacency invariant exhaustively at 8-bit resolution and the
    * tighter-rectangle win over Morton on the orders layout).
    *
    * The classic xy→d walk (Hamilton's algorithm): per bit level from
    * the top, quadrant digit d += s²·((3·rx) xor ry), then the
    * flip/swap rotation carries (x, y) into the subquadrant frame.
    * Level-(i+1) state depends on level-i state, so a declarative
    * formulation needs one projection PER LEVEL (CollapseProject cannot
    * fuse them without exponential expression blowup — measured: 35
    * stacked Project nodes for bits=16); the walk runs instead as the
    * codegen'd [[graft.functions.HilbertIndex]] expression, one static
    * call per row inside whole-stage codegen. Same 16-bit domain
    * contract as [[zValue2]]: pre-bucket wider dims.
    */
  def withHilbert(
      df: DataFrame,
      x: String,
      y: String,
      out: String,
      bits: Int = 16,
  ): DataFrame =
    df.withColumn(out, graft.functions.GraftFunctions.hilbert(col(x), col(y), bits))

  /** Write `df` parquet files clustered by the z-order of two dimension
    * columns: range-repartition on the z-value (balanced files regardless
    * of density skew — fixed-width cells would not be), sort within each
    * partition (tight rowgroup min/max), drop the helper column.
    */
  def zOrderWrite(
      df: DataFrame,
      path: String,
      x: String,
      y: String,
      numFiles: Int,
  ): Unit =
    df.withColumn("__z", zValue2(col(x), col(y)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Rank-normalize a numeric dimension into `buckets` equal-POPULATION
    * bins before interleaving — the principled cure for both of
    * [[zValue2]]'s preconditions at once: quantile bucket ids are always
    * in [0, buckets) (no 16-bit aliasing, no magnitude mismatch between
    * dims) and density skew cannot concentrate the z-space (each bin
    * holds ~1/buckets of the rows, so z cells stay balanced where a
    * linear scaling of a long-tailed dim would leave most cells empty
    * and one hot). This is what Delta/Iceberg z-order does internally
    * (range-id by sampled quantiles).
    *
    * Boundaries come from `approxQuantile` on a driver-held array
    * (production fits them on a `Sampling.hashSample` slice — the
    * codebook-style offline model step); the mapping itself is a literal
    * when-chain, codegen'd scan-side, no join. Boundary-equal values
    * share a bucket deterministically (`<` comparisons against fixed
    * literals).
    */
  def rankBucket(df: DataFrame, dim: String, buckets: Int): org.apache.spark.sql.Column =
    rankBuckets(df, Seq(dim), buckets).head

  /** [[rankBucket]] for SEVERAL dimensions in ONE fitting pass:
    * `approxQuantile`'s multi-column overload runs a single driver job
    * over `df` for all dims together, where per-dim calls would each
    * full-scan — at 100 TB the difference between one and `dims.size`
    * stats passes over the table being laid out.
    */
  def rankBuckets(df: DataFrame, dims: Seq[String], buckets: Int): Seq[org.apache.spark.sql.Column] = {
    require(buckets >= 2 && buckets <= 65536, s"buckets must be in [2, 65536], got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val allCuts = df.stat.approxQuantile(dims.toArray, probs, 0.001)
    dims.zip(allCuts.toSeq).map { case (dim, raw) =>
      val cuts = raw.distinct.sorted
      cuts.zipWithIndex.foldRight(lit(cuts.length): org.apache.spark.sql.Column) {
        case ((cut, i), els) => when(col(dim) < lit(cut), lit(i)).otherwise(els)
      }
    }
  }

  /** Bit-spread of the low 16 bits of `c` to every THIRD bit position
    * (Morton-3D ladder — the standard 21-bit magic masks, which contain
    * the 16-bit case): bit i lands at position 3i.
    */
  private def spread16x3(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1f00000000ffffL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1f0000ff0000ffL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100f00f00f00f00fL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10c30c30c30c30c3L))
    x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Z-order value for 1–3 dimensions (bit i of dim d at position
    * n·i+d): the [[zValue2]] preconditions — 16-bit range, comparable
    * magnitudes — apply to every dim; use [[rankBuckets]] to establish
    * both. Dimensions beyond 3 are deliberately unsupported: 4×16 bits
    * overflows a long's sign-safe range, and past ~3 dims interleaving
    * dilutes each dim's prefix locality so much that min/max pruning
    * decays toward a plain hash layout — prefer partitioning on the
    * extra dims instead (the Delta/Iceberg guidance).
    */
  def zValueN(dims: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column = dims match {
    case Seq(x) => x.cast("long").bitwiseAND(lit(0xFFFFL))
    case Seq(x, y) => zValue2(x, y)
    case Seq(x, y, z) =>
      spread16x3(x.cast("long"))
        .bitwiseOR(shiftleft(spread16x3(y.cast("long")), 1))
        .bitwiseOR(shiftleft(spread16x3(z.cast("long")), 2))
    case _ => throw new IllegalArgumentException(
      s"zValueN supports 1-3 dims, got ${dims.size} (partition on the extra dims instead)")
  }

  /** [[zOrderWrite]] with every dim rank-normalized via [[rankBuckets]]
    * (ONE quantile-fitting pass for all dims): the skew-robust default
    * for arbitrary numeric dimensions, 2 or 3 of them.
    */
  def zOrderWriteRanked(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      numFiles: Int,
      buckets: Int = 256,
  ): Unit =
    df.withColumn("__z", zValueN(rankBuckets(df, dims, buckets)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Two-dim convenience overload (source-compatible with the r8 API). */
  def zOrderWriteRanked(
      df: DataFrame,
      path: String,
      x: String,
      y: String,
      numFiles: Int,
      buckets: Int,
  ): Unit = zOrderWriteRanked(df, path, Seq(x, y), numFiles, buckets)
}
