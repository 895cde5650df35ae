package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join — the scale path for interval predicates.
  *
  * A naive `a JOIN b ON b.day BETWEEN a.day - lookback AND a.day` is a
  * non-equi join: Spark plans it as BroadcastNestedLoopJoin (or a cartesian
  * product), O(|a|·|b|) — fine at test scale, catastrophic at 100 TB. The
  * banded formulation quantizes the time axis into fixed-width bands and
  * turns the predicate into an equi-join on the band key plus a cheap
  * residual filter:
  *
  *   - each right row lands in exactly ONE band: floor(day / bandWidth);
  *   - each left row explodes to the 2..k consecutive bands its
  *     [day − lookback, day] window can touch (k = lookback/bandWidth + 2);
  *   - equi-join on the band key shuffles both sides by band (hash
  *     partitioned, AQE-skew-splittable), then the exact BETWEEN filters
  *     the band-collision false positives.
  *
  * Each qualifying pair matches exactly once (the right row's single band
  * appears once in the left row's distinct band list), so no dedup pass is
  * needed. Cost: |a|·k + |b| shuffled rows instead of the |a|·|b| loop.
  *
  * No reference counterpart (SURVEY.md §2.4 notes the reference has no
  * range/interval joins); this is beyond-reference scope for the
  * training-data pipeline (e.g. "events within N days of snapshot").
  */
object RangeJoin {

  /** Join `left` to the `right` rows whose `rightDay` falls within
    * [leftDay − lookbackDays, leftDay]. Day columns must be DATE-typed.
    *
    * @param bandDays band width in days; ≥ lookbackDays/4 keeps the left
    *   explosion factor ≤ ~5 while bounding band population.
    */
  def trailingWindowJoin(
      left: DataFrame,
      leftDay: String,
      right: DataFrame,
      rightDay: String,
      lookbackDays: Int,
      bandDays: Int,
  ): DataFrame = {
    require(lookbackDays >= 0 && bandDays > 0)
    val reserved = Set("_ldn", "_rdn", "_band")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"input columns collide with RangeJoin internals: ${clash.mkString(",")}")
    // Integer day number since epoch: exact, no TZ arithmetic.
    def dayNum(c: Column): Column = datediff(c, to_date(lit("1970-01-01")))
    val l = left
      .withColumn("_ldn", dayNum(col(leftDay)))
      .withColumn(
        "_band",
        explode(sequence(
          floor((col("_ldn") - lookbackDays) / bandDays),
          floor(col("_ldn") / bandDays))))
    val r = right
      .withColumn("_rdn", dayNum(col(rightDay)))
      .withColumn("_band", floor(col("_rdn") / bandDays))
    l.join(r, Seq("_band"))
      .filter(col("_rdn").between(col("_ldn") - lookbackDays, col("_ldn")))
      .drop("_band", "_ldn", "_rdn")
  }
}
