package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — shrink the fact side BEFORE its
  * shuffle, keeping the result exact.
  *
  * The scale problem: `fact SEMI JOIN dim` where dim is too big to
  * broadcast shuffles the ENTIRE fact table on the join key, even when
  * only a sliver of it matches. Spark's own runtime row-level filters
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) attack the same
  * waste; this utility makes the pattern explicit and composable:
  *
  *   1. collect a Bloom filter over the dim keys (one pass over dim,
  *      a few MB sketch on the driver);
  *   2. broadcast it and drop fact rows whose key cannot match — a
  *      narrow, pre-shuffle filter with fpp false positives;
  *   3. run the exact semi join on the survivors — false positives are
  *      removed here, so the final result is EXACTLY the plain join's.
  *
  * At 100 TB: the fact scan still reads everything (no pushdown for an
  * opaque sketch), but the shuffle — the expensive stage — carries only
  * matches + fpp·|fact| rows instead of |fact|.
  */
object BloomJoin {

  /** Exact left-semi join with a Bloom pre-filter on the fact side.
    * Key columns must be integral (hashed as longs into the sketch).
    *
    * EAGER at construction: `dim.stat.bloomFilter` is a driver-side
    * action (one pass over dim), so building this DataFrame runs a job —
    * inherent to the driver-held sketch; construct it when you mean it.
    * The broadcast itself is ContextCleaner-reclaimed once the returned
    * DataFrame is unreferenced (no unpersist bookkeeping needed).
    *
    * dim is evaluated TWICE — once by the sketch action and again as the
    * semi-join build side. When dim is itself an expensive pipeline (not
    * a table scan), `persist()`/`localCheckpoint()` it around this call,
    * or the upstream work runs twice.
    *
    * @param expectedItems sizing for the sketch (dim-side distinct keys)
    * @param fpp           false-positive rate: shuffle waste, not error
    */
  def semiJoinReduced(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01,
  ): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    // Codegen'd Catalyst probe (graft.functions.BloomMightContain), not a
    // UDF: the pre-shuffle filter inlines into the fact scan's
    // whole-stage-generated code instead of breaking the stage around
    // closure dispatch. Null keys probe false.
    val d = dim.select(col(dimKey).as("__bk")).where(col("__bk").isNotNull)
    fact
      .filter(graft.functions.GraftFunctions.bloomMightContain(col(factKey).cast("long"), bc))
      .join(d, col(factKey) === col("__bk"), "left_semi")
  }
}
