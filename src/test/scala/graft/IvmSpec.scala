package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Ivm

/** Incremental view maintenance pins — the algebra that q_ivm_agg /
  * q_ivm_join / q_ivm_retract rely on, exercised on small controlled
  * frames where the invariants are checkable exactly.
  */
class IvmSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = Seq("k")

  private def rows(rs: (String, String, Int)*): DataFrame =
    rs.toDF("k", "v", "op")
      .select(col("k"), col("v").cast("decimal(18,6)").as("v"), col("op"))

  private def asMap(df: DataFrame): Map[String, (Long, BigDecimal)] =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  /** Merge widens sum_v's decimal precision (28,6 → 38,6); canonicalize
    * before frame equality so the comparison is about VALUES.
    */
  private def canon(df: DataFrame): DataFrame =
    df.select(col("k"), col("n"), col("sum_v").cast("decimal(38,6)").as("sum_v"),
      col("min_v"), col("max_v"))

  test("append-only fold over any batch split equals the one-shot state") {
    val all = rows(("a", "1.5", 1), ("a", "2.25", 1), ("b", "-3", 1),
      ("a", "0.125", 1), ("b", "7", 1), ("c", "4", 1))
    val oneShot = Ivm.aggState(all, keys, "v")
    // two different splits, both must match the one-shot bit-for-bit
    for (cut <- Seq(2, 4)) {
      val withId = all.coalesce(1).withColumn("i", monotonically_increasing_id())
      val b1 = withId.filter(col("i") < cut).drop("i")
      val b2 = withId.filter(col("i") >= cut).drop("i")
      val folded = canon(Ivm.mergeAggStates(
        Ivm.aggState(b1, keys, "v"), Ivm.aggState(b2, keys, "v"), keys))
      val want = canon(oneShot)
      assert(folded.exceptAll(want).isEmpty && want.exceptAll(folded).isEmpty)
    }
  }

  test("mergeAggStates with an empty delta is the identity") {
    val st = Ivm.aggState(rows(("a", "1", 1), ("b", "2", 1)), keys, "v")
    val empty = Ivm.aggState(rows(("a", "1", 1)).limit(0), keys, "v")
    val merged = canon(Ivm.mergeAggStates(st, empty, keys))
    val want = canon(st)
    assert(merged.exceptAll(want).isEmpty && want.exceptAll(merged).isEmpty)
  }

  test("signed state: full retraction empties the view; partial keeps exact n/sum") {
    val ins = rows(("a", "1.5", 1), ("a", "2.5", 1), ("b", "4", 1))
    val delA = rows(("a", "1.5", -1), ("a", "2.5", -1))
    val st = Ivm.mergeSignedStates(
      Ivm.signedAggState(ins, keys, "v", "op"),
      Ivm.signedAggState(delA, keys, "v", "op"), keys)
    val view = asMap(Ivm.finishSigned(st))
    assert(view == Map("b" -> ((1L, BigDecimal(4)))))
  }

  test("signed state: re-insertion after full retraction brings the key back") {
    val b1 = Ivm.signedAggState(rows(("a", "2", 1)), keys, "v", "op")
    val b2 = Ivm.signedAggState(rows(("a", "2", -1)), keys, "v", "op")
    val b3 = Ivm.signedAggState(rows(("a", "9", 1)), keys, "v", "op")
    val st = Ivm.mergeSignedStates(Ivm.mergeSignedStates(b1, b2, keys), b3, keys)
    assert(asMap(Ivm.finishSigned(st)) == Map("a" -> ((1L, BigDecimal(9)))))
  }

  test("finishSigned fails loudly on negative support") {
    val st = Ivm.signedAggState(rows(("a", "2", -1)), keys, "v", "op")
    val e = intercept[Exception] { Ivm.finishSigned(st).collect() }
    assert(e.getMessage.contains("negative support")
      || e.getCause != null && e.getCause.getMessage.contains("negative support"))
  }

  test("support table: retracting the current minimum promotes the runner-up") {
    val ins = Seq(("a", 3, 1), ("a", 7, 1), ("a", 5, 1)).toDF("k", "d", "op")
    val del = Seq(("a", 3, -1)).toDF("k", "d", "op")
    val st = Ivm.mergeSupportStates(
      Ivm.supportState(ins, keys, "d", "op"),
      Ivm.supportState(del, keys, "d", "op"), keys, "d")
    val ext = Ivm.extremaFromSupport(st, keys, "d").collect()
    assert(ext.length == 1 && ext(0).getInt(1) == 5 && ext(0).getInt(2) == 7)
  }

  test("support table drops zero-support values eagerly (no tombstone growth)") {
    val ins = Seq(("a", 3, 1), ("a", 7, 1)).toDF("k", "d", "op")
    val del = Seq(("a", 3, -1)).toDF("k", "d", "op")
    val st = Ivm.mergeSupportStates(
      Ivm.supportState(ins, keys, "d", "op"),
      Ivm.supportState(del, keys, "d", "op"), keys, "d")
    assert(st.count() == 1) // only (a, 7) survives; (a, 3) is gone, not 0
  }

  test("extremaFromSupport fails loudly on negative support") {
    val del = Seq(("a", 3, -1)).toDF("k", "d", "op")
    val st = Ivm.supportState(del, keys, "d", "op")
    val e = intercept[Exception] {
      Ivm.extremaFromSupport(st, keys, "d").collect()
    }
    assert(e.getMessage.contains("negative support")
      || e.getCause != null && e.getCause.getMessage.contains("negative support"))
  }

  test("distinctFromSupport: a value leaves only when its LAST copy is retracted") {
    val ins = Seq(("a", 7, 1), ("a", 7, 1), ("a", 9, 1)).toDF("k", "u", "op")
    val del1 = Seq(("a", 7, -1)).toDF("k", "u", "op") // one of two copies
    val st1 = Ivm.mergeSupportStates(
      Ivm.supportState(ins, keys, "u", "op"),
      Ivm.supportState(del1, keys, "u", "op"), keys, "u")
    assert(Ivm.distinctFromSupport(st1, keys).collect().map(_.getLong(1)).toSeq == Seq(2L))
    val del2 = Seq(("a", 7, -1)).toDF("k", "u", "op") // the last copy
    val st2 = Ivm.mergeSupportStates(
      st1, Ivm.supportState(del2, keys, "u", "op"), keys, "u")
    assert(Ivm.distinctFromSupport(st2, keys).collect().map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("joinDelta: J_old ∪ ΔJ reproduces the full recomputed join") {
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("k", "a")
    val aNew = Seq((2, "a3"), (3, "a4")).toDF("k", "a")
    val bOld = Seq((1, "b1"), (3, "b2")).toDF("k", "b")
    val bNew = Seq((2, "b3"), (3, "b4")).toDF("k", "b")
    val full = aOld.unionByName(aNew).join(bOld.unionByName(bNew), Seq("k"))
    val ivm = aOld.join(bOld, Seq("k"))
      .unionByName(Ivm.joinDelta(aOld, aNew, bOld, bNew, Seq("k")))
    assert(ivm.exceptAll(full).isEmpty && full.exceptAll(ivm).isEmpty)
  }

  test("signed fold equals direct aggregation of the surviving multiset") {
    // the q_ivm_retract shape in miniature: insert everything, retract a
    // deterministic subset, compare against a plain filter+agg
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type").as("k"),
        col("value").cast("decimal(18,6)").as("v"),
        dayofmonth(col("ts")).as("day"))
    val ins = ev.withColumn("op", lit(1))
    val dels = ev.filter(col("day") <= 10).withColumn("op", lit(-1))
    val st = Ivm.mergeSignedStates(
      Ivm.signedAggState(ins, keys, "v", "op"),
      Ivm.signedAggState(dels, keys, "v", "op"), keys)
    val direct = ev.filter(col("day") > 10).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
    val got = asMap(Ivm.finishSigned(st))
    val want = asMap(direct)
    assert(got == want)
  }

  test("quantiles under retraction: deletes shift the maintained median exactly (type-1)") {
    // live multiset after the delta: a -> {1, 2, 3, 4}    (5 retracted)
    //                                b -> {10, 10, 20}    (one copy of 10 retracted)
    val ins = Seq(("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 1), ("a", 5, 1),
      ("b", 10, 1), ("b", 10, 1), ("b", 10, 1), ("b", 20, 1))
      .toDF("k", "v", "op")
    val del = Seq(("a", 5, -1), ("b", 10, -1)).toDF("k", "v", "op")
    val st = Ivm.mergeSupportStates(
      Ivm.supportState(ins, keys, "v", "op"),
      Ivm.supportState(del, keys, "v", "op"), keys, "v")
    val got = Ivm.quantileFromSupport(st, keys, "v",
      Seq("med" -> 0.5, "p75" -> 0.75)).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    // type-1: a N=4 → med at cum>=2 is 2, p75 at cum>=3 is 3
    //         b N=3 → med at cum>=2 is 10 (support 2 survives), p75 at cum>=ceil(2.25)=3 is 20
    assert(got == Map("a" -> ((2, 3)), "b" -> ((10, 20))), got.toString)
  }

  test("top-k under retraction: retracting the reigning #1 (and #2) promotes runners-up") {
    // id-grain support table: grain = (k, value), "value" column = id
    val grain = Seq("k", "v")
    val ins = Seq(("a", 9.0, 101L, 1), ("a", 8.0, 102L, 1), ("a", 7.0, 103L, 1),
      ("a", 6.0, 104L, 1), ("b", 5.0, 201L, 1), ("b", 4.0, 202L, 1))
      .toDF("k", "v", "id", "op")
    // delete a's #1 AND #2, and ALL of b — a whole leaderboard vanishes
    val del = Seq(("a", 9.0, 101L, -1), ("a", 8.0, 102L, -1),
      ("b", 5.0, 201L, -1), ("b", 4.0, 202L, -1)).toDF("k", "v", "id", "op")
    val st = Ivm.mergeSupportStates(
      Ivm.supportState(ins, grain, "id", "op"),
      Ivm.supportState(del, grain, "id", "op"), grain, "id")
    val got = Ivm.topKFromSupport(st, Seq("k"), "v", "id", 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(("a", 1, 103L, 7.0), ("a", 2, 104L, 6.0)), got.toString)
  }

  test("top-k fold over an insert/retract changelog equals the one-shot window ranking") {
    // q_ivm_topk_retract in miniature on real data: live set = day > 10
    val grain = Seq("k", "v")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("k"), col("event_id").as("id"),
        col("value").as("v"), dayofmonth(col("ts")).as("day"))
    val ins = ev.withColumn("op", lit(1))
    val dels = ev.filter(col("day") <= 10).withColumn("op", lit(-1))
    val st = Ivm.mergeSupportStates(
      Ivm.supportState(ins, grain, "id", "op"),
      Ivm.supportState(dels, grain, "id", "op"), grain, "id")
    val got = Ivm.topKFromSupport(st, Seq("k"), "v", "id", 3)
    val want = ev.filter(col("day") > 10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= 3)
      .select(col("k"), col("rank"), col("id"), col("v"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  private def boundedRead(st: Ivm.TopKBoundedState, k: Int) =
    Ivm.topKFromBounded(st, Seq("k"), "v", "id", k)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toList
      .sortBy(_._1)

  test("bounded top-k: hidden-side churn touches only the counter; reads stay exact") {
    // key "a": ids 1..10, value = id — buffer (k=2, m=2 → B=4) holds
    // {10, 9, 8, 7}; ids 1..6 are hidden; watermark = (7.0, id 7)
    val init = (1L to 10L).map(i => ("a", i, i.toDouble)).toDF("k", "id", "v")
    val st0 = Ivm.topKBoundedInit(init, keys, "v", "id", k = 2, m = 2)
    // insert below the watermark (11 → hidden) and into the buffer
    // (12 @ 8.5 → evicts 7 to hidden); delete one buffered row (9),
    // two hidden rows (2, 11)
    val d1 = Seq(("a", 11L, 3.5, 1), ("a", 12L, 8.5, 1)).toDF("k", "id", "v", "op")
    val d2 = Seq(("a", 9L, 9.0, -1), ("a", 2L, 2.0, -1), ("a", 11L, 3.5, -1))
      .toDF("k", "id", "v", "op")
    val st = Seq(d1, d2).foldLeft(st0)(
      Ivm.topKBoundedMerge(_, _, keys, "v", "id", "op", k = 2, m = 2))
    // live = {1,3,4,5,6,7,8,10,12@8.5}: top-2 = 10, 12
    assert(boundedRead(st, 2) == List((1, 10L, 10.0), (2, 12L, 8.5)))
    // the eviction of 7 kept order: buffer still answers exactly at its
    // current size (3 rows: 10, 12, 8)
    assert(Ivm.topKBoundedUnderflowKeys(st, keys, 2).isEmpty)
    // state stays bounded: never more than B = 4 buffer rows
    assert(st.buffer.groupBy("k").count().collect().forall(_.getLong(1) <= 4))
  }

  test("bounded top-k: underflow fails loudly, rebuild from the changelog recovers") {
    val init = (1L to 10L).map(i => ("a", i, i.toDouble)).toDF("k", "id", "v")
    val st0 = Ivm.topKBoundedInit(init, keys, "v", "id", k = 2, m = 2)
    // gnaw the whole buffer {10,9,8,7} away while 1..6 stay hidden
    val dels = Seq(7L, 8L, 9L, 10L).map(i => ("a", i, i.toDouble, -1))
      .toDF("k", "id", "v", "op")
    val st = Ivm.topKBoundedMerge(st0, dels, keys, "v", "id", "op", k = 2, m = 2)
    assert(Ivm.topKBoundedUnderflowKeys(st, keys, 2)
      .collect().map(_.getString(0)).toList == List("a"))
    val ex = intercept[Exception] { boundedRead(st, 2) }
    assert(ex.getMessage != null) // loud, not silent-wrong
    // the caller's changelog knows the live rows; rebuild just that key
    val live = (1L to 6L).map(i => ("a", i, i.toDouble)).toDF("k", "id", "v")
    val fixed = Ivm.topKBoundedRebuild(st, live, keys, "v", "id", k = 2, m = 2)
    assert(boundedRead(fixed, 2) == List((1, 6L, 6.0), (2, 5L, 5.0)))
    assert(Ivm.topKBoundedUnderflowKeys(fixed, keys, 2).isEmpty)
  }

  test("bounded top-k: retraction of a never-inserted row fails loudly") {
    val init = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("k", "id", "v")
    val st0 = Ivm.topKBoundedInit(init, keys, "v", "id", k = 1, m = 2)
    val bogus = Seq(("a", 999L, 5.0, -1)).toDF("k", "id", "v", "op")
    val st = Ivm.topKBoundedMerge(st0, bogus, keys, "v", "id", "op", k = 1, m = 2)
    intercept[Exception] { boundedRead(st, 1) }
  }

  test("bounded top-k fold on real data equals the one-shot window ranking") {
    // q_ivm_topk_bounded in miniature — same churn, bounded state
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("k"), col("event_id").as("id"),
        col("value").as("v"), dayofmonth(col("ts")).as("day"))
    val ins1 = ev.filter(col("day") <= 15).withColumn("op", lit(1))
    val ins2 = ev.filter(col("day") > 15).withColumn("op", lit(1))
    val dels = ev.filter(col("day") <= 10).withColumn("op", lit(-1))
    val st0 = Ivm.topKBoundedInit(ins1, keys, "v", "id", k = 3, m = 4)
    val st = Seq(ins2, dels).foldLeft(st0) { (acc, b) =>
      val n = Ivm.topKBoundedMerge(acc, b, keys, "v", "id", "op", k = 3, m = 4)
      Ivm.TopKBoundedState(n.buffer.localCheckpoint(), n.meta.localCheckpoint())
    }
    val got = Ivm.topKFromBounded(st, keys, "v", "id", 3)
    val want = ev.filter(col("day") > 10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= 3)
      .select(col("k"), col("rank"), col("id"), col("v"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the bound that motivates the variant: state rows ≪ live rows
    val liveRows = ev.filter(col("day") > 10).count()
    val stateRows = st.buffer.count() + st.meta.count()
    assert(stateRows <= 13 * st.meta.count(), "state must stay <= (k*m + 1) rows per key")
    // sf0.001 has only ~130 live rows/key; the gap widens with scale
    // (state is O(keys), live is O(rows)) — BENCH.md pins it at sf1
    assert(stateRows < liveRows / 5,
      s"bounded state ($stateRows) should be far below the live set ($liveRows)")
  }
}
