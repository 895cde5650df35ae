package graft

import org.apache.spark.sql.functions._

import graft.functions.{DtwImpl, GraftFunctions}

/** Banded DTW kernel pins (q_dtw). */
class DtwSpec extends SparkTestBase {
  import spark.implicits._

  private def dtw(a: Seq[Long], b: Seq[Long], r: Int = 3): Long =
    Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.dtwBand(col("a"), col("b"), r).as("d"))
      .collect()(0).getLong(0)

  /** Unbanded reference DP (full matrix) for cross-checking. */
  private def ref(a: Seq[Long], b: Seq[Long], r: Int): Long = {
    val INF = DtwImpl.Inf
    val n = a.length; val m = b.length
    val dp = Array.fill(n + 1, m + 1)(INF)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m if math.abs(i - j) <= r) {
      val c = math.abs(a(i - 1) - b(j - 1))
      val best = Seq(dp(i - 1)(j), dp(i)(j - 1), dp(i - 1)(j - 1)).min
      if (best < INF) dp(i)(j) = c + best
    }
    dp(n)(m)
  }

  test("identity: dtw(a, a) == 0; symmetry: dtw(a,b) == dtw(b,a)") {
    val a = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val b = Seq(2L, 7L, 1L, 8L, 2L, 8L, 1L, 8L)
    assert(dtw(a, a) == 0L)
    assert(dtw(a, b) == dtw(b, a))
  }

  test("elasticity: a time-shifted copy costs less than pointwise L1") {
    val a = Seq(0L, 0L, 10L, 0L, 0L, 0L, 0L, 0L)
    val b = Seq(0L, 0L, 0L, 0L, 10L, 0L, 0L, 0L) // same spike, shifted by 2 <= r
    val l1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    val d = dtw(a, b)
    assert(d < l1, s"warping ($d) must beat rigid alignment ($l1)")
  }

  test("kernel matches the full-matrix reference DP on deterministic series") {
    // hash-derived pseudo-random series: no Math.random in tests either
    def h(seed: Long, i: Int): Long = {
      val x = seed * 6364136223846793005L + i * 1442695040888963407L
      math.abs(x % 1000L)
    }
    for (len <- Seq(1, 2, 5, 17, 30); r <- Seq(0, 1, 3)) {
      val a = (0 until len).map(i => h(7L, i))
      val b = (0 until len).map(i => h(13L, i))
      assert(dtw(a, b, r) == ref(a, b, r), s"len=$len r=$r")
    }
  }

  test("out-of-band lengths return the INF sentinel; empties are consistent") {
    assert(dtw(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L), Seq(1L)) == DtwImpl.Inf)
    assert(dtw(Seq.empty[Long], Seq.empty[Long]) == 0L)
    assert(dtw(Seq(1L), Seq.empty[Long]) == DtwImpl.Inf)
  }

  test("radius 0 is rigid pointwise L1 on equal-length series") {
    val a = Seq(5L, 9L, 2L); val b = Seq(1L, 4L, 8L)
    assert(dtw(a, b, 0) == a.zip(b).map { case (x, y) => math.abs(x - y) }.sum)
  }

  test("q_dtw: pair grid broadcasts — no sort-merge join on the 5-row sides") {
    val p = SparkEntry.queries("q_dtw")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SortMergeJoin"), s"tiny series table must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected a broadcast pair grid:\n$p")
  }
}
