package graft

import org.apache.spark.sql.functions._
import graft.core.Stats

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("pValue mantissa/exponent motif matches reference semantics") {
    // Reference (AzGeneBurden.py:214-221): exp = int(log10(p)) - 1
    // (truncation toward zero), mantissa = round(p / 10^exp, 3).
    val df = Seq(3e-5, 0.05, 2.5e-8, 0.9).toDF("p")
      .select(
        $"p",
        Stats.pValueExponent($"p").as("e"),
        Stats.pValueMantissa($"p").as("m"))
    val got = df.collect().map(r => r.getDouble(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got(3e-5) == ((-5, 3.0)))
    assert(got(0.05) == ((-2, 5.0)))   // int(-1.30)=-1, -1-1=-2, 0.05/1e-2=5
    assert(got(2.5e-8) == ((-8, 2.5)))
    assert(got(0.9) == ((-1, 9.0)))    // int(-0.045)=0, 0-1=-1
  }

  test("pFromNegLog10 inverts the LOG10P encoding") {
    val p = Seq(7.0).toDF("lg").select(Stats.pFromNegLog10($"lg").as("p")).head().getDouble(0)
    assert(math.abs(p - 1e-7) < 1e-20)
  }

  test("repairZeroPValues substitutes global min positive") {
    val df = Seq(0.0, 1e-12, 0.5).toDF("p")
    val out = Stats.repairZeroPValues(df, "p").as[Double].collect().sorted.toSeq
    assert(out == Seq(1e-12, 1e-12, 0.5))
  }

  test("repairZeroPValues keeps rows when NO positive p exists (edge)") {
    val df = Seq(0.0, 0.0).toDF("p")
    val out = Stats.repairZeroPValues(df, "p").as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.0), "rows must survive an all-zero column")
  }

  test("gini: uniform array -> 0, fully concentrated -> (n-1)/n; kernel agrees with HOF") {
    val df = Seq(
      (1, Seq(5.0, 5.0, 5.0, 5.0)),
      (2, Seq(0.0, 0.0, 0.0, 8.0)),
    ).toDF("k", "xs").select(
      $"k",
      round(Stats.gini($"xs"), 9).as("g"),
      round(graft.functions.GraftFunctions.gini($"xs"), 9).as("gk"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"kernel/HOF gini disagree: $r")
    }
    val m = df.select("k", "g").as[(Int, Double)].collect().toMap
    assert(m(1) == 0.0)
    assert(m(2) == 0.75)
  }

  test("minMaxScale maps to [0.5, 1] with degenerate-range guard") {
    val df = Seq((0.0, 0.0, 10.0), (10.0, 0.0, 10.0), (5.0, 0.0, 10.0), (3.0, 3.0, 3.0))
      .toDF("x", "lo", "hi")
      .select(Stats.minMaxScale($"x", $"lo", $"hi").as("s"))
    assert(df.as[Double].collect().toSeq == Seq(0.5, 1.0, 0.75, 0.5))
  }

  test("bonferroni") {
    val a = Seq(500).toDF("n").select(Stats.bonferroni($"n").as("a")).head().getDouble(0)
    assert(a == 0.0001)
  }
}
