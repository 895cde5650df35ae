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

  test("ksTest2 golden: two-sample KS matches the hand ECDF computation") {
    // a = [1,2,3,4,10] (s1), b = [2,5,6,7]: D = |3/5 - 1/4| at x=4 → 0.55.
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 10.0).map(v => ("g1", v, true)) ++
      Seq(2.0, 5.0, 6.0, 7.0).map(v => ("g1", v, false))).toDF("g", "v", "in1")
    val r = Stats.ksTest2(df, $"g", $"v", $"in1").collect().head
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 4L)
    assert(math.abs(r.getAs[Double]("d") - 0.55) < 1e-15)
    val ks = math.sqrt(5.0 * 4.0 / 9.0) * 0.55
    assert(math.abs(r.getAs[Double]("ks_stat") - ks) < 1e-15)
    assert(math.abs(r.getAs[Double]("p_asym") - math.min(1.0, 2.0 * math.exp(-2.0 * ks * ks))) < 1e-15)
  }

  test("ksTest2 drops groups missing either sample") {
    val df = Seq(("only1", 1.0, true), ("only1", 2.0, true), ("both", 1.0, true), ("both", 2.0, false))
      .toDF("g", "v", "in1")
    val got = Stats.ksTest2(df, $"g", $"v", $"in1").select("g").as[String].collect().toSeq
    assert(got == Seq("both"), "a one-sample group has no defined D")
  }

  test("mannWhitneyU golden: tie-corrected z matches the hand rank-sum") {
    // Same samples; value 2.0 tied across samples → avg rank 2.5,
    // tiesum = 2³−2 = 6, U1 = 6.5, z = −0.8609160647753271.
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 10.0).map(v => ("g1", v, true)) ++
      Seq(2.0, 5.0, 6.0, 7.0).map(v => ("g1", v, false))).toDF("g", "v", "in1")
    val r = Stats.mannWhitneyU(df, $"g", $"v", $"in1").collect().head
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Double]("u1") == 6.5)
    assert(math.abs(r.getAs[Double]("z") - (-0.8609160647753271)) < 1e-14)
  }

  test("mannWhitneyU is antisymmetric in the sample flag") {
    val df = (Seq(1.0, 2.0, 3.0).map(v => ("g", v, true)) ++
      Seq(2.5, 4.0).map(v => ("g", v, false))).toDF("g", "v", "in1")
    val z1 = Stats.mannWhitneyU(df, $"g", $"v", $"in1").collect().head.getAs[Double]("z")
    val z2 = Stats.mannWhitneyU(df, $"g", $"v", !$"in1").collect().head.getAs[Double]("z")
    assert(math.abs(z1 + z2) < 1e-12, s"flipping samples must negate z: $z1 vs $z2")
  }

  test("psi: identical distributions read exactly 0; a shifted one reads positive") {
    val same = (1 to 64).flatMap(i => Seq(("g", i.toDouble, true), ("g", i.toDouble, false)))
      .toDF("g", "v", "ref")
    val z = Stats.psi(same, $"g", $"v", $"ref").collect().head
    assert(z.getAs[Double]("psi") == 0.0, "equal per-bin shares must cancel exactly")
    assert(z.getAs[Long]("n_ref") == 64L && z.getAs[Long]("n_cur") == 64L)
    val shifted = ((1 to 64).map(i => ("g", i.toDouble, true)) ++
      (1 to 64).map(i => ("g", i.toDouble + 40.0, false))).toDF("g", "v", "ref")
    val s = Stats.psi(shifted, $"g", $"v", $"ref").collect().head.getAs[Double]("psi")
    assert(s > 0.5, s"a 40-unit shift on a 64-wide support must alarm: $s")
  }

  test("jsdFromCounts: identical mixes read 0; disjoint vocabularies read ln 2") {
    val z = Stats.jsdFromCounts(
      Seq(("g", 3L, 3L), ("g", 7L, 7L)).toDF("g", "ca", "cb"), $"g", $"ca", $"cb")
      .collect().head.getAs[Double]("jsd")
    assert(math.abs(z) < 1e-15, s"identical mixes: $z")
    val disj = Stats.jsdFromCounts(
      Seq(("g", 5L, 0L), ("g", 0L, 5L)).toDF("g", "ca", "cb"), $"g", $"ca", $"cb")
      .collect().head.getAs[Double]("jsd")
    assert(math.abs(disj - math.log(2.0)) < 1e-9, s"disjoint vocab must hit ln2: $disj")
  }
}
