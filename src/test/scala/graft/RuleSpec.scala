package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FuseTokenCount optimizer-rule pins: the injected Catalyst rule must
  * rewrite the library's HOF token-count idiom to the one-pass kernel —
  * and must be value-identical on every input, null conventions
  * included. Plan-shape assertions run over parquet-backed frames:
  * local literal relations constant-fold to a LocalRelation before any
  * operator rule can be observed.
  */
class RuleSpec extends SparkTestBase {
  import spark.implicits._

  /** The exact library idiom the rule targets. */
  private def hofCount(c: Column): Column =
    size(filter(split(trim(c), "\\s+"), _ =!= ""))

  /** Same value, different split regex — deliberately NOT matched by the
    * rule; serves as the unfused twin for value comparisons.
    */
  private def unfused(c: Column): Column =
    size(filter(split(trim(c), "\\s{1,}"), _ =!= ""))

  /** Edge-case rows, parquet-backed so plans stay observable. */
  private lazy val edge: DataFrame = {
    val p = tmpDir("rule_edge")
    Seq(Some(""), Some(" "), Some("  a"), Some("a  "), Some("a b\tc"),
      Some("a\u000Bb"), Some("a\u00A0b"), Some("\t\n\f\r"), Some("x"),
      Some(" x y  z "), Some("a b"), None)
      .toDF("t").coalesce(1).write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("the idiom is rewritten to graft_token_count in the optimized plan") {
    val df = edge.select(hofCount($"t").as("n"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_token_count"), plan)
    assert(!plan.contains("array_filter"), s"HOF chain should be gone:\n$plan")
  }

  test("a different regex or filter literal is left alone") {
    for (df <- Seq(
      edge.select(unfused($"t")),
      edge.select(size(filter(split(trim($"t"), "\\s+"), _ =!= "x"))),
    )) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_token_count"), plan)
    }
  }

  test("value identity on whitespace edge cases incl. nulls (size convention)") {
    val got = edge.select(hofCount($"t")).collect().map(r => Option(r.get(0))).toSeq
    val want = edge.select(unfused($"t")).collect().map(r => Option(r.get(0))).toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("reversed comparison operand ('' =!= x) fuses and agrees") {
    val df = edge.select(size(filter(split(trim($"t"), "\\s+"), x => lit("") =!= x)).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_token_count"))
    val want = edge.select(unfused($"t")).collect().map(r => Option(r.get(0))).toSeq
    assert(df.collect().map(r => Option(r.get(0))).toSeq == want)
  }

  test("the no-trim variant fuses as well") {
    val df = edge.select(size(filter(split($"t", "\\s+"), _ =!= "")).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_token_count"))
    val want = edge.select(unfused($"t")).collect().map(r => Option(r.get(0))).toSeq
    assert(df.collect().map(r => Option(r.get(0))).toSeq == want)
  }

  test("SQL surface: graft_token_count registered and consistent") {
    val got = spark.sql("SELECT graft_token_count(' a  b\tc ')").collect()(0).getInt(0)
    assert(got == 3)
  }
}
