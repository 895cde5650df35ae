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

  // ---- FuseRegexCount: the run-counting double-regexp algebra ----------

  /** The exact run-count idiom the rule targets. */
  private def runCount(c: Column, pat: String): Column =
    length(regexp_replace(c, pat, "X")) - length(regexp_replace(c, pat, ""))

  /** Value twin the rule deliberately does NOT match (replacements of
    * 2 and 1 chars — the diff is still the match count).
    */
  private def runCountTwin(c: Column, pat: String): Column =
    length(regexp_replace(c, pat, "XY")) - length(regexp_replace(c, pat, "Y"))

  /** Regex edge rows: unicode (incl. a supplementary code point inside
    * and outside matches), empties, no-match, adjacent matches, null.
    */
  private lazy val redge: DataFrame = {
    val p = tmpDir("rule_regex_edge")
    Seq(Some(""), Some("abcab"), Some("aaa"), Some("a.b!c?d"),
      Some("x y\tz"), Some("café café"), Some("a😀b c"),
      Some("😀😀"), Some("no digits here"),
      Some("1a22b333"), None)
      .toDF("t").coalesce(1).write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("run-count idiom is rewritten to graft_regex_count; both regex scans gone") {
    val df = redge.select(runCount($"t", "[0-9]+").as("n"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_regex_count"), plan)
    assert(!plan.contains("regexp_replace"), s"double scan should be gone:\n$plan")
  }

  test("run-count value identity on regex edges incl. nulls and unicode") {
    for (pat <- Seq("[0-9]+", "\\S+", "[aeiouy]+", "ab", "q", "a*")) {
      val got = redge.select(runCount($"t", pat)).collect()
        .map(r => Option(r.get(0))).toSeq
      val want = redge.select(runCountTwin($"t", pat)).collect()
        .map(r => Option(r.get(0))).toSeq
      assert(got == want, s"pattern '$pat': got=$got want=$want")
    }
  }

  test("matched-chars idiom fuses and equals the two-column difference") {
    for (pat <- Seq("[0-9]+", "\\s+", "😀", "a*")) {
      val df = redge.select(
        (length($"t") - length(regexp_replace($"t", pat, ""))).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_regex_matched_chars"), s"'$pat':\n$plan")
      // Oracle: the same two lengths collected separately, diffed here.
      val parts = redge.select(length($"t").as("a"),
        length(regexp_replace($"t", pat, "")).as("b")).collect()
        .map(r => if (r.isNullAt(0) || r.isNullAt(1)) None
                  else Some(r.getInt(0) - r.getInt(1))).toSeq
      val got = df.collect().map(r => Option(r.get(0))).toSeq
      assert(got == parts, s"pattern '$pat': got=$got want=$parts")
    }
  }

  test("non-matching regexp shapes are left alone") {
    val noFuse = Seq(
      // different patterns on the two sides
      length(regexp_replace($"t", "[0-9]+", "X")) -
        length(regexp_replace($"t", "[a-z]+", "")),
      // replacement with appendReplacement meta-semantics
      length(regexp_replace($"t", "[0-9]+", "$")) -
        length(regexp_replace($"t", "[0-9]+", "")),
      // 2-char replacement (not the 1-vs-0 identity)
      length(regexp_replace($"t", "[0-9]+", "XY")) -
        length(regexp_replace($"t", "[0-9]+", ""))
    )
    for (c <- noFuse) {
      val plan = redge.select(c).queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_regex_count") &&
        !plan.contains("graft_regex_matched_chars"), plan)
    }
    // Non-default search position (SQL 4-arg surface): left alone.
    redge.createOrReplaceTempView("redge_v")
    val sqlPlan = spark.sql(
      """SELECT length(regexp_replace(t, '[0-9]+', 'X', 2))
        |     - length(regexp_replace(t, '[0-9]+', '', 2)) FROM redge_v"""
        .stripMargin).queryExecution.optimizedPlan.toString
    assert(!sqlPlan.contains("graft_regex_count"), sqlPlan)
  }

  test("size(regexp_extract_all(s,p,0)) fuses; group-index > 0 left alone") {
    for (pat <- Seq("[0-9]+", "ab", "a*", "😀")) {
      val df = redge.select(
        size(regexp_extract_all($"t", lit(pat), lit(0))).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_regex_count"), s"'$pat':\n$plan")
      // value oracle: the run-count twin (same match count, not fused)
      val want = redge.select(runCountTwin($"t", pat)).collect()
        .map(r => Option(r.get(0))).toSeq
      val got = df.collect().map(r => Option(r.get(0))).toSeq
      assert(got == want, s"pattern '$pat': got=$got want=$want")
    }
    // a capture-group index other than 0 is NOT the fused shape
    val p1 = redge.select(
      size(regexp_extract_all($"t", lit("(a)b"), lit(1)))).queryExecution
      .optimizedPlan.toString
    assert(!p1.contains("graft_regex_count"), p1)
  }

  test("SQL surface: graft_regex_count / graft_regex_matched_chars registered") {
    val r = spark.sql(
      "SELECT graft_regex_count('abcab', 'ab'), " +
        "graft_regex_matched_chars('a1b22c333', '[0-9]+')").collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 6)
  }

  // ---- FuseRegexChain: the ordered rulebook fold ------------------------

  /** Rulebooks whose value depends on SEQUENTIAL semantics: pass 2 must
    * see pass 1's output (b→c sees a→b's rewrites), replacements carry
    * $-group refs, patterns overlap. Any alternation shortcut diverges
    * on these; the fused kernel must not.
    */
  private val chainRules = Seq(
    Seq("[0-9]+" -> "<NUM>", "[a-z]+@[a-z.]+" -> "<EMAIL>", "\\s+$" -> ""),
    Seq("a" -> "b", "b" -> "c"),                  // cascading rewrites
    Seq("(c)af(é)" -> "$2af$1", "é+" -> "E"),     // group refs then overlap
    Seq("😀" -> "[emoji]", "\\[emoji\\]" -> "!"), // replacement re-matched
    Seq("(a)\\1*" -> "A", "q" -> ""),             // backref: no pre-filter
  )

  private def unfusedChain(c: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  test("nested rulebook chain is rewritten to one graft_regex_chain kernel") {
    val df = redge.select(unfusedChain($"t", chainRules.head).as("s"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_regex_chain"), plan)
    assert(!plan.contains("regexp_replace"), s"all three passes should fuse:\n$plan")
  }

  test("rulebook value identity incl. nulls, cascades, $-refs, backrefs") {
    for (rules <- chainRules) {
      // genuinely-unfused twin: each pass is a SINGLE regexp_replace on
      // its own collected frame (never nested, so CollapseProject cannot
      // rebuild the shape the rule fuses)
      var want: Seq[Option[String]] =
        redge.collect().map(r => Option(r.getString(0))).toSeq
      for ((p, rep) <- rules)
        want = want.toDF("s").select(regexp_replace($"s", p, rep))
          .collect().map(r => Option(r.getString(0))).toSeq
      val got = redge.select(
        graft.functions.GraftFunctions.regexChain($"t", rules).as("s"))
        .collect().map(r => Option(r.getString(0))).toSeq
      assert(got == want, s"rules $rules: got=$got want=$want")
    }
  }

  test("a non-literal or positioned pass breaks the chain there; the rest fuses") {
    redge.createOrReplaceTempView("redge_chain_v")
    // outer pass at position 2: not fused; the inner 2-pass chain is
    val plan = spark.sql(
      """SELECT regexp_replace(
        |  regexp_replace(regexp_replace(t, 'a', 'b'), 'b', 'c'),
        |  'c', 'd', 2) FROM redge_chain_v""".stripMargin)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_regex_chain"), plan)
    assert(plan.contains("regexp_replace"), s"the positioned pass must survive:\n$plan")
    // a single pass (no nesting) is never touched
    val single = redge.select(regexp_replace($"t", "a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!single.contains("graft_regex_chain"), single)
  }

  test("SQL surface: graft_regex_chain registered") {
    val r = spark.sql(
      "SELECT graft_regex_chain('a1 b2', array('[0-9]', 'a|b'), array('#', 'X'))")
      .collect()(0)
    assert(r.getString(0) == "X# X#")
  }
}
