package graft

class QueriesSpec extends SparkTestBase {

  test("entry flagship returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q_join_full keeps unmatched rows from BOTH sides") {
    val sides = SparkEntry.queries("q_join_full")(spark, sf)
      .groupBy("side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.keySet == Set("both", "order_only", "lines_only"), s"got $sides")
  }

  test("all queries execute and return rows at sf0.001 (except known-empty)") {
    val mayBeEmpty = Set("q_join_anti") // every sf0.001 customer has orders
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q_rbo stays inside truncated-RBO bounds; identical lists would cap at 1-p^10") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_rbo")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val cap = 1.0 - math.pow(0.9, 10) // truncated RBO@10 of IDENTICAL lists
    rows.foreach { case (q, nBoth, rbo) =>
      assert(nBoth >= 0 && nBoth <= 10, s"q $q overlap out of range: $nBoth")
      assert(rbo >= 0.0 && rbo <= cap + 1e-9, s"q $q rbo $rbo outside [0, $cap]")
      if (nBoth == 0) assert(rbo == 0.0)
    }
  }

  test("q_rfm: quintiles balanced within each segment; label rules hold") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_rfm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("segment")).foreach { case (seg, rs) =>
      val sizes = rs.groupBy(_.getAs[Int]("r_score")).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$seg r_score quintiles unbalanced: $sizes")
    }
    rows.foreach { r =>
      val (rc, fc) = (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"))
      val label = r.getAs[String]("segment_label")
      if (rc >= 4 && fc >= 4) assert(label == "champion")
      else if (rc <= 2 && fc <= 2) assert(label == "at_risk")
      else assert(label == "regular")
      assert(r.getAs[Int]("rfm") == rc * 100 + fc * 10 + r.getAs[Int]("m_score"))
    }
  }

  test("q_benford: digits 1-9, observed counts account for every order, chi2 terms nonneg") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9, s"first digit out of range: $d")
      assert(r.getAs[Double]("contrib") >= 0.0)
    }
    rows.groupBy(_.getAs[String]("priority")).foreach { case (p, rs) =>
      val n = rs.head.getAs[Long]("n")
      assert(rs.map(_.getAs[Long]("obs")).sum == n, s"$p: digit counts must partition n")
      val expSum = rs.map(_.getAs[Double]("expected")).sum
      // only digits that OCCUR emit rows, but the 6-dp constants sum to 1
      assert(expSum <= n + 1e-6, s"$p: expected mass exceeds n: $expSum vs $n")
    }
  }

  test("q_assoc_rules: rules come in mirrored pairs, lift is symmetric, confidence bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_assoc_rules")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r._1, r._2) -> r).toMap
    rows.foreach { case (a, c, nab, conf, lift) =>
      assert(conf > 0.0 && conf <= 1.0, s"confidence out of (0,1]: $conf")
      assert(lift > 0.0)
      val mirror = byPair.get((c, a))
      assert(mirror.isDefined, s"rule $a->$c has no mirror")
      assert(mirror.get._5 == lift, "lift must be direction-independent")
      assert(mirror.get._3 == nab)
    }
  }
}
