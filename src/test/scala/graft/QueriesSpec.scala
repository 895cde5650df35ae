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
