package graft

import org.apache.spark.sql.functions._

/** SeqMine's order-statistic folding on hand streams — the
  * gap-allowed-vs-adjacent distinction, session isolation, and the
  * same-type-repeat edge the min<max rule must get right.
  */
class SeqMineSpec extends SparkTestBase {
  import spark.implicits._

  private def mine(rows: Seq[(Long, Long, String)], minSupport: Long = 1L) =
    graft.core.SeqMine.frequentSequences(
      rows.zipWithIndex.map { case ((u, t, a), i) => (u, t, a, i.toLong) }
        .toDF("u", "t", "a", "id"),
      user = col("u"), tsUs = col("t"), typ = col("a"), tieBreak = col("id"),
      gapUs = 100L, minSupport = minSupport)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("gap-allowed: a>c found across an intervening b; adjacency not required") {
    // One session: a(0) b(10) c(20). All six ordered pairs/triples of
    // the witnessed orderings, nothing reversed.
    val got = mine(Seq((1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c")))
    assert(got(("a>c", 2)) == 1L, "non-adjacent pair must be mined")
    assert(got(("a>b>c", 3)) == 1L)
    assert(!got.contains(("c>a", 2)) && !got.contains(("b>a", 2)),
      "reversed orders must be absent")
    assert(!got.contains(("a>a", 2)), "single occurrence cannot witness a repeat")
  }

  test("same-type repeat needs two events; session gap isolates witnesses") {
    // User 1: a(0) a(50) in one session -> a>a. User 2: a(0) | a(200)
    // in DIFFERENT sessions (gap 100) -> no a>a; each session alone.
    val got = mine(Seq((1L, 0L, "a"), (1L, 50L, "a"), (2L, 0L, "a"), (2L, 200L, "a")))
    assert(got(("a>a", 2)) == 1L, s"only user 1's session witnesses a repeat: $got")
  }

  test("support counts SESSIONS, and the triple rule uses the earliest valid B") {
    // Two users, one session each, both a->b->c; plus a session where
    // the only B precedes every A (b a c): a>b>c must NOT count it.
    val got = mine(Seq(
      (1L, 0L, "a"), (1L, 1L, "b"), (1L, 2L, "c"),
      (2L, 0L, "a"), (2L, 5L, "b"), (2L, 9L, "c"),
      (3L, 0L, "b"), (3L, 1L, "a"), (3L, 2L, "c")))
    assert(got(("a>b>c", 3)) == 2L, s"session 3 has no b after a: $got")
    assert(got(("b>a>c", 3)) == 1L)
    // minSupport filters: at 2 only patterns shared by both full funnels
    val filtered = mine(Seq(
      (1L, 0L, "a"), (1L, 1L, "b"), (1L, 2L, "c"),
      (2L, 0L, "a"), (2L, 5L, "b"), (2L, 9L, "c"),
      (3L, 0L, "b"), (3L, 1L, "a"), (3L, 2L, "c")), minSupport = 2L)
    assert(filtered.contains(("a>c", 2)) && !filtered.contains(("b>a", 2)))
  }
}
