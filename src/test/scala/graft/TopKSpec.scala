package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TopKState}

/** Exact bounded top-k aggregate pins (q_topk_agg / q_reservoir_sample). */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def entries(st: TopKState): Seq[(Long, Double)] = {
    val bytes = st.serialize()
    val arr = TopKState.entriesOf(bytes)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(1), r.getDouble(2))
    }
  }

  test("under-full state keeps everything, best first, ids break ties ascending") {
    val st = new TopKState(10)
    Seq((5.0, 3L), (7.0, 1L), (5.0, 2L)).foreach { case (v, id) => st.insert(v, id) }
    assert(entries(st) == Seq((1L, 7.0), (2L, 5.0), (3L, 5.0)))
  }

  test("full state evicts the worst pair exactly") {
    val st = new TopKState(3)
    (1 to 10).foreach(i => st.insert(i.toDouble, 100L - i))
    assert(entries(st) == Seq((90L, 10.0), (91L, 9.0), (92L, 8.0)))
  }

  test("tie at the eviction boundary: larger id loses") {
    val st = new TopKState(2)
    st.insert(4.0, 9L); st.insert(4.0, 2L); st.insert(4.0, 5L)
    assert(entries(st) == Seq((2L, 4.0), (5L, 4.0)))
  }

  test("merge of any sharding equals the one-shot state (exact, order-free)") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (rng.nextInt(40).toDouble, i.toLong))
    val oneShot = new TopKState(16)
    rows.foreach { case (v, id) => oneShot.insert(v, id) }
    for (shards <- Seq(2, 7)) {
      val parts = rows.groupBy(_._2 % shards).values.map { part =>
        val st = new TopKState(16)
        part.foreach { case (v, id) => st.insert(v, id) }
        st
      }
      val merged = parts.reduce((a, b) => a.merge(b))
      assert(entries(merged) == entries(oneShot), s"shards=$shards")
    }
  }

  test("serialize/deserialize round-trips the kept set") {
    val st = new TopKState(4)
    (1 to 9).foreach(i => st.insert(i * 1.5, i.toLong))
    assert(entries(TopKState.deserialize(st.serialize())) == entries(st))
  }

  test("null value or id rows are skipped; all-null group probes to null entries") {
    val df = Seq(
      ("a", Some(3.0), Some(1L)), ("a", None, Some(2L)), ("a", Some(5.0), None),
      ("b", None, None),
    ).toDF("k", "v", "id")
    val agg = df.groupBy("k")
      .agg(GraftFunctions.topK(col("v"), col("id"), 4).as("st"))
      .select(col("k"), GraftFunctions.topKEntries(col("st")).as("e"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(agg("a") != null && agg("a").get.asInstanceOf[scala.collection.Seq[_]].size == 1)
    assert(agg("b").get.asInstanceOf[scala.collection.Seq[_]].isEmpty) // state exists, no pairs
  }

  test("SQL surface: graft_topk / graft_topk_merge / graft_topk_entries") {
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView("ev_topk")
    val got = spark.sql(
      """SELECT event_type, e.id AS event_id, e.rank AS rank
        |FROM (
        |  SELECT event_type, graft_topk_merge(st) AS st FROM (
        |    SELECT event_type, day(ts) AS d, graft_topk(value, event_id, 3) AS st
        |    FROM ev_topk GROUP BY 1, 2) GROUP BY 1)
        |LATERAL VIEW explode(graft_topk_entries(st)) AS e""".stripMargin)
      .as[(String, Long, Int)].collect().toSet
    val want = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id"))))
      .filter(col("rank") <= 3)
      .select($"event_type", $"event_id", $"rank".cast("int"))
      .as[(String, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("plan shape: the aggregate partial-combines (no window exchange of raw rows)") {
    val plan = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(GraftFunctions.topK(col("value"), col("event_id"), 5).as("st"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial + final mode around one exchange
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.toLowerCase.contains("window"))
  }
}
