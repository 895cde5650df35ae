package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Rank

class RankSpec extends SparkTestBase {
  import spark.implicits._

  test("rowNumberDesc equals the single-partition window rank (with ties)") {
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      // Integer-divide prices into coarse buckets so primary-key TIES are
      // plentiful — the tiebreak path is what needs proving.
      .agg((sum(col("o_totalprice")) / 1000).cast("long").as("v"))
    val naive = spend
      .withColumn("rn", row_number().over(Window.orderBy(col("v").desc, col("o_custkey"))).cast("long"))
      .select("o_custkey", "v", "rn")
    val bucketed = Rank.rowNumberDesc(spend, "v", Seq("o_custkey"))
      .select("o_custkey", "v", "rn")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }

  test("rowNumberDesc is exact even when every row lands in one bucket") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "v")
    val got = Rank.rowNumberDesc(df, "v", Seq("id"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.toSeq == Seq((1L, 5L, 1L), (2L, 5L, 2L), (3L, 5L, 3L)))
  }

  test("rowNumberDesc fails loudly on a null primary value (documented unsupported)") {
    // A null primary would drop every split in the bucket filter and
    // silently interleave mid-order; the in-plan raise_error guard turns
    // that misuse into an exception instead of wrong ranks.
    val df = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null: java.lang.Long))
      .toDF("id", "v")
    val ex = intercept[Exception] {
      Rank.rowNumberDesc(df, "v", Seq("id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("null in primary column")))
  }
}
