package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.SparseSim

/** Ad-hoc stage profiler for perf work — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-28s ${ts.min}%.3f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("postings only") {
      noop(SparseSim.postings(docs, "doc_id", "text", 3, 100))
    }
    time("full topk") {
      noop(SparseSim.topKNeighbors(SparseSim.postings(docs, "doc_id", "text", 3, 100), 5))
    }
    val pr = SparseSim.topKNeighbors(SparseSim.postings(docs, "doc_id", "text", 3, 100), 5)
    println("[scratch] knn rows = " + pr.count())
    spark.stop()
  }
}
