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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.text.TextAnalysis
    import graft.similarity.SetSimJoin
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val shingles = TextAnalysis.wordShingles(col("text"), 3)
    val idx = time("buildIndex+materialize") {
      val i = SetSimJoin.buildIndex(docs.filter(col("doc_id") % 4 =!= 0), col("doc_id"), shingles)
      i._1.count(); i._2.count(); i
    }
    val out = SetSimJoin.selfJoinIncrement(docs.filter(col("doc_id") % 4 === 0), col("doc_id"), shingles, idx, t = 0.5)
    time("increment full")(out.count())
    time("increment again")(out.count())
    spark.stop()
  }
}
