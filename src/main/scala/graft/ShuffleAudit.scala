package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Cost-model probe (dev harness, not driver-run): executes registry
  * queries end-to-end (noop sink) while a SparkListener sums every
  * task's shuffle WRITE bytes/records and input-read bytes — the two
  * quantities that multiply against 100 TB. Shuffle write is counted
  * (not read) so a value is attributed exactly once per exchange, and
  * re-used/replayed reads don't double-count.
  *
  * Output: one JSON line per query —
  * {"q":name,"sec":s,"input_mb":m,"shuffle_mb":m,"shuffle_rows":n,
  *  "amplification":shuffle_bytes/input_bytes}
  * `amplification` is the scale verdict in one number: an operator whose
  * shuffle grows faster than its input (ratio rising across sf0.1 → sf1
  * → sf10) is the one that breaks first on a 1000-executor cluster.
  *
  * Usage: SPARK_GRAFT_SF_DIR=target/sf10 runMain graft.ShuffleAudit q1 q2 ...
  * (no args = the BENCH.md scaling-table family)
  */
object ShuffleAudit {

  /** The standing-index / dedup / IVM shapes whose state or fan-out
    * could bend super-linearly — the sf10 table's rows.
    */
  val defaultQueries: Seq[String] = Seq(
    "q_dedup_clusters", "q_dedup_clusters_incremental",
    "q_substring_dedup", "q_sparse_incremental",
    "q_ann_ivf_incremental", "q_ann_pq_incremental", "q_ann_ivfpq_incremental",
    "q_setsim_join", "q_containment_incremental",
    "q_ivm_agg", "q_ivm_retract", "q_ivm_topk_retract",
    "q_ivm_quantile_retract", "q_ivm_topk_bounded",
    "q_asof_salted")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error(
      "ShuffleAudit: set SPARK_GRAFT_SF_DIR to the parquet scale dir to audit"))
    val names = if (args.nonEmpty) args.toSeq else defaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new LongAdder
    val shuffleRows = new LongAdder
    val inputBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.add(m.shuffleWriteMetrics.bytesWritten)
          shuffleRows.add(m.shuffleWriteMetrics.recordsWritten)
          inputBytes.add(m.inputMetrics.bytesRead)
        }
      }
    })

    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[audit] unknown query: $name")
        case Some(fn) =>
          shuffleBytes.reset(); shuffleRows.reset(); inputBytes.reset()
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            // listener events are posted async; drain before reading
            org.apache.spark.sql.GraftShim.drainListenerBus(spark)
            val in = inputBytes.sum(); val sh = shuffleBytes.sum()
            val amp = if (in > 0) sh.toDouble / in else Double.NaN
            println(f"""{"q":"$name","sec":$sec%.2f,"input_mb":${in / 1048576.0}%.1f,"shuffle_mb":${sh / 1048576.0}%.1f,"shuffle_rows":${shuffleRows.sum()},"amplification":$amp%.3f}""")
          } catch {
            case e: Throwable => System.err.println(s"[audit] $name failed: $e")
          }
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
          }
      }
    }
    spark.stop()
  }
}
