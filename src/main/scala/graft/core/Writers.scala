package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Sinks — SURVEY.md §2.2 (K1, K2, K5).
  *
  * Reference contract: one gzipped JSON-lines file per parser
  * (`common/evidence.py:66-80`: coalesce(1) → json+gzip → rename the single
  * part file, assert exactly one chunk).
  *
  * Scale note: `coalesce(1)` funnels the entire output through one task.
  * That is the reference's explicit contract for its (small, ≤100k-row)
  * evidence outputs, so [[writeJsonGzSingle]] keeps it — but for large
  * outputs use [[writeJsonGz]] (multi-part, parallel) and let downstream
  * consumers glob the directory.
  */
object Writers {

  /** K1: single-file gzipped JSON-lines sink (reference
    * `common/evidence.py:66-80`). Only for outputs known to be small.
    *
    * Pass a `contract` to validate the output against the reference's
    * JSON-Schema-style rules (§5 mechanism 1, `Snakefile:110`): the
    * violation counters ride `Dataset.observe`, accumulating DURING the
    * write itself — no second scan — and are read back through a
    * QueryExecutionListener once the write's execution completes. Like
    * the reference's file-then-validate flow, a violation throws AFTER
    * the bytes land; the exception names every violated rule.
    */
  def writeJsonGzSingle(
      df: DataFrame,
      outFile: String,
      contract: Option[Qc.EvidenceContract] = None,
  ): Unit = contract match {
    case None => writeJsonGzSingleRaw(df, outFile)
    case Some(c) =>
      val spark = df.sparkSession
      // Unique per call: the listener is session-global, so two
      // concurrent contract writes sharing one metric name would capture
      // each other's counter rows — a violating output could be silently
      // accepted against the clean write's all-zero metrics.
      val metricName = s"evidence_contract_${java.util.UUID.randomUUID()}"
      val observed = Qc.observedEvidence(df, c, metricName)
      val captured = new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.Row]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(
            funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.get(metricName).foreach(captured.compareAndSet(null, _))
        override def onFailure(
            funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        writeJsonGzSingleRaw(observed, outFile)
        // Listener dispatch is asynchronous; drain before reading.
        org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      } finally spark.listenerManager.unregister(listener)
      val metrics = Option(captured.get).getOrElse(throw new IllegalStateException(
        "evidence-contract metrics were not observed during the write"))
      Qc.failOnViolations(Qc.contractCounts(metrics))
  }

  private def writeJsonGzSingleRaw(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + "_tmp"
    df.coalesce(1)
      .write
      .mode("overwrite")
      .option("compression", "gzip")
      .json(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    val parts = fs.globStatus(new Path(tmp, "part-*"))
    require(parts.length == 1, s"expected exactly 1 part file, got ${parts.length}")
    val dest = new Path(outFile)
    // Hadoop FS ops report failure via booleans, not exceptions — check
    // them, and only clean the temp dir AFTER the rename landed (a failed
    // rename must not lose the only copy of the data).
    if (fs.exists(dest) && !fs.delete(dest, true))
      throw new java.io.IOException(s"could not remove existing $outFile")
    if (!fs.rename(parts.head.getPath, dest))
      throw new java.io.IOException(s"rename to $outFile failed; data retained in $tmp")
    fs.delete(new Path(tmp), true)
  }

  /** Parallel multi-part gzipped JSON-lines sink — the 100 TB-safe variant. */
  def writeJsonGz(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(outDir)

  /** K2: format-dispatched writer (reference `BrainCRISPR.py:310-317`). */
  def writeByExtension(df: DataFrame, path: String): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) df.write.mode("overwrite").parquet(path)
    else if (lower.endsWith(".orc")) df.write.mode("overwrite").orc(path)
    else if (lower.contains(".json")) writeJsonGzSingle(df, path)
    else if (lower.endsWith(".tsv"))
      df.coalesce(1).write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)
    else df.write.mode("overwrite").parquet(path)
  }

  /** Size-targeted parquet write — the small-files compaction step every
    * long-lived 100 TB table needs: thousands of kilobyte-sized files
    * wreck scan planning (file listing, footer reads, task-per-file) and
    * downstream shuffle fan-in. Partition count comes from Catalyst's
    * optimized-plan size statistics, so no extra pass over the data; a
    * round-robin repartition levels the output files.
    *
    * Without CBO the statistics are only trustworthy for scan-rooted
    * plans: joins multiply child sizes and stat-less leaves default to
    * Long.MaxValue. Estimates beyond `statSanityBytes` (default 1 PB)
    * are treated as junk and fall back to the session's default
    * parallelism rather than fanning out to the clamp.
    *
    * At true scale prefer the declarative knob
    * (`spark.sql.files.maxRecordsPerFile` / AQE coalescing) when it
    * fits; this helper is for explicit re-compaction of an existing
    * fragmented table.
    *
    * @return the partition (≈ file) count chosen
    */
  def writeCompacted(
      df: DataFrame,
      path: String,
      targetBytes: Long = 128L << 20,
      statSanityBytes: BigInt = BigInt(1L) << 50,
  ): Int = {
    require(targetBytes > 0)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts =
      if (bytes > statSanityBytes) df.sparkSession.sparkContext.defaultParallelism
      else ((bytes + targetBytes - 1) / targetBytes).min(10000).max(1).toInt
    df.repartition(parts).write.mode("overwrite").parquet(path)
    parts
  }
}
