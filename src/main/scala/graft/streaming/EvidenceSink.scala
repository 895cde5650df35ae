package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming → evidence-contract bridge: append each micro-batch as
  * gzipped JSON-lines parts under one output directory (the parallel
  * variant of the K1 sink — `coalesce(1)` per batch would serialize the
  * stream; consumers glob the directory, same as the reference's
  * validator reads a single file).
  *
  * foreachBatch rather than the built-in json sink so per-batch QC hooks
  * (graft.core.Qc) can veto a bad batch before it lands.
  */
object EvidenceSink {

  def start(
      evidence: DataFrame,
      outDir: String,
      checkpointDir: String,
      qc: DataFrame => Unit = _ => (),
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
  ): StreamingQuery =
    evidence.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        qc(batch)
        batch.write
          .mode("append")
          .option("compression", "gzip")
          .json(outDir)
      }
      .start()
}
