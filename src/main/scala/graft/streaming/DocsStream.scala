package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Structured Streaming ingest for DOCUMENT feeds — the continuous face
  * of the text/dedup operators (a crawler or firehose landing training
  * text nonstop, rather than the batch `documents` table).
  *
  * Everything stateless here is the SAME codegen'd kernels the batch
  * path uses (TextStats, fingerprints) running inside the micro-batch
  * plan — StreamingSpec asserts stream ≡ batch on identical input, so
  * the two paths cannot drift. The one stateful stage (fingerprint
  * dedup) bounds its state with the watermark, the standing requirement
  * for an infinite feed.
  */
object DocsStream {

  /** Stateless enrichment: language ID, token count, quality signals via
    * the one-pass TextStats kernel — a narrow codegen'd projection per
    * micro-batch, no state, no shuffle. The stream stays partitioned as
    * it arrives (100 TB/day is fine if the source is).
    */
  def enriched(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val st = graft.functions.GraftFunctions.textStats(col(textCol))
    docs
      .withColumn("stats", st)
      .select(
        col("*"),
        col("stats.n_tokens").as("n_tokens"),
        col("stats.n_chars").as("n_chars_seen"),
        col("stats.lang_pred").as("lang_id"),
        TextAnalysis.fingerprintMd5(col(textCol)).as("fp"),
      )
      .drop("stats")
  }

  /** Streaming fuzzy-exact dedup: drop any document whose normalized
    * (case/punctuation/whitespace) fingerprint was already seen within the
    * watermark horizon — re-crawled pages with cosmetic edits never
    * reach the corpus. State is one fingerprint per surviving doc and
    * expires with the watermark (bounded on an infinite feed); the
    * within-horizon semantics match the batch `q_norm_dedup` collapse
    * exactly — both hash TextAnalysis.normalizeForDedup, one definition.
    *
    * `eventTimeCol` is the ingest timestamp the watermark rides on.
    */
  def dedupedDocs(
      docs: DataFrame,
      eventTimeCol: String = "ingest_time",
      watermark: String = "10 minutes",
      textCol: String = "text",
  ): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprintNormMd5(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
