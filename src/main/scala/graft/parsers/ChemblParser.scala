package graft.parsers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Cleanup, Qc, Union}

/** ChEMBL stopped-trials parser (reference `modules/ChEMBL.py`):
  * the R8 literal-map column (`map_from_entries`, `:95-105`) applied
  * inside an R6 higher-order `transform` (`:111`), NCT-id extraction as
  * last-URL-segment (`common/evidence.py:315` motif), left-join of
  * predictions, split/union-rejoin of stopped vs running trials, and the
  * reference's hard QC assertions (`:59-63,69`: stopped fraction 8–15%,
  * union preserves the row count).
  */
object ChemblParser {

  /** Reference `CATEGORIESMAPPINGS` (`ChEMBL.py:80-103`), abridged to the
    * shape that matters: raw subclass tag → pretty label.
    */
  val categoryMap: Map[String, String] = Map(
    "Business_Administrative" -> "Business or administrative",
    "Logistics_Resources" -> "Logistics or resources",
    "Covid19" -> "COVID-19",
    "Safety_Sideeffects" -> "Safety or side effects",
    "Negative" -> "Negative",
    "Study_Design" -> "Study design",
    "Invalid_Reason" -> "Invalid reason",
    "Success" -> "Success",
    "Uncategorised" -> "Uncategorised",
  )

  /** `prettify_subclasses` (`ChEMBL.py:76-114`): map each subclass tag
    * through the literal map, in place, inside the array.
    */
  def prettifySubclasses(predictions: DataFrame): DataFrame = {
    val mapping = map(categoryMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    predictions
      .select(col("nct_id"), col("subclasses"))
      .withColumn("studyStopReasonCategories",
        transform(col("subclasses"), x => element_at(mapping, x)))
      .drop("subclasses")
      .distinct()
  }

  /** @param evidence    ChEMBL evidence rows with `studyStopReason` and
    *                    `urls` array<struct<niceName,url>>
    * @param predictions (nct_id, subclasses array) classification output
    * @param checkFractions reference QC gates (disable for tiny fixtures)
    */
  def apply(evidenceIn: DataFrame, predictions: DataFrame, checkFractions: Boolean = false): DataFrame = {
    // Multi-consumer point (§2.12): the evidence subtree feeds the QC
    // counts, the stopped branch, and the running branch — persist so the
    // scan+decode runs once (reference persists at the same spot,
    // `ChEMBL.py:32`).
    val evidence = if (checkFractions) evidenceIn.persist() else evidenceIn
    val pretty = prettifySubclasses(predictions)
    val stopped = evidence
      .filter(col("studyStopReason").isNotNull)
      .select(col("*"), explode(col("urls.url")).as("nct_url"))
      .withColumn("nct_id", Cleanup.lastSegment(col("nct_url")))
      .drop("nct_url")
      .join(pretty, Seq("nct_id"), "left")
      .drop("nct_id")
      .distinct()
    if (checkFractions)
      Qc.assertFractionBetween(evidence, col("studyStopReason").isNotNull, 0.08, 0.15,
        "stopped-trial share")
    val enriched = Union.unionByNameAll(
      Seq(evidence.filter(col("studyStopReason").isNull), stopped),
      allowMissingColumns = true)
    if (checkFractions) {
      val n = evidence.count() // one count, reused for both bounds
      Qc.assertCountBetween(enriched, n, n, "union-preserved rows")
    }
    enriched
  }
}
