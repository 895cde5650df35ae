package graft.parsers

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` variant of an evidence pipeline (SURVEY.md §1.3:
  * "`Dataset[T]` is optional sugar; nothing in the reference requires
  * typed rows" — provided here as the compile-time-checked API surface
  * for consumers who want field-name safety over raw DataFrames).
  *
  * Note the boundary discipline: transforms stay in the Column
  * expression world (codegen'd) even on a Dataset; typed lambdas
  * (`map`/`filter` on case classes) would deserialize every row and are
  * used only where per-row logic genuinely needs the object form.
  */
object TypedEvidence {

  final case class BurdenRow(
      gene: String,
      trait_name: String,
      p_value: Double,
      beta: Option[Double],
  )

  final case class Evidence(
      datasourceId: String,
      targetFromSourceId: String,
      diseaseFromSource: String,
      resourceScore: Double,
      pValueExponent: Int,
      pValueMantissa: Double,
      beta: Option[Double],
  )

  /** Typed end-to-end: Dataset[BurdenRow] → Dataset[Evidence] with the
    * p-value motif, keeping every transform as a Column expression.
    */
  def toEvidence(rows: Dataset[BurdenRow], pCutoff: Double = 1e-7)(implicit spark: SparkSession): Dataset[Evidence] = {
    import spark.implicits._
    rows
      .filter(col("p_value") <= pCutoff)
      .select(
        lit("gene_burden").as("datasourceId"),
        col("gene").as("targetFromSourceId"),
        col("trait_name").as("diseaseFromSource"),
        col("p_value").as("resourceScore"),
        graft.core.Stats.pValueExponent(col("p_value")).as("pValueExponent"),
        graft.core.Stats.pValueMantissa(col("p_value")).as("pValueMantissa"),
        col("beta"),
      )
      .as[Evidence]
  }

  /** Typed aggregation example: best (min-p) evidence per target via
    * groupByKey + reduceGroups — the KeyValueGroupedDataset API.
    */
  def bestPerTarget(ev: Dataset[Evidence])(implicit spark: SparkSession): Dataset[Evidence] = {
    import spark.implicits._
    ev.groupByKey(_.targetFromSourceId)
      .reduceGroups((a, b) => if (a.resourceScore <= b.resourceScore) a else b)
      .map(_._2)
  }
}
