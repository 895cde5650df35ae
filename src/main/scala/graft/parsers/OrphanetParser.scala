package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Xml

/** Orphanet gene-disease parser (reference `modules/Orphanet.py`):
  * S11 XML ingestion (`:52-126`, ElementTree on the driver →
  * createDataFrame; here the streaming StAX reader), the R8
  * `create_map`-based status lookup (`:134-147`), and the isin-blacklist
  * filter (`:138`).
  */
object OrphanetParser {

  /** Association statuses allowed through (reference blacklists the
    * rest via isin, `Orphanet.py:138`).
    */
  val validStatuses: Seq[String] = Seq("Assessed", "Validated")

  /** Disorder-gene association type → variant functional consequence
    * (shape of `Orphanet.py:134-147` create_map lookup).
    */
  val consequenceMap: Map[String, String] = Map(
    "Disease-causing germline mutation(s) in" -> "SO_0002054",
    "Disease-causing germline mutation(s) (loss of function) in" -> "SO_0002054",
    "Disease-causing germline mutation(s) (gain of function) in" -> "SO_0002053",
  )

  def fromXml(spark: SparkSession, path: String): DataFrame =
    Xml.readRecords(spark, path, "DisorderGeneAssociation",
      Seq("OrphaCode", "DisorderName", "GeneSymbol", "AssociationType", "AssociationStatus"))

  def apply(associations: DataFrame): DataFrame = {
    val cmap = map(consequenceMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    associations
      .filter(col("AssociationStatus").isin(validStatuses: _*))
      .select(
        lit("orphanet").as("datasourceId"),
        lit("genetic_association").as("datatypeId"),
        col("GeneSymbol").as("targetFromSourceId"),
        col("DisorderName").as("diseaseFromSource"),
        concat(lit("Orphanet_"), col("OrphaCode")).as("diseaseFromSourceId"),
        element_at(cmap, col("AssociationType")).as("variantFunctionalConsequenceId"),
      )
      .distinct()
  }
}
