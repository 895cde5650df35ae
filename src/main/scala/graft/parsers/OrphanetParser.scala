package graft.parsers

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Orphanet gene-disease parser (reference `modules/Orphanet.py`):
  * S11 XML ingestion of the product6 dump (`:52-126` — ElementTree on the
  * driver → createDataFrame; here a streaming StAX state machine faithful
  * to the real nesting:
  *
  * Disorder > {Name, OrphaCode, DisorderType>Name,
  *   DisorderGeneAssociationList > DisorderGeneAssociation >
  *     {SourceOfValidation, DisorderGeneAssociationType>Name,
  *      DisorderGeneAssociationStatus>Name,
  *      Gene > {Name, ExternalReferenceList>…>Reference}}}
  *
  * ), then the R8 map-based consequence lookup (`:134-147`) and the
  * status filter (`:138`).
  */
object OrphanetParser {

  val outputSchema: StructType = StructType(Seq(
    StructField("diseaseFromSource", StringType),
    StructField("diseaseFromSourceId", StringType),
    StructField("type", StringType),
    StructField("literature", ArrayType(StringType), nullable = true),
    StructField("associationType", StringType),
    StructField("confidence", StringType),
    StructField("targetFromSource", StringType),
    StructField("targetFromSourceId", StringType),
  ))

  /** One row per DisorderGeneAssociation, reproducing
    * `parse_orphanet_xml` (`Orphanet.py:52-126`) field for field.
    */
  def readProduct6(spark: SparkSession, path: String): DataFrame = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val in = new java.io.FileInputStream(path)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val r = factory.createXMLStreamReader(in)
      val stack = scala.collection.mutable.Stack.empty[String]
      val sb = new StringBuilder
      var capturing = false

      // Disorder-level state
      var disorderName: String = null
      var orphaCode: String = null
      var disorderType: String = null
      // Association-level state
      var sourceOfValidation: String = null
      var assocType: String = null
      var assocStatus: String = null
      var geneName: String = null
      var ensemblId: String = null

      def path2: String = if (stack.size >= 2) stack(1) + "/" + stack(0) else stack.headOption.getOrElse("")

      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            stack.push(r.getLocalName)
            val p = path2
            capturing = p match {
              case "Disorder/Name" | "Disorder/OrphaCode" | "DisorderType/Name" |
                   "DisorderGeneAssociation/SourceOfValidation" |
                   "DisorderGeneAssociationType/Name" | "DisorderGeneAssociationStatus/Name" |
                   "Gene/Name" | "ExternalReference/Reference" => true
              case _ => false
            }
            if (capturing) sb.clear()
            if (r.getLocalName == "DisorderGeneAssociation") {
              sourceOfValidation = null; assocType = null; assocStatus = null
              geneName = null; ensemblId = null
            } else if (r.getLocalName == "Disorder") {
              disorderName = null; orphaCode = null; disorderType = null
            }
          case XMLStreamConstants.CHARACTERS if capturing =>
            sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (capturing) {
              val text = sb.toString.trim
              path2 match {
                case "Disorder/Name" => disorderName = text
                case "Disorder/OrphaCode" => orphaCode = text
                case "DisorderType/Name" => disorderType = text
                case "DisorderGeneAssociation/SourceOfValidation" => sourceOfValidation = text
                case "DisorderGeneAssociationType/Name" => assocType = text
                case "DisorderGeneAssociationStatus/Name" => assocStatus = text
                case "Gene/Name" => if (geneName == null) geneName = text
                case "ExternalReference/Reference" =>
                  if (text.contains("ENSG") && ensemblId == null) ensemblId = text
                case _ =>
              }
              capturing = false
            }
            if (name == "DisorderGeneAssociation") {
              // literature: '_'-separated SourceOfValidation, [PMID]-tagged
              // entries only, tag stripped (Orphanet.py:93-99).
              val literature = Option(sourceOfValidation).map {
                _.split("_").toSeq
                  .filter(_.contains("[PMID]"))
                  .map(_.replace("[PMID]", "").trim)
              }.filter(_.nonEmpty).orNull
              rows += Row(
                disorderName,
                if (orphaCode != null) "Orphanet_" + orphaCode else null,
                disorderType,
                literature,
                assocType,
                assocStatus,
                geneName,
                ensemblId,
              )
            }
            stack.pop()
          case _ =>
        }
      }
      r.close()
    } finally in.close()
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      outputSchema)
  }

  /** Association statuses allowed through (`Orphanet.py:138` blacklist
    * inverse).
    */
  val validStatuses: Seq[String] = Seq("Assessed", "Validated")

  /** Association type → variant functional consequence
    * (`Orphanet.py:134-147` create_map).
    */
  val consequenceMap: Map[String, String] = Map(
    "Disease-causing germline mutation(s) in" -> "SO_0002054",
    "Disease-causing germline mutation(s) (loss of function) in" -> "SO_0002054",
    "Disease-causing germline mutation(s) (gain of function) in" -> "SO_0002053",
  )

  def apply(associations: DataFrame): DataFrame = {
    val cmap = map(consequenceMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    associations
      .filter(col("confidence").isin(validStatuses: _*))
      .select(
        lit("orphanet").as("datasourceId"),
        lit("genetic_association").as("datatypeId"),
        coalesce(col("targetFromSourceId"), col("targetFromSource")).as("targetFromSourceId"),
        col("diseaseFromSource"),
        col("diseaseFromSourceId"),
        col("literature"),
        element_at(cmap, col("associationType")).as("variantFunctionalConsequenceId"),
      )
      .distinct()
  }
}
