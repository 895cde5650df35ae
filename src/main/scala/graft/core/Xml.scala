package graft.core

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S11: XML ingestion (reference `modules/Orphanet.py:52-126` parses the
  * Orphanet product6 XML with ElementTree on the driver and hands rows to
  * `spark.createDataFrame`).
  *
  * Same architecture here — a streaming StAX parse on the driver feeding
  * `createDataFrame` — because the reference's XML inputs are single
  * smallish files (tens of MB). For sharded 100 TB XML use the DataSource
  * V2 twin, `graft.sources.XmlDirectorySource` (`format("graft-xml")`):
  * identical record semantics, one executor-side partition per file,
  * pushed-down column pruning. XmlSourceSpec pins the two readers equal.
  */
object Xml {

  /** Extract one row per `recordTag` element: each requested field is the
    * DIRECT text of the first descendant element with that local name —
    * text up to the element's first child, ElementTree `.text` semantics
    * (the reference reads `elem.find(name).text`). Capture therefore ends
    * at ANY child element start, not just requested ones, which keeps the
    * value independent of which other fields were requested — the DSv2
    * twin relies on that invariance for pushed-down column pruning. All
    * columns are strings (cast downstream, same as the reference).
    */
  def readRecords(
      spark: SparkSession,
      path: String,
      recordTag: String,
      fields: Seq[String],
  ): DataFrame = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val in = new java.io.FileInputStream(path)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val reader = factory.createXMLStreamReader(in)
      var inRecord = false
      var nest = 0 // recordTag elements nested INSIDE the open record
      var current: scala.collection.mutable.Map[String, String] = null
      var capture: String = null
      val sb = new StringBuilder
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = reader.getLocalName
            if (name == recordTag && !inRecord) {
              inRecord = true
              nest = 0
              current = scala.collection.mutable.Map.empty
            } else if (inRecord) {
              // A nested recordTag is a CHILD of the open record, not a
              // new record — outermost-record semantics, tracked by depth
              // so the record closes at its own matching end tag. The
              // DSv2 twin (XmlDirectorySource) applies the same rule;
              // XmlSourceSpec pins the two equal on nested input.
              if (name == recordTag) nest += 1
              // A child element ends the enclosing capture (.text rule):
              // commit what we have so the value never depends on whether
              // the child itself was requested.
              if (capture != null) {
                current.put(capture, sb.toString.trim)
                capture = null
              }
              if (fields.contains(name) && !current.contains(name)) {
                capture = name
                sb.clear()
              }
            }
          case XMLStreamConstants.CHARACTERS if capture != null =>
            sb.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val name = reader.getLocalName
            if (capture == name) {
              current.put(name, sb.toString.trim)
              capture = null
            }
            if (name == recordTag && inRecord) {
              if (nest > 0) nest -= 1
              else {
                rows += Row.fromSeq(fields.map(f => current.get(f).orNull))
                inRecord = false
              }
            }
          case _ =>
        }
      }
      reader.close()
    } finally in.close()
    val schema = StructType(fields.map(f => StructField(f, StringType, nullable = true)))
    spark.createDataFrame(new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava), schema)
  }
}
