package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for SHARDED XML corpora — the scale path
  * `core/Xml.scala` documents but (until now) deferred: that reader
  * StAX-parses a single file on the driver (right for the reference's
  * tens-of-MB Orphanet inputs); this source plans ONE InputPartition PER
  * FILE and parses on the executors, so a directory of thousands of XML
  * shards scans with full cluster parallelism and O(1) memory per task
  * (the record pull below never materializes a file).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-xml")
  *     .option("recordTag", "Disorder")
  *     .option("fields", "Name,OrphaCode")   // omit -> inferred
  *     .load("/data/xml-shards")
  * }}}
  *
  * Semantics match `Xml.readRecords` exactly (one row per `recordTag`
  * element; each field = trimmed DIRECT text of the FIRST descendant
  * with that local name — text before its first child, ElementTree
  * `.text` semantics; all columns string): XmlSourceSpec pins multi-file
  * reads to the union of per-file driver reads, including a nested-field
  * case under pruning. Schema inference reads only the first record of
  * the lexicographically first file. Column pruning is pushed down: a
  * 2-column projection captures 2 fields per record, not the full
  * schema — and because capture ends at ANY child element (not just
  * requested ones), pruning never changes a surviving column's value.
  * Paths resolve through the session's Hadoop configuration (shipped to
  * executors via SerializableConfiguration), so `spark.hadoop.fs.*`
  * settings — S3 credentials, fs.defaultFS — apply the same as for
  * built-in sources.
  */
class XmlDirectorySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xml"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XmlDirectorySource.schemaFor(options)

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XmlTable(schema, new CaseInsensitiveStringMap(properties))
}

object XmlDirectorySource {
  /** Driver-side Hadoop conf: the active session's (so `spark.hadoop.*`
    * options — object-store credentials, fs.defaultFS — apply), falling
    * back to defaults only outside a session (unit construction).
    */
  private[sources] def driverHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private[sources] def recordTag(options: CaseInsensitiveStringMap): String = {
    val tag = options.get("recordTag")
    require(tag != null && tag.nonEmpty, "graft-xml requires option 'recordTag'")
    tag
  }

  /** The shard list: each root from `path` (single-arg load) or `paths`
    * (multi-arg load(dir1, dir2, ...) — Spark encodes them as a JSON
    * array option) may be a directory — every regular `*.xml` child,
    * sorted for deterministic partition order — or a single file. Roots
    * keep the caller's order; children sort within each root.
    */
  private[sources] def listShards(options: CaseInsensitiveStringMap): Seq[String] = {
    val roots: Seq[String] = Option(options.get("paths")).filter(_.nonEmpty) match {
      case Some(js) =>
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(js, classOf[Array[String]]).toSeq
      case None =>
        val raw = options.get("path")
        require(raw != null && raw.nonEmpty, "graft-xml requires a load path")
        Seq(raw)
    }
    roots.flatMap { root =>
      val p = new Path(root)
      val fs = p.getFileSystem(driverHadoopConf())
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".xml"))
          .map(_.getPath.toString).sorted
      else Seq(p.toString)
    }
  }

  private[sources] def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    val fields: Seq[String] = Option(options.get("fields")) match {
      case Some(f) if f.nonEmpty => f.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case _ => inferFields(options)
    }
    StructType(fields.map(StructField(_, StringType, nullable = true)))
  }

  /** Infer = distinct child-element local names of the FIRST record in
    * the first shard, in document order. One bounded driver-side parse.
    */
  private def inferFields(options: CaseInsensitiveStringMap): Seq[String] = {
    val tag = recordTag(options)
    val first = listShards(options).headOption.getOrElse(
      throw new IllegalArgumentException("graft-xml: no .xml files to infer a schema from"))
    val p = new Path(first)
    val in = p.getFileSystem(driverHadoopConf()).open(p)
    try {
      val reader = XmlPartitionReader.newReader(in)
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      var inRecord = false
      var depth = 0
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = reader.getLocalName
            if (name == tag && !inRecord) { inRecord = true; depth = 0 }
            else if (inRecord) { depth += 1; if (depth == 1) seen += name }
          case XMLStreamConstants.END_ELEMENT =>
            if (inRecord) {
              if (reader.getLocalName == tag && depth == 0) {
                reader.close()
                return seen.toSeq
              }
              depth -= 1
            }
          case _ =>
        }
      }
      reader.close()
      seen.toSeq
    } finally in.close()
  }
}

private[sources] class XmlTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-xml:${Option(options.get("path")).getOrElse(options.get("paths"))}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new XmlScanBuilder(tableSchema, options)
}

/** ScanBuilder + Scan + Batch in one: the only pushdown state is the
  * pruned column set.
  */
private[sources] class XmlScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
  private var pruned: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Preserve our column order; an empty requirement (count(*)) keeps
    // zero fields — the reader still emits one row per record.
    pruned = StructType(full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = this
  override def readSchema(): StructType = pruned
  override def description(): String = s"graft-xml[${pruned.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    XmlDirectorySource.listShards(options).map(XmlShard(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    // Capture the session Hadoop conf HERE (driver side) and ship it in
    // the factory — executors have no active session to read it from.
    new XmlReaderFactory(
      XmlDirectorySource.recordTag(options),
      pruned.fieldNames.toSeq,
      new org.apache.spark.util.SerializableConfiguration(XmlDirectorySource.driverHadoopConf()))
}

private[sources] case class XmlShard(path: String) extends InputPartition

private[sources] class XmlReaderFactory(
    recordTag: String,
    fields: Seq[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new XmlPartitionReader(partition.asInstanceOf[XmlShard].path, recordTag, fields, conf.value)
}

private[sources] object XmlPartitionReader {
  /** Hardened StAX factory — same entity/DTD lockdown as core.Xml. */
  def newReader(in: java.io.InputStream): XMLStreamReader = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.createXMLStreamReader(in)
  }
}

/** Pull-based record reader: `next()` advances the StAX stream to the
  * next complete `recordTag` element and materializes ONE row — memory
  * per task is one record, independent of shard size. Field semantics
  * mirror `core.Xml.readRecords` (first descendant wins, text trimmed).
  */
private[sources] class XmlPartitionReader(
    path: String,
    recordTag: String,
    fields: Seq[String],
    hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(path)
    p.getFileSystem(hadoopConf).open(p)
  }
  private val reader = XmlPartitionReader.newReader(in)
  private val idx = fields.zipWithIndex.toMap
  private var row: InternalRow = _

  override def next(): Boolean = {
    var current: scala.collection.mutable.Map[String, String] = null
    var capture: String = null
    val sb = new StringBuilder
    var inRecord = false
    var nest = 0 // recordTag elements nested INSIDE the open record
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val name = reader.getLocalName
          if (name == recordTag && !inRecord) {
            inRecord = true
            nest = 0
            current = scala.collection.mutable.Map.empty
          } else if (inRecord) {
            // A nested recordTag is a CHILD of the open record, not a new
            // record — outermost-record semantics, same depth rule as
            // core.Xml.readRecords (XmlSourceSpec pins the parity).
            if (name == recordTag) nest += 1
            // Any child element ends the enclosing capture (ElementTree
            // `.text` rule, mirrored in core.Xml.readRecords). Committing
            // here — not only at requested-field starts — is what makes a
            // pruned read return byte-identical values to a full read when
            // one requested field nests inside another.
            if (capture != null) {
              current.put(capture, sb.toString.trim)
              capture = null
            }
            if (idx.contains(name) && !current.contains(name)) {
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
              row = InternalRow.fromSeq(fields.map(f =>
                current.get(f).map(UTF8String.fromString).orNull))
              return true
            }
          }
        case _ =>
      }
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit = {
    reader.close()
    in.close()
  }
}
