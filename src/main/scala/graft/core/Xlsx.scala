package graft.core

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S10: direct .xlsx ingestion — the reference reads multi-sheet,
  * multi-row-header Excel with pandas+openpyxl (`modules/chemicalProbes
  * .py:122-129`, `CvdiGeneBurden.py:100-127`). An .xlsx is a zip of
  * well-specified XML parts (ECMA-376/OOXML), so the JDK alone reads it:
  * `java.util.zip.ZipFile` for the container, StAX for the sheet XML —
  * the same driver-side streaming-parse architecture as [[Xml]], and the
  * same rationale (curation/dimension workbooks are small; the 100 TB
  * side of every pipeline is parquet).
  *
  * Covered cell forms: shared strings (`t="s"` + xl/sharedStrings.xml,
  * including multi-run rich text), inline strings (`t="inlineStr"`),
  * formula-cached strings (`t="str"`), booleans (`t="b"` → TRUE/FALSE),
  * and raw numbers. All cells surface as strings (cast downstream,
  * exactly like the CSV readers); date serial numbers surface as their
  * raw numeric text. Local filesystem paths only (like the reference's
  * openpyxl read).
  */
object Xlsx {

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] =
    withZip(path) { zip => workbookSheets(zip).map(_._1) }

  /** One sheet as a dense row-major string grid: ragged rows are padded
    * with "" to the sheet's max width; blank/missing cells are "".
    */
  def sheetRows(path: String, sheet: String): Seq[Seq[String]] =
    withZip(path) { zip =>
      val target = workbookSheets(zip)
        .collectFirst { case (n, t) if n == sheet => t }
        .getOrElse(throw new IllegalArgumentException(
          s"sheet '$sheet' not in $path (has: ${workbookSheets(zip).map(_._1).mkString(", ")})"))
      val shared = sharedStrings(zip)
      val raw = parseSheet(zip, target, shared)
      val width = if (raw.isEmpty) 0 else raw.map(_.length).max
      raw.map(_.padTo(width, ""))
    }

  /** Sheet → all-string DataFrame with the SAME multi-row-header
    * semantics as [[Readers.csvMultiHeader]] (horizontal forward-fill for
    * merged cells, '_'-joined distinct parts) — one header contract for
    * delimited text and Excel.
    */
  def read(
      spark: SparkSession,
      path: String,
      sheet: String,
      headerRows: Int = 1,
  ): DataFrame = {
    require(headerRows >= 0, s"headerRows must be >= 0, got $headerRows")
    val rows = sheetRows(path, sheet)
    val names =
      if (headerRows == 0) (0 until rows.headOption.fold(0)(_.length)).map(i => s"_c$i")
      else Readers.multiHeaderNames(rows.take(headerRows).toList)
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val data = rows.drop(headerRows).map(r =>
      Row.fromSeq(names.indices.map(i => r.lift(i).filter(_.nonEmpty).orNull)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }

  // ------------------------------------------------------------------ //

  private def withZip[A](path: String)(f: ZipFile => A): A = {
    val zip = new ZipFile(path)
    try f(zip) finally zip.close()
  }

  private def secureFactory(): XMLInputFactory = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory
  }

  private def withPart[A](zip: ZipFile, name: String)(f: XMLStreamReader => A): A = {
    val entry = Option(zip.getEntry(name)).getOrElse(
      throw new IllegalArgumentException(s"not an xlsx: missing part $name"))
    val in = zip.getInputStream(entry)
    try {
      val reader = secureFactory().createXMLStreamReader(in)
      try f(reader) finally reader.close()
    } finally in.close()
  }

  /** (name, zip part path) per sheet, workbook order: workbook.xml gives
    * name → rId, workbook.xml.rels gives rId → worksheet part.
    */
  private def workbookSheets(zip: ZipFile): Seq[(String, String)] = {
    val rels = withPart(zip, "xl/_rels/workbook.xml.rels") { r =>
      val m = scala.collection.mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          m.put(attr(r, "Id"), attr(r, "Target"))
      }
      m.toMap
    }
    withPart(zip, "xl/workbook.xml") { r =>
      val sheets = Seq.newBuilder[(String, String)]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val rid = attr(r, "id") // r:id — StAX local name is "id"
          val target = rels.getOrElse(rid,
            throw new IllegalArgumentException(s"dangling sheet relationship $rid"))
          val part =
            if (target.startsWith("/")) target.stripPrefix("/")
            else s"xl/$target"
          sheets += ((attr(r, "name"), part))
        }
      }
      sheets.result()
    }
  }

  /** xl/sharedStrings.xml: one entry per <si>, concatenating its <t> runs
    * (rich-text strings split one logical cell across several runs).
    * Runs inside <rPh> blocks are phonetic hints (furigana), not cell
    * text — skipped, or annotated workbooks would read base+phonetic
    * concatenated.
    */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return IndexedSeq.empty
    withPart(zip, "xl/sharedStrings.xml") { r =>
      val out = IndexedSeq.newBuilder[String]
      val sb = new StringBuilder
      var inT = false
      var inRPh = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" => sb.clear()
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "rPh" => inRPh = true
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rPh" => inRPh = false
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" && !inRPh => inT = true
          case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" => inT = false
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" => out += sb.toString
          case _ =>
        }
      }
      out.result()
    }
  }

  /** Worksheet XML → ragged grid. Cell addresses (r="B3") place values;
    * gaps (Excel omits empty cells entirely) become "". ECMA-376 makes
    * the address attribute OPTIONAL — streaming writers omit it — so an
    * address-less cell falls back to sequential placement (one past the
    * previous cell in the row).
    */
  private def parseSheet(
      zip: ZipFile,
      part: String,
      shared: IndexedSeq[String],
  ): Seq[Array[String]] = withPart(zip, part) { r =>
    val rows = Seq.newBuilder[Array[String]]
    var cells: scala.collection.mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var nextCol = 0
    var cellType = ""
    var inV = false
    var inIsT = false
    val sb = new StringBuilder
    def flushCell(): Unit = if (cellCol >= 0) {
      val raw = sb.toString
      val v = cellType match {
        case "s" => if (raw.nonEmpty) shared(raw.trim.toInt) else ""
        case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
        case _ => raw // n (default), str, inlineStr all carry their text
      }
      cells += ((cellCol, v))
      nextCol = cellCol + 1
      cellCol = -1
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              cells = scala.collection.mutable.ArrayBuffer.empty
              nextCol = 0
            case "c" =>
              cellCol = Option(attrOrNull(r, "r")).map(colIndex).getOrElse(nextCol)
              cellType = Option(attrOrNull(r, "t")).getOrElse("")
              sb.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" if inIsT => inIsT = false
            case "c" => flushCell()
            case "row" =>
              val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
              val arr = Array.fill(width)("")
              cells.foreach { case (i, v) => arr(i) = v }
              rows += arr
            case _ =>
          }
        case _ =>
      }
    }
    rows.result()
  }

  /** "B3" → 0-based column 1 (row digits ignored). */
  private[core] def colIndex(ref: String): Int = {
    var acc = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    require(acc > 0, s"bad cell ref '$ref'")
    acc - 1
  }

  private def attr(r: XMLStreamReader, local: String): String = {
    val v = attrOrNull(r, local)
    require(v != null, s"missing attribute $local on ${r.getLocalName}")
    v
  }

  private def attrOrNull(r: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
