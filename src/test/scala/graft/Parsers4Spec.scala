package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.parsers._

class Parsers4Spec extends SparkTestBase {
  import spark.implicits._

  test("ProjectScoreParser: right join + collect_set of cell-line structs") {
    val cellLines = Seq(("COAD", "SIDM1")).toDF("CANCER_TYPE", "CMP_ID")
    val passport = Seq(
      ("SIDM1", ("HT29", "large intestine")),
      ("SIDM2", ("HeLa", "cervix")),
    ).toDF("id", "diseaseCellLine")
    val out = ProjectScoreParser(cellLines, passport)
    assert(out.count() == 2) // coad + null cancerType (right-join keep)
    val coad = out.filter($"cancerType" === "coad").head()
    assert(coad.getAs[scala.collection.Seq[Row]]("diseaseCellLines").head.getString(0) == "HT29")
    assert(out.filter($"cancerType".isNull).count() == 1)
  }

  test("TepParser: url synthesis + multi-gene explode") {
    val raw = Seq(("SLC12A4/SLC12A6", "Neuro", "desc"))
      .toDF("Gene", "Therapeutic Area", "Description")
    val out = TepParser(raw)
    assert(out.count() == 2)
    val urls = out.select("url").distinct().as[String].collect()
    assert(urls.toSeq == Seq("https://www.thesgc.org/tep/slc12a4slc12a6"))
    assert(out.select("targetFromSourceId").as[String].collect().sorted.toSeq ==
      Seq("SLC12A4", "SLC12A6"))
  }

  test("GenebassParser: filter + motif + CI from beta±SE") {
    val raw = Seq(
      ("ENSG1", "T2D", 3e-9, -0.25, 0.04),
      ("ENSG2", "HTN", 1e-3, 0.10, 0.02),
    ).toDF("gene_id", "description", "Pvalue_Burden", "BETA_Burden", "SE_Burden")
    val out = GenebassParser(raw)
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[Int]("pValueExponent") == -9 && r.getAs[Double]("pValueMantissa") == 3.0)
    assert(r.getAs[Double]("betaConfidenceIntervalLower") == -0.3284)
    assert(r.getAs[Double]("betaConfidenceIntervalUpper") == -0.1716)
  }

  test("ValidationLabParser: assay melt + F6 biomarker LUT + nesting") {
    val raw = Seq(("HT29", "BRAF", "1", "0"))
      .toDF("cellLineName", "targetFromSourceId", "MS_status", "KRAS_status")
    val lut = Seq(
      ("MS_status", "1", "MSI", "microsatellite instable"),
    ).toDF("biomarkerName", "biomarkerValue", "mappedName", "mappedDescription")
    val out = ValidationLabParser(raw, lut)
    assert(out.count() == 1)
    val bms = out.head().getAs[scala.collection.Seq[Row]]("biomarkerList")
    assert(bms.length == 1, "KRAS '0' (not applied) dropped")
    assert(bms.head.getAs[String]("name") == "MSI")
  }

  test("SystemsBiologyParser: per-study min-max renormalization to [0.5,1]") {
    val raw = Seq(
      ("S1", "G1", "D", 10.0), ("S1", "G2", "D", 20.0), ("S1", "G3", "D", 15.0),
      ("S2", "G1", "D", 7.0),
    ).toDF("studyId", "targetFromSourceId", "diseaseFromSource", "score")
    val out = SystemsBiologyParser(raw)
    val m = out.select("studyId", "targetFromSourceId", "resourceScore")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("S1", "G1")) == 0.5 && m(("S1", "G2")) == 1.0 && m(("S1", "G3")) == 0.75)
    assert(m(("S2", "G1")) == 0.5, "degenerate range maps to lo")
  }

  test("TypedEvidence: Dataset[T] pipeline with typed reduceGroups") {
    implicit val sp = spark
    import graft.parsers.TypedEvidence._
    val rows: org.apache.spark.sql.Dataset[BurdenRow] = Seq(
      BurdenRow("G1", "trait A", 3e-9, Some(0.5)),
      BurdenRow("G1", "trait B", 1e-12, None),
      BurdenRow("G2", "trait C", 0.01, Some(0.1)), // filtered
    ).toDS()
    val ev = toEvidence(rows)
    assert(ev.count() == 2)
    val g1 = ev.filter($"diseaseFromSource" === "trait A").head()
    assert(g1.pValueExponent == -9 && g1.pValueMantissa == 3.0)
    assert(g1.beta.contains(0.5))
    val best = bestPerTarget(ev).collect()
    assert(best.length == 1 && best.head.diseaseFromSource == "trait B",
      "min-p evidence wins per target")
  }

  test("CrisprScreensParser: U1 fan-out shell") {
    val a = Seq(("G1", 0.5)).toDF("targetFromSourceId", "resourceScore")
    val b = Seq(("G2", "note")).toDF("targetFromSourceId", "comment")
    val out = CrisprScreensParser(Seq(a, b))
    assert(out.count() == 2)
    assert(out.columns.sorted.toSeq == Seq("comment", "resourceScore", "targetFromSourceId"))
  }

  test("ProgenyParser: LUT joins, target split-explode, conditional EFO") {
    val raw = Seq(
      ("BRCA", "EGFR", "G1, G2", 1e-5),   // mapped disease, 2 targets
      ("LUAD", "MAPK", "G3", 2e-4),       // unmapped disease (left join keeps)
      ("COAD", "Unknown", "G4", 3e-4),    // pathway not in LUT (inner join drops)
    ).toDF("Cancer_type", "Pathway", "target", "P.Value")
    val diseaseLut = Seq(("BRCA", "EFO_0000305"), ("COAD", "EFO_0005842"))
      .toDF("Cancer_type", "EFO_id")
    val pathwayLut = Seq(
      ("EGFR", "R-HSA-177929", "Signaling by EGFR"),
      ("MAPK", "R-HSA-5683057", "MAPK family signaling"),
    ).toDF("Pathway", "reactomeId", "description")
    val out = ProgenyParser(raw, diseaseLut, pathwayLut)
    assert(out.count() == 3) // 2 exploded targets + 1 single; COAD row dropped
    val g1 = out.filter($"targetFromSourceId" === "G1").head()
    assert(g1.getAs[String]("diseaseFromSourceMappedId") == "EFO_0000305")
    assert(g1.getSeq[Row](g1.fieldIndex("pathways")).head.getAs[String]("id") == "R-HSA-177929")
    assert(g1.getSeq[String](g1.fieldIndex("literature")) == Seq("29295995"))
    assert(out.filter($"targetFromSourceId" === "G3").head().isNullAt(
      out.columns.indexOf("diseaseFromSourceMappedId")))
  }

  test("Pipelines registry covers progeny and ot_crispr wiring") {
    assert(Pipelines.byName.contains("progeny") && Pipelines.byName.contains("ot_crispr"))
    val rep1 = Seq(("G1", 0.01, 1.5), ("G2", 0.2, -0.5), ("CTRL", 0.01, 2.0))
      .toDF("targetFromSourceId", "resourceScore", "log2FoldChangeValue")
    val rep2 = Seq(("G1", 0.02, 1.1), ("CTRL", 0.02, 2.0))
      .toDF("targetFromSourceId", "resourceScore", "log2FoldChangeValue")
    val controls = Seq(Tuple1("CTRL")).toDF("targetFromSourceId")
    val out = Pipelines.byName("ot_crispr").run(spark,
      Map("rep1" -> rep1, "rep2" -> rep2, "controls" -> controls))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("targetFromSourceId") == "G1",
      "G2 fails the all-replicates rule; CTRL is anti-joined out")
  }
}
