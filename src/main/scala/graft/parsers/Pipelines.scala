package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine-level pipeline registry — the Spark-native counterpart of
  * the reference's Snakemake DAG (`Snakefile:60-86`): ~25 independent
  * rules, one per parser, each `(inputs) => evidence DataFrame` ending in
  * the K1 sink.
  *
  * Parsers stay pure (DataFrames in → DataFrame out, injected by the
  * caller/test); this registry carries the wiring metadata: which module
  * each pipeline reproduces and the input tables it expects. Rules are
  * independent, so a driver can run them embarrassingly parallel exactly
  * like `snakemake --cores all` — or submit each as its own Spark job.
  */
object Pipelines {

  final case class Pipeline(
      name: String,
      referenceModule: String,
      inputs: Seq[String],
      run: (SparkSession, Map[String, DataFrame]) => DataFrame,
  )

  val all: Seq[Pipeline] = Seq(
    Pipeline("clingen", "modules/ClinGen.py", Seq("raw", "efoLut"),
      (_, in) => ClinGenParser(in("raw"), in("efoLut"))),
    Pipeline("slapenrich", "modules/SLAPEnrich.py", Seq("raw", "pathwayLut"),
      (_, in) => SLAPEnrichParser(in("raw"), in("pathwayLut"))),
    Pipeline("gene2phenotype", "modules/Gene2Phenotype.py", Seq("raw"),
      (_, in) => Gene2PhenotypeParser(in("raw"))),
    Pipeline("gene_burden", "modules/GeneBurden.py", Seq("azRaw", "azTraitLut", "curated"),
      (_, in) => GeneBurdenParser(Seq(
        GeneBurdenParser.azBranch(in("azRaw"), in("azTraitLut")),
        GeneBurdenParser.curatedBranch(in("curated"))))),
    Pipeline("panelapp", "modules/PanelApp.py", Seq("raw"),
      (_, in) => PanelAppParser(in("raw"))),
    Pipeline("essentiality", "modules/Essentiality.py", Seq("geneEffectWide", "modelLut"),
      (_, in) => EssentialityParser(in("geneEffectWide"), in("modelLut"))),
    Pipeline("impc", "modules/IMPC.py", Seq("diseaseModelSummary", "mouseGeneMap", "humanGeneMap"),
      (_, in) => ImpcParser(in("diseaseModelSummary"), in("mouseGeneMap"), in("humanGeneMap"))),
    Pipeline("encore", "partner_preview_scripts/encore_parser.py", Seq("wide"),
      (_, in) => EncoreParser(in("wide"))),
    Pipeline("cancer_biomarkers", "modules/cancerBiomarkers.py", Seq("raw"),
      (_, in) => CancerBiomarkersParser(in("raw"))),
    Pipeline("target_safety", "modules/TargetSafety.py", Seq("sources"),
      (_, in) => TargetSafetyParser(in.collect { case (k, v) if k.startsWith("source") => v }.toSeq)),
    Pipeline("baseline_expression", "modules/baseline_expression/", Seq("wide"),
      (_, in) => BaselineExpressionParser(in("wide"))),
    Pipeline("chembl", "modules/ChEMBL.py", Seq("evidence", "predictions"),
      (_, in) => ChemblParser(in("evidence"), in("predictions"))),
    Pipeline("orphanet", "modules/Orphanet.py", Seq("associations"),
      (_, in) => OrphanetParser(in("associations"))),
    Pipeline("intogen", "modules/IntOGen.py", Seq("raw", "cohorts"),
      (_, in) => IntOGenParser(in("raw"), in("cohorts"))),
    Pipeline("pharmacogenetics", "modules/Pharmacogenetics.py", Seq("raw", "phenotypeLut"),
      (_, in) => PharmacogeneticsParser(in("raw"), in("phenotypeLut"))),
    Pipeline("chemical_probes", "modules/chemicalProbes.py", Seq("raw"),
      (_, in) => ChemicalProbesParser(in("raw"))),
    Pipeline("crispr_brain", "modules/BrainCRISPR.py", Seq("raw", "diseaseLut"),
      (_, in) => BrainCrisprParser(in("raw"), in("diseaseLut"))),
    Pipeline("cvdi_gene_burden", "modules/CvdiGeneBurden.py", Seq("raw", "efoLut"),
      (_, in) => CvdiGeneBurdenParser(in("raw"), in("efoLut"))),
    Pipeline("project_score", "modules/ProjectScore.py", Seq("cellLines", "passportCellLines"),
      (_, in) => ProjectScoreParser(in("cellLines"), in("passportCellLines"))),
    Pipeline("tep", "modules/TEP.py", Seq("raw"),
      (_, in) => TepParser(in("raw"))),
    Pipeline("genebass", "modules/GenebassGeneBurden.py", Seq("raw"),
      (_, in) => GenebassParser(in("raw"))),
    Pipeline("validation_lab", "partner_preview_scripts/ValidationLab.py", Seq("raw", "biomarkerLut"),
      (_, in) => ValidationLabParser(in("raw"), in("biomarkerLut"))),
    Pipeline("sysbio", "modules/SystemsBiology.py", Seq("raw"),
      (_, in) => SystemsBiologyParser(in("raw"))),
    Pipeline("crispr_screens", "modules/crispr_screens.py", Seq("sources"),
      (_, in) => CrisprScreensParser(in.collect { case (k, v) if k.startsWith("source") => v }.toSeq)),
    Pipeline("progeny", "modules/PROGENY.py", Seq("raw", "diseaseLut", "pathwayLut"),
      (_, in) => ProgenyParser(in("raw"), in("diseaseLut"), in("pathwayLut"))),
    // Config fan-out (§2.12): replicate inputs keyed "rep*", optional
    // "controls"; single-study wiring — multi-study callers use
    // OtCrisprParser.apply directly.
    Pipeline("ot_crispr", "partner_preview_scripts/ot_crispr.py", Seq("rep1", "rep2", "controls"),
      (_, in) => OtCrisprParser(
        Seq(OtCrisprParser.StudyConfig("OTAR", 0.05)),
        Map("OTAR" -> in.keys.filter(_.startsWith("rep")).toSeq.sorted.map(in)),
        in.get("controls").map("OTAR" -> _).toMap)),
  )

  def byName: Map[String, Pipeline] = all.map(p => p.name -> p).toMap

  /** Run one pipeline and write its evidence with the K1 sink. */
  def runToFile(spark: SparkSession, name: String, inputs: Map[String, DataFrame], outFile: String): Unit =
    graft.core.Writers.writeJsonGzSingle(byName(name).run(spark, inputs), outFile)
}
