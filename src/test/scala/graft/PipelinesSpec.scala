package graft

import org.apache.spark.sql.functions._
import graft.parsers.Pipelines
import graft.streaming.{EventsStream, EvidenceSink}

class PipelinesSpec extends SparkTestBase {
  import spark.implicits._

  test("registry covers 26 pipelines with unique names and reference citations") {
    assert(Pipelines.all.size == 26)
    assert(Pipelines.byName.size == 26, "duplicate pipeline names")
    assert(Pipelines.all.forall(_.referenceModule.nonEmpty))
  }

  test("runToFile executes a pipeline end-to-end through the K1 sink") {
    val dir = tmpDir("pipe")
    val raw = Seq(("SLC12A4/SLC12A6", "Neuro", "d")).toDF("Gene", "Therapeutic Area", "Description")
    Pipelines.runToFile(spark, "tep", Map("raw" -> raw), s"$dir/tep.json.gz")
    val back = spark.read.json(s"$dir/tep.json.gz")
    assert(back.count() == 2)
    assert(back.columns.contains("targetFromSourceId"))
  }

  test("evidence contract validates a full parser pipeline output at the K1 sink") {
    val dir = tmpDir("pipe_contract")
    val raw = Seq(("SLC12A4/SLC12A6", "Neuro", "d"), ("BRD4", "Oncology", "e"))
      .toDF("Gene", "Therapeutic Area", "Description")
    val ev = Pipelines.byName("tep").run(spark, Map("raw" -> raw))
    val contract = graft.core.Qc.EvidenceContract(
      required = Seq("targetFromSourceId", "url", "therapeuticArea"),
      patterns = Map("url" -> "^https://www\\.thesgc\\.org/tep/[a-z0-9]+$"))
    graft.core.Writers.writeJsonGzSingle(ev, s"$dir/tep.json.gz", Some(contract))
    assert(spark.read.json(s"$dir/tep.json.gz").count() == 3)
    // A gene symbol with an illegal URL character violates the pattern rule.
    val bad = Seq(("AB CD", "X", "y")).toDF("Gene", "Therapeutic Area", "Description")
    val ex = intercept[graft.core.Qc.QcException](
      graft.core.Writers.writeJsonGzSingle(
        Pipelines.byName("tep").run(spark, Map("raw" -> bad)), s"$dir/bad.json.gz", Some(contract)))
    assert(ex.getMessage.contains("pattern:url=1"))
  }

  // Deterministic fixtures shaped like the real gene-burden inputs —
  // a known significant slice under each filter, plus edge rows (zero
  // p-values, unparseable CI text). Shared by the count-window and
  // evidence-contract tests below.
  private def azFixture = {
    val azRaw = spark.range(0, 200000).select(
      concat(lit("ENSG"), format_string("%06d", $"id" % 20000)).as("Gene"),
      concat(lit("trait"), ($"id" % 500).cast("string")).as("diseaseFromSource"),
      when($"id" % 2 === 0, "Quantitative").otherwise("Binary").as("Type"),
      (($"id" % 100) / lit(50.0) - 1.0).as("beta"),
      exp(($"id" % 100) / lit(100.0)).as("oddsRatio"),
      when($"id" >= 199980, lit(0.0))
        .when($"id" < 29000, lit(1e-9) * (($"id" % 97) + 1))
        .otherwise(lit(1e-4) + ($"id" % 1000) * lit(1e-7)).as("pValue"))
    val azLut = Seq(("trait0", "EFO:0000001"), ("trait1", "EFO:0000002"))
      .toDF("diseaseFromSource", "diseaseFromSourceMappedId")
    (azRaw, azLut)
  }

  private def genebassFixture =
    spark.range(0, 120000).select(
      concat(lit("ENSG"), format_string("%06d", $"id" % 15000)).as("gene_id"),
      concat(lit("phenotype "), ($"id" % 800).cast("string")).as("description"),
      when($"id" < 9100, lit(1e-8) * (($"id" % 50) + 1))
        .otherwise(lit(1e-3) + ($"id" % 100) * lit(1e-6)).as("Pvalue_Burden"),
      (($"id" % 60) / lit(30.0) - 1.0).as("BETA_Burden"),
      lit(0.01).as("SE_Burden"))

  private def cvdiFixture = {
    val cvdiRaw = spark.range(0, 30000).select(
      concat(lit("GENE"), ($"id" % 3000).cast("string")).as("gene"),
      concat(lit("pheno"), ($"id" % 200).cast("string")).as("phenotype"),
      when($"id" % 2 === 0, "LOF").otherwise("missense").as("mask"),
      when($"id" % 3 === 0, lit("NA")).otherwise(lit("1.25 (1.10-1.42)")).as("orCi"),
      when($"id" < 1550, lit(1e-7) * (($"id" % 30) + 1))
        .otherwise(lit(0.5)).as("pValue"),
      when($"id" % 2 === 0, lit(5e-6)).otherwise(lit(4e-6)).as("pCutoff"))
    val cvdiLut = Seq(("pheno0", "EFO:0000100")).toDF("diseaseFromSource", "diseaseFromSourceMappedId")
    (cvdiRaw, cvdiLut)
  }

  test("AZ / Genebass / CVDI pipelines land inside the reference's hard count windows") {
    import graft.core.Qc
    // The reference asserts its output volumes as hard QC gates
    // (BASELINE.md: AzGeneBurden.py:126-132 28-30k, GenebassGeneBurden
    // .py:64-68 8-10k, CvdiGeneBurden.py:66-73 1.5-1.6k).

    // AZ PheWAS: 29,000 sub-cutoff rows + 20 zero-p rows that the global
    // min/2 repair pulls under the cutoff -> 29,020 expected.
    val (azRaw, azLut) = azFixture
    val az = graft.parsers.GeneBurdenParser.azBranch(azRaw, azLut)
    assert(Qc.assertCountBetween(az, 28000, 30000, "AZ evidence") == 29020L)

    // Genebass: 9,100 rows under the 6.7e-7 cutoff.
    val gb = graft.parsers.GenebassParser(genebassFixture)
    assert(Qc.assertCountBetween(gb, 8000, 10000, "Genebass evidence") == 9100L)

    // CVDI: per-mask FDR cutoffs ride a pCutoff column; 1,550 rows pass,
    // a third of them with unparseable CI text (nulls, not crashes).
    val (cvdiRaw, cvdiLut) = cvdiFixture
    val cvdi = graft.parsers.CvdiGeneBurdenParser(cvdiRaw, cvdiLut)
    assert(Qc.assertCountBetween(cvdi, 1500, 1600, "CVDI evidence") == 1550L)

    // The gate is a real gate: an out-of-window output throws.
    val ex = intercept[Qc.QcException](
      Qc.assertCountBetween(gb.limit(100), 8000, 10000, "Genebass evidence"))
    assert(ex.getMessage.contains("outside expected"))
  }

  test("evidence contracts hold on the three full gene-burden parser outputs") {
    import graft.core.Qc
    // The reference validates every evidence file against a JSON Schema
    // before accepting it (Snakefile:110,130,154). Same gate here, on
    // REAL parser output (not planted rows): required fields + enum'd
    // datasource/datatype/project + ID-shape patterns, one aggregate
    // pass per output via Qc.validateEvidence.
    val burdenCore = Qc.EvidenceContract(
      required = Seq("datasourceId", "datatypeId", "projectId", "targetFromSourceId",
        "diseaseFromSource", "resourceScore", "pValueExponent", "pValueMantissa"),
      enums = Map(
        "datasourceId" -> Seq("gene_burden"),
        "datatypeId" -> Seq("genetic_association")))

    val (azRaw, azLut) = azFixture
    val az = graft.parsers.GeneBurdenParser.azBranch(azRaw, azLut)
    val azCounts = Qc.validateEvidence(az, burdenCore.copy(
      enums = burdenCore.enums + ("projectId" -> Seq("AstraZeneca PheWAS Portal")),
      patterns = Map(
        "targetFromSourceId" -> "^ENSG\\d{6}$",
        "diseaseFromSourceMappedId" -> "^EFO:\\d{7}$")))
    assert(azCounts.values.forall(_ == 0L) && azCounts.size == 13,
      s"8 required + 3 enum + 2 pattern rules, all zero: $azCounts")

    val gb = graft.parsers.GenebassParser(genebassFixture)
    Qc.validateEvidence(gb, burdenCore.copy(
      required = burdenCore.required ++
        Seq("beta", "betaConfidenceIntervalLower", "betaConfidenceIntervalUpper"),
      enums = burdenCore.enums + ("projectId" -> Seq("Genebass")),
      patterns = Map("targetFromSourceId" -> "^ENSG\\d{6}$")))

    val (cvdiRaw, cvdiLut) = cvdiFixture
    val cvdi = graft.parsers.CvdiGeneBurdenParser(cvdiRaw, cvdiLut)
    // oddsRatio / CI columns stay OUT of required: a third of the
    // fixture's orCi cells are unparseable "NA" by design and must
    // surface as nulls, not violations.
    Qc.validateEvidence(cvdi, burdenCore.copy(
      enums = burdenCore.enums + ("projectId" -> Seq("CVDI Human Disease Portal")),
      patterns = Map("targetFromSourceId" -> "^GENE\\d+$")))

    // The gate bites on real output: a malformed EFO id entering through
    // the trait LUT violates the mapped-id pattern after the full parse.
    val badLut = Seq(("trait0", "EFO_0000001x"))
      .toDF("diseaseFromSource", "diseaseFromSourceMappedId")
    val ex = intercept[Qc.QcException](Qc.validateEvidence(
      graft.parsers.GeneBurdenParser.azBranch(azRaw, badLut),
      Qc.EvidenceContract(patterns = Map("diseaseFromSourceMappedId" -> "^EFO:\\d{7}$"))))
    assert(ex.getMessage.contains("pattern:diseaseFromSourceMappedId"))
  }

  test("EvidenceSink lands gzip JSON-lines evidence from a stream with QC hook") {
    // tmpDir itself wipes and recreates the directory.
    def fresh(name: String): String = tmpDir(name)
    val srcDir = fresh("esink_src")
    val outDir = fresh("esink_out")
    val ckDir = fresh("esink_ck")
    spark.read.schema(EventsStream.eventsSchema).parquet(s"$sf/events.parquet")
      .limit(300).write.mode("overwrite").parquet(srcDir)
    var qcBatches = 0
    val stream = EventsStream.readEvents(spark, srcDir, maxFilesPerTrigger = 1)
      .select(col("event_id"), col("event_type"), col("value"))
    val q = EvidenceSink.start(stream, outDir, ckDir, qc = { b => qcBatches += 1; assert(b.columns.length == 3) })
    try {
      q.processAllAvailable()
      val back = spark.read.json(outDir)
      assert(back.count() == 300)
      assert(qcBatches >= 1)
      val gz = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".json.gz"))
      assert(gz >= 1, "expected gzipped part files")
    } finally q.stop()
  }

  test("EvidenceSink validates the contract per micro-batch BEFORE the batch lands") {
    // tmpDir itself wipes and recreates the directory.
    def fresh(name: String): String = tmpDir(name)
    val srcDir = fresh("csink_src")
    val contract = graft.core.Qc.EvidenceContract(
      required = Seq("event_type"),
      enums = Map("event_type" -> Seq("view", "click", "purchase", "signup", "error")))
    val base = spark.read.schema(EventsStream.eventsSchema).parquet(s"$sf/events.parquet").limit(100)

    // Good batches stream through and land.
    base.write.mode("overwrite").parquet(srcDir)
    val okOut = fresh("csink_ok_out")
    val q1 = EvidenceSink.start(
      EventsStream.readEvents(spark, srcDir, maxFilesPerTrigger = 1)
        .select(col("event_id"), col("event_type")),
      okOut, fresh("csink_ok_ck"), contract = Some(contract))
    try {
      q1.processAllAvailable()
      assert(spark.read.json(okOut).count() == 100)
    } finally q1.stop()

    // A batch violating the enum fails the QUERY (nothing silently lands).
    val badSrc = fresh("csink_bad_src")
    base.withColumn("event_type",
        when(col("event_id") % 10 === 0, lit("corrupt")).otherwise(col("event_type")))
      .write.mode("overwrite").parquet(badSrc)
    val badOut = fresh("csink_bad_out")
    val q2 = EvidenceSink.start(
      EventsStream.readEvents(spark, badSrc, maxFilesPerTrigger = 1)
        .select(col("event_id"), col("event_type")),
      badOut, fresh("csink_bad_ck"), contract = Some(contract))
    try {
      val ex = intercept[Exception](q2.processAllAvailable())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("enum:event_type")), s"got: ${messages(ex)}")
      val landed = Option(new java.io.File(badOut).listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".json.gz"))
      assert(landed == 0, "violating batch must not land")
    } finally q2.stop()
  }
}
