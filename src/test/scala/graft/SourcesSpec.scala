package graft

import org.apache.spark.SparkFiles
import org.apache.spark.sql.functions._
import graft.core.{Qc, Readers, Xml}

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("S2: multiline quoted CSV records (cell-passport shape)") {
    val dir = tmpDir("mlcsv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "models.csv"),
      "model_name,model_id,tissue\n\"HeLa\nsubline\",SIDM1,Cervix\nA549,SIDM2,Lung\n")
    val df = Readers.csv(spark, s"$dir/models.csv", multiLine = true)
    assert(df.count() == 2)
    assert(df.filter($"model_id" === "SIDM1").head().getString(0) == "HeLa\nsubline")
  }

  test("S6: recursive directory JSON scan") {
    val dir = tmpDir("recjson")
    Seq(("a", 1)).toDF("k", "v").write.mode("overwrite").json(s"$dir/nested/part1")
    Seq(("b", 2)).toDF("k", "v").write.mode("overwrite").json(s"$dir/nested/deeper/part2")
    val df = Readers.json(spark, dir, recursive = true)
    assert(df.count() == 2)
  }

  test("S9: addFile + SparkFiles.get staging (remote-file pattern)") {
    val dir = tmpDir("addfile")
    val f = java.nio.file.Paths.get(dir, "lut_staged.tsv")
    java.nio.file.Files.writeString(f, "k\tv\nx\t1\n")
    spark.sparkContext.addFile(f.toUri.toString)
    val staged = SparkFiles.get("lut_staged.tsv")
    val df = Readers.tsv(spark, staged)
    assert(df.head().getString(0) == "x")
  }

  test("S11: StAX XML records reader (Orphanet product6 shape)") {
    val dir = tmpDir("xml")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "orphanet.xml"),
      """<?xml version="1.0" encoding="UTF-8"?>
        |<JDBOR>
        |  <DisorderList>
        |    <Disorder id="17601">
        |      <OrphaCode>166024</OrphaCode>
        |      <Name lang="en">Multiple epiphyseal dysplasia</Name>
        |      <Gene><Symbol>KIF7</Symbol></Gene>
        |    </Disorder>
        |    <Disorder id="2">
        |      <OrphaCode>93</OrphaCode>
        |      <Name lang="en">Achondroplasia &amp; co</Name>
        |    </Disorder>
        |  </DisorderList>
        |</JDBOR>
        |""".stripMargin)
    val df = Xml.readRecords(spark, s"$dir/orphanet.xml", "Disorder", Seq("OrphaCode", "Name", "Symbol"))
    assert(df.count() == 2)
    val r = df.filter($"OrphaCode" === "166024").head()
    assert(r.getAs[String]("Symbol") == "KIF7")
    val r2 = df.filter($"OrphaCode" === "93").head()
    assert(r2.getAs[String]("Name") == "Achondroplasia & co")
    assert(r2.getAs[Any]("Symbol") == null)
  }

  test("Contracts: schema conformance + required-field nullness") {
    import graft.core.Contracts
    import org.apache.spark.sql.types._
    val ev = Seq(("clingen", "BRCA1", Seq("123")))
      .toDF("datasourceId", "targetFromSourceId", "literature")
    Contracts.assertConforms(ev, Contracts.evidenceCore)
    Contracts.assertConforms(ev, StructType(Seq(
      StructField("literature", ArrayType(StringType)))))
    intercept[Contracts.ContractViolation] {
      Contracts.assertConforms(ev, StructType(Seq(StructField("resourceScore", DoubleType))))
    }
    intercept[Contracts.ContractViolation] {
      Contracts.assertConforms(ev, StructType(Seq(StructField("literature", ArrayType(DoubleType)))))
    }
    Contracts.assertNoNulls(ev, Seq("datasourceId", "targetFromSourceId"))
    val withNull = Seq((null.asInstanceOf[String], "g")).toDF("datasourceId", "targetFromSourceId")
    intercept[graft.core.Qc.QcException] {
      Contracts.assertNoNulls(withNull, Seq("datasourceId"))
    }
  }

  test("Qc: count windows, uniqueness, invariants, fractions") {
    val df = Seq((1, 0.5), (2, 0.1), (3, 0.0)).toDF("id", "p")
    assert(Qc.assertCountBetween(df, 2, 5) == 3)
    intercept[Qc.QcException](Qc.assertCountBetween(df, 10, 20))
    Qc.assertUniqueKey(df, Seq("id"))
    intercept[Qc.QcException](Qc.assertUniqueKey(df.union(df), Seq("id")))
    intercept[Qc.QcException](Qc.assertNone(df, $"p" === 0.0, "zero p-values"))
    val frac = Qc.assertFractionBetween(df, $"p" >= 0.5, 0.2, 0.5, "high-p share")
    assert(math.abs(frac - 1.0 / 3) < 1e-9)
    Qc.assertAll(df, Seq("neg_p" -> ($"p" < 0), "huge_p" -> ($"p" > 1)))
    intercept[Qc.QcException](Qc.assertAll(df, Seq("zero_p" -> ($"p" === 0.0))))
  }

  test("Qc.observed records metrics during the pipeline's own action (no extra job)") {
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
    val observed = Qc.observed(base, "qc",
      count(lit(1)).as("rows"),
      sum(when($"l_quantity" <= 0, 1L).otherwise(0L)).as("bad_qty"))
      .filter($"l_quantity" > 0) // QC sees pre-filter rows: attached at the scan
    // collect() runs the Dataset's OWN QueryExecution — the one observe is
    // attached to (a write would build a fresh one; see Qc scaladoc).
    val n = observed.collect().length
    val m = Qc.observedMetrics(observed)("qc")
    assert(m.getAs[Long]("rows") == base.count() && m.getAs[Long]("bad_qty") == 0L)
    assert(n == base.count(), "filter dropped nothing (no non-positive quantities)")
  }

  test("ORC round-trip with predicate pushdown and writeByExtension dispatch") {
    val out = tmpDir("orc_roundtrip") + "/nation.orc"
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    graft.core.Writers.writeByExtension(nation, out)
    val back = graft.core.Readers.readPath(spark, out)
    assert(back.collect().toSet == nation.collect().toSet, "ORC round-trip lost rows")
    val p = back.filter($"n_nationkey" > 10).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,10)]"),
      s"ORC scan must push the predicate:\n$p")
  }
}
