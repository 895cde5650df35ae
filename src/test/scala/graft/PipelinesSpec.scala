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

  test("EvidenceSink lands gzip JSON-lines evidence from a stream with QC hook") {
    def fresh(name: String): String = {
      val d = new java.io.File(tmpDir(name))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(d); d.mkdirs(); d.getAbsolutePath
    }
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
}
