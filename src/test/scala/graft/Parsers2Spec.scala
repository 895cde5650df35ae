package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.parsers.{ChemblParser, OrphanetParser}
import graft.streaming.EventsStream

class Parsers2Spec extends SparkTestBase {
  import spark.implicits._

  test("ChemblParser: map-in-transform categories + NCT harvest + union rejoin") {
    val evidence = Seq(
      ("e1", Some("Trial was stopped"), Seq("https://clinicaltrials.gov/study/NCT001")),
      ("e2", None, Seq("https://clinicaltrials.gov/study/NCT999")),
    ).toDF("id", "studyStopReason", "url_list")
      .withColumn("urls", transform(col("url_list"), u => struct(lit("ct").as("niceName"), u.as("url"))))
      .drop("url_list")
    val predictions = Seq(
      ("NCT001", Seq("Safety_Sideeffects", "Covid19", "UNKNOWN_TAG")),
    ).toDF("nct_id", "subclasses")
    val out = ChemblParser(evidence, predictions)
    assert(out.count() == 2, "union preserves row count")
    val stopped = out.filter($"id" === "e1").head()
    assert(stopped.getAs[scala.collection.Seq[String]]("studyStopReasonCategories") ==
      Seq("Safety or side effects", "COVID-19", null), "unknown tags map to null")
    assert(out.filter($"id" === "e2").head().getAs[Any]("studyStopReasonCategories") == null)
  }

  test("OrphanetParser: real product6 nesting -> status filter -> consequence map") {
    val dir = tmpDir("orphanet2")
    // Structure mirrors the real en_product6.xml the reference parses
    // (Orphanet.py:75-120): Disorder-level Name/OrphaCode/DisorderType,
    // association-level SourceOfValidation / type / status / Gene with
    // external references.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "product6.xml"),
      """<?xml version="1.0"?>
        |<JDBOR><DisorderList count="1">
        |<Disorder id="17601">
        |  <OrphaCode>15</OrphaCode>
        |  <Name lang="en">Achondroplasia</Name>
        |  <DisorderType><Name lang="en">Disease</Name></DisorderType>
        |  <DisorderGeneAssociationList count="2">
        |    <DisorderGeneAssociation>
        |      <SourceOfValidation>21538838[PMID]_15772651[PMID]_junk</SourceOfValidation>
        |      <Gene id="20160">
        |        <Name lang="en">fibroblast growth factor receptor 3</Name>
        |        <Symbol>FGFR3</Symbol>
        |        <ExternalReferenceList count="2">
        |          <ExternalReference><Source>HGNC</Source><Reference>3690</Reference></ExternalReference>
        |          <ExternalReference><Source>Ensembl</Source><Reference>ENSG00000068078</Reference></ExternalReference>
        |        </ExternalReferenceList>
        |      </Gene>
        |      <DisorderGeneAssociationType><Name lang="en">Disease-causing germline mutation(s) (gain of function) in</Name></DisorderGeneAssociationType>
        |      <DisorderGeneAssociationStatus><Name lang="en">Assessed</Name></DisorderGeneAssociationStatus>
        |    </DisorderGeneAssociation>
        |    <DisorderGeneAssociation>
        |      <Gene id="99"><Name lang="en">fake gene</Name><Symbol>FAKE1</Symbol></Gene>
        |      <DisorderGeneAssociationType><Name lang="en">Candidate gene tested in</Name></DisorderGeneAssociationType>
        |      <DisorderGeneAssociationStatus><Name lang="en">Not validated</Name></DisorderGeneAssociationStatus>
        |    </DisorderGeneAssociation>
        |  </DisorderGeneAssociationList>
        |</Disorder>
        |</DisorderList></JDBOR>
        |""".stripMargin)
    val assoc = OrphanetParser.readProduct6(spark, s"$dir/product6.xml")
    assert(assoc.count() == 2)
    val a1 = assoc.filter($"targetFromSourceId".isNotNull).head()
    assert(a1.getAs[String]("diseaseFromSource") == "Achondroplasia")
    assert(a1.getAs[String]("type") == "Disease")
    assert(a1.getAs[scala.collection.Seq[String]]("literature") == Seq("21538838", "15772651"),
      "PMID-tagged entries only, tag stripped")
    assert(a1.getAs[String]("targetFromSource") == "fibroblast growth factor receptor 3")
    val out = OrphanetParser(assoc)
    assert(out.count() == 1, "non-validated association filtered")
    val r = out.head()
    assert(r.getAs[String]("targetFromSourceId") == "ENSG00000068078", "Ensembl xref preferred")
    assert(r.getAs[String]("diseaseFromSourceId") == "Orphanet_15")
    assert(r.getAs[String]("variantFunctionalConsequenceId") == "SO_0002053")
  }

  test("stream-stream conversion join matches batch self-join") {
    val dir = tmpDir("stream_conv")
    spark.read.schema(EventsStream.eventsSchema).parquet(s"$sf/events.parquet")
      .limit(1500).write.mode("overwrite").parquet(dir)
    val stream = EventsStream.readEvents(spark, dir, maxFilesPerTrigger = 2)
    val q = EventsStream.runToMemory(
      EventsStream.conversions(stream, "click", "signup", "30 minutes", "1 hour"),
      "conversions")
    try {
      val streamed = spark.table("conversions")
        .select("from_id", "to_id").as[(Long, Long)].collect().toSet
      val batchEvents = EventsStream.withEventTime(
        spark.read.schema(EventsStream.eventsSchema).parquet(dir))
      val batch = EventsStream.conversions(batchEvents, "click", "signup", "30 minutes", "1 hour")
        .select("from_id", "to_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "fixture should contain click->signup pairs")
      assert(streamed == batch, s"stream-stream join diverges: ${streamed.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("sessionCounts groups activity bursts per user (session_window)") {
    val dir = tmpDir("stream_sess")
    // Two bursts for user 1 separated by > 30 min, one burst for user 2.
    // ts must be written as the schema's TIMESTAMP_NTZ, not a long.
    def ntz(min: Long) = java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min)
    val rows = Seq(
      (1L, ntz(0), 1L, "click", 1.0, "{}"),
      (2L, ntz(5), 1L, "click", 2.0, "{}"),
      (3L, ntz(60), 1L, "view", 3.0, "{}"),
      (4L, ntz(2), 2L, "click", 4.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(dir)
    val stream = EventsStream.readEvents(spark, dir)
    val q = EventsStream.runToMemory(
      EventsStream.sessionCounts(stream, "30 minutes", "1 hour"), "sessions")
    try {
      // Append mode only emits sessions the watermark has closed; push a
      // far-future event in a second micro-batch to advance it.
      Seq((99L, ntz(600), 99L, "flush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val sess = spark.table("sessions")
        .filter($"user_id" =!= 99L)
        .select("user_id", "n_events").as[(Long, Long)].collect().sorted.toSeq
      assert(sess == Seq((1L, 1L), (1L, 2L), (2L, 1L)),
        s"expected two sessions for user 1 and one for user 2, got $sess")
    } finally q.stop()
  }
}
