package graft

import java.nio.file.{Files, Paths}

import graft.core.Xml

/** DataSource V2 sharded-XML source: per-file partitions, driver-reader
  * parity, inference, and pushed-down column pruning.
  */
class XmlSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def writeShards(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      Files.writeString(
        Paths.get(dir, f"part-$i%03d.xml"),
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<Feed>
           |  <Item id="a$i">
           |    <Code>${100 + i}</Code>
           |    <Name lang="en">Item $i &amp; co</Name>
           |    <Extra><Symbol>S$i</Symbol></Extra>
           |  </Item>
           |  <Item id="b$i">
           |    <Code>${200 + i}</Code>
           |    <Name>Other $i</Name>
           |  </Item>
           |</Feed>
           |""".stripMargin)
    }

  test("graft-xml: one partition per shard, rows = union of driver reads") {
    val dir = tmpDir("xmlshards")
    writeShards(dir, 5)
    val df = spark.read.format("graft-xml")
      .option("recordTag", "Item")
      .option("fields", "Code,Name,Symbol")
      .load(dir)
    assert(df.rdd.getNumPartitions == 5, "expected one input partition per file")
    val union = (0 until 5)
      .map(i => Xml.readRecords(spark, f"$dir/part-$i%03d.xml", "Item", Seq("Code", "Name", "Symbol")))
      .reduce(_ unionAll _)
    assert(df.count() == 10)
    assert(df.exceptAll(union).isEmpty && union.exceptAll(df).isEmpty,
      "DSv2 rows must equal the driver-side reader's union")
    // First-descendant + trim semantics carry over (nested Symbol).
    assert(df.filter($"Code" === "100").head().getAs[String]("Symbol") == "S0")
    assert(df.filter($"Code" === "200").head().getAs[String]("Symbol") == null)
  }

  test("graft-xml: nested requested fields — pruning never changes a surviving value") {
    val dir = tmpDir("xmlnested")
    // Name's text is interrupted by a nested, REQUESTED Symbol element:
    // ElementTree `.text` semantics keep "Item 1" (text before the first
    // child) whether or not Symbol survives pruning.
    Files.writeString(
      Paths.get(dir, "part-000.xml"),
      """<?xml version="1.0"?>
        |<Feed>
        |  <Item><Name>Item 1 <Symbol>S0</Symbol> tail</Name><Code>7</Code></Item>
        |</Feed>
        |""".stripMargin)
    val df = spark.read.format("graft-xml")
      .option("recordTag", "Item")
      .option("fields", "Name,Symbol,Code")
      .load(dir)
    val full = df.collect().head
    assert(full.getAs[String]("Name") == "Item 1")
    assert(full.getAs[String]("Symbol") == "S0")
    val prunedName = df.select("Name").as[String].collect().head
    assert(prunedName == full.getAs[String]("Name"),
      "pruning Symbol out must not change Name's captured value")
    // Driver reader agrees on the same rule.
    val drv = Xml.readRecords(spark, s"$dir/part-000.xml", "Item", Seq("Name", "Symbol", "Code")).collect().head
    assert(drv.getAs[String]("Name") == "Item 1" && drv.getAs[String]("Symbol") == "S0")
  }

  test("graft-xml: nested recordTag elements are children, both readers agree") {
    val dir = tmpDir("xmlnestrec")
    // The outer Item CONTAINS an Item — outermost-record semantics: one
    // record, the nested Item is a child whose fields don't leak (Code
    // stays 1, the first descendant), and the record closes at the OUTER
    // </Item>, so Tail (after the nested element) is still captured.
    Files.writeString(
      Paths.get(dir, "part-000.xml"),
      """<?xml version="1.0"?>
        |<Feed>
        |  <Item><Code>1</Code><Item><Code>99</Code></Item><Tail>t1</Tail></Item>
        |  <Item><Code>2</Code><Tail>t2</Tail></Item>
        |</Feed>
        |""".stripMargin)
    val dsv2 = spark.read.format("graft-xml")
      .option("recordTag", "Item")
      .option("fields", "Code,Tail")
      .load(dir)
      .collect().map(r => (r.getAs[String]("Code"), r.getAs[String]("Tail"))).sorted.toSeq
    assert(dsv2 == Seq(("1", "t1"), ("2", "t2")), s"got $dsv2")
    val drv = Xml.readRecords(spark, s"$dir/part-000.xml", "Item", Seq("Code", "Tail"))
      .collect().map(r => (r.getAs[String]("Code"), r.getAs[String]("Tail"))).sorted.toSeq
    assert(drv == dsv2, "driver reader must match the DSv2 reader on nested records")
  }

  test("graft-xml: multi-path load unions shard lists in caller order") {
    val dir1 = tmpDir("xmlmulti1")
    val dir2 = tmpDir("xmlmulti2")
    writeShards(dir1, 2)
    Files.writeString(
      Paths.get(dir2, "solo.xml"),
      """<?xml version="1.0"?>
        |<Feed><Item><Code>900</Code><Name>Solo</Name></Item></Feed>
        |""".stripMargin)
    val df = spark.read.format("graft-xml")
      .option("recordTag", "Item")
      .option("fields", "Code,Name")
      .load(dir1, dir2)
    assert(df.rdd.getNumPartitions == 3, "2 shards + 1 shard across the two roots")
    assert(df.count() == 5)
    assert(df.filter($"Code" === "900").head().getAs[String]("Name") == "Solo")
  }

  test("graft-xml: schema inference reads the first record's child names") {
    val dir = tmpDir("xmlinfer")
    writeShards(dir, 2)
    val df = spark.read.format("graft-xml").option("recordTag", "Item").load(dir)
    // First record of part-000: Code, Name, Extra (document order).
    assert(df.schema.fieldNames.toSeq == Seq("Code", "Name", "Extra"))
    assert(df.count() == 4)
  }

  test("graft-xml: column pruning reaches the reader, count(*) survives zero columns") {
    val dir = tmpDir("xmlprune")
    writeShards(dir, 3)
    val df = spark.read.format("graft-xml")
      .option("recordTag", "Item")
      .option("fields", "Code,Name,Symbol")
      .load(dir)
    val pruned = df.select("Code")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("graft-xml[Code]"),
      s"pruned scan description must show only Code:\n$plan")
    assert(pruned.as[String].collect().sorted.head == "100")
    assert(df.count() == 6) // zero-column pruning still counts records
  }
}
