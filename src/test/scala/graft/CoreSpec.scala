package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

class CoreSpec extends SparkTestBase {
  import spark.implicits._

  test("Readers.csv with forced schema and nullValue") {
    val dir = tmpDir("csv1")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.csv"),
      "gene,score\nBRCA1,1.5\nTP53,null\n")
    val schema = StructType(Seq(
      StructField("gene", StringType), StructField("score", DoubleType)))
    val df = Readers.csv(spark, s"$dir/in.csv", schema = Some(schema), nullValue = Some("null"))
    val rows = df.orderBy("gene").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("BRCA1", "TP53"))
    assert(rows(0).getDouble(1) == 1.5)
    assert(rows(1).isNullAt(1))
  }

  test("Readers.csvSkipRows drops leading metadata lines (ClinGen S4)") {
    val dir = tmpDir("csv2")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.csv"),
      "JUNK LINE 1\nJUNK LINE 2\ngene,score\nBRCA1,1\nTP53,2\n")
    val schema = StructType(Seq(
      StructField("gene", StringType), StructField("score", IntegerType)))
    val df = Readers.csvSkipRows(spark, s"$dir/in.csv", skipRows = 2, schema = schema)
    assert(df.count() == 2)
    assert(df.filter($"gene" === "BRCA1").head().getInt(1) == 1)
  }

  test("Readers.readPath dispatches by extension") {
    val dir = tmpDir("auto")
    Seq(("a", 1), ("b", 2)).toDF("k", "v").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Readers.readPath(spark, s"$dir/t.parquet").count() == 2)
    Seq(("a", 1)).toDF("k", "v").coalesce(1).write.mode("overwrite").json(s"$dir/t.json")
    assert(Readers.readPath(spark, s"$dir/t.json").count() == 1)
  }

  test("Writers.writeJsonGzSingle produces exactly one gz json file (K1)") {
    val dir = tmpDir("sink")
    val out = s"$dir/evidence.json.gz"
    Writers.writeJsonGzSingle(Seq(("g1", 0.5), ("g2", 0.7)).toDF("target", "score"), out)
    assert(new java.io.File(out).isFile)
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("score", "target"))
  }

  test("Union.unionByNameAll tolerates missing columns (U1)") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, 9.9)).toDF("id", "only_b")
    val u = Union.unionByNameAll(Seq(a, b))
    assert(u.count() == 2)
    assert(u.columns.sorted.toSeq == Seq("id", "only_a", "only_b"))
    assert(u.filter($"id" === 2).head().getAs[Any]("only_a") == null)
  }

  test("Dedup.topOnePerKey keeps the best row deterministically (W1)") {
    val df = Seq((1, "a", 5.0), (1, "b", 9.0), (1, "c", 9.0), (2, "d", 1.0))
      .toDF("k", "tag", "score")
    val out = Dedup.topOnePerKey(df, Seq("k"), Seq($"score".desc, $"tag".asc))
    val m = out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m == Map(1 -> "b", 2 -> "d")) // tie on 9.0 broken by tag asc
  }

  test("Dedup.bestRowPerKey agrees with window variant") {
    val df = Seq((1, "a", 5.0), (1, "b", 9.0), (2, "d", 1.0)).toDF("k", "tag", "score")
    val viaAgg = Dedup.bestRowPerKey(df, Seq("k"), Seq("score", "tag"))
      .select("k", "tag").as[(Int, String)].collect().toSet
    assert(viaAgg == Set((1, "b"), (2, "d")))
  }

  test("Dedup.exactTextDedup keeps one survivor per normalized text") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different"),
    ).toDF("id", "text")
    val out = Dedup.exactTextDedup(df, "id", "text")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("Cleanup.dictReplace only replaces exact matches (R11)") {
    val df = Seq("A", "AB", "R").toDF("flag")
    val out = Cleanup.dictReplace(df, Seq("flag"), Map("A" -> "accepted"))
    assert(out.as[String].collect().sorted.toSeq == Seq("AB", "R", "accepted"))
  }

  test("Cleanup.applyRegexRules applies rulebook in order") {
    val df = Seq("Frontotemporal dementia, TDP-43 type").toDF("phenotype")
    val out = Cleanup.applyRegexRules(df, "phenotype", Seq(
      (",.*$", ""),         // strip qualifier tail
      ("\\s+$", ""),
    ))
    assert(out.head().getString(0) == "Frontotemporal dementia")
  }

  test("Reshape.melt unpivots runtime-discovered columns (R3)") {
    val wide = Seq(("m1", 1.0, 2.0, 3.0)).toDF("id", "gA", "gB", "gC")
    val out = Reshape.melt(wide, Seq("id"), "gene", "effect")
    assert(out.count() == 3)
    assert(out.filter($"gene" === "gB").head().getDouble(2) == 2.0)
  }

  test("Reshape.meltMetricTriplets pivots <entity>_<metric> columns (Encore R3)") {
    val wide = Seq(("p1", 0.01, 0.5, 0.02, 0.7)).toDF(
      "id", "SIDM1_pval", "SIDM1_lfc", "SIDM2_pval", "SIDM2_lfc")
    val out = Reshape.meltMetricTriplets(wide, Seq("id"), Seq("pval", "lfc"), "cellLine")
    assert(out.count() == 2)
    val r = out.filter($"cellLine" === "SIDM2").head()
    assert(r.getAs[Double]("pval") == 0.02 && r.getAs[Double]("lfc") == 0.7)
  }

  test("Reshape.zipWithPad reuses first type for overflow (R9)") {
    val df = Seq((Seq("v1", "v2", "v3"), Seq("t1", "t2"))).toDF("vals", "types")
    val out = df.select(Reshape.zipWithPad($"vals", $"types").as("z"))
      .select(explode($"z").as("p")).select("p.value", "p.type")
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("v1", "t1"), ("v2", "t2"), ("v3", "t1")))
  }

  test("Profile.profile survives hostile column names (quotes, backticks, dots)") {
    // The melt is built with the Column API, never by splicing names into
    // SQL text — names that would break a selectExpr/stack profile fine.
    val df = Seq((1, "x", 2.0), (2, "y", 2.0), (2, null, 3.0))
      .toDF("it's", "back`tick", "dot.ted")
    val out = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("it's", "back`tick", "dot.ted"))
    assert(out("it's") == ((3L, 0L, 2L)))       // n, nulls, distinct
    assert(out("back`tick") == ((3L, 1L, 2L)))
    assert(out("dot.ted") == ((3L, 0L, 2L)))
  }

  test("OntologyMap.addEfoMapping null-safe joins on both keys (J5/F9)") {
    val evidence = Seq(
      ("asthma", "MONDO:1", "g1"), ("asthma", null, "g2"), (null, null, "g3"),
    ).toDF("diseaseFromSource", "diseaseFromSourceId", "target")
    val lut = Seq(
      ("asthma", "MONDO:1", "EFO_A"), ("asthma", null, "EFO_B"), (null, null, "EFO_C"),
    ).toDF("diseaseFromSource", "diseaseFromSourceId", "diseaseFromSourceMappedId")
    val out = OntologyMap.addEfoMapping(evidence, lut)
    val m = out.select("target", "diseaseFromSourceMappedId")
      .as[(String, String)].collect().toMap
    assert(m == Map("g1" -> "EFO_A", "g2" -> "EFO_B", "g3" -> "EFO_C"))
  }

  test("reciprocalBestMatch: mutuality drops the loser of a roster collision") {
    import org.apache.spark.sql.functions._
    // Probes "smith" and "smyth" both best-match roster "smith"; only
    // the exact probe survives mutuality, and bestMatch keeps BOTH.
    // Blocking key: last 2 chars ("th" shared by all).
    val probes = Seq((1L, "smith"), (2L, "smyth")).toDF("pid", "pname")
    val roster = Seq((10L, "smith")).toDF("rid", "rname")
    val rbm = graft.core.Linkage.reciprocalBestMatch(
      probes, "pid", "pname", roster, "rid", "rname", blockLen = 2, minSim = 0.5)
      .select("d_key", "matched_key").as[(Long, Long)].collect().toSet
    assert(rbm == Set((1L, 10L)), s"only the mutual best survives: $rbm")
    val bm = graft.core.Linkage.bestMatch(
      probes, "pid", "pname", roster, "rid", "rname", blockLen = 2, minSim = 0.5)
      .select("d_key", "matched_key").as[(Long, Long)].collect().toSet
    assert(bm == Set((1L, 10L), (2L, 10L)), "one-directional argmax keeps both")
  }
}
