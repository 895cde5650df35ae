package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.core.Layout

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE finalizes the plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children ++ other.subqueries
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bucketed tables join with zero shuffle (co-located SMJ)") {
    // Warehouse dir is set (static conf) in TestSession.
    // Force SMJ path: disable broadcast so the test is about bucketing.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val lines = spark.read.parquet(s"$sf/lineitem.parquet")
      Layout.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", Seq("k"), 8)
      Layout.writeBucketed(lines.withColumnRenamed("l_orderkey", "k"), "b_lines", Seq("k"), 8)
      val joined = spark.table("b_orders").join(spark.table("b_lines"), Seq("k"))
      val nShuffles = countShuffles(joined)
      assert(nShuffles == 0, s"expected shuffle-free bucketed join, got $nShuffles exchanges")
      // Same join on plain parquet shuffles both sides.
      val plain = orders.join(lines, orders("o_orderkey") === lines("l_orderkey"))
      assert(countShuffles(plain) >= 2, "plain SMJ should shuffle both sides")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }

  test("writePartitioned enables partition pruning (PartitionFilters in scan)") {
    val dir = tmpDir("part_layout") + "/orders_by_status"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    Layout.writePartitioned(orders, dir, Seq("o_orderstatus"))
    val pruned = spark.read.parquet(dir).filter($"o_orderstatus" === "F")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PartitionFilters") && scanDesc.contains("o_orderstatus"),
      s"expected partition filter in scan, plan:\n${scanDesc.take(800)}")
    // Pruning must not change results.
    assert(pruned.count() == orders.filter($"o_orderstatus" === "F").count())
    // Only the matching partition directory is listed in the scan files.
    val filesRead = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!filesRead.contains("o_orderstatus=O"), "non-matching partition should be pruned")
  }

  test("saltedJoin matches plain join results") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) "HOT" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("HOT", "hot-payload"), ("k5", "k5-payload")).toDF("key", "payload")
    val plain = large.join(small, Seq("key")).select("key", "v", "payload")
      .as[(String, Int, String)].collect().toSet
    val salted = Layout.saltedJoin(large, small, "key", saltFactor = 4)
      .select("key", "v", "payload").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "HOT") == 100)
  }

  test("saltedCount matches plain groupBy count") {
    val df = (1 to 500).map(i => if (i % 5 == 0) "HOT" else s"k${i % 7}").toDF("key")
    val plain = df.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Layout.saltedCount(df, "key", saltFactor = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("gram-bucketed anchor index: incremental substring dedup skips the index-side shuffle") {
    import graft.text.SubstringDedup
    // The 100 TB shape SubstringDedup.buildAnchorIndex documents: the
    // corpus anchor index is stored bucketed on gram, so each batch's
    // index-side distinct aggregation rides the bucket layout instead of
    // re-shuffling corpus-scale data per batch.
    def filler(seed: Char, n: Int): String =
      new scala.util.Random(seed.toLong).alphanumeric.take(n).mkString
    val span = "THE-PLANTED-VERBATIM-SPAN-0123456789-XYZ" * 3
    val corpus = Seq(
      (1L, filler('a', 40) + span + filler('b', 40)),
      (2L, filler('c', 250)),
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, filler('d', 17) + span + filler('e', 30)),
      (11L, filler('f', 200)),
    ).toDF("doc_id", "text")
    val index = SubstringDedup.buildAnchorIndex(corpus, "doc_id", "text", gramLen = 24, window = 16)
    try {
      Layout.writeBucketed(index, "b_anchor_idx", Seq("gram"), 8)
      val viaBucketed = SubstringDedup.incrementalSharedSpans(
        batch, "doc_id", "text", spark.table("b_anchor_idx"), gramLen = 24, window = 16, minSpan = 60)
      val viaPlain = SubstringDedup.incrementalSharedSpans(
        batch, "doc_id", "text", index, gramLen = 24, window = 16, minSpan = 60)
      val a = viaBucketed.as[(Long, Long, Long, Long, Long)].collect().toSet
      val b = viaPlain.as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(a == b && a.map(_._1) == Set(10L), s"layout must not change the answer: $a vs $b")
      val (sB, sP) = (countShuffles(viaBucketed), countShuffles(viaPlain))
      assert(sB < sP, s"bucketed index should drop the index-side exchange ($sB vs $sP)")
    } finally spark.sql("DROP TABLE IF EXISTS b_anchor_idx")
  }

  test("term-bucketed postings index: incremental lexical kNN skips the index-side shuffle") {
    import graft.similarity.SparseSim
    // The 100 TB shape SparseSim.buildPostingsIndex documents: postings
    // stored bucketed on term, so a batch's scoring join reads the
    // corpus side in place instead of re-shuffling it per batch. Force
    // SMJ (disable broadcast) so the pin is about the bucket layout.
    val corpus = (1 to 20).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i shared common tokens here w${i % 4}"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "shared common tokens here w1 plus fresh material"),
      (101L, "shared common tokens here w2 and more words"),
    ).toDF("doc_id", "text")
    val index = SparseSim.buildPostingsIndex(corpus, "doc_id", "text", shingleLen = 3, dfCap = 100)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(index, "b_postings_idx", Seq("term"), 8)
      val viaBucketed = SparseSim.incrementalNeighbors(
        batch, "doc_id", "text", spark.table("b_postings_idx"), shingleLen = 3, k = 5)
      val viaPlain = SparseSim.incrementalNeighbors(
        batch, "doc_id", "text", index, shingleLen = 3, k = 5)
      val a = viaBucketed.as[(Long, Long, Long, Double, Int)].collect().toSet
      val b = viaPlain.as[(Long, Long, Long, Double, Int)].collect().toSet
      assert(a == b && a.nonEmpty && a.map(_._1).subsetOf(Set(100L, 101L)),
        s"layout must not change the answer: $a vs $b")
      val (sB, sP) = (countShuffles(viaBucketed), countShuffles(viaPlain))
      assert(sB < sP, s"bucketed index should drop the index-side exchange ($sB vs $sP)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_postings_idx")
    }
  }

  test("term-bucketed BM25 index: batch retrieval skips the index-side shuffle") {
    import graft.similarity.SparseSim
    // Same layout as the postings-index pin above, through the BM25
    // store: buildBm25Index bucketed on term, bm25Retrieve's scoring
    // join reads the corpus side in place. Broadcast disabled so the
    // pin is about the bucket layout, not the small-side broadcast.
    val corpus = (1 to 20).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i shared common tokens here w${i % 4}"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "shared common tokens here w1 plus fresh material"),
      (101L, "shared common tokens here w2 and more words"),
    ).toDF("doc_id", "text")
    val index = SparseSim.buildBm25Index(corpus, "doc_id", "text", shingleLen = 2, dfCap = 100)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(index, "b_bm25_idx", Seq("term"), 8)
      val viaBucketed = SparseSim.bm25Retrieve(
        batch, "doc_id", "text", spark.table("b_bm25_idx"), shingleLen = 2, k = 5)
      val viaPlain = SparseSim.bm25Retrieve(
        batch, "doc_id", "text", index, shingleLen = 2, k = 5)
      val a = viaBucketed.as[(Long, Long, Long, Double, Int)].collect().toSet
      val b = viaPlain.as[(Long, Long, Long, Double, Int)].collect().toSet
      assert(a == b && a.nonEmpty && a.map(_._1).subsetOf(Set(100L, 101L)),
        s"layout must not change the answer: $a vs $b")
      val (sB, sP) = (countShuffles(viaBucketed), countShuffles(viaPlain))
      assert(sB < sP, s"bucketed index should drop the index-side exchange ($sB vs $sP)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_bm25_idx")
    }
  }

  test("zValue2 matches a bit-by-bit reference Morton interleave") {
    def morton(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (1499L, 2404L), (12345L, 54321L), (70000L, 3L)) // 70000 aliases mod 2^16
    val got = pairs.toDF("x", "y")
      .select(Layout.zValue2($"x", $"y")).as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => morton(x & 0xFFFF, y & 0xFFFF) })
  }

  test("withHilbert: base quadrant order, exhaustive bijection + unit-step adjacency at 8 bits") {
    // bits=1: the defining U shape — (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3.
    val base = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val d1 = Layout.withHilbert(base, "x", "y", "d", bits = 1)
      .select("x", "y", "d").as[(Long, Long, Long)].collect()
      .map { case (x, y, d) => (x, y) -> d }.toMap
    assert(d1 == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L), s"$d1")

    // bits=8, EXHAUSTIVE over all 65536 grid points: the index must be a
    // bijection onto [0, 65536) and every consecutive pair of indexes
    // must be Manhattan-ADJACENT — the locality property Morton lacks
    // (z-order jumps a diagonal at every quadrant seam). This is the
    // whole reason the curve exists, so it is pinned exhaustively, not
    // sampled.
    val n = 256
    val grid = spark.range(n.toLong * n)
      .select(($"id" / n).cast("long").as("x"), ($"id" % n).as("y"))
    val walk = Layout.withHilbert(grid, "x", "y", "d", bits = 8)
      .select("d", "x", "y").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(walk.length == n * n)
    assert(walk.head._1 == 0L && walk.last._1 == (n.toLong * n - 1), "not a bijection")
    assert(walk.map(_._1).distinct.length == n * n, "duplicate indexes")
    walk.sliding(2).foreach { case Array((_, x0, y0), (d, x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-adjacent step at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }

    // And the payoff vs Morton on the same grid: mean Manhattan jump
    // between consecutive sort positions is exactly 1.0 for Hilbert,
    // strictly worse for z-order.
    val mortonWalk = grid.select(Layout.zValue2($"x", $"y").as("d"), $"x", $"y")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val mortonJump = mortonWalk.sliding(2).map { case Array((_, x0, y0), (_, x1, y1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0)
    }.sum.toDouble / (n * n - 1)
    assert(mortonJump > 1.0, s"morton mean jump $mortonJump should exceed hilbert's exact 1.0")
  }

  test("zOrderWrite: files prune on BOTH dims; single-dim sort and unscaled z do not") {
    val orders = spark.read.parquet(s"$sf/orders.parquet").select(
      $"o_custkey",
      datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("day"))
    // ck is ~8-bit at this sf, day ~12-bit: scale ck into day's range so
    // the interleave sees comparable magnitudes (zValue2 scaladoc).
    val scaled = orders.withColumn("ck16", $"o_custkey" * 16)
    val zdir = tmpDir("layout_zorder")
    val ddir = tmpDir("layout_daysorted")
    Layout.zOrderWrite(scaled, zdir, "ck16", "day", numFiles = 8)
    orders.repartitionByRange(8, $"day").sortWithinPartitions("day")
      .write.mode("overwrite").parquet(ddir)
    // Per-FILE min/max spans — exactly what parquet footer skipping sees.
    def spans(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("o_custkey").as("cklo"), max("o_custkey").as("ckhi"),
          min("day").as("dlo"), max("day").as("dhi"))
        .select($"cklo", $"ckhi", $"dlo", $"dhi")
        .as[(Long, Long, Long, Long)].collect()
    def hits(s: Array[(Long, Long, Long, Long)], ck: Long, day: Long): (Int, Int) =
      (s.count(f => f._1 <= ck && ck <= f._2), s.count(f => f._3 <= day && day <= f._4))
    val zs = spans(zdir)
    val ds = spans(ddir)
    assert(zs.length == 8 && ds.length == 8)
    val (zCk, zDay) = hits(zs, 75L, 1200L)
    val (dCk, dDay) = hits(ds, 75L, 1200L)
    // Day-sorted layout: day prunes hard but EVERY file spans the full
    // custkey range. Z-order trades a little day tightness for pruning
    // on both dimensions (the √-law: ~2^(b/2) cells per dim at 2^b files).
    assert(dCk == 8, s"single-dim sort must not prune the other dim, got $dCk")
    assert(dDay <= 3, s"day-sorted layout must prune day hard, got $dDay")
    // RangePartitioner boundaries move slightly between runs (sampled);
    // the invariant is BOTH dims prune, not the exact file count.
    assert(zCk <= 7 && zDay <= 7,
      s"z-order must prune BOTH dims ($zCk ck hits, $zDay day hits of 8)")
    // The degenerate case the scaladoc warns about: unscaled 8-bit ck
    // interleaved with 12-bit day — day's high bits own the z prefix and
    // custkey pruning vanishes.
    val udir = tmpDir("layout_zorder_unscaled")
    Layout.zOrderWrite(orders, udir, "o_custkey", "day", numFiles = 8)
    val (uCk, _) = hits(spans(udir), 75L, 1200L)
    assert(uCk == 8, s"unscaled unequal-width z-order degenerates, got $uCk")
  }

  test("zOrderWriteRanked prunes a long-tailed dim where raw interleave degenerates") {
    // 90% of x mass in [0, 100), tail out to ~60k; y uniform 16-bit.
    // Raw interleave: typical x has ~7 significant bits vs y's 16, so
    // y's bits own the z prefix and x pruning vanishes. Rank-bucketing
    // gives the dense region ~90% of the equal-POPULATION buckets, so
    // the interleave sees balanced dims again.
    val data = (0 until 4000).map { i =>
      val x = if (i % 10 == 0) (i.toLong * 37) % 60000L else (i.toLong * 13) % 100L
      (i.toLong, x, (i.toLong * 101) % 60000L)
    }
    val df = data.toDF("id", "x", "y")
    val rdir = tmpDir("layout_zranked")
    val udir = tmpDir("layout_zraw")
    Layout.zOrderWriteRanked(df, rdir, "x", "y", numFiles = 8, buckets = 64)
    Layout.zOrderWrite(df, udir, "x", "y", numFiles = 8)
    def xHits(dir: String, v: Long): Int = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("lo"), max("x").as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect()
      .count { case (lo, hi) => lo <= v && v <= hi }
    val raw = xHits(udir, 50L)
    val ranked = xHits(rdir, 50L)
    assert(raw == 8, s"raw interleave of a long-tailed dim must degenerate, got $raw")
    assert(ranked < raw, s"rank-bucketed z-order must prune the dense region ($ranked vs $raw)")
  }

  test("zValueN: 3-dim Morton matches bit reference; ranked 3-dim layout prunes on ALL dims") {
    def morton3(x: Long, y: Long, z: Long): Long =
      (0 until 16).foldLeft(0L) { (m, i) =>
        m | (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }
    val triples = Seq((0L, 0L, 0L), (1L, 2L, 4L), (65535L, 65535L, 65535L),
      (1499L, 2404L, 999L), (70000L, 3L, 5L)) // 70000 aliases mod 2^16
    val got = triples.toDF("x", "y", "z")
      .select(Layout.zValueN(Seq($"x", $"y", $"z"))).as[Long].collect().toSeq
    assert(got == triples.map { case (x, y, z) => morton3(x & 0xFFFF, y & 0xFFFF, z & 0xFFFF) })
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq($"x", $"y", $"z", $"x"))
    }
    // 3-dim ranked layout: every dim prunes, where a 1-dim sort serves
    // only its leading column. 16 files -> ~2^(4/3) cells per dim: the
    // per-dim pruning is MILDER than 2-dim z-order (the interleave
    // dilution the zValueN scaladoc describes) but must still beat the
    // all-files baseline on every dimension.
    // Independent dims (seeded RNG): modular functions of i correlate
    // with each other and quietly let a 1-dim sort prune the others.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 6000).map { i =>
      (i.toLong, rnd.nextInt(5000).toLong, rnd.nextInt(60000).toLong, rnd.nextInt(900).toLong)
    }
    val df3 = rows.toDF("id", "x", "y", "z")
    val zdir = tmpDir("layout_z3")
    val sdir = tmpDir("layout_z3_xsorted")
    Layout.zOrderWriteRanked(df3, zdir, Seq("x", "y", "z"), numFiles = 16, buckets = 64)
    df3.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sdir)
    def hits(dir: String, dim: String, v: Long): Int = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(dim).as("lo"), max(dim).as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect()
      .count { case (lo, hi) => lo <= v && v <= hi }
    val (px, py, pz) = (hits(zdir, "x", 2500L), hits(zdir, "y", 30000L), hits(zdir, "z", 450L))
    assert(px < 16 && py < 16 && pz < 16,
      s"3-dim z-order must prune on every dim, got x=$px y=$py z=$pz of 16")
    assert(hits(sdir, "y", 30000L) == 16 && hits(sdir, "z", 450L) == 16,
      "x-sorted baseline must not prune the other dims")
  }

  test("zValueN(3): bit i of dim d lands at position 3i+d (reference interleave)") {
    // mask-cascade vs the naive bit-by-bit definition (q_zorder3_cells
    // hash-checks the same algebra against DuckDB's replay)
    def refZ(x: Long, y: Long, z: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc |
          (((x >> i) & 1L) << (3 * i)) |
          (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }
    val probes = Seq((0L, 0L, 0L), (65535L, 65535L, 65535L), (1L, 2L, 4L),
      (12345L, 54321L, 4097L), (0xAAAAL, 0x5555L, 0xF0F0L))
    val got = probes.toDF("x", "y", "z")
      .select(Layout.zValueN(Seq($"x", $"y", $"z")).as("zv"))
      .as[Long].collect().toSeq
    assert(got == probes.map { case (x, y, z) => refZ(x, y, z) },
      s"mask cascade diverges from the bit-by-bit interleave: $got")
  }
}
