package graft

import org.apache.spark.sql.functions._
import graft.text.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("packSequences: shard-local token stream, EOS accounting, straddle marks") {
    // One shard so the stream is a single deterministic sequence.
    val docs = Seq(
      (1L, "a b c"),         // 3 tokens
      (2L, "d e f g h"),     // 5
      (3L, ""),              // empty -> drops
      (4L, "i j"),           // 2
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", ctxLen = 8, shards = 1)
      .orderBy("tok_start")
      .select("doc_id", "n_tokens", "tok_start", "bin_first", "bin_last", "straddles")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out.length == 3, s"empty doc must drop: $out")
    // Offsets chain: each doc advances n_tokens + 1 (EOS).
    out.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 == a._3 + a._2 + 1, s"stream must be gapless: $out")
      case _ =>
    }
    // Every token lands in exactly the floor(tok/8) bin; straddle is
    // bin_last > bin_first.
    out.foreach { case (_, n, start, bf, bl, st) =>
      assert(bf == start / 8 && bl == (start + n) / 8, s"bins wrong: $out")
      assert(st == (bl > bf))
    }
    // The total stream length is sum(n+1); at ctx 8 and 13 tokens + 3
    // EOS = 16 stream positions, at least one doc must straddle a cut.
    assert(out.exists(_._6), s"a straddling doc is expected here: $out")
  }

  test("packSequences: shards bound the window partitions; ids stay in their md5 shard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Packing.packSequences(docs, "doc_id", "text", ctxLen = 256, shards = 16)
    val shardOf = packed.select(
      col("doc_id"),
      col("shard"),
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
        lit(16)).as("expect"))
    assert(shardOf.filter(col("shard") =!= col("expect")).count() == 0)
    assert(packed.select("shard").distinct().count() <= 16)
    // packStats covers every bin a doc touches exactly once.
    val stats = Packing.packStats(packed)
    val binsFromDocs = packed
      .select(col("shard"), explode(sequence(col("bin_first"), col("bin_last"))).as("bin"))
      .groupBy("shard", "bin").count()
    assert(stats.count() == binsFromDocs.count())
    assert(stats.agg(sum("n_docs")).as[Long].head() ==
      binsFromDocs.agg(sum("count")).as[Long].head())
  }

  test("packGreedy: next-fit bins never straddle; oversize docs bin alone, flagged") {
    // One shard → a single deterministic fold. md5-rank order for these
    // ids is computed by the operator itself; the invariants below are
    // order-free.
    val docs = Seq(
      (1L, Seq.fill(5)("t").mkString(" ")),   // 5 tokens
      (2L, Seq.fill(4)("t").mkString(" ")),   // 4
      (3L, Seq.fill(7)("t").mkString(" ")),   // 7
      (4L, Seq.fill(12)("t").mkString(" ")),  // 12 > ctx → truncated, own bin
      (5L, Seq.fill(3)("t").mkString(" ")),   // 3
      (6L, ""),                               // drops
    ).toDF("doc_id", "text")
    val out = Packing.packGreedy(docs, "doc_id", "text", ctxLen = 8, shards = 1)
      .select("doc_id", "n_tokens", "bin", "truncated")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.length == 5, s"empty doc must drop: $out")
    // Capacity invariant: per bin, the sum of effective sizes fits ctx.
    out.groupBy(_._3).foreach { case (bin, ds) =>
      val fill = ds.map(d => math.min(d._2, 8L)).sum
      assert(fill <= 8, s"bin $bin overfilled: $ds")
    }
    // The oversize doc is flagged and alone in its bin.
    val big = out.find(_._1 == 4L).get
    assert(big._4, "12-token doc must be truncated at ctx 8")
    assert(out.count(_._3 == big._3) == 1, s"oversize doc must bin alone: $out")
    assert(out.filter(_._1 != 4L).forall(!_._4))
    // Bins are dense from 0.
    val bins = out.map(_._3).distinct.sorted
    assert(bins == (0L until bins.length).toSeq, s"bins not dense: $bins")
  }

  test("packGreedyAppend: split-append is bit-identical to one-shot packGreedy") {
    // Split the corpus at a global md5-rank threshold: every shard sees
    // batch 1's docs strictly before batch 2's, which is exactly the
    // order one-shot packGreedy folds them in — so
    // append(append(empty, b1), b2) must reproduce the one-shot layout
    // row for row, including tail-bin fills carried across the seam.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rank = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    val withRank = docs.withColumn("__r", rank)
    val median = withRank.stat.approxQuantile("__r", Array(0.5), 0.0).head.toLong
    val b1 = withRank.filter(col("__r") < median).drop("__r")
    val b2 = withRank.filter(col("__r") >= median).drop("__r")
    val empty = Packing.emptyPackState(spark)
    val p1 = Packing.packGreedyAppend(b1, "doc_id", "text", ctxLen = 64, shards = 4, state = empty)
      .localCheckpoint()
    val s1 = Packing.packState(empty, p1, ctxLen = 64).localCheckpoint()
    val p2 = Packing.packGreedyAppend(b2, "doc_id", "text", ctxLen = 64, shards = 4, state = s1)
    val appended = p1.unionByName(p2)
      .select("doc_id", "shard", "n_tokens", "bin", "truncated")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val oneShot = Packing.packGreedy(docs, "doc_id", "text", ctxLen = 64, shards = 4)
      .select("doc_id", "shard", "n_tokens", "bin", "truncated")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(appended == oneShot,
      s"diff: ${(appended diff oneShot).take(5)} / ${(oneShot diff appended).take(5)}")
    // And the rolled state after both appends equals the one-shot tail.
    val s2 = Packing.packState(s1, p2, ctxLen = 64)
      .as[(Long, Long, Long)].collect().toSet
    val oneTail = {
      val p = Packing.packGreedy(docs, "doc_id", "text", ctxLen = 64, shards = 4)
      Packing.packState(Packing.emptyPackState(spark), p, ctxLen = 64)
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(s2 == oneTail, s"state drift: $s2 vs $oneTail")
  }

  test("chunkTokens: stride windows with short tail; content preserved; no shuffle") {
    val docs = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (8L, "solo")).toDF("doc_id", "text")
    val out = Packing.chunkTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "tok_start", "chunk_len", "chunk_text")
      .as[(Long, Int, Long, Long, String)].collect().toSeq
    val d7 = out.filter(_._1 == 7L)
    assert(d7.map(c => (c._3, c._4)) == Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 1L)), d7.toString)
    assert(d7.head._5 == "t0 t1 t2 t3")
    assert(d7.last._5 == "t9", "tail chunk keeps the remainder")
    // Consecutive chunks overlap by window - stride = 1 token.
    assert(d7(1)._5 == "t3 t4 t5 t6")
    assert(out.filter(_._1 == 8L) == Seq((8L, 0, 0L, 1L, "solo")))
    // Scan-side operator: no exchange anywhere in the plan.
    val plan = Packing.chunkTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
