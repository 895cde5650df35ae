package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for perf work — not part of the library surface.
  *
  * Current experiment (r14 optimization round): stage-split the remaining
  * bench-scale hot queries and A/B the candidate rewrites BEFORE touching
  * the registry:
  *  - q_minhash_union: the 16 md5 signature hashes run per DUPLICATED
  *    (source, shard, sh) row; min-hash over distinct (source, sh) is
  *    identical and the exact side already needs that distinct — variant
  *    computes signatures from the shared distinct.
  *  - q_kendall_tau: the per-month supplier pair join explodes from a
  *    tiny AQE-coalesced aggregate (~1 partition) — variant repartitions
  *    the probe side first so the expansion parallelizes.
  *  - PQ family: where do the seconds sit — codebook fit, encode pass,
  *    ADC scan? (encode/ADC run interpreted HOFs today.)
  *  - substring dedup: gram stream vs stats agg vs semi-joins vs splice.
  *  - q_sssp/q_harmonic: sources derive from the UN-checkpointed edge
  *    plan — variant checkpoints the substrate once.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error(
      "Scratch: set SPARK_GRAFT_SF_DIR to the parquet scale dir to profile " +
        "(e.g. target/sf1 from MakeScale, or a testdata sf dir)"))
    val only = sys.env.get("SCRATCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("SCRATCH_MAXFIELDS", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): Unit = {
      if (only.forall(_.exists(label.startsWith))) {
        f // warm pass: JIT + parquet footer caches; report the steady run
        var best = Long.MaxValue
        for (_ <- 1 to 3) {
          val t0 = System.nanoTime(); f
          best = math.min(best, System.nanoTime() - t0)
        }
        println(f"[scratch] $label: ${best / 1e9}%.2f s")
      }
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"), col("lang"), col("n_chars"))

    // ---- q_minhash_union: current vs distinct-first ---------------------
    def h(i: Int): Column = conv(substring(
      md5(concat(lit(s"${i}_"), col("sh"))), 1, 8), 16, 10).cast("long")
    time("minhash_union: current full") {
      val sh = docs.select(col("source"), (col("doc_id") % 4).as("shard"),
        explode(array_distinct(graft.text.TextAnalysis.wordShingles(col("text"), 3))).as("sh"))
        .localCheckpoint(eager = false)
      val sigAggs = (0 until 16).map(i => min(h(i)).as(s"sig$i"))
      val partial = sh.groupBy("source", "shard").agg(sigAggs.head, sigAggs.tail: _*)
      val mergeAggs = (0 until 16).map(i => min(col(s"sig$i")).as(s"sig$i"))
      val merged = partial.groupBy("source").agg(mergeAggs.head, mergeAggs.tail: _*)
      val setsAll = sh.select(col("source"), col("sh")).distinct()
      val sets = setsAll.join(
        setsAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 64).select("sh"),
        Seq("sh"), "leftsemi")
      val sizes = sets.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = sets.as("x").join(sets.as("y"),
          col("x.sh") === col("y.sh") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      val nMatch = (0 until 16)
        .map(i => when(col(s"a.sig$i") === col(s"b.sig$i"), 1L).otherwise(0L))
        .reduceLeft(_ + _)
      val pairs = merged.as("a")
        .join(broadcast(merged.as("b")), col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          nMatch.as("n_match_sig"))
      noop(pairs
        .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))), Seq("source_b"))
        .join(inter, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"), col("n_match_sig"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))).as("n_union"),
          (col("n_match_sig") / lit(16.0)).as("est_jaccard"),
          (coalesce(col("n_inter"), lit(0L)).cast("double") /
            (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))).cast("double"))
            .as("jaccard")))
    }
    time("minhash_union: distinct-first variant") {
      val sets = docs.select(col("source"),
          explode(array_distinct(graft.text.TextAnalysis.wordShingles(col("text"), 3))).as("sh"))
        .distinct()
        .localCheckpoint(eager = false)
      val sigAggs = (0 until 16).map(i => min(h(i)).as(s"sig$i"))
      val merged = sets.groupBy("source").agg(sigAggs.head, sigAggs.tail: _*)
      val kept = sets.join(
        sets.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 64).select("sh"),
        Seq("sh"), "leftsemi")
      val sizes = kept.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = kept.as("x").join(kept.as("y"),
          col("x.sh") === col("y.sh") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      val nMatch = (0 until 16)
        .map(i => when(col(s"a.sig$i") === col(s"b.sig$i"), 1L).otherwise(0L))
        .reduceLeft(_ + _)
      val pairs = merged.as("a")
        .join(broadcast(merged.as("b")), col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          nMatch.as("n_match_sig"))
      noop(pairs
        .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))), Seq("source_b"))
        .join(inter, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"), col("n_match_sig"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))).as("n_union"),
          (col("n_match_sig") / lit(16.0)).as("est_jaccard"),
          (coalesce(col("n_inter"), lit(0L)).cast("double") /
            (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))).cast("double"))
            .as("jaccard")))
    }

    // ---- q_kendall_tau: current vs repartitioned pair join --------------
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def kendall(repart: Boolean): DataFrame = {
      val d = (c: Column) => c.cast("double")
      val m0 = li.select(
          month(col("l_shipdate").cast("timestamp")).as("mth"),
          col("l_suppkey"),
          col("l_quantity").cast("decimal(12,2)").as("q"),
          col("l_extendedprice").cast("decimal(12,2)").as("r"))
        .groupBy("mth", "l_suppkey")
        .agg(sum(col("q")).as("qty"), sum(col("r")).as("rev"))
      val m = (if (repart) m0.repartition(32, col("mth"), col("l_suppkey")) else m0)
        .localCheckpoint(eager = false)
      val sgn = (a: Column, b: Column) =>
        when(a > b, 1L).when(a < b, -1L).otherwise(0L)
      val pairs = m.select(col("mth"), col("l_suppkey").as("ka"),
          col("qty").as("qa"), col("rev").as("ra"))
        .join(m.select(col("mth"), col("l_suppkey").as("kb"),
          col("qty").as("qb"), col("rev").as("rb")), Seq("mth"))
        .filter(col("ka") < col("kb"))
        .groupBy("mth")
        .agg(sum(sgn(col("qa"), col("qb")) * sgn(col("ra"), col("rb"))).as("cmd"))
      val tq = m.groupBy(col("mth"), col("qty")).agg(count(lit(1)).as("c"))
        .groupBy("mth").agg(sum(col("c") * (col("c") - 1)).as("t1x2"))
      val tr = m.groupBy(col("mth"), col("rev")).agg(count(lit(1)).as("c"))
        .groupBy("mth").agg(sum(col("c") * (col("c") - 1)).as("t2x2"))
      val nn = m.groupBy("mth").agg(count(lit(1)).as("n_supp"))
        .withColumn("n0x2", col("n_supp") * (col("n_supp") - 1))
      nn.join(pairs, Seq("mth")).join(tq, Seq("mth")).join(tr, Seq("mth"))
        .select(col("mth"), col("n_supp"), col("cmd"),
          round(lit(2.0) * d(col("cmd")) /
            sqrt(d(col("n0x2") - col("t1x2")) * d(col("n0x2") - col("t2x2"))), 9)
            .as("tau_b"))
    }
    time("kendall_tau: current")(noop(kendall(repart = false)))
    time("kendall_tau: repartitioned")(noop(kendall(repart = true)))

    // ---- PQ family stage split ------------------------------------------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    import graft.similarity.Ann
    time("pq: codebook fit only") {
      Ann.pqCodebooks(emb, "vec_id", "embedding", dim = 64, m = 8, ksub = 16, iters = 2)
    }
    locally {
      lazy val books = Ann.pqCodebooks(emb, "vec_id", "embedding", dim = 64, m = 8, ksub = 16, iters = 2)
      time("pq: encode pass only (books prefit)") {
        noop(Ann.pqEncode(emb, "vec_id", "embedding", books))
      }
      time("pq: full topk (fit+encode+adc+rerank)") {
        noop(Ann.pqTopK(emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
          books, k = 5, rerank = 32))
      }
    }
    time("ivfpq: full query shape") {
      val books = Ann.pqCodebooks(emb, "vec_id", "embedding", dim = 64, m = 8, ksub = 16, iters = 2)
      noop(Ann.ivfPqTopK(emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        books, k = 5, nList = 8, nProbe = 3, coarseIters = 3, rerank = 32))
    }

    // ---- substring-dedup stages ------------------------------------------
    import graft.text.SubstringDedup
    val d2 = docs.select(col("doc_id"), col("text"))
    time("substr: gramStream stride-1 gen only")(
      noop(SubstringDedup.gramStream(d2, "doc_id", "text", 40, 1)))
    time("substr: sharedSpans full")(
      noop(SubstringDedup.sharedSpans(d2, "doc_id", "text", gramLen = 40, minSpan = 60)))
    time("substr: removeShared full (scrub)")(
      noop(SubstringDedup.removeShared(d2, "doc_id", "text", gramLen = 40, minSpan = 60)))

    // ---- q_sssp / q_harmonic: un-checkpointed sources vs checkpointed ----
    def substrate(ckpt: Boolean): DataFrame = {
      val baskets = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val pairs = baskets
        .select(posexplode(col("ps")).as(Seq("pos", "a")), col("ps"))
        .select(col("a"), explode(slice(col("ps"), col("pos") + 2, size(col("ps")))).as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .withColumn("w", floor(lit(1000.0) / col("n").cast("double")).cast("long"))
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst"), col("w")))
      if (ckpt) edges.localCheckpoint(eager = false) else edges
    }
    time("substrate: pairs+edges alone")(noop(substrate(ckpt = false)))
    time("sssp: current (sources off raw plan)") {
      val edges = substrate(ckpt = false)
      val sources = edges.select(col("src")).distinct()
        .orderBy(col("src")).limit(3).select(col("src").as("source"))
      noop(graft.graph.ShortestPath.runAdaptive(edges, sources, iters = 6)
        .select(col("source"), col("node").as("part"), col("dist")))
    }
    time("sssp: checkpointed substrate variant") {
      val edges = substrate(ckpt = true)
      val sources = edges.select(col("src")).distinct()
        .orderBy(col("src")).limit(3).select(col("src").as("source"))
      noop(graft.graph.ShortestPath.runAdaptive(edges, sources, iters = 6)
        .select(col("source"), col("node").as("part"), col("dist")))
    }

    // ---- containment / setsim incremental stages --------------------------
    import graft.similarity.SetSimJoin
    val shingles = graft.text.TextAnalysis.wordShingles(col("text"), 3)
    time("setsim: buildIndex only") {
      val (a, b) = SetSimJoin.buildIndex(d2.filter(col("doc_id") % 4 =!= 0), col("doc_id"), shingles)
      noop(a); noop(b)
    }
    time("setsim: buildIndex toks-checkpointed variant") {
      val base = d2.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id").as("sid"), array_distinct(shingles).as("ts"))
        .filter(size(col("ts")) > 0)
      val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
        .localCheckpoint(false)
      val dict = toks.groupBy("tok").agg(count(lit(1)).as("dfr"))
      val ordered = toks
        .join(dict, "tok")
        .groupBy("sid")
        .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
        .select(col("sid"),
          transform(col("pairs"), e => e.getField("tok")).as("arr"),
          size(col("pairs")).as("m"))
      noop(ordered.localCheckpoint(false)); noop(dict.localCheckpoint(false))
    }
    time("setsim: buildIndex stage1 toks+dict only") {
      val base = d2.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id").as("sid"), array_distinct(shingles).as("ts"))
        .filter(size(col("ts")) > 0)
      val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
      noop(toks.groupBy("tok").agg(count(lit(1)).as("dfr")))
    }
    time("setsim: buildIndex stage2 collect_list only") {
      val base = d2.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id").as("sid"), array_distinct(shingles).as("ts"))
        .filter(size(col("ts")) > 0)
      val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
      val dict = toks.groupBy("tok").agg(count(lit(1)).as("dfr"))
      noop(toks.join(dict, "tok")
        .groupBy("sid")
        .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs")))
    }
    time("containment_incremental: full") {
      val idx = SetSimJoin.buildIndex(d2.filter(col("doc_id") % 4 =!= 0), col("doc_id"), shingles)
      noop(SetSimJoin.containmentIncrement(d2.filter(col("doc_id") % 4 === 0), col("doc_id"), shingles, idx, t = 0.5))
    }
    // ---- containmentIncrement sub-stages (index prebuilt+materialized) --
    locally {
      val t = 0.5
      val (idxSets0, dict0) = SetSimJoin.buildIndex(d2.filter(col("doc_id") % 4 =!= 0), col("doc_id"), shingles)
      noop(idxSets0); noop(dict0) // materialize the standing halves outside the timed region
      val batch = d2.filter(col("doc_id") % 4 === 0)
      def mkParts() = {
        val base = batch.select(col("doc_id").as("sid"), array_distinct(shingles).as("ts"))
          .filter(size(col("ts")) > 0)
        val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
        val batchVocab = toks.select("tok").distinct().localCheckpoint(false)
        val dictPruned = dict0.join(batchVocab, Seq("tok"), "left_semi")
        val ordered = toks
          .join(dictPruned, Seq("tok"), "left")
          .withColumn("dfr", coalesce(col("dfr"), lit(0L)))
          .groupBy("sid")
          .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
          .select(col("sid"),
            transform(col("pairs"), e => e.getField("tok")).as("arr"),
            size(col("pairs")).as("m"))
          .localCheckpoint(false)
        (batchVocab, ordered)
      }
      time("cinc: batch ordered build only") { val (_, o) = mkParts(); noop(o) }
      time("cinc: candidates (join+distinct) only") {
        val (bv, o) = mkParts()
        def prefixOf(sets: org.apache.spark.sql.DataFrame) = sets.select(
          col("sid"), col("m"),
          posexplode(slice(col("arr"), lit(1),
            col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))).as(Seq("pos", "tok")))
        def postingsOf(sets: org.apache.spark.sql.DataFrame) = sets.select(
          col("sid").as("bsid"), col("m").as("mb"),
          posexplode(col("arr")).as(Seq("posb", "tok")))
        val lenPrune =
          col("mb").cast("double") >= ceil(lit(t) * col("m").cast("double")) - lit(1e-9) &&
            (lit(1) + least(col("m") - col("pos") - 1, col("mb") - col("posb") - 1))
              .cast("double") >=
              ceil(lit(t) * col("m").cast("double")) - lit(1e-9)
        val iPosts = postingsOf(idxSets0).join(bv, Seq("tok"), "left_semi")
        val iPrefix = prefixOf(idxSets0).join(bv, Seq("tok"), "left_semi")
        val probe = prefixOf(o).withColumn("pidx", lit(false))
          .unionByName(iPrefix.withColumn("pidx", lit(true)))
        val posts = postingsOf(o).withColumn("bidx", lit(false))
          .unionByName(iPosts.withColumn("bidx", lit(true)))
        noop(probe.join(posts, Seq("tok"))
          .filter(col("sid") =!= col("bsid") && !(col("pidx") && col("bidx")) && lenPrune)
          .select(col("sid").as("da"), col("bsid").as("db"), col("pidx"), col("bidx"))
          .distinct())
      }
    }
    time("setsim_incremental: full") {
      val idx2 = SetSimJoin.buildIndex(d2.filter(col("doc_id") % 2 =!= 0), col("doc_id"), shingles)
      noop(SetSimJoin.selfJoinIncrement(d2.filter(col("doc_id") % 2 === 0), col("doc_id"), shingles, idx2, t = 0.5))
    }
    time("containment: one-shot full") {
      noop(SetSimJoin.containmentJoin(d2, col("doc_id"), shingles, t = 0.5))
    }

    // ---- sparse / rbo stages ----------------------------------------------
    import graft.similarity.SparseSim
    time("sparse: postings build only")(
      noop(SparseSim.postings(d2, "doc_id", "text", shingleLen = 3, dfCap = 100)))
    time("sparse: postings window-norm variant") {
      val toks0 = graft.text.TextAnalysis.tokens(col("text"))
      val tf = d2.select(col("doc_id"),
          explode(graft.functions.GraftFunctions.wordShingles(toks0, 3)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = false)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = d2.agg(count(lit(1)).as("n_docs"))
      val w = tf
        .join(df.filter(col("df") <= 100), Seq("term"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") < col("n_docs"))
        .withColumn("w",
          col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")))
      val byDoc = Window.partitionBy("doc_id")
      noop(w.withColumn("norm",
          sqrt(sum((col("w") * col("w")).cast("decimal(28,12)")).over(byDoc).cast("double")))
        .select(col("doc_id"), col("term"), (col("w") / col("norm")).as("u")))
    }
    time("sparse_topk: full")(
      noop(SparseSim.topKNeighbors(
        SparseSim.postings(d2, "doc_id", "text", shingleLen = 3, dfCap = 100), k = 5)))
    time("rbo: bm25 half")(
      noop(SparseSim.bm25TopK(d2, idCol = "doc_id", textCol = "text",
        isQuery = col("doc_id") % 17 === 0, k = 10)))
    time("rbo: lex half")(
      noop(SparseSim.topKNeighborsFor(
        SparseSim.postings(d2, idCol = "doc_id", textCol = "text", shingleLen = 3, dfCap = 100),
        isQuery = col("doc_id") % 17 === 0, k = 10)))

    // ---- dedup clusters incremental stages --------------------------------
    import graft.similarity.NearDup
    time("dedup_clusters_inc: base labels half") {
      val base = d2.filter(col("doc_id") % 10 =!= 0)
      noop(NearDup.connectedComponentsAdaptive(
        NearDup.jaccardVerify(
          NearDup.minhashCandidates(base, "doc_id", "text",
            shingleLen = 3, numHashes = 16, bands = 16, maxBucket = 10000),
          base, "doc_id", "text", shingleLen = 3, minJaccard = 0.5),
        "doc_id_a", "doc_id_b"))
    }
    time("dedup_clusters_inc: full") {
      val base = d2.filter(col("doc_id") % 10 =!= 0)
      val batch = d2.filter(col("doc_id") % 10 === 0)
      val baseLabels = NearDup.connectedComponentsAdaptive(
        NearDup.jaccardVerify(
          NearDup.minhashCandidates(base, "doc_id", "text",
            shingleLen = 3, numHashes = 16, bands = 16, maxBucket = 10000),
          base, "doc_id", "text", shingleLen = 3, minJaccard = 0.5),
        "doc_id_a", "doc_id_b")
      val newPairs = NearDup.jaccardVerify(
        NearDup.incrementalCandidates(batch, base, "doc_id", "text",
          shingleLen = 3, numHashes = 16, bands = 16, maxBucket = 10000),
        d2, "doc_id", "text", shingleLen = 3, minJaccard = 0.5)
      noop(NearDup.incrementalComponents(baseLabels, newPairs, "doc_id_a", "doc_id_b")
        .select(col("id").as("doc_id"), col("label").as("cluster")))
    }

    // ---- pca moment aggregate (153 decimal aggs — codegen-fallback probe)
    time("pca: moment agg alone") {
      def x(i: Int) = element_at(col("embedding"), i).cast("double")
      val moCols =
        (1 to 16).map(i => sum(x(i).cast("decimal(28,12)")).cast("double").as(s"s$i")) ++
          (for { i <- 1 to 16; j <- i to 16 }
            yield sum((x(i) * x(j)).cast("decimal(28,12)")).cast("double").as(s"p${i}_$j"))
      noop(emb.agg(count(lit(1)).cast("double").as("n"), moCols: _*))
    }
    time("pca: moment agg, double sums (no decimal) — diagnostic only") {
      def x(i: Int) = element_at(col("embedding"), i).cast("double")
      val moCols =
        (1 to 16).map(i => sum(x(i)).as(s"s$i")) ++
          (for { i <- 1 to 16; j <- i to 16 } yield sum(x(i) * x(j)).as(s"p${i}_$j"))
      noop(emb.agg(count(lit(1)).cast("double").as("n"), moCols: _*))
    }

    // ---- trivial-query floor ------------------------------------------
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    time("floor: single parquet scan + count agg")(
      noop(ord.groupBy("o_orderstatus").agg(count(lit(1)))))
    spark.stop()
  }
}
