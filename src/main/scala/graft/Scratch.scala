package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for perf work — not part of the library surface.
  *
  * Current experiment set (r15 optimization round): A/B the candidate
  * rewrites from the r14 verdict queue BEFORE touching the registry:
  *  - basket-pair substrate: the posexplode×slice successor chain (two
  *    Generate nodes, parent array duplicated per row) vs ONE
  *    explode(graft_successor_pairs(ps)) — feeds ~15 graph queries;
  *  - SparseSim.postings: fold the norm aggregation into a per-doc
  *    collect agg (5 → 4 keyed shuffles) vs the norm agg + join;
  *  - SetSimJoin.selfJoinIncrement: prune the index-side prefixes by the
  *    batch vocabulary (the containment variant already does);
  *  - q_dedup_clusters_incremental: share ONE minhash-signature corpus
  *    pass between the base and incremental candidate calls;
  *  - q_containment one-shot: stage split (prefix / postings / candidate
  *    join / verify) to decide whether any prefilter can pay.
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): Unit = {
      if (only.forall(_.exists(label.startsWith))) {
        spark.sparkContext.setJobDescription(label)
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
    val d2 = docs.select(col("doc_id"), col("text"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    // ---- basket-pair substrate: posexplode×slice vs successor kernel ----
    def basketPairs(kernel: Boolean): DataFrame = {
      val baskets = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val raw =
        if (kernel)
          baskets
            .select(explode(graft.functions.GraftFunctions.successorPairs(col("ps"))).as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b"))
        else
          baskets
            .select(posexplode(col("ps")).as(Seq("pos", "a")), col("ps"))
            .select(col("a"), explode(slice(col("ps"), col("pos") + 2, size(col("ps")))).as("b"))
      raw.groupBy("a", "b").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    }
    time("substrate: pairs current")(noop(basketPairs(kernel = false)))
    time("substrate: pairs kernel")(noop(basketPairs(kernel = true)))
    def triangles(kernel: Boolean): DataFrame = {
      val edges = basketPairs(kernel).select(col("a").as("pa"), col("b").as("pb"))
        .localCheckpoint(false)
      val tris = edges.select(col("pa").as("a"), col("pb").as("b"))
        .join(edges.select(col("pa").as("b"), col("pb").as("c")), Seq("b"))
        .join(edges.select(col("pa").as("a"), col("pb").as("c")), Seq("a", "c"))
      tris.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
        .groupBy("part").agg(count(lit(1)).as("n_tri"))
    }
    time("triangles: current")(noop(triangles(kernel = false)))
    time("triangles: kernel")(noop(triangles(kernel = true)))

    // ---- SparseSim.postings: norm agg+join vs folded collect agg --------
    def postingsVariant(fold: Boolean): DataFrame = {
      val toks0 = graft.text.TextAnalysis.tokens(col("text"))
      val tf = d2.select(col("doc_id"),
          explode(graft.functions.GraftFunctions.wordShingles(toks0, 3)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = false)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = d2.agg(count(lit(1)).as("n_docs"))
      val w0 = tf
        .join(df.filter(col("df") <= 100), Seq("term"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") < col("n_docs"))
        .withColumn("w",
          col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")))
      if (fold) {
        w0.groupBy("doc_id")
          .agg(
            collect_list(struct(col("term"), col("w"))).as("tw"),
            sqrt(sum((col("w") * col("w")).cast("decimal(28,12)")).cast("double")).as("norm"))
          .select(col("doc_id"), explode(col("tw")).as("t"), col("norm"))
          .select(col("doc_id"), col("t.term").as("term"), (col("t.w") / col("norm")).as("u"))
      } else {
        val w = w0.localCheckpoint(eager = false)
        val norms = w.groupBy("doc_id")
          .agg(sqrt(sum((col("w") * col("w")).cast("decimal(28,12)")).cast("double")).as("norm"))
        w.join(norms, Seq("doc_id"))
          .select(col("doc_id"), col("term"), (col("w") / col("norm")).as("u"))
      }
    }
    time("sparse: postings current")(noop(postingsVariant(fold = false)))
    time("sparse: postings norm-folded")(noop(postingsVariant(fold = true)))
    def topkOver(p: DataFrame, kernel: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val lists = p.groupBy("term")
        .agg(collect_list(struct(col("doc_id"), col("u"))).as("ps"))
        .filter(size(col("ps")) >= 2)
        .select(array_sort(col("ps")).as("ps"))
      val pairs0 =
        if (kernel)
          lists.select(explode(graft.functions.GraftFunctions.successorPairs(col("ps"))).as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b"))
        else
          lists.select(posexplode(col("ps")).as(Seq("pos", "a")), col("ps"))
            .select(col("a"), explode(slice(col("ps"), col("pos") + 2, size(col("ps")))).as("b"))
      val pairs = pairs0
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"),
          sum((col("a.u") * col("b.u")).cast("decimal(28,12)")).cast("double").as("cos"))
      val sym = pairs.unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b"), col("n_shared"), col("cos")))
      val win = Window.partitionBy("doc_a").orderBy(col("cos").desc, col("doc_b").asc)
      sym.withColumn("rn", row_number().over(win)).filter(col("rn") <= 5)
    }
    time("sparse_topk: current full")(
      noop(topkOver(postingsVariant(fold = false), kernel = false)))
    time("sparse_topk: folded+kernel full")(
      noop(topkOver(postingsVariant(fold = true), kernel = true)))
    time("sparse_topk: kernel only (postings current)")(
      noop(topkOver(postingsVariant(fold = false), kernel = true)))
    time("sparse_topk: folded only (pairs current)")(
      noop(topkOver(postingsVariant(fold = true), kernel = false)))

    // ---- selfJoinIncrement: index prefixes unpruned vs batch-vocab-pruned
    import graft.similarity.SetSimJoin
    val shingles = graft.text.TextAnalysis.wordShingles(col("text"), 3)
    def setsimInc(prune: Boolean): DataFrame = {
      val t = 0.5
      val idx = SetSimJoin.buildIndex(d2.filter(col("doc_id") % 2 =!= 0), col("doc_id"), shingles)
      val (idxSets, dict) = idx
      val batch = d2.filter(col("doc_id") % 2 === 0)
      val base = batch
        .select(col("doc_id").as("sid"), array_distinct(shingles).as("ts"))
        .filter(size(col("ts")) > 0)
      val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
      val batchVocab = toks.select("tok").distinct().localCheckpoint(false)
      val dictPruned = dict.join(batchVocab, Seq("tok"), "left_semi")
      val ordered = toks
        .join(dictPruned, Seq("tok"), "left")
        .withColumn("dfr", coalesce(col("dfr"), lit(0L)))
        .groupBy("sid")
        .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
        .select(col("sid"),
          transform(col("pairs"), e => e.getField("tok")).as("arr"),
          size(col("pairs")).as("m"))
        .withColumn("p", col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))
        .localCheckpoint(false)
      val bPrefix = ordered.select(
        col("sid"), col("m"),
        posexplode(slice(col("arr"), lit(1), col("p"))).as(Seq("pos", "tok")))
      val iPrefix0 = idxSets
        .withColumn("p", col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))
        .select(col("sid"), col("m"),
          posexplode(slice(col("arr"), lit(1), col("p"))).as(Seq("pos", "tok")))
      val iPrefix = if (prune) iPrefix0.join(batchVocab, Seq("tok"), "left_semi") else iPrefix0
      val prune2 =
        col("b.m").cast("double") >= lit(t) * col("a.m").cast("double") - lit(1e-9) &&
          col("a.m").cast("double") >= lit(t) * col("b.m").cast("double") - lit(1e-9) &&
          (lit(1) + least(col("a.m") - col("a.pos") - 1, col("b.m") - col("b.pos") - 1))
            .cast("double") >=
            lit(t / (1.0 + t)) * (col("a.m") + col("b.m")).cast("double") - lit(1e-9)
      val posts = iPrefix.withColumn("bidx", lit(true))
        .unionByName(bPrefix.withColumn("bidx", lit(false)))
      val cand = bPrefix.alias("a")
        .join(posts.alias("b"), col("a.tok") === col("b.tok") &&
          (col("b.bidx") || col("a.sid") < col("b.sid")) && prune2)
        .select(col("a.sid").as("da"), col("b.sid").as("db"), col("b.bidx").as("bidx"))
        .distinct()
      val allSets = idxSets.select(col("sid"), col("arr"), col("m"))
        .unionByName(ordered.select(col("sid"), col("arr"), col("m")))
      cand
        .join(ordered.select(col("sid").as("da"), col("arr").as("aa"), col("m").as("ma")), "da")
        .join(allSets.select(col("sid").as("db"), col("arr").as("ab"), col("m").as("mb")), "db")
        .withColumn("inter", size(array_intersect(col("aa"), col("ab"))))
        .withColumn("un", col("ma") + col("mb") - col("inter"))
        .filter(col("inter").cast("double") >= lit(t) * col("un").cast("double"))
        .select(
          col("da").as("batch_id"), col("db").as("partner_id"),
          when(col("bidx"), lit("index")).otherwise(lit("batch")).as("side"),
          col("inter").cast("long").as("inter"),
          col("un").cast("long").as("un"),
          (col("inter").cast("double") / col("un").cast("double")).as("jaccard"))
    }
    time("setsiminc: current (unpruned iPrefix)")(noop(setsimInc(prune = false)))
    time("setsiminc: batch-vocab-pruned iPrefix")(noop(setsimInc(prune = true)))

    // ---- containment one-shot: stage split --------------------------------
    locally {
      val t = 0.5
      def ordered0() = {
        val base = d2.select(col("doc_id").as("sid"), array_distinct(shingles).as("ts"))
          .filter(size(col("ts")) > 0)
        val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
        val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfr"))
        toks.join(dfreq, "tok")
          .groupBy("sid")
          .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
          .select(col("sid"),
            transform(col("pairs"), e => e.getField("tok")).as("arr"),
            size(col("pairs")).as("m"))
      }
      time("containment: ordered build only")(noop(ordered0()))
      time("containment: prefix+postings gen only") {
        val o = ordered0().localCheckpoint(false)
        noop(o.select(col("sid"), col("m"),
          posexplode(slice(col("arr"), lit(1),
            col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))).as(Seq("pos", "tok"))))
        noop(o.select(col("sid").as("bsid"), col("m").as("mb"),
          posexplode(col("arr")).as(Seq("posb", "tok"))))
      }
      time("containment: candidates only") {
        val o = ordered0().localCheckpoint(false)
        val prefix = o.select(col("sid"), col("m"),
          posexplode(slice(col("arr"), lit(1),
            col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))).as(Seq("pos", "tok")))
        val postings = o.select(col("sid").as("bsid"), col("m").as("mb"),
          posexplode(col("arr")).as(Seq("posb", "tok")))
        noop(prefix.join(postings, Seq("tok"))
          .filter(col("sid") =!= col("bsid") &&
            col("mb").cast("double") >=
              ceil(lit(t) * col("m").cast("double")) - lit(1e-9) &&
            (lit(1) + least(col("m") - col("pos") - 1, col("mb") - col("posb") - 1))
              .cast("double") >=
              ceil(lit(t) * col("m").cast("double")) - lit(1e-9))
          .select(col("sid").as("da"), col("bsid").as("db"))
          .distinct())
      }
      time("containment: one-shot full")(
        noop(SetSimJoin.containmentJoin(d2, col("doc_id"), shingles, t = 0.5)))
    }

    // ---- dedup clusters incremental: two corpus passes vs shared sigs ----
    import graft.similarity.NearDup
    time("dedupinc: current full") {
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

    // ---- trivial-query floor ------------------------------------------
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    time("floor: single parquet scan + count agg")(
      noop(ord.groupBy("o_orderstatus").agg(count(lit(1)))))
    spark.stop()
  }
}
