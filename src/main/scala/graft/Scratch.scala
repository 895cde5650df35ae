package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for perf work — not part of the library surface.
  *
  * Current experiment (r14): split the remaining bench-scale hot queries
  * into their stages to see which ones carry the seconds.
  *  - the basket-pair substrate (lineitem → co-purchase edges) feeds ~10
  *    graph queries; time its three stages separately;
  *  - q_bradley_terry = comp aggregation (real work) vs MM rounds
  *    (bounded model) — which side is the 3.4 s?
  *  - the trivial-query floor: one small join, timed end-to-end, tells
  *    us the per-query fixed cost nothing algorithmic can beat.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    // fail fast rather than default to a machine-specific absolute path:
    // profiling numbers against an unintended scale dir are worse than
    // no numbers
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.error(
      "Scratch: set SPARK_GRAFT_SF_DIR to the parquet scale dir to profile " +
        "(e.g. target/sf1 from MakeScale, or a testdata sf dir)"))
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

    def time[A](label: String)(f: => A): A = {
      f // warm pass: JIT + parquet footer caches; report the steady run
      var best = Long.MaxValue; var r: A = null.asInstanceOf[A]
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); r = f
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"[scratch] $label: ${best / 1e9}%.2f s"); r
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- basket-pair substrate stages ---------------------------------
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def baskets = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    def rawPairs = baskets
      .select(posexplode(col("ps")).as(Seq("pos", "a")), col("ps"))
      .select(col("a"), explode(slice(col("ps"), col("pos") + 2, size(col("ps")))).as("b"))
    def pairs = rawPairs.groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    time("baskets only (groupBy collect_set)")(noop(baskets))
    time("baskets + pair explosion (no second agg)")(noop(rawPairs))
    time("full pair substrate (second agg + filter)")(noop(pairs))
    val nPairsRaw = rawPairs.count()
    val nPairs = pairs.count()
    println(s"[scratch] raw pair rows: $nPairsRaw, surviving (n>=2): $nPairs")

    // ---- q_bradley_terry split ----------------------------------------
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def cTab = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    def comp = {
      val c = cTab
      val a = c.toDF("user_id", "ta", "ca")
      val b = c.toDF("user_id", "tb", "cb")
      a.join(b, Seq("user_id"))
        .filter(col("ta") =!= col("tb") && col("ca") > col("cb"))
        .groupBy(col("ta").as("winner"), col("tb").as("loser"))
        .agg(count(lit(1)).as("n"))
    }
    time("bradley_terry: comp aggregation only")(noop(comp))
    time("bradley_terry: full (comp + 3 MM rounds)")(
      noop(graft.core.Preference.bradleyTerry(comp, "winner", "loser", "n", iters = 3)))

    // ---- substring-dedup stages ----------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[scratch] docs: ${docs.count()} rows, ${docs.agg(sum(length(col("text")))).head().getLong(0)} chars")
    import graft.text.SubstringDedup
    time("substr: gramStream stride-1 gen only")(
      noop(SubstringDedup.gramStream(docs, "doc_id", "text", 40, 1)))
    time("substr: sharedSpans full")(
      noop(SubstringDedup.sharedSpans(docs, "doc_id", "text", gramLen = 40, minSpan = 60)))
    time("substr: removeShared full (scrub)")(
      noop(SubstringDedup.removeShared(docs, "doc_id", "text", gramLen = 40, minSpan = 60)))

    // ---- containment/setsim incremental stages -------------------------
    import graft.similarity.SetSimJoin
    val shingles = graft.text.TextAnalysis.wordShingles(col("text"), 3)
    time("setsim: buildIndex only")({
      val (a, b) = SetSimJoin.buildIndex(docs.filter(col("doc_id") % 4 =!= 0), col("doc_id"), shingles)
      noop(a); noop(b)
    })
    time("containment_incremental: full")({
      val idx = SetSimJoin.buildIndex(docs.filter(col("doc_id") % 4 =!= 0), col("doc_id"), shingles)
      noop(SetSimJoin.containmentIncrement(docs.filter(col("doc_id") % 4 === 0), col("doc_id"), shingles, idx, t = 0.5))
    })
    time("setsim_incremental: full")({
      val idx2 = SetSimJoin.buildIndex(docs.filter(col("doc_id") % 2 =!= 0), col("doc_id"), shingles)
      noop(SetSimJoin.selfJoinIncrement(docs.filter(col("doc_id") % 2 === 0), col("doc_id"), shingles, idx2, t = 0.5))
    })

    // ---- trivial-query floor ------------------------------------------
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    time("floor: orders join customer + agg")(
      noop(ord.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"), sum("o_totalprice"))))
    time("floor: single parquet scan + count agg")(
      noop(ord.groupBy("o_orderstatus").agg(count(lit(1)))))
    spark.stop()
  }
}
