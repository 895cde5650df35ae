package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for perf work — not part of the library surface.
  *
  * Current experiment: IVM amortization. At N× events, compare the cost
  * of maintaining the q_ivm_agg view for ONE day's delta (read standing
  * state + aggState(delta) + merge + write new state) against the full
  * one-shot recompute — the claim is maintenance ~ O(|delta| + |state|),
  * independent of history size. Same shape for the join view: the three
  * joinDelta terms against a 1-day orders delta vs the full join.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder()
      // the library extension: kernel SQL surface + the FuseTokenCount
      // optimizer rule — the documented way to run the engine
      .withExtensions(new GraftExtensions())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    import graft.core.Ivm

    def time[A](label: String)(f: => A): A = {
      f // warm pass: JIT + parquet footer caches; report the steady run
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val keys = Seq("event_type", "ubucket")
    // Recompute cost grows with the corpus; maintenance cost must NOT —
    // measure both at two corpus sizes with the SAME one-day delta.
    for (dir <- Seq("/root/testdata/sf0.1", sfDir)) {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"), (col("user_id") % 10).cast("int").as("ubucket"),
          col("value").cast("decimal(18,6)").as("v"), dayofmonth(col("ts")).as("day"))
      val n = ev.count()
      time(s"agg: full one-shot recompute over $n rows") {
        Ivm.aggState(ev, keys, "v").collect().length
      }
      val statePath = "target/testtmp/ivm_scale_state"
      // standing state = history through day 29 (built once; not
      // maintenance); the delta lands as its own file, as a daily ingest
      // would — maintenance never touches the history table at all.
      Ivm.aggState(ev.filter(col("day") <= 29), keys, "v")
        .write.mode("overwrite").parquet(statePath)
      ev.filter(col("day") === 30)
        .write.mode("overwrite").parquet(statePath + "_delta")
      val dn = spark.read.parquet(statePath + "_delta").count()
      time(s"agg: maintain one-day delta ($dn rows) against $n-row history") {
        val delta = Ivm.aggState(spark.read.parquet(statePath + "_delta"), keys, "v")
        Ivm.mergeAggStates(spark.read.parquet(statePath), delta, keys)
          .write.mode("overwrite").parquet(statePath + "_next")
        spark.read.parquet(statePath + "_next").count()
      }
    }

    // ----- join view -----
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"), col("o_orderdate"))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    println(s"[scratch] orders rows: ${orders.count()}, customer rows: ${cust.count()}")
    time("join: full recompute (count)") {
      orders.join(cust, Seq("c_custkey")).count()
    }
    val cut = to_timestamp(lit("2001-07-01")) // last-month delta
    val aOld = orders.filter(col("o_orderdate") < cut)
    val aDelta = orders.filter(col("o_orderdate") >= cut)
    println(s"[scratch] orders delta rows: ${aDelta.count()}")
    time("join: delta terms only (count)") {
      // append-only delta on one side: ΔA ⋈ B (B unchanged) — the daily term
      aDelta.join(broadcast(cust), Seq("c_custkey")).count()
    }

    // ----- FuseTokenCount kernel vs HOF chain -----
    // the '\\s{1,}' regex dodges the rule, so this times the UNFUSED
    // chain against the fused one on identical data
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).localCheckpoint()
    println(s"[scratch] docs rows: ${docs.count()}")
    time("token count: HOF chain (unfused)") {
      docs.select(sum(size(filter(split(trim(col("text")), "\\s{1,}"),
        _ =!= "")))).collect()
    }
    time("token count: fused kernel (rule-rewritten)") {
      docs.select(sum(size(filter(split(trim(col("text")), "\\s+"),
        _ =!= "")))).collect()
    }
    spark.stop()
  }
}
