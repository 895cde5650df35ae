package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for perf work — not part of the library surface.
  *
  * Current experiment: FuseRegexCount. The readability/script-detect
  * family counts pattern runs with the double-regexp_replace identity —
  * two full regex-engine passes plus two rewritten string copies per
  * row. The injected rule fuses that to the one-scan RegexCount /
  * RegexMatchedChars kernels. Measure the full q_readability-shaped
  * scan (3 run counts per doc) both ways on sf0.1 documents; the
  * "unfused" control is the XY/Y replacement twin the rule deliberately
  * leaves alone (same two-scan work, same values).
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

    import org.apache.spark.sql.Column
    // The suite corpus is small (~300 chars/doc), so whole-query numbers
    // are job-overhead-bounded; SPARK_GRAFT_REPEAT inflates per-row text
    // to measure the pure per-row kernel factor (the number that scales
    // to 100 TB, where the scan IS the cost).
    val rep = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (if (rep > 1) docs0.withColumn("text", repeat(col("text"), rep))
                else docs0).persist()
    docs.count()

    def fused(c: Column, pat: String): Column =
      length(regexp_replace(c, pat, "X")) - length(regexp_replace(c, pat, ""))
    def twin(c: Column, pat: String): Column =
      length(regexp_replace(c, pat, "XY")) - length(regexp_replace(c, pat, "Y"))

    def readabilityScan(runs: (Column, String) => Column) = {
      val low = lower(col("text"))
      docs.select(
        runs(col("text"), "\\S+").cast("long").as("words"),
        runs(col("text"), "[.!?]+").cast("long").as("sents"),
        runs(low, "[aeiouy]+").cast("long").as("sylls"))
        .agg(sum("words"), sum("sents"), sum("sylls")).collect()
    }

    val a = time("readability-shape scan, UNFUSED double regexp_replace")(
      readabilityScan(twin))
    val b = time("readability-shape scan, FUSED graft_regex_count")(
      readabilityScan(fused))
    require(a.head == b.head, s"value drift: ${a.head} vs ${b.head}")

    // matched-chars shape (q_script_detect's volume counter)
    def volUnfused = docs.select(
      (length(col("text")) -
        length(regexp_replace(col("text"), "[a-zA-Z]+", "Y")) +
        fused(col("text"), "[a-zA-Z]+")).cast("long").as("v"))
      .agg(sum("v")).collect()
    def volFused = docs.select(
      (length(col("text")) -
        length(regexp_replace(col("text"), "[a-zA-Z]+", ""))).cast("long").as("v"))
      .agg(sum("v")).collect()
    val c1 = time("matched-chars scan, UNFUSED")(volUnfused)
    val c2 = time("matched-chars scan, FUSED graft_regex_matched_chars")(volFused)
    require(c1.head == c2.head, s"value drift: ${c1.head} vs ${c2.head}")

    // ---- FuseRegexChain: the ordered PII rulebook (q_pii_scrub shape) --
    // Control: the same 4-pass fold built through per-pass VIEWS with a
    // non-literal (concat-built) pattern so the chain rule cannot touch
    // it — each pass is a genuine regexp_replace scan+copy. Fused: the
    // direct kernel. Most docs match nothing, so the kernel's zero-copy
    // no-match skip (one decode + N find()s, no rebuild) carries the
    // win; SPARK_GRAFT_REPEAT again isolates the per-row factor.
    val piiRules = Seq(
      "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
      "\\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}" -> "<PHONE>",
      "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "<ID>",
      "https?://\\S+" -> "<URL>")
    def chainUnfused = docs.select(
      sum(length(piiRules.foldLeft(lower(col("text"))) {
        case (acc, (p, r)) => regexp_replace(acc, p, r)
      })).as("s")).collect()
    def chainFused = docs.select(
      sum(length(graft.functions.GraftFunctions.regexChain(
        lower(col("text")), piiRules))).as("s")).collect()
    // this session carries the rule, which would silently fuse the
    // control — exclude it (by ruleName) for the unfused timing only
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.FuseRegexChain")
    val controlPlan = docs.select(piiRules.foldLeft(lower(col("text"))) {
      case (acc, (p, r)) => regexp_replace(acc, p, r)
    }).queryExecution.optimizedPlan.toString
    require(controlPlan.contains("regexp_replace"),
      s"excludedRules did not disable the rule; control is fused:\n$controlPlan")
    val u = time("pii rulebook, UNFUSED 4-pass regexp_replace fold")(chainUnfused)
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    val f = time("pii rulebook, FUSED graft_regex_chain")(chainFused)
    require(u.head == f.head, s"value drift: ${u.head} vs ${f.head}")

    // Match-HEAVY rulebook: every pass rewrites every row, so the
    // unfused chain pays 4 full rebuild+decode+encode cycles per row
    // where the kernel pays 4 rebuilds + 1 decode + 1 encode — the
    // copy-dominated regime (normalization rulebooks, not PII scrubs).
    val heavyRules = Seq(
      "[aeiouy]+" -> "V",
      "[0-9]+" -> "N",
      "\\s{2,}" -> " ",
      "[.,;:!?]+" -> "")
    def heavyUnfused = docs.select(
      sum(length(heavyRules.foldLeft(lower(col("text"))) {
        case (acc, (p, r)) => regexp_replace(acc, p, r)
      })).as("s")).collect()
    def heavyFused = docs.select(
      sum(length(graft.functions.GraftFunctions.regexChain(
        lower(col("text")), heavyRules))).as("s")).collect()
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.FuseRegexChain")
    val hu = time("match-heavy rulebook, UNFUSED")(heavyUnfused)
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    val hf = time("match-heavy rulebook, FUSED graft_regex_chain")(heavyFused)
    require(hu.head == hf.head, s"value drift: ${hu.head} vs ${hf.head}")

    spark.stop()
  }
}
