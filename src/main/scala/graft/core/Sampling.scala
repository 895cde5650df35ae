package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (beyond-reference
  * scope).
  *
  * `Dataset.sample` draws per-partition pseudo-random numbers: the kept
  * set changes with partitioning, cluster size, and engine. Content-hash
  * sampling decides membership from the key bytes alone, so it is stable
  * across runs, repartitioning, engines (auditable in plain SQL), and —
  * critically for incremental 100 TB pipelines — across loads: a row
  * sampled in yesterday's run is sampled in today's.
  */
object Sampling {

  /** Keep rows whose `md5(key)` lands in the first `keep` of 16 hex
    * buckets — expected fraction keep/16. Exactly reproducible in any
    * engine with md5: `WHERE substr(md5(CAST(k AS VARCHAR)), 1, 1) < '<h>'`.
    */
  def hashSample(df: DataFrame, key: Column, keep: Int): DataFrame = {
    require(keep >= 1 && keep <= 16, s"keep must be in [1,16], got $keep")
    if (keep == 16) df
    else df.filter(substring(md5(key.cast("string")), 1, 1) < lit(Integer.toHexString(keep)))
  }

  /** Deterministic train/val/test assignment: the first two hex chars of
    * md5(key) give 256 buckets; `cuts` maps each label to its EXCLUSIVE
    * upper hex bound (lowercase, 2 chars, ascending), the last label
    * catching the rest. E.g. `Seq("train" -> "cc", "val" -> "e6")` +
    * `rest = "test"` ≈ 80/10/10. Membership depends only on the key
    * bytes: stable across partitioning, engines, and incremental loads —
    * a row never migrates between splits when the corpus grows (the
    * property per-run random splits lack, and leakage-free by key).
    */
  def stratifiedSplit(key: Column, cuts: Seq[(String, String)], rest: String): Column = {
    require(cuts.nonEmpty, "at least one cut")
    require(cuts.forall(_._2.matches("[0-9a-f]{2}")),
      s"cut bounds must be 2 lowercase hex chars, got ${cuts.map(_._2)}")
    require(cuts.map(_._2) == cuts.map(_._2).sorted && cuts.map(_._2).distinct == cuts.map(_._2),
      s"cut bounds must be strictly ascending, got ${cuts.map(_._2)} — a non-ascending " +
        "when-chain silently shadows later labels")
    val bucket = substring(md5(key.cast("string")), 1, 2)
    cuts.foldRight(lit(rest)) { case ((label, hi), els) =>
      when(bucket < lit(hi), lit(label)).otherwise(els)
    }
  }

  /** Per-group mixture sampling (Pile/Dolma-style source reweighting):
    * each group keeps `keep`/256 of its rows, decided by the first two
    * hex chars of `md5(key)` — so membership is a pure function of the
    * row key, reproducible across engines, runs, and incremental loads,
    * and UNCORRELATED across different mixes of the same corpus only if
    * their keys differ (same key ⇒ nested samples, which is exactly the
    * property you want when tightening a mix: the 25 % cut is a subset
    * of the 50 % cut). `keep = 256` keeps everything; unknown groups
    * fall back to `defaultKeep`. The filter is a codegen'd when-chain
    * over the (small, literal) weight table — no join, no shuffle: a
    * 100 TB remix is a single scan.
    */
  def weightedMix(
      df: DataFrame,
      key: Column,
      group: Column,
      keeps: Seq[(String, Int)],
      defaultKeep: Int): DataFrame = {
    require((defaultKeep +: keeps.map(_._2)).forall(k => k >= 0 && k <= 256),
      s"keep counts must be in [0,256], got ${keeps.map(_._2)} / $defaultKeep")
    val bucket = substring(md5(key.cast("string")), 1, 2)
    def cond(k: Int): Column =
      if (k >= 256) lit(true) else bucket < lit(f"$k%02x")
    val keep = keeps.foldRight(cond(defaultKeep)) { case ((g, k), els) =>
      when(group === g, cond(k)).otherwise(els)
    }
    df.filter(keep)
  }

  /** TEMPERATURE-based group reweighting (the Pile/Dolma α-mix): keep
    * rates derived IN-PLAN from the group sizes themselves — rate_g ∝
    * n_g^(α−1), normalized so the SMALLEST group keeps everything and
    * the biggest keeps the smallest fraction at α < 1 (flattening the
    * source distribution; α=1 keeps everything, α=0 equalizes expected
    * per-group yields).
    * Membership is the same md5-bucket primitive as [[weightedMix]] at
    * 64k granularity — deterministic, growth-stable, nested under a
    * lower α — but the rate TABLE is computed from the data (one tiny
    * group-count aggregate broadcast back), not supplied: re-running on
    * a grown corpus re-derives the rates, which is what a temperature
    * mix means. `minKeep` floors every group at ≥ minKeep/65536 so rare
    * groups never vanish. A 100 TB remix is one count aggregate + one
    * scan.
    */
  def temperatureMix(
      df: DataFrame,
      key: Column,
      group: Column,
      alpha: Double,
      minKeep: Int = 1): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    require(minKeep >= 1 && minKeep <= 65536, s"minKeep in [1,65536], got $minKeep")
    val rates = df
      .groupBy(group.as("__g"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__r", pow(col("__n").cast("double"), lit(alpha - 1.0)))
    val keeps = rates
      .crossJoin(broadcast(rates.agg(max(col("__r")).as("__rmax"))))
      .select(col("__g"),
        least(lit(65536), greatest(lit(minKeep),
          floor(col("__r") / col("__rmax") * 65536).cast("int"))).as("__keep"))
    df.join(broadcast(keeps), group <=> col("__g"))
      .filter(col("__keep") >= 65536 ||
        substring(md5(key.cast("string")), 1, 4) < format_string("%04x", col("__keep")))
      .drop("__g")
  }

  /** Finer-grained variant: first 4 hex chars → 65536 buckets, keep
    * buckets `[0, keep)` — fraction keep/65536.
    */
  def hashSample64k(df: DataFrame, key: Column, keep: Int): DataFrame = {
    require(keep >= 1 && keep <= 65536, s"keep must be in [1,65536], got $keep")
    if (keep == 65536) df
    else df.filter(substring(md5(key.cast("string")), 1, 4) < lit(f"$keep%04x"))
  }

  /** Deterministic weighted sampling without replacement, `k` rows per
    * group (Efraimidis–Spirakis A-ES with the exponential-race key):
    * each row draws `u ∈ (0,1)` FROM ITS OWN KEY BYTES (first 8 hex
    * chars of md5 → uniform 32-bit integer, +0.5 to dodge the endpoints)
    * and races with clock `e = −ln(u)/w`; the `k` smallest `e` per group
    * win. P(row wins) increases with `w` exactly as weighted sampling
    * without replacement requires, yet membership is a pure function of
    * (key, weight): stable across partitioning, engines, runs, and —
    * the property `Dataset.sample` and rand()-keyed A-ES both lack —
    * across incremental loads, so yesterday's sampled rows stay sampled
    * today and only genuinely new rows compete for the remaining slots.
    *
    * Scale shape: one shuffle on the group key into a rank window whose
    * `rn <= k` filter Spark rewrites to WindowGroupLimit — per-partition
    * top-k heaps BEFORE the exchange, so the shuffle carries at most
    * k rows per (map partition × group), not the corpus. The exponential
    * key is a codegen'd scalar chain (md5 → conv → one ln, one divide);
    * ln/div on identical inputs are identical IEEE doubles in DuckDB
    * (the q_sparse_topk idf precedent), and the race key itself is NOT
    * emitted — output is the winning rows plus `rn`.
    *
    * PRECONDITION: `key` must be unique within each group — it seeds
    * the race AND breaks ties, so duplicate keys draw identical (e, key)
    * sort tuples and which duplicate wins becomes partition-order-
    * dependent, voiding every stability guarantee above. Content ids
    * (doc_id, url hash) satisfy this by construction.
    *
    * Rows with a NULL key or a null/zero/negative weight are EXCLUDED
    * from the race (standard A-ES semantics: weight ≤ 0 means "never
    * sample"). Left in, w=0 would mint +Inf race keys, w<0 would invert
    * the race, and a null key's null sort key would order differently
    * across engines (Spark NULLS FIRST vs DuckDB NULLS LAST), silently
    * breaking the documented cross-engine stability.
    */
  def weightedSample(
      df: DataFrame,
      group: Column,
      weight: Column,
      key: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    val e = -log(u) / weight.cast("double")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(e.asc, key.asc)
    df.filter(key.isNotNull && weight.cast("double") > 0.0)
      .withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
  }
}
