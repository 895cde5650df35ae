package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the entity-resolution core behind
  * q_entity_match, factored out so the batch query and the streaming
  * serve path share one definition.
  *
  * Scale shape: candidates come from an equi-join on the blocking key
  * (turning n² all-pairs into Σ block²), scoring is the codegen'd
  * [[graft.functions.JaroWinkler]] kernel (DuckDB-exact semantics), and
  * the per-probe argmax compiles to WindowGroupLimit. Determinism: ties
  * break on (sim desc, roster id asc).
  */
object Linkage {

  /** Best roster match per probe row: (d_key, d_name, matched_key, sim),
    * probes with no in-block candidate at `minSim` are absent. The
    * blocking key is the last `blockLen` characters — callers pick a
    * suffix their dirt model leaves intact (q_entity_match's typo
    * classes all preserve the numeric tail).
    */
  def bestMatch(
      probes: DataFrame,
      probeId: String,
      probeName: String,
      roster: DataFrame,
      rosterId: String,
      rosterName: String,
      blockLen: Int = 4,
      minSim: Double = 0.85,
  ): DataFrame = {
    val w = Window.partitionBy(col("d_key")).orderBy(col("sim").desc, col("matched_key"))
    scored(probes, probeId, probeName, roster, rosterId, rosterName, blockLen, minSim)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("d_key"), col("d_name"), col("matched_key"), round(col("sim"), 6).as("sim"))
  }

  /** Blocked candidate scoring shared by [[bestMatch]] and
    * [[reciprocalBestMatch]]: (d_key, d_name, matched_key, sim ≥
    * minSim) per in-block pair.
    */
  private def scored(
      probes: DataFrame, probeId: String, probeName: String,
      roster: DataFrame, rosterId: String, rosterName: String,
      blockLen: Int, minSim: Double,
  ): DataFrame = {
    val p = probes.select(col(probeId).as("d_key"), col(probeName).as("d_name"),
      right(col(probeName), lit(blockLen)).as("blk"))
    val r = roster.select(col(rosterId).as("matched_key"), col(rosterName).as("r_name"),
      right(col(rosterName), lit(blockLen)).as("blk"))
    p.join(r, Seq("blk"))
      .withColumn("sim", graft.functions.GraftFunctions.jaroWinkler(col("d_name"), col("r_name")))
      .filter(col("sim") >= minSim)
  }

  /** RECIPROCAL best match — the mutual-argmax tightening of
    * [[bestMatch]]: keep (probe, roster) pairs where each side is the
    * other's single best candidate (ties broken by id, both
    * directions). The standard precision move in entity resolution:
    * one-directional argmax happily maps MANY dirty probes onto one
    * popular roster row; mutuality caps the mapping at 1:1 and drops
    * exactly the ambiguous probes a human would route to review.
    *
    * Same blocked candidate set and codegen'd JW scoring as
    * [[bestMatch]] (shared [[scored]] plan — the two argmax windows
    * re-key the SAME scored pairs, so the block join runs once);
    * deterministic by (sim desc, id asc) in both directions.
    */
  def reciprocalBestMatch(
      probes: DataFrame,
      probeId: String,
      probeName: String,
      roster: DataFrame,
      rosterId: String,
      rosterName: String,
      blockLen: Int = 4,
      minSim: Double = 0.85,
  ): DataFrame = {
    val wP = Window.partitionBy(col("d_key")).orderBy(col("sim").desc, col("matched_key"))
    val wR = Window.partitionBy(col("matched_key")).orderBy(col("sim").desc, col("d_key"))
    scored(probes, probeId, probeName, roster, rosterId, rosterName, blockLen, minSim)
      .withColumn("rp", row_number().over(wP))
      .withColumn("rr", row_number().over(wR))
      .filter(col("rp") === 1 && col("rr") === 1)
      .select(col("d_key"), col("d_name"), col("matched_key"), round(col("sim"), 6).as("sim"))
  }

  /** Fellegi-Sunter match/non-match parameter estimation by EM over
    * UNLABELED candidate pairs — the probabilistic upgrade to
    * [[bestMatch]]'s fixed threshold: given per-pair 0/1 agreement
    * columns γ_k, estimate m_k = P(γ_k=1 | match), u_k = P(γ_k=1 |
    * non-match) and the match prevalence λ, from which per-pair match
    * weights log(m/u) follow. The classic unsupervised linkage
    * calibration (Fellegi & Sunter 1969; Winkler's EM formulation).
    *
    * One EM round = ONE aggregation over the pairs: the E-step weight
    *   w = λ·Π_k f_k / (λ·Π_k f_k + (1−λ)·Π_k g_k),
    *   f_k = γ_k ? m_k : 1−m_k,  g_k = γ_k ? u_k : 1−u_k
    * is a row-local expression (the 2K+1 current parameters ride in via
    * a broadcast 1-row cross join — no driver collect, the q_zero_repair
    * in-plan-scalar discipline), and the M-step is sums of w and w·γ_k.
    *
    * Determinism: w is quantized ONCE to decimal(28,12) (HALF_UP, the
    * PageRank mass discipline) and every M-step sum accumulates the
    * quantized value exactly — partitioning cannot perturb the next
    * round's parameters, and the oracle aggregates the same integers.
    * The left-fold product order Π_k and every IEEE division are fixed
    * expression shapes shared with the SQL text. Parameters clamp to
    * [1e-6, 1−1e-6] so a degenerate round cannot zero a product.
    *
    * Scale: `iters` aggregations over the candidate-pair table (itself
    * blocking-bounded, never n²); the parameter row is broadcast. State
    * is 2K+1 doubles — nothing grows with the corpus.
    *
    * Output: one row — (n_pairs, lam, m_<k>, u_<k> per agreement col).
    */
  def fellegiSunterEM(
      pairs: DataFrame,
      agreeCols: Seq[String],
      iters: Int,
      lambda0: Double = 0.1,
      m0: Double = 0.9,
      u0: Double = 0.1,
  ): DataFrame = {
    require(agreeCols.nonEmpty && iters >= 1, s"bad EM config $agreeCols iters=$iters")
    val spark = pairs.sparkSession
    import spark.implicits._
    val k = agreeCols
    // Evaluate the pair columns once; every EM round re-reads this.
    val p = pairs.select(k.map(c => col(c).cast("int").as(c)): _*).localCheckpoint(eager = false)
    var params: DataFrame = Seq(1).toDF("__one").select(
      lit(lambda0).as("lam") +:
        k.flatMap(c => Seq(lit(m0).as(s"m_$c"), lit(u0).as(s"u_$c"))): _*)
    val clamp = (c: org.apache.spark.sql.Column) =>
      least(greatest(c, lit(1e-6)), lit(1.0) - lit(1e-6))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(28,12)")
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    for (_ <- 1 to iters) {
      val joined = p.crossJoin(broadcast(params))
      val f = k.map(c => when(col(c) === 1, col(s"m_$c")).otherwise(lit(1.0) - col(s"m_$c")))
        .reduceLeft(_ * _)
      val g = k.map(c => when(col(c) === 1, col(s"u_$c")).otherwise(lit(1.0) - col(s"u_$c")))
        .reduceLeft(_ * _)
      val w = (col("lam") * f) / (col("lam") * f + (lit(1.0) - col("lam")) * g)
      val e = joined.withColumn("__wq", dec(w)).withColumn("__wn", dec(lit(1.0) - w))
      val agg = e.agg(
        count(lit(1)).as("n"),
        sum(col("__wq")).as("sw") +: sum(col("__wn")).as("swn") +:
          k.flatMap(c => Seq(
            sum(when(col(c) === 1, col("__wq")).otherwise(dec(lit(0.0)))).as(s"swa_$c"),
            sum(when(col(c) === 1, col("__wn")).otherwise(dec(lit(0.0)))).as(s"swna_$c"))): _*)
      params = agg.select(
        col("n") +:
          clamp(d(col("sw")) / d(col("n"))).as("lam") +:
          k.flatMap(c => Seq(
            clamp(d(col(s"swa_$c")) / d(col("sw"))).as(s"m_$c"),
            clamp(d(col(s"swna_$c")) / d(col("swn"))).as(s"u_$c"))): _*)
    }
    params.select(
      col("n").as("n_pairs") +: col("lam") +:
        k.flatMap(c => Seq(col(s"m_$c"), col(s"u_$c"))): _*)
  }
}
