package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by power iteration — the graph-centrality
  * counterpart to [[graft.similarity.NearDup]]'s connected components
  * (same iterate-as-lazy-plan discipline, same checkpoint cadence).
  *
  * Scale shape: each iteration is ONE shuffle — contributions join ranks
  * to edges on `src` (the edge table, annotated with out-degree, is
  * checkpointed once and re-read every round) and aggregate on `dst` with
  * map-side partial sums. Rank mass is accumulated in DECIMAL, so results
  * are partitioning-independent and bit-reproducible; the damping blend
  * happens once per node per round in double.
  *
  * Plan growth is linear in iterations; `checkpointEvery` caps compile
  * cost the same way NearDup's propagation loop does. No driver-side
  * graph state at any size — the driver only tracks the loop counter.
  */
object PageRank {

  /** Ranks after `iters` rounds of r ← (1−d) + d·Σ_in r/deg.
    *
    * Node set = the distinct `src` endpoints; callers with undirected
    * graphs emit both edge directions (which also makes dangling-mass
    * redistribution a non-issue: every node has out-degree ≥ 1). Nodes
    * with no in-edges settle at the (1−d) floor. Uniform start rank 1.0
    * keeps total mass = |V| at every round (the standard N-normalized
    * formulation).
    */
  def run(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 3,
  ): DataFrame =
    runWithTeleport(edges, iters, damping, checkpointEvery, tele = lit(1.0))

  /** Personalized PageRank: the teleport mass lands ONLY on the seed
    * set (proximity to the seeds replaces global centrality — the
    * "related items to THESE items" query). Teleport vector e = 1 for
    * seeds, 0 otherwise; start rank = e; update
    * r ← (1−d)·e + d·Σ_in r/deg. Non-seed nodes unreachable from any
    * seed settle at exactly 0. Same per-round dataflow, decimal mass
    * discipline, and checkpoint cadence as [[run]] (shared loop — the
    * paths cannot drift).
    */
  def runPersonalized(
      edges: DataFrame,
      isSeed: org.apache.spark.sql.Column,
      iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 3,
  ): DataFrame =
    runWithTeleport(edges, iters, damping, checkpointEvery,
      tele = when(isSeed, lit(1.0)).otherwise(lit(0.0)))

  /** Shared power-iteration loop over an arbitrary per-node teleport
    * column (evaluated against the node id as `node`).
    */
  private def runWithTeleport(
      edges: DataFrame,
      iters: Int,
      damping: Double,
      checkpointEvery: Int,
      tele: org.apache.spark.sql.Column,
  ): DataFrame = {
    require(iters >= 0 && damping >= 0 && damping < 1 && checkpointEvery > 0,
      s"bad pagerank config iters=$iters d=$damping checkpointEvery=$checkpointEvery")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src").select(col("src"), col("dst"), col("deg")).localCheckpoint(false)
    val nodes = deg.select(col("src").as("node"), tele.as("tele")).localCheckpoint(false)

    var rank = nodes.select(col("node"), col("tele").as("rank"))
    // Lineage cap: checkpoint every N rounds, EAGERLY, then release the
    // previous round's checkpoint blocks — otherwise executor storage
    // grows O(iters/checkpointEvery × |V|) over a long run.
    var prevCkpt: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val inMass = e
        .join(rank, e("src") === rank("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).cast("decimal(28,12)").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_mass"))
      rank = nodes
        .join(inMass, Seq("node"), "left")
        .select(
          col("node"),
          (lit(1.0 - damping) * col("tele") +
            lit(damping) * coalesce(col("in_mass").cast("double"), lit(0.0))).as("rank"),
        )
      if (i % checkpointEvery == 0) {
        rank = rank.localCheckpoint() // eager: owns its blocks before the old ones go
        prevCkpt.foreach(_.unpersist())
        prevCkpt = Some(rank)
      }
    }
    rank
  }

  /** [[run]] with the adaptive small-graph escape hatch — the same
    * decision NearDup.connectedComponentsAdaptive makes: a graph under
    * `maxDriverEdges` (long pairs; 2M ≈ 32 MB) iterates on the driver in
    * microseconds instead of paying `iters` distributed rounds of
    * scheduler latency, exactly like a broadcast join collects a small
    * side. Bigger graphs take the distributed path unchanged.
    *
    * Both paths are BIT-IDENTICAL: contributions are quantized to
    * decimal(28,12) (HALF_UP, matching Spark's double→decimal cast),
    * summed exactly (order-free), and blended in the same double op
    * order — PageRankAdaptiveSpec asserts equality, not approximation.
    * The edge subtree is lazily checkpointed so the sizing count and the
    * chosen path share one materialization.
    *
    * Long node ids only (the cast is ANSI — non-numeric ids throw rather
    * than corrupt); graphs with string ids hash them first or use [[run]].
    */
  def runAdaptive(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      maxDriverEdges: Long = 2_000_000L,
  ): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).localCheckpoint(false)
    if (e.count() > maxDriverEdges) return run(e, iters, damping)
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = es.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keys.toArray.sorted
    var rank = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val mass = collection.mutable.Map.empty[Long, java.math.BigDecimal]
      es.foreach { case (s, d) =>
        val contrib = java.math.BigDecimal.valueOf(rank(s) / deg(s))
          .setScale(12, java.math.RoundingMode.HALF_UP)
        mass.updateWith(d)(prev => Some(prev.fold(contrib)(_.add(contrib))))
      }
      rank = nodes.map { n =>
        n -> ((1.0 - damping) + damping * mass.get(n).fold(0.0)(_.doubleValue))
      }.toMap
    }
    val spark = edges.sparkSession
    import spark.implicits._
    nodes.map(n => (n, rank(n))).toSeq.toDF("node", "rank")
  }
}
