package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed multi-source shortest paths by hop-bounded Bellman-Ford —
  * the path-cost member of the graph kit beside [[PageRank]] (centrality)
  * and NearDup's connected components (reachability). Reference scope:
  * the reference's interaction parsers only ever need 1-hop joins; path
  * cost over the derived graphs (e.g. co-purchase proximity) is
  * beyond-reference capability with the same edge tables.
  *
  * SEMANTICS — after `iters` relaxation rounds, `dist(source, node)` is
  * the EXACT minimum total edge cost over paths from `source` to `node`
  * using at most `iters` edges (unreached pairs are absent). The hop
  * bound is the semantic contract, not an approximation knob: it is what
  * a bounded recursive-CTE oracle computes, it is well-defined on graphs
  * with cycles, and on graphs whose diameter is below the bound it IS
  * the unbounded shortest path. Costs are LONG integers end to end —
  * no float anywhere, so cross-engine parity is structural (the same
  * reason [[graft.functions.DamerauLevenshteinImpl]] is integer DP).
  *
  * Scale shape: the state is SPARSE — only (source, reached-node) rows
  * exist, so round r shuffles O(sources × nodes-within-r-hops), never
  * |V|×|sources|. Each round is ONE shuffle: state joins the (localCheck-
  * pointed, reused) edge table on `src` and min-aggregates on
  * (source, dst) with map-side partial min. Multi-source costs no extra
  * rounds — the source id rides the state key through the same joins.
  * Lineage is capped with the [[PageRank]] eager-checkpoint cadence.
  */
object ShortestPath {

  /** Sparse Bellman-Ford. `edges` carries (`src`, `dst`, `w`) with
    * non-negative LONG costs (directed — undirected callers emit both
    * directions); `sources` carries one `source` column. Output:
    * (source, node, dist), one row per reached pair, sources included at
    * dist 0.
    */
  def run(
      edges: DataFrame,
      sources: DataFrame,
      iters: Int,
      checkpointEvery: Int = 3,
  ): DataFrame = {
    require(iters >= 0 && checkpointEvery > 0,
      s"bad sssp config iters=$iters checkpointEvery=$checkpointEvery")
    val e = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(eager = false)
    var state = sources
      .select(col("source"), col("source").as("node"), lit(0L).as("dist"))
    var prevCkpt: Option[DataFrame] = None
    for (i <- 1 to iters) {
      // Carry ∪ relax, then exact min per (source, node). The union is
      // the zero-cost-self-loop identity: a kept dist is a relaxation
      // over the implicit (node, node, 0) edge, which is how the
      // recursive-CTE oracle states the same round.
      val relaxed = state
        .join(e, state("node") === e("src"))
        .select(col("source"), col("dst").as("node"),
          (col("dist") + col("w")).as("dist"))
      state = state
        .unionByName(relaxed)
        .groupBy(col("source"), col("node"))
        .agg(min(col("dist")).as("dist"))
      if (i % checkpointEvery == 0) {
        state = state.localCheckpoint() // eager: owns its blocks first
        prevCkpt.foreach(_.unpersist())
        prevCkpt = Some(state)
      }
    }
    state
  }

  /** [[run]] driven to FIXPOINT: rounds continue until the state stops
    * changing (capped at `maxIters` — a loud cap, not a silent
    * truncation). CONVERGED distances are the unbounded shortest paths
    * and are UNIQUE, which is what makes [[incrementalAdd]] well-defined
    * (hop-bounded intermediate states are fold-order-dependent;
    * fixpoints are not — the same reason NearDup's incremental
    * components build on converged labels).
    *
    * Fixpoint detection without a diff join: a relaxation round never
    * removes a (source, node) row and never increases a dist, so the
    * state is unchanged iff (row count, Σdist) is unchanged — two exact
    * longs per check, the NearDup fixpoint-count discipline.
    */
  def runConverged(
      edges: DataFrame,
      sources: DataFrame,
      maxIters: Int = 30,
      checkpointEvery: Int = 3,
  ): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(eager = false)
    var state = sources
      .select(col("source"), col("source").as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var fingerprint = fp(state)
    var prevCkpt: Option[DataFrame] = Some(state)
    var i = 0
    var done = false
    while (i < maxIters && !done) {
      i += 1
      val relaxed = state.join(e, state("node") === e("src"))
        .select(col("source"), col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      var next = state.unionByName(relaxed)
        .groupBy(col("source"), col("node"))
        .agg(min(col("dist")).as("dist"))
      if (i % checkpointEvery == 0 || i == maxIters) {
        next = next.localCheckpoint()
        val nfp = fp(next)
        done = nfp == fingerprint
        fingerprint = nfp
        prevCkpt.foreach(_.unpersist())
        prevCkpt = Some(next)
      }
      state = next
    }
    state
  }

  private def fp(state: DataFrame): (Long, Long) = {
    val r = state.agg(count(lit(1)), sum(col("dist"))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** INCREMENTAL edge addition over a converged state: given
    * `dist` = [[runConverged]] over an edge set E and a batch of new
    * edges ΔE, produce the converged distances over E ∪ ΔE touching
    * only the AFFECTED region — distances can only decrease under edge
    * addition (the monotonicity that makes this exact), so the work is
    * a wavefront: seed improvements by relaxing the current state
    * through ΔE alone, then propagate each improvement wave through the
    * full edge set until no row improves. Rounds ∝ the affected
    * region's eccentricity, work per round ∝ |wavefront| × degree —
    * NOT a full recompute (ShortestPathSpec pins equality with one).
    *
    * `edgesAll` must be E ∪ ΔE (the full post-addition set); weights of
    * existing edges must be unchanged (weight DECREASE is also safe —
    * it is an addition of a cheaper parallel edge; weight increase or
    * deletion breaks monotonicity and needs a rebuild, the documented
    * contract — the same asymmetry as Ivm's append-vs-retract split).
    */
  def incrementalAdd(
      dist: DataFrame,
      edgesAll: DataFrame,
      newEdges: DataFrame,
      maxIters: Int = 30,
      checkpointEvery: Int = 3,
  ): DataFrame = {
    val eAll = edgesAll
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(eager = false)
    val eNew = newEdges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
    var state = dist.select(col("source"), col("node"), col("dist").cast("long").as("dist"))
      .localCheckpoint()
    // Seed wave: the only rows that can change flow through ΔE.
    var wave = state.join(eNew, state("node") === eNew("src"))
      .select(col("source"), col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      .groupBy(col("source"), col("node")).agg(min(col("dist")).as("dist"))
    var prevCkpt: Option[DataFrame] = Some(state)
    var i = 0
    var done = false
    while (i < maxIters && !done) {
      i += 1
      // Improvements = wave entries strictly better than (or absent
      // from) the current state; everything else has converged already.
      val improved = wave.as("w")
        .join(state.as("s"), Seq("source", "node"), "left")
        .filter(col("s.dist").isNull || col("w.dist") < col("s.dist"))
        .select(col("source"), col("node"), col("w.dist").as("dist"))
        .localCheckpoint() // consumed by the empty-check, merge, and next wave
      if (improved.isEmpty) done = true
      else {
        state = state.as("s")
          .join(improved.as("i").withColumnRenamed("dist", "idist"),
            Seq("source", "node"), "outer")
          .select(col("source"), col("node"),
            coalesce(least(col("s.dist"), col("idist")),
              col("idist"), col("s.dist")).as("dist"))
        wave = improved.join(eAll, improved("node") === eAll("src"))
          .select(col("source"), col("dst").as("node"), (col("dist") + col("w")).as("dist"))
          .groupBy(col("source"), col("node")).agg(min(col("dist")).as("dist"))
        if (i % checkpointEvery == 0) {
          state = state.localCheckpoint()
          prevCkpt.foreach(_.unpersist())
          prevCkpt = Some(state)
        }
      }
    }
    state
  }

  /** [[runConverged]] with the same small-graph escape hatch as
    * [[runAdaptive]]: under `maxDriverEdges` long-triples the fixpoint
    * iterates in driver memory (full-edge relaxation sweeps with
    * early-exit on an unchanged sweep — each sweep reads the previous
    * sweep's map, exactly one distributed round) instead of paying up to
    * `maxIters` rounds of scheduler latency. Pure long min-plus admits no
    * accumulation-order effects and converged fixpoints are unique, so
    * the two paths are bit-identical (GraphSpec pins it). The sizing
    * count shares the lazily-checkpointed edge subtree with whichever
    * path runs.
    */
  def runConvergedAdaptive(
      edges: DataFrame,
      sources: DataFrame,
      maxIters: Int = 30,
      checkpointEvery: Int = 3,
      maxDriverEdges: Long = 2000000L,
  ): DataFrame = {
    val e = edges
      .select(col("src").cast("long"), col("dst").cast("long"), col("w").cast("long"))
      .localCheckpoint(eager = false)
    if (e.count() <= maxDriverEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val srcs = sources.select(col("source").cast("long")).collect().map(_.getLong(0))
      driverConverged(e.sparkSession,
        srcs.map(s => s -> scala.collection.mutable.LongMap(s -> 0L)).toSeq, es, maxIters)
    } else runConverged(e, sources, maxIters, checkpointEvery)
  }

  /** [[incrementalAdd]] with the driver escape hatch: under
    * `maxDriverEdges` the converged base state (bounded by
    * sources × reached nodes — the same state every distributed round
    * shuffles anyway) and the post-addition edge set collect, and
    * relaxation sweeps run to the fixpoint in driver memory. Distances
    * only decrease under edge addition and the fixpoint is unique, so
    * sweeping the FULL edge set from the stale state converges to
    * exactly what the distributed improvement wavefront converges to
    * (GraphSpec pins driver ≡ distributed ≡ full recompute).
    */
  def incrementalAddAdaptive(
      dist: DataFrame,
      edgesAll: DataFrame,
      newEdges: DataFrame,
      maxIters: Int = 30,
      checkpointEvery: Int = 3,
      maxDriverEdges: Long = 2000000L,
  ): DataFrame = {
    val eAll = edgesAll
      .select(col("src").cast("long"), col("dst").cast("long"), col("w").cast("long"))
      .localCheckpoint(eager = false)
    if (eAll.count() <= maxDriverEdges) {
      val es = eAll.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val state = dist
        .select(col("source").cast("long"), col("node").cast("long"), col("dist").cast("long"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (s, rows) =>
          s -> scala.collection.mutable.LongMap(rows.map(r => r.getLong(1) -> r.getLong(2)): _*)
        }.toSeq
      driverConverged(eAll.sparkSession, state, es, maxIters)
    } else incrementalAdd(dist, eAll, newEdges, maxIters, checkpointEvery)
  }

  /** Shared driver-memory fixpoint: full-edge relaxation sweeps from the
    * given per-source state, early-exit when a sweep changes nothing,
    * loudly capped at `maxIters` sweeps like the distributed rounds.
    */
  private def driverConverged(
      spark: org.apache.spark.sql.SparkSession,
      init: Seq[(Long, scala.collection.mutable.LongMap[Long])],
      es: Array[(Long, Long, Long)],
      maxIters: Int,
  ): DataFrame = {
    import spark.implicits._
    init.flatMap { case (s, init0) =>
      var dist = init0
      var i = 0
      var changed = true
      while (i < maxIters && changed) {
        val next = dist.clone()
        changed = false
        es.foreach { case (u, v, w) =>
          dist.get(u).foreach { du =>
            val cand = du + w
            if (next.get(v).forall(_ > cand)) { next(v) = cand; changed = true }
          }
        }
        dist = next
        i += 1
      }
      dist.toSeq.map { case (n, d) => (s, n, d) }
    }.toDF("source", "node", "dist")
  }

  /** [[run]] with the small-graph escape hatch every iterative operator
    * in this repo has (NearDup.connectedComponentsAdaptive, PageRank
    * .runAdaptive): a graph under `maxDriverEdges` long-triples iterates
    * in driver memory instead of paying `iters` rounds of scheduler
    * latency. Both paths are BIT-IDENTICAL by construction — pure long
    * arithmetic admits no accumulation-order effects, so equality is
    * structural (ShortestPathSpec asserts it anyway). EAGER: sizing the
    * edge list runs a count job; the edge subtree is lazily
    * checkpointed so both paths share one materialization. Long node
    * ids only (ANSI casts throw on non-numeric ids).
    */
  def runAdaptive(
      edges: DataFrame,
      sources: DataFrame,
      iters: Int,
      maxDriverEdges: Long = 2000000L,
  ): DataFrame = {
    val spark = edges.sparkSession
    val e = edges
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .localCheckpoint(eager = false)
    if (e.count() <= maxDriverEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val srcs = sources.select(col("source").cast("long")).collect().map(_.getLong(0))
      // Per-source Bellman-Ford over a LongMap keyed by node; `iters`
      // sweeps of full-edge relaxation reproduces the hop-bounded
      // semantics exactly (dist after sweep r = min cost over <= r edges
      // requires reading the PREVIOUS sweep's map, so sweeps copy).
      import spark.implicits._
      srcs.toSeq.flatMap { s =>
        var dist = scala.collection.mutable.LongMap(s -> 0L)
        var i = 0
        while (i < iters) {
          val next = dist.clone()
          es.foreach { case (u, v, w) =>
            dist.get(u).foreach { du =>
              val cand = du + w
              if (next.get(v).forall(_ > cand)) next(v) = cand
            }
          }
          dist = next
          i += 1
        }
        dist.toSeq.map { case (n, d) => (s, n, d) }
      }.toDF("source", "node", "dist")
    } else run(e, sources, iters)
  }
}
