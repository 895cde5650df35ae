package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adamic-Adar link prediction: score NON-adjacent node pairs by their
  * shared neighborhood, down-weighting promiscuous connectors —
  * AA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z). The classic "which edge
  * forms next" heuristic; here it ranks co-purchase pairs the basket
  * graph has not (yet) connected.
  *
  * Determinism: 1/ln(deg z) is an identical IEEE tree of an exact
  * integer on both engines, quantized to decimal(28,12) per term so the
  * per-pair sum is order-free. deg z ≥ 2 whenever z emits a pair (a
  * 1-degree pivot has no neighbor pair), so ln is never 0.
  *
  * Scale: pairs are generated through the pivot z with the successor-
  * slice pattern (each unordered pair once, no self-join of the
  * adjacency); `maxDeg` excludes hub pivots, bounding the per-pivot
  * fan-out at maxDeg²/2 — the standard AA truncation (a hub's 1/ln(deg)
  * contribution is negligible anyway, and at 100 TB the hub cap is what
  * keeps the two-hop space from exploding). Existing edges leave via one
  * left-anti join on the symmetric edge list.
  */
object LinkPred {

  /** @param edges UNDIRECTED graph as a symmetric (src, dst) list
    * @return (node_a, node_b, cn, aa) for non-adjacent a < b with
    *         cn ≥ minCommon common neighbors through pivots of degree
    *         ≤ maxDeg.
    */
  def adamicAdar(edges: DataFrame, minCommon: Int = 2, maxDeg: Int = 200): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val pairs = e
      .join(deg.filter(col("deg") <= maxDeg), "src")
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"), max(col("deg")).as("degz"))
      // r15: successor pairs in one codegen'd kernel call + one explode
      // (the posexplode×slice chain duplicated the neighbor list per
      // position; fan-out stays ≤ maxDeg²/2 either way).
      .select(col("degz"),
        explode(graft.functions.GraftFunctions.successorPairs(col("ns"))).as("pr"))
      .select(col("degz"), col("pr.a").as("a"), col("pr.b").as("b"))
      .withColumn("w", (lit(1.0) / log(col("degz").cast("double"))).cast("decimal(28,12)"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum(col("w")).as("aa"))
      .filter(col("cn") >= minCommon)
    pairs
      .join(e.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"), "left_anti")
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("cn"), col("aa").cast("double").as("aa"))
  }
}
