package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosineSim

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
  * diversified re-ranker: from a relevance-ranked candidate pool,
  * greedily take the item maximizing
  * `lambda·rel − mu·max_{s∈S} cos(v, s)`, so each pick is relevant to
  * the query AND far from everything already picked. The standard
  * redundancy cut on a retrieval stage's top-k before it reaches a
  * context window or a labeling batch.
  *
  * Spark-first tiering (the [[KCenter]] skeleton):
  *  - the POOL is a TakeOrdered top-`poolSize` by relevance — never a
  *    window over the corpus; at 100 TB the corpus contributes one
  *    scan (the rel projection) and only `poolSize` rows survive;
  *  - each greedy round is a codegen'd
  *    `greatest(ms, cosineSim(v, <picked literal>))` projection over
  *    the checkpointed pool plus a 1-row TakeOrdered collect — the
  *    bounded model tier (k ≤ poolSize ≤ 256 rows total);
  *  - `lambda` and `mu` are INDEPENDENT literals (not `1 − lambda`:
  *    `1.0 - 0.7` is 0.30000000000000004 in IEEE, which would diverge
  *    from a SQL literal `0.3` — the oracle replays the same two
  *    constants).
  *
  * Determinism: query point = smallest id; pool and every argmax break
  * ties on smallest id; similarities are the same double trees DuckDB's
  * `list_cosine_similarity` computes, so the whole selection replays as
  * k unrolled SQL rounds (q_mmr's oracle).
  */
object Mmr {

  /** (ord, id, rel, ms, score) for the k selected items; `ms` is the
    * max similarity to the previously selected set at pick time (0 for
    * the first pick, which has no selected set yet).
    */
  def select(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             lambda: Double = 0.7, mu: Double = 0.3,
             poolSize: Int = 16): DataFrame = {
    require(k >= 1 && k <= poolSize && poolSize <= 256,
      s"need 1 <= k <= poolSize <= 256, got k=$k poolSize=$poolSize")
    val spark = emb.sparkSession
    def litVec(r: Row) = array(r.getSeq[Any](1).map {
      case f: Float  => lit(f)
      case d: Double => lit(d)
      case x => throw new IllegalArgumentException(
        s"$vecCol must be array<float> or array<double>, got element " +
          (if (x == null) "null" else x.getClass.getName))
    }: _*)
    val q = emb.orderBy(col(idCol).asc).limit(1)
      .select(col(idCol), col(vecCol)).head()
    val qid = q.getLong(0)
    val pool = emb.filter(col(idCol) =!= qid)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("rel", cosineSim(col("v"), litVec(q)))
      .orderBy(col("rel").desc, col("id").asc).limit(poolSize)
      .localCheckpoint(eager = false)
    val nPool = pool.count()
    require(nPool >= k, s"MMR needs k=$k candidates, pool has $nPool")

    val first = pool.orderBy(col("rel").desc, col("id").asc).limit(1).head()
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double, Double)](
      (1, first.getLong(0), first.getDouble(2), 0.0,
        lambda * first.getDouble(2) - mu * 0.0))
    var cur = pool.filter(col("id") =!= first.getLong(0))
      .withColumn("ms", cosineSim(col("v"), litVec(first)))
      .localCheckpoint(eager = false)
    for (r <- 2 to k) {
      val top = cur
        .withColumn("score", lit(lambda) * col("rel") - lit(mu) * col("ms"))
        .orderBy(col("score").desc, col("id").asc).limit(1).head()
      picked += ((r, top.getLong(0), top.getDouble(2), top.getDouble(3),
        top.getDouble(4)))
      if (r < k) {
        cur = cur.filter(col("id") =!= top.getLong(0))
          .withColumn("ms",
            greatest(col("ms"), cosineSim(col("v"), litVec(top))))
          .localCheckpoint(eager = false)
      }
    }
    import spark.implicits._
    picked.toSeq.toDF("ord", "id", "rel", "ms", "score")
  }
}
