package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosineSim

/** Gonzalez greedy k-center selection over an embedding column — the
  * classic farthest-point 2-approximation: repeatedly take the point
  * farthest (cosine distance) from everything chosen so far. The
  * selection order doubles as a diversity ranking, which is why
  * training-data curation uses it to seed diverse subsets (coreset /
  * facility-location sampling); the radius curve it emits is the
  * covering-radius diagnostic ("how much does center k+1 still buy?").
  *
  * Spark-first tiering, mirroring [[KMeans.lloyd]]:
  *  - the DATA never leaves the cluster: each round is one codegen'd
  *    `least(dmin, 1 - cosineSim(v, <center literal>))` projection over
  *    the running min-distance column;
  *  - the MODEL (one center per round — an id and one vector) is a
  *    1-row TakeOrdered collect per round, the same bounded driver tier
  *    as KMeans centroids and BPE's per-round argmax;
  *  - the running dmin column localCheckpoints each round, so round r+1
  *    scans a materialized (id, v, dmin) instead of replaying r plans.
  *
  * Determinism: seed = smallest id; argmax ties break on smallest id;
  * distances are the same double trees DuckDB's
  * `list_cosine_similarity` computes (the q_ann_topk parity), so the
  * whole selection replays as k unrolled SQL rounds — q_kcenter's
  * oracle does exactly that.
  */
object KCenter {

  /** (ord, center_id, radius) for the k selected centers; radius is the
    * chosen point's min distance to the previously selected set at
    * selection time (0 for the seed) — the non-increasing max-min
    * covering-radius curve.
    */
  def select(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k in [1,64], got $k")
    val spark = emb.sparkSession
    // Element type read generically: float and double embedding columns
    // both work (lit() preserves the source type, so the float path's
    // arithmetic — and its oracle parity — is unchanged). Anything else
    // fails with a message naming the column, not a ClassCastException.
    def litVec(r: Row) = array(r.getSeq[Any](1).map {
      case f: Float  => lit(f)
      case d: Double => lit(d)
      case x => throw new IllegalArgumentException(
        s"$vecCol must be array<float> or array<double>, got element " +
          (if (x == null) "null" else x.getClass.getName))
    }: _*)
    // One bounded count up front: with n < k the greedy loop would
    // silently re-pick exhausted points (every dmin hits 0), so fail
    // loudly instead — selection is a model fit, the extra job is noise.
    val n = emb.count()
    require(n >= k, s"k-center needs at least k=$k rows, corpus has $n")
    val seed = emb.orderBy(col(idCol).asc).limit(1)
      .select(col(idCol), col(vecCol)).head()
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)](
      (0, seed.getLong(0), 0.0))
    // Picked points leave the candidate pool: on a duplicate-heavy
    // corpus every dmin can reach 0.0, and an argmax over the FULL pool
    // would then re-pick the seed (smallest id) forever — distinct
    // centers by construction instead, with radius 0 marking the
    // degenerate tail (n >= k guarantees the pool never runs dry). The
    // q_kcenter oracle replays the same exclusion (NOT IN picked).
    var cur = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(col("id") =!= seed.getLong(0))
      .withColumn("dmin", lit(1.0) - cosineSim(col("v"), litVec(seed)))
      .localCheckpoint(false)
    for (r <- 1 until k) {
      val top = cur.orderBy(col("dmin").desc, col("id").asc).limit(1).head()
      picked += ((r, top.getLong(0), top.getDouble(2)))
      if (r < k - 1) {
        cur = cur
          .filter(col("id") =!= top.getLong(0))
          .withColumn("dmin",
            least(col("dmin"), lit(1.0) - cosineSim(col("v"), litVec(top))))
          .localCheckpoint(false)
      }
    }
    import spark.implicits._
    picked.toSeq.toDF("ord", "center_id", "radius")
  }
}
