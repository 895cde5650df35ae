package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A distilled neural scorer as pure columnar compute — the "tiny MLP
  * over embeddings" stage of a training-data pipeline (quality /
  * relevance heads distilled from a large model), expressed entirely in
  * built-in higher-order functions so it rides Catalyst like any other
  * projection: no UDF, no batch server, no state.
  *
  *   score(v) = b2 + Σ_j w2[j] · relu(b1[j] + Σ_i W1[j][i] · v[i])
  *
  * Weights are model-as-data: here a deterministic pseudo-random set
  * (dyadic rationals from a seeded hash, the [[Ann.hyperplaneValues]]
  * discipline — float-exact in every engine, `Double.toString`
  * round-trips), in production the distilled checkpoint loaded as
  * literal arrays. Each hidden unit is one `aggregate(zip_with(...))`
  * fold in fixed order and the unit sums chain left-to-right, so the
  * whole forward pass is a fixed IEEE expression tree — a DuckDB oracle
  * replaying the same folds is bit-equal.
  *
  * Scale shape: the model is a few KB of literals inside a codegen'd
  * projection — scoring 100 TB of embeddings is exactly one scan, no
  * shuffle, no driver participation; the top-k readout compiles to
  * TakeOrderedAndProject.
  */
object MlpScore {

  /** Deterministic dyadic weight in [-1, 1): tag discriminates the
    * parameter tensor (0=W1, 1=b1, 2=w2, 3=b2).
    */
  private[graft] def weight(tag: Int, j: Int, i: Int): Double =
    ((scala.util.hashing.MurmurHash3.productHash((tag, j, i)).toLong & 0xffffffL)
      .toDouble / 0x800000L) - 1.0

  private[graft] def w1Row(j: Int, dim: Int): Seq[Double] = (0 until dim).map(weight(0, j, _))
  private[graft] def b1(j: Int): Double = weight(1, j, 0)
  private[graft] def w2(j: Int): Double = weight(2, j, 0)
  private[graft] def b2: Double = weight(3, 0, 0)

  /** Dot product of a vector column against a literal weight row — the
    * shared fold shape (zip_with products, left-to-right aggregate; the
    * cast keeps float corpora exact).
    */
  private def dotLit(vec: Column, w: Seq[Double]): Column =
    aggregate(
      zip_with(vec, array(w.map(lit): _*), (x, c) => x.cast("double") * c),
      lit(0.0), (acc, x) => acc + x)

  /** The forward pass as one Column: hidden relu units in index order,
    * output accumulation left-to-right.
    */
  def score(vec: Column, dim: Int, hidden: Int = 8): Column =
    (0 until hidden).foldLeft(lit(b2): Column) { (acc, j) =>
      acc + lit(w2(j)) * greatest(lit(0.0), lit(b1(j)) + dotLit(vec, w1Row(j, dim)))
    }

  /** Score every row and keep the global top `k` (score desc, id asc) —
    * TakeOrderedAndProject, not a window: no partition-less window, no
    * full sort materialization.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, dim: Int, hidden: Int, k: Int): DataFrame =
    df.select(col(idCol), round(score(col(vecCol), dim, hidden), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
