package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with a ±1 (Achlioptas 2003)
  * sign matrix: y_j = (Σ_i s_ij · v_i) / √dOut. The JL lemma says
  * pairwise Euclidean distances survive the projection to within
  * (1 ± ε) with high probability — the standard cheap dimensionality
  * cut in front of ANN indexing / clustering when the embedding dim is
  * larger than the geometry needs.
  *
  * Spark-first shape: the sign matrix is a MODEL-AS-CODE constant
  * (dIn × dOut signs derived from MD5 of the (i,j) cell — deterministic,
  * versionable, no fit step), folded into ONE codegen'd projection of
  * ±v_i addition chains. No shuffle, no UDF, no state: at 100 TB this
  * is a pure scan-side map that rides whatever scan produced the
  * vectors, and the projected column feeds Ann/KMeans/SemDeDup at an
  * 8× smaller memory/compare cost.
  *
  * Determinism doctrine: each output dim is a LEFT-ASSOCIATED chain of
  * IEEE double adds/subtracts of the (float→double widened) inputs —
  * no reordering, no FMA — so DuckDB replays it term-for-term from the
  * same generated sign constants (see SparkEntry's jlProjectSql).
  */
object RandomProjection {

  /** The ±1 sign for cell (i, j), 1-based: parity of the first byte of
    * md5("jl:i:j"). Driver-side constant — both the Spark projection
    * and the generated SQL oracle bake in the SAME values, so the
    * "model" is reproducible from the code alone.
    */
  def signs(dIn: Int, dOut: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dIn, dOut) { (i0, j0) =>
      val h = md.digest(s"jl:${i0 + 1}:${j0 + 1}".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }
  }

  /** The dOut projected columns (unrounded doubles) for a float/double
    * array column: p_j = (±v_1 ± v_2 … ± v_dIn) / √dOut, left-assoc.
    */
  def projectCols(vecCol: Column, dIn: Int, dOut: Int): Seq[Column] = {
    val s = signs(dIn, dOut)
    def x(i: Int) = element_at(vecCol, i).cast("double")
    (0 until dOut).map { j =>
      val chain = (0 until dIn)
        .map(i => if (s(i)(j) > 0) x(i + 1) else -x(i + 1))
        .reduceLeft(_ + _)
      (chain / sqrt(lit(dOut.toDouble))).as(s"p${j + 1}")
    }
  }

  /** id + p1..pdOut for every row — the standing projected table. */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              dIn: Int, dOut: Int): DataFrame =
    emb.select(col(idCol) +: projectCols(col(vecCol), dIn, dOut): _*)
}
