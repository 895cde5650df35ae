package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.DoubleType

/** Column-API façade over graft's custom Catalyst expressions, mirroring
  * `org.apache.spark.sql.functions`' style. Also registers them as SQL
  * functions (`graft_erf`, `graft_simhash64`, `graft_cosine`).
  */
object GraftFunctions {

  def erf(c: Column): Column =
    GraftShim.toColumn(Erf(GraftShim.toExpression(c)))

  def erfc(c: Column): Column =
    GraftShim.toColumn(Erfc(GraftShim.toExpression(c)))

  def simhash64(tokens: Column): Column =
    GraftShim.toColumn(SimHash64(GraftShim.toExpression(tokens)))

  def cosineSim(a: Column, b: Column): Column =
    GraftShim.toColumn(CosineSimilarity(GraftShim.toExpression(a), GraftShim.toExpression(b)))

  def minhashShingles(tokens: Column, n: Int, k: Int): Column =
    GraftShim.toColumn(MinHashShingles(GraftShim.toExpression(tokens), n, k))

  /** One-pass text statistics (token/char counts, stopword hits, lang). */
  def textStats(text: Column): Column =
    GraftShim.toColumn(TextStats(GraftShim.toExpression(text)))

  /** One-pass Gini; input must be array<double>. */
  def gini(values: Column): Column =
    GraftShim.toColumn(Gini(GraftShim.toExpression(values)))

  /** One-pass HPA classification; input must be array<double>. */
  def hpaClassify(values: Column, low: Double): Column =
    GraftShim.toColumn(HpaClassify(GraftShim.toExpression(values), low))

  def registerAll(spark: SparkSession): Unit = {
    // SQL numeric literals arrive as decimals — cast into the kernel type.
    GraftShim.registerFunction(spark, "graft_erf", es => Erf(Cast(es.head, DoubleType)))
    GraftShim.registerFunction(spark, "graft_erfc", es => Erfc(Cast(es.head, DoubleType)))
    GraftShim.registerFunction(spark, "graft_simhash64", es => SimHash64(es.head))
    GraftShim.registerFunction(spark, "graft_cosine", es => CosineSimilarity(es(0), es(1)))
  }
}
