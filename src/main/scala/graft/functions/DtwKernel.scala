package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

object DtwImpl {
  /** INF sentinel shared with the SQL oracle: far above any feasible
    * path sum (band width × |series| × max step cost in this engine's
    * micro-quantized inputs), far below Long overflow even after an
    * INF + cost + INF fold inside `min`.
    */
  val Inf: Long = 1000000000000000L

  /** Banded (Sakoe–Chiba, radius `r`) dynamic-time-warping distance
    * between two integer series with |a[i]−b[j]| step cost — O(n·r)
    * time, O(r) memory (two sliding band rows), never materializing the
    * n×m matrix. Returns [[Inf]] when no in-band alignment exists
    * (||a|−|b|| > r). Sakoe & Chiba 1978, IEEE TASSP 26(1).
    */
  def distance(a: ArrayData, b: ArrayData, r: Int): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return if (n == m) 0L else Inf
    val w = 2 * r + 1
    // band rows in offset space: row i covers j = i-r .. i+r;
    // offset o = j - i + r ∈ [0, w)
    var prev = new Array[Long](w)
    var cur = new Array[Long](w)
    java.util.Arrays.fill(prev, Inf)
    prev(r) = 0L // dp[0][0]
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, Inf)
      var o = 0
      while (o < w) {
        val j = i - r + o
        if (j >= 1 && j <= m) {
          val cost = math.abs(a.getLong(i - 1) - b.getLong(j - 1))
          // dp[i-1][j] at prev offset o+1; dp[i-1][j-1] at prev offset o;
          // dp[i][j-1] at cur offset o-1
          val up = if (o + 1 < w) prev(o + 1) else Inf
          val diag = prev(o)
          val left = if (o > 0) cur(o - 1) else Inf
          var best = up
          if (diag < best) best = diag
          if (left < best) best = left
          cur(o) = if (best >= Inf) Inf else cost + best
        }
        o += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    // dp[n][m] at offset m - n + r; out of band → Inf
    val fo = m - n + r
    if (fo < 0 || fo >= w) Inf else prev(fo)
  }
}

/** graft_dtw(a, b, radius) → bigint: banded DTW distance between two
  * BIGINT series (quantize doubles to micro-integers first — the
  * engine's determinism doctrine keeps the DP in exact integer
  * arithmetic so the oracle's recursive-CTE replay hash-matches).
  * Codegen'd; O(n·radius) per row.
  */
case class DtwBand(left: Expression, right: Expression, radius: Int)
    extends BinaryExpression {
  require(radius >= 0, s"graft_dtw: radius must be >= 0, got $radius")
  override def prettyName: String = "graft_dtw"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    DtwImpl.distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], radius)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DtwImpl.distance($a, $b, $radius)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwBand =
    copy(left = newLeft, right = newRight)
}
