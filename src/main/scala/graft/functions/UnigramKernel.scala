package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frozen unigram-LM model for [[UnigramEncode]] — (piece → integer
  * log-prob) pairs as a broadcast-model reference object. Scores are
  * micro-nats (floor(1e6·ln p), BIGINT) so the Viterbi DP is pure
  * integer arithmetic: exact, order-free, engine-reproducible. Unknown
  * single characters cost `unkLp` = (worst vocabulary piece) − 1e6 —
  * one nat worse than anything known, derived from the model so both
  * engines agree without an extra parameter.
  */
final class UnigramModel(
    val pieces: Array[String], val lps: Array[Long], val maxLen: Int)
    extends Serializable {
  require(pieces.length == lps.length,
    s"UnigramModel: ${pieces.length} pieces vs ${lps.length} log-probs")
  require(pieces.nonEmpty, "UnigramModel: empty vocabulary")
  require(maxLen >= 1, s"UnigramModel: maxLen must be >= 1, got $maxLen")
  val unkLp: Long = lps.min - 1000000L
  @transient private var map0: java.util.HashMap[String, java.lang.Long] = _
  def map: java.util.HashMap[String, java.lang.Long] = {
    if (map0 == null) {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), lps(i)); i += 1 }
      map0 = m
    }
    map0
  }
}

object UnigramImpl {
  /** Viterbi max-log-prob segmentation of whitespace-split words —
    * the SentencePiece unigram-LM inference step (Kudo 2018), vs
    * [[WordPieceImpl]]'s greedy MaxMatch. Codepoint-exact like the
    * WordPiece kernel. Canonical path: forward DP maximizes the integer
    * score sum; reconstruction walks BACKWARD choosing the SHORTEST
    * last piece that achieves dp[i] — the tie-break the oracle's
    * recursive CTE replays (min-l backward ≡ max-j forward).
    */
  def encode(t: UTF8String, v: UnigramModel): InternalRow = {
    val sb = new java.lang.StringBuilder()
    var nWords = 0L; var nPieces = 0L; var nUnk = 0L; var scoreTotal = 0L
    val words = t.toString.split("\\s+")
    val m = v.map
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        if (nWords > 0L) sb.append('\u001E')
        nWords += 1L
        val n = w.codePointCount(0, w.length)
        val idx = new Array[Int](n + 1)
        var ci = 0; var c = 0
        while (c < n) { idx(c) = ci; ci = w.offsetByCodePoints(ci, 1); c += 1 }
        idx(n) = w.length
        // forward DP over codepoint positions: dp(i) = best score of w[0,i)
        val dp = new Array[Long](n + 1)
        var i = 1
        while (i <= n) {
          var best = Long.MinValue
          var l = 1
          val lMax = math.min(v.maxLen, i)
          while (l <= lMax) {
            val lp = m.get(w.substring(idx(i - l), idx(i)))
            if (lp != null) {
              val cand = dp(i - l) + lp.longValue()
              if (cand > best) best = cand
            } else if (l == 1) {
              val cand = dp(i - 1) + v.unkLp
              if (cand > best) best = cand
            }
            l += 1
          }
          dp(i) = best
          i += 1
        }
        scoreTotal += dp(n)
        // backward reconstruction: smallest l with dp(i-l) + lp == dp(i)
        val outPieces = new java.util.ArrayList[String]()
        var unkRev = 0L
        var p = n
        while (p > 0) {
          var l = 1
          var taken = false
          val lMax = math.min(v.maxLen, p)
          while (!taken && l <= lMax) {
            val piece = w.substring(idx(p - l), idx(p))
            val lp = m.get(piece)
            val cand =
              if (lp != null) dp(p - l) + lp.longValue()
              else if (l == 1) dp(p - 1) + v.unkLp
              else Long.MinValue
            if (cand == dp(p)) {
              outPieces.add(piece)
              if (lp == null) unkRev += 1L
              p -= l
              taken = true
            }
            l += 1
          }
          // dp(p) was built from exactly these candidates: one must
          // match. Throw (not assert): with -Xdisable-assertions a
          // silent fall-through would loop forever on p.
          if (!taken)
            throw new IllegalStateException(s"unigram: no backward step at $p in '$w'")
        }
        nPieces += outPieces.size.toLong
        nUnk += unkRev
        var k = outPieces.size - 1
        while (k >= 0) {
          sb.append(outPieces.get(k))
          if (k > 0) sb.append('\u001F')
          k -= 1
        }
      }
      wi += 1
    }
    InternalRow(nWords, nPieces, nUnk, scoreTotal,
      UTF8String.fromString(sb.toString))
  }
}

/** graft_unigram(text, pieces, logprobs, maxLen) →
  * struct<n_words,n_pieces,n_unk,score_total,seg>: Viterbi unigram-LM
  * segmentation against a frozen (piece, micro-nat log-prob) model (see
  * [[graft.text.Unigram]]). Like [[WordPieceEncode]], the model is a
  * plan-time constant riding whole-stage codegen as a reference object —
  * a pure scan-side projection, NO join, NO shuffle on the corpus.
  */
case class UnigramEncode(
    child: Expression, pieces: Seq[String], lps: Seq[Long], maxLen: Int)
    extends UnaryExpression {
  override def prettyName: String = "graft_unigram"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("score_total", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  @transient private lazy val model =
    new UnigramModel(pieces.toArray, lps.toArray, maxLen)

  override def nullSafeEval(t: Any): Any =
    UnigramImpl.encode(t.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramImpl.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}
