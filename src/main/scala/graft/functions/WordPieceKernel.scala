package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frozen piece inventory for [[WordPieceEncode]] — a broadcast-model
  * reference object (≤ vocab-size strings; the set rebuilds lazily after
  * deserialization on each executor).
  */
final class PieceVocab(val pieces: Array[String], val maxLen: Int)
    extends Serializable {
  require(maxLen >= 1, s"PieceVocab: maxLen must be >= 1, got $maxLen")
  @transient private var set0: java.util.HashSet[String] = _
  def set: java.util.HashSet[String] = {
    if (set0 == null) {
      val s = new java.util.HashSet[String](pieces.length * 2)
      pieces.foreach(s.add)
      set0 = s
    }
    set0
  }
}

object WordPieceImpl {
  /** Greedy longest-match segmentation of whitespace-split words.
    * Codepoint-exact: piece boundaries never split a surrogate pair, so
    * the walk agrees with the (codepoint-based) substr both engines used
    * to BUILD the vocabulary. Unknown characters pass through as their
    * own piece and count in n_unk.
    */
  def encode(t: UTF8String, v: PieceVocab): InternalRow = {
    val sb = new java.lang.StringBuilder()
    var nWords = 0L; var nPieces = 0L; var nUnk = 0L; var nPieceChars = 0L
    val words = t.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        if (nWords > 0L) sb.append('\u001E')
        nWords += 1L
        // codepoint index: idx(c) = UTF-16 offset of codepoint c
        val n = w.codePointCount(0, w.length)
        val idx = new Array[Int](n + 1)
        var ci = 0; var c = 0
        while (c < n) { idx(c) = ci; ci = w.offsetByCodePoints(ci, 1); c += 1 }
        idx(n) = w.length
        var p = 0; var first = true
        while (p < n) {
          var l = math.min(v.maxLen, n - p)
          while (l > 1 && !v.set.contains(w.substring(idx(p), idx(p + l)))) l -= 1
          val hit = l > 1 || v.set.contains(w.substring(idx(p), idx(p + 1)))
          if (!hit) nUnk += 1L
          if (!first) sb.append('\u001F')
          sb.append(w, idx(p), idx(p + l))
          nPieces += 1L
          nPieceChars += l.toLong
          first = false
          p += l
        }
      }
      wi += 1
    }
    InternalRow(nWords, nPieces, nUnk, nPieceChars,
      UTF8String.fromString(sb.toString))
  }
}

/** graft_wordpiece(text, pieces, maxLen) →
  * struct<n_words,n_pieces,n_unk,n_piece_chars,seg>: greedy longest-match
  * subword segmentation against a frozen inventory (see
  * [[graft.text.WordPiece]]). The inventory is a plan-time constant —
  * a broadcast model inside whole-stage codegen; the scan never shuffles.
  */
case class WordPieceEncode(child: Expression, pieces: Seq[String], maxLen: Int)
    extends UnaryExpression {
  override def prettyName: String = "graft_wordpiece"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("n_piece_chars", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  @transient private lazy val vocab = new PieceVocab(pieces.toArray, maxLen)

  override def nullSafeEval(t: Any): Any =
    WordPieceImpl.encode(t.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", vocab, classOf[PieceVocab].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordPieceImpl.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}
