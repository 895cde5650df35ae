package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

object TokenCountImpl {
  /** Java-regex `\s` class EXACTLY: [ \t\n\x0B\f\r]. This must NOT be
    * Character.isWhitespace (which adds Unicode space separators) — the
    * kernel's contract is value-identity with
    * `size(filter(split(text, "\\s+"), _ =!= ""))`, and that chain's
    * whitespace definition is the regex one.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Number of maximal non-whitespace runs — the engine-wide token
    * count, in one allocation-free pass.
    */
  def count(text: UTF8String): Int = {
    val s = text.toString
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        n += 1
        while (i < len && !isWs(s.charAt(i))) i += 1
      }
    }
    n
  }
}

/** graft_token_count(text) → int: whitespace token count as one
  * allocation-free pass. The library's HOF idiom
  * `size(filter(split(trim(text), "\\s+"), _ =!= ""))` materializes a
  * string array and re-walks it per row; this kernel is the fused form,
  * and [[graft.plans.FuseTokenCount]] rewrites that exact idiom to this
  * expression plan-wide (value-identical on every input, null
  * conventions included — RuleSpec pins it).
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_token_count"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(t: Any): Any =
    TokenCountImpl.count(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountImpl.count($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}
