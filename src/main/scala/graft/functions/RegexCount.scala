package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels for the run-counting regexp algebra. Both are defined
  * in terms of the SAME Java-regex `Matcher.find()` loop that Spark's
  * `regexp_replace` uses internally, so they are value-identical to the
  * two-scan idioms they fuse (see [[graft.plans.FuseRegexCount]]):
  *
  *  - `length(regexp_replace(s, p, "X")) - length(regexp_replace(s, p, ""))`
  *    = number of `find()` matches (each match contributes exactly one
  *    replacement char on the left and zero on the right; unmatched text
  *    contributes equally to both) — [[RegexCountImpl.count]];
  *  - `length(s) - length(regexp_replace(s, p, ""))`
  *    = code points covered by matches (Spark's `length` on strings is
  *    the CODE-POINT count, so supplementary characters inside a match
  *    must count once, not twice) — [[RegexCountImpl.matchedChars]].
  *
  * Zero-width matches need no special casing: `find()` advances past
  * them identically in the replace loop and here, and they add 0 chars.
  */
object RegexCountImpl {
  /** Number of non-overlapping `find()` matches of `p` in `s`. */
  def count(p: Pattern, s: UTF8String): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Total CODE POINTS covered by non-overlapping matches of `p`. */
  def matchedChars(p: Pattern, s: UTF8String): Int = {
    val str = s.toString
    val m = p.matcher(str)
    var n = 0
    while (m.find()) n += str.codePointCount(m.start, m.end)
    n
  }
}

/** graft_regex_count(text, pattern) → int: non-overlapping match count
  * of a plan-time-constant Java regex, in ONE scan. The library's
  * run-counting idiom `length(regexp_replace(c, p, "X")) -
  * length(regexp_replace(c, p, ""))` walks every string through the
  * regex engine TWICE and materializes two rewritten copies per row;
  * [[graft.plans.FuseRegexCount]] rewrites that exact shape to this
  * kernel plan-wide (value-identical on every input — RuleSpec pins it).
  */
case class RegexCount(child: Expression, regex: String) extends UnaryExpression {
  override def prettyName: String = "graft_regex_count"
  override def dataType: DataType = IntegerType
  @transient private lazy val pattern: Pattern = Pattern.compile(regex)
  override def nullSafeEval(t: Any): Any =
    RegexCountImpl.count(pattern, t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexCountPattern", pattern,
      classOf[Pattern].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.RegexCountImpl.count($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): RegexCount =
    copy(child = newChild)
}

/** graft_regex_matched_chars(text, pattern) → int: code points covered
  * by non-overlapping matches — the one-scan form of
  * `length(c) - length(regexp_replace(c, p, ""))`, fused by
  * [[graft.plans.FuseRegexCount]].
  */
case class RegexMatchedChars(child: Expression, regex: String)
    extends UnaryExpression {
  override def prettyName: String = "graft_regex_matched_chars"
  override def dataType: DataType = IntegerType
  @transient private lazy val pattern: Pattern = Pattern.compile(regex)
  override def nullSafeEval(t: Any): Any =
    RegexCountImpl.matchedChars(pattern, t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexMatchedPattern", pattern,
      classOf[Pattern].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RegexCountImpl.matchedChars($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): RegexMatchedChars =
    copy(child = newChild)
}
