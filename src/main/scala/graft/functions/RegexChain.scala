package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared engine for the fused ordered-rulebook scrub (see
  * [[RegexChainReplace]]): replays the EXACT sequential
  * `regexp_replace(regexp_replace(...))` semantics — pass i runs on pass
  * i−1's output, `Matcher.appendReplacement` replacement conventions
  * ($-group refs, backslash escapes) included — but through a single
  * String pipeline:
  *
  *  - ONE UTF8String→String decode and at most one encode per row,
  *    instead of one of each per pass (the unfused chain re-materializes
  *    a UTF8String between every pair of passes);
  *  - a pass whose pattern has no match costs one `find()` and ZERO
  *    copies (the unfused idiom still rebuilds the string);
  *  - a clean row (no pattern matches anywhere — the common case for a
  *    PII rulebook) returns the INPUT UTF8String untouched: no copy, no
  *    re-encode.
  *
  * Two rejected designs, measured on the sf0.1 corpus (REPEAT=8):
  *  - a combined alternation PRE-FILTER (one `(?:p1)|(?:p2)|...` scan
  *    deciding whether any pass needs to run) was 20% SLOWER than just
  *    running the passes: alternation forfeits each pattern's own engine
  *    optimizations (literal-prefix Boyer-Moore, fail-fast first-char
  *    classes) and re-tries every branch at every position, while a
  *    non-matching sequential pass is already a single cheap scan;
  *  - the single-pass "ordered alternation" SCRUB (replace while
  *    scanning once) diverges from sequential semantics whenever matches
  *    of different patterns overlap (pattern 1 claims its matches across
  *    the WHOLE string before pattern 2 sees any of it) — not statically
  *    checkable, so a value-identity fusion rule cannot use it.
  */
final class RegexChainImpl(
    val patterns: Array[String], val replacements: Array[String])
    extends Serializable {
  require(patterns.nonEmpty && patterns.length == replacements.length,
    "RegexChain: need equally many patterns and replacements")

  @transient private lazy val compiled: Array[Pattern] =
    patterns.map(Pattern.compile)

  def apply(input: UTF8String): UTF8String = {
    var s = input.toString
    var changed = false
    var i = 0
    while (i < compiled.length) {
      val m = compiled(i).matcher(s)
      if (m.find()) {
        val sb = new java.lang.StringBuilder
        do m.appendReplacement(sb, replacements(i)) while (m.find())
        m.appendTail(sb)
        s = sb.toString
        changed = true
      }
      i += 1
    }
    if (changed) UTF8String.fromString(s) else input
  }
}

/** graft_regex_chain(text, patterns, replacements) → string: an ordered
  * regex rulebook (sequential `regexp_replace` fold) in one fused kernel
  * — value-identical to the unfused chain on every input, planned
  * automatically by [[graft.plans.FuseRegexChain]] and exposed directly
  * via `GraftFunctions.regexChain` / SQL `graft_regex_chain`.
  */
case class RegexChainReplace(
    child: Expression, patterns: Seq[String], replacements: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "graft_regex_chain"
  override def dataType: DataType = StringType
  @transient private lazy val impl =
    new RegexChainImpl(patterns.toArray, replacements.toArray)
  override def nullSafeEval(t: Any): Any =
    impl.apply(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // patterns compile lazily per executor — an invalid literal regex
    // throws at first execution, the same surface as the unfused chain
    val ref = ctx.addReferenceObj("regexChainImpl",
      new RegexChainImpl(patterns.toArray, replacements.toArray),
      classOf[RegexChainImpl].getName)
    defineCodeGen(ctx, ev, c => s"$ref.apply($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): RegexChainReplace =
    copy(child = newChild)
}
