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
  *  - an optional combined pre-filter (alternation of all patterns):
  *    when NO pattern matches — the common case for PII rulebooks over
  *    clean text — the row costs one scan total and returns the INPUT
  *    UTF8String untouched. Alternation shifts group numbering, so any
  *    pattern containing a backreference (`\1`) or a named-group
  *    construct (`(?<`) disables only the pre-filter; the sequential
  *    passes never merge patterns and stay exact regardless.
  *
  * This is deliberately NOT the single-pass "ordered alternation" scrub:
  * leftmost-match-wins alternation diverges from sequential semantics
  * whenever matches of different patterns overlap (pattern 1 claims its
  * matches across the WHOLE string before pattern 2 sees any of it), and
  * that divergence is not statically checkable — so a value-identity
  * fusion rule cannot use it.
  */
final class RegexChainImpl(
    val patterns: Array[String], val replacements: Array[String])
    extends Serializable {
  require(patterns.nonEmpty && patterns.length == replacements.length,
    "RegexChain: need equally many patterns and replacements")

  @transient private lazy val compiled: Array[Pattern] =
    patterns.map(Pattern.compile)

  /** `\<digit>` backreference or a named-group construct anywhere in a
    * pattern poisons the combined alternation (group renumbering /
    * duplicate group names) — conservatively includes escaped
    * backslash-digit false positives; a skipped pre-filter only costs
    * speed, never correctness.
    */
  private def alternationUnsafe(p: String): Boolean = {
    var i = 0
    while (i < p.length - 1) {
      if (p.charAt(i) == '\\' && Character.isDigit(p.charAt(i + 1))) return true
      i += 1
    }
    p.contains("(?<")
  }

  @transient private lazy val prefilter: Pattern =
    if (patterns.exists(alternationUnsafe)) null
    else Pattern.compile(patterns.map(p => s"(?:$p)").mkString("|"))

  def apply(input: UTF8String): UTF8String = {
    var s = input.toString
    if (prefilter != null && !prefilter.matcher(s).find()) return input
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
