package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RegexCount, RegexMatchedChars}

/** Kernel-fusion optimizer rule #2: the run-counting regexp algebra.
  * The library (and plain SQL users) count pattern occurrences with
  *
  *   `length(regexp_replace(c, p, "X")) - length(regexp_replace(c, p, ""))`
  *
  * (match count — each match leaves 1 char vs 0 chars) and measure
  * matched volume with
  *
  *   `length(c) - length(regexp_replace(c, p, ""))`
  *
  * (code points covered by matches). Both shapes push every string
  * through the regex engine twice and materialize one or two rewritten
  * copies per row; this rule rewrites them to the one-scan, zero-copy
  * kernels [[graft.functions.RegexCount]] / [[RegexMatchedChars]].
  *
  * Guards (RuleSpec pins each):
  *  - the two `regexp_replace` calls must share an IDENTICAL literal
  *    pattern, literal replacements of exactly 1 and 0 code points, and
  *    the default search position 1;
  *  - the 1-char replacement must be a verbatim char — '$' and '\' have
  *    appendReplacement meta-semantics (a lone one throws at runtime in
  *    the unfused form), so they are left alone;
  *  - the subject must be deterministic and semantically equal on both
  *    sides (a nondeterministic subject evaluated twice is not the same
  *    value — no fusion);
  *  - null convention is unchanged: every matched shape null-propagates
  *    from the subject exactly like the fused kernel (patterns are
  *    non-null literals or the match fails);
  *  - the Subtract cannot overflow (both operands are string lengths,
  *    the count form is in [0, length]), so ANSI/TRY/legacy eval modes
  *    are all value-identical to the plain kernel result.
  *
  * Known (accepted) behavior shift: the kernels compile their pattern at
  * codegen time (`addReferenceObj`), so an INVALID literal regex throws
  * during planning, where the unfused `regexp_replace` idiom throws at
  * execution — same exception, earlier surface. Values on every valid
  * pattern are identical.
  *
  * Injected via `injectOptimizerRule` (GraftExtensions); the rewrite
  * produces no further match, so the fixed point is stable.
  */
object FuseRegexCount extends Rule[LogicalPlan] {

  /** A string literal of exactly `n` code points; for n == 1 the char
    * must be verbatim under appendReplacement ('$'/'\' excluded).
    */
  private def litRep(e: Expression, n: Int): Boolean = e match {
    case Literal(s: UTF8String, StringType) if s.numChars() == n =>
      n == 0 || { val c = s.toString.charAt(0); c != '$' && c != '\\' }
    case _ => false
  }

  private object LitPattern {
    def unapply(e: Expression): Option[UTF8String] = e match {
      case Literal(s: UTF8String, StringType) if s != null => Some(s)
      case _ => None
    }
  }

  /** Default search position (the 3-arg regexp_replace surface). */
  private def posOne(e: Expression): Boolean = e match {
    case Literal(1, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // Match count: len(replace(s, p, "X")) - len(replace(s, p, "")).
      case Subtract(
          Length(RegExpReplace(s1, LitPattern(re1), rep1, p1)),
          Length(RegExpReplace(s2, LitPattern(re2), rep2, p2)), _)
          if re1 == re2 && litRep(rep1, 1) && litRep(rep2, 0) &&
            posOne(p1) && posOne(p2) &&
            s1.deterministic && s1.semanticEquals(s2) =>
        RegexCount(s1, re1.toString)

      // Matched code points: len(s) - len(replace(s, p, "")).
      case Subtract(
          Length(s1),
          Length(RegExpReplace(s2, LitPattern(re2), rep2, p2)), _)
          if litRep(rep2, 0) && posOne(p2) && s1.dataType == StringType &&
            s1.deterministic && s1.semanticEquals(s2) =>
        RegexMatchedChars(s1, re2.toString)

      // Match count via array materialization:
      // size(regexp_extract_all(s, p, 0)) builds the full match array
      // per row only to take its length — one entry per find() match
      // (idx 0 = the whole match; other group indexes also emit one
      // entry per match, but only idx 0 is fused to keep the guard
      // trivially airtight). Null convention follows the matched size's
      // own legacy flag, exactly like FuseTokenCount.
      case Size(RegExpExtractAll(s, LitPattern(re), Literal(0, _)), legacy) =>
        if (legacy) Coalesce(Seq(RegexCount(s, re.toString), Literal(-1)))
        else RegexCount(s, re.toString)
    }
}
