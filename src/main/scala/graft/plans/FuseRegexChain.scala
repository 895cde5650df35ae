package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RegexChainReplace

/** Kernel-fusion optimizer rule #3: the ordered regex RULEBOOK. The
  * library's scrub idiom (Cleanup.regexRules — the reference's PanelApp
  * rulebook fold, q_pii_scrub / q_regex_rulebook) nests N
  * `regexp_replace` passes:
  *
  *   `regexp_replace(regexp_replace(regexp_replace(c, p1, r1), p2, r2), p3, r3)`
  *
  * Each unfused pass decodes UTF8String→String, scans, rebuilds, and
  * re-encodes — N scans and up to 4·N copies per row even when nothing
  * matches. This rule collapses any maximal literal chain (length ≥ 2)
  * into ONE [[graft.functions.RegexChainReplace]] kernel, which replays
  * the identical sequential passes through a single String pipeline:
  * one decode, per-pass `find()` with a ZERO-COPY skip when a pass
  * matches nothing, one re-encode. (A combined alternation pre-filter
  * was prototyped and deleted — it measured ~20% SLOWER and risks
  * semantic drift on overlapping matches; RegexChainImpl's scaladoc
  * records that rejected design.)
  *
  * Guards (RuleSpec pins each):
  *  - every pattern and replacement in the chain is a non-null string
  *    literal, and every search position is the default 1 — a partial
  *    prefix that qualifies still fuses (the unqualified outer passes
  *    stay as plain `regexp_replace` above the kernel);
  *  - the chain is the exact nested shape — anything between two passes
  *    (a cast, a coalesce) ends the chain there;
  *  - value identity is by construction: the kernel runs the same
  *    Matcher.appendReplacement loop per pass in the same order, so
  *    nulls, $-group references, and replacement escapes behave
  *    identically (the q_pii_scrub / q_regex_rulebook DuckDB oracles
  *    hash-verify this cross-engine every round).
  *
  * Injected via `injectOptimizerRule` (GraftExtensions). The rewrite
  * consumes the nested shape and produces a non-matching node, so the
  * fixed point is stable.
  */
object FuseRegexChain extends Rule[LogicalPlan] {

  private object LitStr {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(s: UTF8String, StringType) if s != null => Some(s.toString)
      case _ => None
    }
  }

  private def posOne(e: Expression): Boolean = e match {
    case Literal(1, _) => true
    case _ => false
  }

  /** Walk outer→inner collecting qualifying passes; returns the subject
    * below the chain and the passes in EXECUTION order (innermost
    * first).
    */
  private def collect(e: Expression, acc: List[(String, String)]): (Expression, List[(String, String)]) =
    e match {
      case RegExpReplace(subj, LitStr(p), LitStr(r), pos) if posOne(pos) =>
        collect(subj, (p, r) :: acc)
      case other => (other, acc)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer @ RegExpReplace(RegExpReplace(_, _, _, _), _, _, _) =>
        collect(outer, Nil) match {
          case (subject, chain) if chain.length >= 2 =>
            RegexChainReplace(subject, chain.map(_._1), chain.map(_._2))
          // a 2-deep nesting where a pattern/replacement/pos is not a
          // qualifying literal: leave it; the transform still descends,
          // so a qualifying inner sub-chain fuses on its own
          case _ => outer
        }
    }
}
