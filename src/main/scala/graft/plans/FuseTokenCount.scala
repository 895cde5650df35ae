package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TokenCount

/** Kernel-fusion optimizer rule — the engine's library-level Catalyst
  * integration: the ubiquitous token-count idiom
  * `size(filter(split(trim(text), "\\s+"), _ =!= ""))` materializes a
  * string array per row and re-walks it twice; this rule rewrites the
  * exact idiom to the allocation-free one-pass
  * [[graft.functions.TokenCount]] kernel wherever it appears in a plan.
  *
  * Value identity (RuleSpec pins each):
  *  - token count = number of maximal non-`\s` runs — equal to the HOF
  *    chain on EVERY input (leading/trailing/multiple separators and the
  *    empty string all normalize through the `=!= ""` filter);
  *  - an inner one-arg `trim` is value-neutral (it removes only ' ',
  *    which is already `\s`, and is null exactly when its input is) —
  *    the rewrite drops it;
  *  - null convention follows the matched `size`'s own flag: legacy
  *    (size(null) = -1) becomes `coalesce(kernel, -1)`, ANSI
  *    (size(null) = null) becomes the null-propagating kernel alone.
  *
  * Injected via `injectOptimizerRule` (GraftExtensions), so it runs in
  * the operator-optimization fixed point on resolved plans; the rewrite
  * produces no further match, so the fixed point is stable.
  */
object FuseTokenCount extends Rule[LogicalPlan] {

  /** split(x, "\s+"[, -1]), with a value-neutral inner trim dropped. */
  private object WsSplit {
    def unapply(e: Expression): Option[Expression] = e match {
      case StringSplit(str, r @ Literal(regex: UTF8String, _), l @ Literal(limit, _))
          if regex.toString == "\\s+" && r.dataType.typeName.startsWith("string") &&
            l.dataType == IntegerType && limit == -1 =>
        Some(str match {
          case StringTrim(src, None) => src
          case other => other
        })
      case _ => None
    }
  }

  /** x => x =!= '' (either operand order), the variable being the
    * lambda's own argument.
    */
  private object NonEmptyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Not(EqualTo(a, b)), Seq(arg: NamedLambdaVariable), _) =>
        (a, b) match {
          case (v: NamedLambdaVariable, Literal(s: UTF8String, _)) =>
            v.exprId == arg.exprId && s.numChars() == 0
          case (Literal(s: UTF8String, _), v: NamedLambdaVariable) =>
            v.exprId == arg.exprId && s.numChars() == 0
          case _ => false
        }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayFilter(WsSplit(x), f), legacy) if NonEmptyLambda.unapply(f) =>
        if (legacy) Coalesce(Seq(TokenCount(x), Literal(-1)))
        else TokenCount(x)
    }
}
