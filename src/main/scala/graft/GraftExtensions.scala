package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MultiContains

/** Oracle-cost-aware conjunct ordering (SURVEY §4 "cost-class filter
  * reordering", Semantic-OLAP Exection_Agent.py:54-60,105-113, recast as a
  * Catalyst rule).
  *
  * Catalyst reorders and pushes predicates structurally but treats every
  * conjunct as equally cheap; a Scala-UDF oracle judge on the left of a
  * codegen'd keyword predicate would run for every row even though `And`
  * short-circuits. This rule stable-sorts the conjuncts of every Filter by
  * cost class — plain comparisons (0) < regex/collection scans (1) <
  * Scala UDFs, i.e. semantic-oracle calls (2) — so whole-stage codegen's
  * left-to-right evaluation gives the reference's cheap-first cascade for
  * free, including for user-composed `df.filter(expensive && cheap)` the
  * engine's own cascade builder never sees.
  *
  * Runs in the user-provided optimizer batch (after predicate pushdown has
  * settled). Filters with any nondeterministic conjunct are left untouched
  * (reordering those would change semantics).
  */
object OracleCostReorder extends Rule[LogicalPlan] with PredicateHelper {

  private def cost(e: Expression): Int =
    if (e.exists(_.isInstanceOf[ScalaUDF])) 2
    else if (e.exists {
      case _: RLike | _: Like | _: RegExpExtract | _: In | _: InSet |
           _: Contains | _: StartsWith | _: EndsWith | _: MultiContains => true
      case _ => false
    }) 1
    else 0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.length < 2 || conjuncts.exists(!_.deterministic)) f
      else {
        val sorted = conjuncts.sortBy(cost) // stable: ties keep plan order
        if (sorted == conjuncts) f else Filter(sorted.reduceLeft(And), child)
      }
  }
}

/** Session extension entry point:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Injects [[OracleCostReorder]] and registers the codegen'd
  * [[graft.functions.MultiContains]] kernel for SQL use:
  * `multi_contains(text, array('k1','k2'), 'all'|'any'|'none')`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def stringLits(e: Expression, what: String): Seq[String] = e match {
    case CreateArray(items, _) => items.map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be an array of string literals, got $other")
    }
    case Literal(data, _) if data != null =>
      e.dataType match {
        case t: org.apache.spark.sql.types.ArrayType if t.elementType == StringType =>
          data.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toArray[UTF8String](StringType).map(_.toString).toSeq
        case _ => throw new IllegalArgumentException(
          s"$what must be an array of string literals")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be an array of string literals, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => OracleCostReorder)
    ext.injectFunction((
      new FunctionIdentifier("multi_contains"),
      new ExpressionInfo(classOf[MultiContains].getName, "multi_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "usage: multi_contains(text, array(keywords...), 'all'|'any'|'none')")
        val mode = children(2) match {
          case Literal(s: UTF8String, StringType) => s.toString.toLowerCase
          case other => throw new IllegalArgumentException(
            s"mode must be a string literal, got $other")
        }
        val (any, negate) = mode match {
          case "all" => (false, false)
          case "any" => (true, false)
          case "none" => (true, true)
          case m => throw new IllegalArgumentException(
            s"mode must be 'all', 'any' or 'none', got '$m'")
        }
        MultiContains(children.head, stringLits(children(1), "keywords"),
          matchAny = any, negate = negate)
      }))
  }
}
