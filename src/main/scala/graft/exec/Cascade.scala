package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.oracle.SemanticOracle
import graft.plan.{LogicalOp, LogicTree}
import graft.ops._

/** Cost-ordered filter-cascade construction.
  *
  * The reference's execution agent flattens the filter plan, sorts it by a
  * cost class (numeric/keyword=0 < pattern/enum=1 < LLM=2,
  * Exection_Agent.py:54-60,105-113) and evaluates ops cheapest-first with
  * three-valued short-circuiting so expensive ops only ever see undecided
  * rows (Exection_Agent.py:380-394, 181-210).
  *
  * The Spark-native equivalent needs no multi-pass row routing:
  *   - every leaf becomes a `Column` predicate;
  *   - within every AND/OR node, children are ordered cheap-first;
  *   - Spark's `And`/`Or` codegen short-circuits per row, so an expensive
  *     oracle UDF on the right of a cheap keyword predicate is only
  *     evaluated for rows the cheap one left undecided — the reference's
  *     cascade, fused into one whole-stage-codegen pass;
  *   - Catalyst additionally splits the cheap conjuncts out and pushes them
  *     into the parquet scan (`PushedFilters`), which the reference cannot do.
  */
object Cascade {

  /** Reference PRIORITY_MAP semantics (Exection_Agent.py:54-60). */
  def cost(op: LogicalOp): Int = op match {
    case _: LogicalOp.NumFilter | _: LogicalOp.KeywordFilter => 0
    case _: LogicalOp.SemFilter => 2
    case _ => 1
  }

  def leafPredicate(df: DataFrame, op: LogicalOp,
      oracle: SemanticOracle): Column = op match {
    case f: LogicalOp.KeywordFilter =>
      KeywordFilter.predicate(df, f.columns, f.keywords, f.logic, f.relation)
    case f: LogicalOp.NumFilter =>
      NumFilter.predicate(f.conditions, f.logic)
    case f: LogicalOp.SemFilter =>
      SemFilter.predicate(df, f.columns, f.condition, oracle)
    case other =>
      sys.error(s"not a filter operator: ${other.name}")
  }

  /** Fold a logic tree over filter leaves into one Column, children of each
    * node ordered by cost class (stable within a class, preserving plan
    * order — matching `reorder_by_priority`'s stable sort).
    */
  def predicate(df: DataFrame, leaves: Map[Int, LogicalOp], tree: LogicTree,
      oracle: SemanticOracle): Column = {

    def leafCost(t: LogicTree): Int = t match {
      case LogicTree.Leaf(id) => cost(leaves(id))
      case LogicTree.Node(_, cs) => if (cs.isEmpty) 0 else cs.map(leafCost).max
    }

    def build(t: LogicTree): Column = t match {
      case LogicTree.Leaf(id) => leafPredicate(df, leaves(id), oracle)
      case LogicTree.Node(op, cs) =>
        val ordered = cs.sortBy(leafCost).map(build)
        Ops.foldLogic(ordered, op.toLowerCase)
    }
    build(LogicTree.normalize(tree))
  }

  /** Filter `df` by a plan of filter ops composed under `tree`; a missing
    * tree means AND of all (the reference's default when no logic is given).
    */
  def filter(df: DataFrame, ops: Seq[(Int, LogicalOp)],
      tree: Option[LogicTree], oracle: SemanticOracle): DataFrame = {
    val t = tree.getOrElse(LogicTree.Node("AND", ops.map(o => LogicTree.Leaf(o._1))))
    df.filter(predicate(df, ops.toMap, t, oracle))
  }
}

/** Whole-plan executor: runs a reference-format plan (filters + derivations
  * + aggregations + top-k) left to right, the way golden plans in
  * Semantic-OLAP/datas/evaluate_datas.json are ordered. Consecutive filter
  * ops are fused into one cost-ordered cascade before execution.
  */
object PlanRunner {
  def isFilter(op: LogicalOp): Boolean = op match {
    case _: LogicalOp.KeywordFilter | _: LogicalOp.NumFilter |
         _: LogicalOp.SemFilter => true
    case _ => false
  }

  def run(df0: DataFrame, plan: Seq[LogicalOp], oracle: SemanticOracle,
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    var df = df0
    var i = 0
    while (i < plan.length) {
      if (isFilter(plan(i))) {
        val run = plan.drop(i).takeWhile(isFilter)
        df = Cascade.filter(df, run.zipWithIndex.map(_.swap), None, oracle)
        i += run.length
      } else {
        df = plan(i) match {
          case op: LogicalOp.SemMap    => SemMap(df, op, oracle)
          case op: LogicalOp.SemGroup  => SemGroup(df, op, oracle, maxTags = 20)
          case op: LogicalOp.SemReduce => SemReduce(df, op, oracle)
          case op: LogicalOp.NumReduce => NumReduce(df, op)
          case op: LogicalOp.CountOp   => CountOp(df, op)
          case op: LogicalOp.NumTopK   =>
            // golden plans reference the count op's output as "count" while
            // the engine names it count_of_<dim> — resolve when unambiguous
            val resolved =
              if (!df.columns.contains(op.column)) {
                df.columns.filter(_.startsWith(s"${op.column}_of_")) match {
                  case Array(one) => op.copy(column = one)
                  case _          => op
                }
              } else op
            NumTopK(df, resolved, tiebreak.filter(df.columns.contains))
          case op: LogicalOp.SemTopK   => SemTopK(df, op, oracle, tiebreak.filter(df.columns.contains))
          case op: LogicalOp.Opaque    =>
            sys.error(s"cannot execute opaque operator '${op.name}'")
          case other => sys.error(s"unexpected operator ${other.name}")
        }
        i += 1
      }
    }
    df
  }
}
