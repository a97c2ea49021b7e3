package graft.plan

/** The engine's logical-plan / lineage IR.
  *
  * Mirrors the reference's normalized plan exchange format — a JSON list of
  * `{"operator_name": ..., "parameters": {...}}` objects (produced by
  * Semantic-OLAP/Agents/Exection_Agent.py:312-370, consumed as the golden
  * plans of Semantic-OLAP/datas/evaluate_datas.json and documented in
  * Semantic-OLAP/baselines/baseline_LLM_direct.py:3-135). Keeping the wire
  * format verbatim makes the golden corpus our test oracle; internally it
  * decodes to this sealed ADT.
  */
sealed trait LogicalOp extends Serializable {
  def name: String
}

/** One numeric predicate atom: column <op> threshold.
  * op in {==, !=, >, <, >=, <=} (Exection_Agent.py:313-326).
  */
final case class NumCondition(column: String, threshold: Double, op: String)

object LogicalOp {
  final case class SemFilter(columns: Seq[String], condition: String)
      extends LogicalOp { val name = "sem_filter" }

  /** relation in {contains, contained_in, equal, irrelevant};
    * logic in {and, or}  (Operaters.py:10-42).
    */
  final case class KeywordFilter(columns: Seq[String], keywords: Seq[String],
      logic: String, relation: String)
      extends LogicalOp { val name = "keyword_filter" }

  final case class NumFilter(conditions: Seq[NumCondition], logic: String)
      extends LogicalOp { val name = "num_filter" }

  /** keyword = the NEW column name (the derived dimension's title). */
  final case class SemMap(columns: Seq[String], mapDescription: String,
      keyword: String)
      extends LogicalOp { val name = "sem_map" }

  final case class SemGroup(columns: Seq[String], groupDescription: String,
      keyword: String)
      extends LogicalOp { val name = "sem_group" }

  final case class SemReduce(columns: Seq[String], groupBy: Option[String])
      extends LogicalOp { val name = "sem_reduce" }

  final case class NumReduce(columns: Seq[String], agg: Seq[String],
      groupBy: Option[String])
      extends LogicalOp { val name = "num_reduce" }

  final case class CountOp(groupBy: String, columns: Seq[String])
      extends LogicalOp { val name = "count" }

  final case class NumTopK(column: String, k: Int, order: String)
      extends LogicalOp { val name = "num_topk" }

  final case class SemTopK(columns: Seq[String], query: String, k: Int)
      extends LogicalOp { val name = "sem_topk" }

  /** Escape hatch for plan entries outside the 10-operator algebra (the
    * corpus occasionally names composite verbs); round-trips verbatim.
    */
  final case class Opaque(name: String, parameters: Map[String, Any])
      extends LogicalOp
}

/** Filter-composition logic tree: `["AND"|"OR", <leafId|subtree>, ...]`
  * (Exection_Agent.py:45, Operaters.py:161). Leaf ids index into the
  * operation list of the enclosing plan.
  */
sealed trait LogicTree extends Serializable
object LogicTree {
  final case class Leaf(id: Int) extends LogicTree
  final case class Node(op: String, children: Seq[LogicTree]) extends LogicTree

  /** Normalization mirroring Exection_Agent.py:213-238: unwrap singleton
    * nodes and flatten nested same-op AND/AND, OR/OR.
    */
  def normalize(t: LogicTree): LogicTree = t match {
    case l: Leaf => l
    case Node(op, cs) =>
      val flat = cs.map(normalize).flatMap {
        case Node(`op`, inner) => inner
        case other             => Seq(other)
      }
      if (flat.size == 1) flat.head else Node(op, flat)
  }
}
