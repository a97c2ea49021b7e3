package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

class PlanJsonSpec extends AnyFunSuite {
  private val corpusPath =
    "/root/reference/Semantic-OLAP/datas/evaluate_datas.json"

  private def corpusPlans(): Seq[(String, String)] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(corpusPath))
    for {
      sess <- root.asScala.toSeq
      qk <- Seq("Q1", "Q2", "Q3", "Q4") if sess.has(qk)
      section <- Seq("golden_plan", "key_operator", "valid_operator")
      plan = sess.get(qk).get(section) if plan != null && plan.isArray
    } yield (s"${sess.get("id")}.$qk.$section", mapper.writeValueAsString(plan))
  }

  test("all corpus plans decode, and round-trip losslessly through the ADT") {
    val plans = corpusPlans()
    assert(plans.nonEmpty, s"corpus not found at $corpusPath")
    var ops = 0
    plans.foreach { case (label, json) =>
      val decoded = PlanJson.decodePlan(json)
      ops += decoded.size
      // ADT -> JSON -> ADT must be a fixpoint
      val reencoded = PlanJson.encodePlan(decoded)
      val redecoded = PlanJson.decodePlan(reencoded)
      assert(redecoded == decoded, s"round-trip mismatch in $label")
    }
    assert(ops > 300, s"expected >300 ops across the corpus, got $ops")
  }

  test("golden plans contain no Opaque ops (full algebra coverage)") {
    corpusPlans().foreach { case (label, json) =>
      PlanJson.decodePlan(json).foreach {
        case op: LogicalOp.Opaque => fail(s"opaque op '${op.name}' in $label")
        case _ =>
      }
    }
  }

  test("decode normalizes corpus variants") {
    val p = PlanJson.decodePlan(
      """[{"operator":"keyword_filter","params":{"columns":["t"],
           "keywords":["x"],"logic":"or","relation":"contain"}},
          {"operator":"sem_group","params":{"columns":["e"],
           "map_description":"organize","keyword":"cats"}}]""")
    assert(p(0) == LogicalOp.KeywordFilter(Seq("t"), Seq("x"), "or", "contains"))
    assert(p(1) == LogicalOp.SemGroup(Seq("e"), "organize", "cats"))
  }

  test("num_filter decodes nested conditions and single-condition shorthand") {
    val p = PlanJson.decodePlan(
      """[{"operator":"num_filter","params":{"conditions":[
           {"column":"score","threshold":5,"operator":">"},
           {"column":"score","threshold":100,"operator":"<="}],"logic":"and"}},
          {"operator":"num_filter","params":{"column":"score","threshold":"7","operator":">"}}]""")
    assert(p(0) == LogicalOp.NumFilter(Seq(
      NumCondition("score", 5, ">"), NumCondition("score", 100, "<=")), "and"))
    assert(p(1) == LogicalOp.NumFilter(Seq(NumCondition("score", 7, ">")), "and"))
  }

  test("logic trees decode and normalize (singleton unwrap + same-op flatten)") {
    val t = PlanJson.decodeLogic("""["AND", 1, ["AND", 2, ["OR", 3, 4]], ["OR", 5]]""")
    val n = LogicTree.normalize(t)
    assert(n == LogicTree.Node("AND", Seq(
      LogicTree.Leaf(1), LogicTree.Leaf(2),
      LogicTree.Node("OR", Seq(LogicTree.Leaf(3), LogicTree.Leaf(4))),
      LogicTree.Leaf(5))))
  }
}
