package graft.agent

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.cube.CubeCatalog
import graft.oracle.DeterministicOracle
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** The reference's FULL 20-session progressive corpus
  * (Semantic-OLAP/datas/evaluate_datas.json, 80 queries) driven through
  * [[OlapAgent.runSession]] — the subsumption-memory claim
  * (OLAP_Memory.py:137-187) gated end-to-end, not on one hand-built
  * session: each session's Q2-Q4 must REUSE the session's cached filter
  * work (Equal reuse returns the cached node; implied reuse executes
  * only the delta steps over the cached frame), and every query's
  * answer must match a from-scratch recomputation of its full filter
  * conjunction — reuse that changed the rows would be a soundness bug,
  * not an optimization.
  *
  * Scripted completions (zero-egress): each query's filter steps are
  * derived deterministically from its golden plan's leading filter ops,
  * so the step sets inherit the corpus's progressive structure.
  */
class AgentCorpusSpec extends SparkSpec {
  import spark.implicits._
  private val oracle = DeterministicOracle.default
  private val mapper = new ObjectMapper()
  private val corpusPath =
    "/root/reference/Semantic-OLAP/datas/evaluate_datas.json"

  /** FIXTURES.md §1 fixture (the GoldenPlanSpec shape). */
  private lazy val fixture: DataFrame = {
    val tags = Seq("python", "sql", "postgresql", "pandas", "spark")
    val errors = Seq("TypeError: unsupported operand",
      "ConnectionError in PostgreSQL driver", "KeyError: missing column",
      "timeout error on query", "no error at all")
    (1 to 400).map { i =>
      val tag = tags(i % tags.size)
      val err = errors(i % errors.size)
      (i.toLong,
        s"How to fix $err in $tag code question $i",
        s"I am hitting $err while using $tag version ${i % 7}. " +
          s"The query returns ${i % 100} rows and fails.",
        s"""["$tag", "${tags((i + 1) % tags.size)}"]""",
        (i % 150).toString,
        s"comment about $err and performance",
        s"answer: upgrade $tag or handle $err",
        s"${2009 + i % 15}-0${1 + i % 9}-1${i % 9} 12:00:00",
        i.toLong)
    }.toDF("question_id", "title", "body", "tags", "score",
      "comments", "answers", "creation_date", "OLAP_ID")
  }

  private val filterOps = Set("keyword_filter", "sem_filter", "num_filter")

  /** Deterministic golden-plan-filter -> session-step mapping. One op
    * maps to a fixed step list, so the corpus's Q(n) ⊆ Q(n+1) filter
    * containment carries over to the step sets the agent sees.
    */
  private def stepsOf(plan: com.fasterxml.jackson.databind.JsonNode)
      : Seq[OlapAgent.FilterStep] = {
    val raw = plan.asScala.toSeq
      .takeWhile(op => filterOps(op.get("operator").asText()))
    raw.flatMap { op =>
      val p = op.get("params")
      op.get("operator").asText() match {
        case "sem_filter" =>
          val cols = p.get("columns").asScala.map(_.asText()).toSeq
          Seq(("dice", Some(cols.head), p.get("condition").asText()))
        case "keyword_filter" =>
          val cols = p.get("columns").asScala.map(_.asText()).toSeq
          val kws = p.get("keywords").asScala.map(_.asText()).toSeq
          Seq(("dice", Some(cols.head), kws.mkString(" ")))
        case "num_filter" =>
          p.get("conditions").asScala.toSeq.map { c =>
            ("dice", Some(c.get("column").asText()),
              s"${c.get("operator").asText()} ${c.get("threshold").asText()}")
          }
      }
    }.zipWithIndex.map { case ((agent, field, action), i) =>
      OlapAgent.FilterStep(i + 1, agent, field, action)
    }
  }

  private def operationsJson(steps: Seq[OlapAgent.FilterStep]): String = {
    val root = mapper.createObjectNode()
    val ops = root.putArray("operations")
    steps.foreach { s =>
      val o = ops.addObject()
      o.put("id", s.id); o.put("agent", s.agent)
      s.field.foreach(f => o.put("field", f))
      o.put("action", s.action)
    }
    val logic = root.putArray("logic")
    logic.add("AND"); steps.foreach(s => logic.add(s.id))
    mapper.writeValueAsString(root)
  }

  test("20 sessions x 4 progressive queries: every answer matches full " +
      "recomputation and every session reuses cached filter work") {
    val root = mapper.readTree(new java.io.File(corpusPath))
    val sessions = root.asScala.toSeq
    assert(sessions.size == 20)
    var totalQueries = 0
    val noReuse = scala.collection.mutable.ArrayBuffer.empty[String]
    sessions.foreach { sess =>
      val sid = sess.get("id").asText()
      val cat = new CubeCatalog(fixture, oracle)
      var reuseHits = 0
      var prevQuery = ""
      var prevSteps = Seq.empty[OlapAgent.FilterStep]
      Seq("Q1", "Q2", "Q3", "Q4").filter(sess.has).foreach { qk =>
        val q = sess.get(qk)
        // filters on columns a previous query's sem_map DERIVED (the
        // reference keeps them on the cached node) have no base column
        // here — drop them deterministically; a query left with no
        // steps repeats the previous step set (Equal-reuse shape)
        val steps0 = stepsOf(q.get("golden_plan"))
          .filter(_.field.forall(fixture.columns.contains))
          .zipWithIndex.map { case (s, i) => s.copy(id = i + 1) }
        val steps = if (steps0.nonEmpty) steps0 else prevSteps
        assert(steps.nonEmpty, s"$sid.$qk has no usable filter prefix")
        prevSteps = steps
        val nlQuery = q.get("Query").asText()
        val script = Iterator(
          s"""{"filter_query": ${mapper.writeValueAsString(nlQuery)},
             | "analysis_query": ""}""".stripMargin,
          operationsJson(steps),
          """{"has_topk": false}""")
        val agent = new OlapAgent(_ => script.next(), oracle)
        val before = cat.all.length
        val out = agent.runSession(cat, nlQuery, historyQuery = prevQuery)
        totalQueries += 1
        val isEqualReuse = cat.all.length == before
        // implied (delta) reuse: the registered node stacks a delta
        // Filter over the cached node's already-filtered frame — a
        // from-root execution folds the conjunction into ONE Filter
        val isDeltaReuse = !isEqualReuse && {
          val n = cat.all.last
          "Filter ".r.findAllIn(
            n.df.queryExecution.analyzed.toString).length >= 2
        }
        if (qk != "Q1" && (isEqualReuse || isDeltaReuse)) reuseHits += 1
        // soundness: the session's answer == executing the FULL filter
        // conjunction from the base table, no reuse involved
        val full = agent.executeFilter(fixture,
          OlapAgent.FilterPlan(steps,
            graft.plan.LogicTree.Node("AND",
              steps.map(s => graft.plan.LogicTree.Leaf(s.id)))))
        val got = out.select("OLAP_ID").as[Long].collect().sorted.toSeq
        val want = full.select("OLAP_ID").as[Long].collect().sorted.toSeq
        assert(got == want,
          s"$sid.$qk: session answer diverged from full recomputation " +
            s"(${got.size} vs ${want.size} rows)")
        prevQuery = nlQuery
      }
      if (reuseHits == 0) noReuse += sid
    }
    assert(totalQueries == 80, s"expected 80 queries, ran $totalQueries")
    assert(noReuse.isEmpty,
      s"sessions with zero Q2-Q4 reuse hits: ${noReuse.mkString(", ")}")
  }
}
