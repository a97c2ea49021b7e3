package graft.exec

import graft.SparkSpec
import graft.oracle.DeterministicOracle
import graft.plan.{LogicalOp, PlanJson}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** End-to-end execution of the reference's 80 golden plans
  * (Semantic-OLAP/datas/evaluate_datas.json) on a synthetic
  * StackOverflow-shaped fixture (FIXTURES.md §1), with the deterministic
  * oracle standing in for the LLM. The assertion is structural soundness —
  * every plan must execute, filters must be monotone, derived columns must
  * appear — since oracle judgments (and thus exact rows) are
  * oracle-dependent by design.
  */
class GoldenPlanSpec extends SparkSpec {
  import spark.implicits._
  private val oracle = DeterministicOracle.default
  private val corpusPath =
    "/root/reference/Semantic-OLAP/datas/evaluate_datas.json"

  /** FIXTURES.md §1 fixture: deterministic rows with planted error strings,
    * spread creation dates, low-cardinality tags.
    */
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

  private def goldenPlans(): Seq[(String, Seq[LogicalOp])] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(corpusPath))
    for {
      sess <- root.asScala.toSeq
      qk <- Seq("Q1", "Q2", "Q3", "Q4") if sess.has(qk)
      plan = sess.get(qk).get("golden_plan") if plan != null && plan.isArray
    } yield (s"${sess.get("id").asText}.$qk",
      PlanJson.decodePlan(mapper.writeValueAsString(plan)))
  }

  test("all 80 golden plans execute end-to-end on the fixture") {
    val plans = goldenPlans()
    assert(plans.size == 80, s"expected 80 plans, got ${plans.size}")
    // progressive sessions: Q(n+1) may reference dimensions minted by Qn
    // (the reference's memory DAG keeps them on the cached node), so the
    // base frame carries across queries within a session
    val failures = plans.groupBy(_._1.split("\\.")(0)).toSeq.flatMap {
      case (_, sessionPlans) =>
        var state = fixture
        sessionPlans.sortBy(_._1).flatMap { case (label, plan) =>
          try {
            val (out, base) = PlanRunner.runWithState(state, plan, oracle,
              tiebreak = Seq("OLAP_ID"))
            out.collect()
            // session state: derived columns persist, filters do not
            // (next query filters from the full table per its own plan)
            val derivedCols = base.columns.filterNot(state.columns.contains)
            if (derivedCols.nonEmpty) {
              state = graft.ops.Reattach(state,
                base.select("OLAP_ID", derivedCols: _*), "OLAP_ID")
            }
            None
          } catch {
            case e: Throwable => Some(s"$label: ${e.getMessage.take(150)}")
          }
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} plans failed:\n${failures.mkString("\n")}")
  }

  test("filter prefixes are monotone (each filter op only removes rows)") {
    val (label, plan) = goldenPlans().find(_._1 == "1.Q4").get
    val filters = plan.takeWhile(PlanRunner.isFilter)
    var prev = fixture.count()
    filters.indices.foreach { i =>
      val n = PlanRunner.run(fixture, filters.take(i + 1), oracle).count()
      assert(n <= prev, s"$label filter $i grew the row set")
      prev = n
    }
  }

  test("derived columns from sem_map/sem_group appear with lineage naming") {
    val plan = goldenPlans().find(_._1 == "1.Q4").get._2
    val derived = plan.collect {
      case m: LogicalOp.SemMap => m.keyword
      case g: LogicalOp.SemGroup => g.keyword
    }
    // run up to (not including) the aggregation tail
    val prefix = plan.takeWhile(op => !op.isInstanceOf[LogicalOp.CountOp])
    val out = PlanRunner.run(fixture, prefix, oracle, Seq("OLAP_ID"))
    derived.foreach(c => assert(out.columns.contains(c), s"missing $c"))
  }
}
