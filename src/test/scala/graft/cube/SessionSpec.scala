package graft.cube

import graft.SparkSpec
import graft.oracle.{DeterministicOracle, TagRule}
import graft.plan.{LogicalOp, NumCondition}
import graft.ops.NumTopK

/** End-to-end progressive analysis session — the reference's evaluation
  * unit (20 sessions x 4 refining queries, evaluate_datas.json): each step
  * refines the previous through the memory DAG, then the analysis verbs
  * reorganize and summarize. Exercises subsumption reuse, drill_down,
  * roll_up and top-k against one catalog, checking row-level results at
  * every step.
  */
class SessionSpec extends SparkSpec {
  import spark.implicits._
  private val oracle = DeterministicOracle.default

  private def corpus = Seq(
    (1L, "spark join tuning guide", 90.0),
    (2L, "spark window functions", 70.0),
    (3L, "spark join deep dive", 85.0),
    (4L, "flink streaming joins", 40.0),
    (5L, "spark streaming basics", 30.0),
    (6L, "pandas merge tricks", 10.0)
  ).toDF("id", "title", "score")

  test("progressive session: filter -> refine -> drill_down+roll_up -> top-k") {
    val cat = new CubeCatalog(corpus, oracle)

    // Q1: "posts about spark"
    val q1 = cat.filterQuery("posts about spark", Seq(
      LogicalOp.KeywordFilter(Seq("title"), Seq("spark"), "and", "contains")))
    assert(q1.df.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L))

    // Q2: "...with score above 50" — must reuse Q1's node (delta only)
    val q2 = cat.filterQuery("spark posts with score above 50", Seq(
      LogicalOp.KeywordFilter(Seq("title"), Seq("spark"), "and", "contains"),
      LogicalOp.NumFilter(Seq(NumCondition("score", 50, ">")), "and")))
    assert(q2.plan.take(q1.plan.length) == q1.plan) // built on Q1
    assert(q2.df.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))

    // Q3: drill into a topic dimension, roll up with per-topic counts
    val q3 = Verbs.drillDown(q2,
      LogicalOp.SemMap(Seq("title"), "(join|window)", "topic"), oracle)
    val (q3r, summary) = Verbs.rollUp(q3,
      LogicalOp.SemGroup(Seq("topic"), "topic group", "topic_group"),
      Seq(TagRule("join", "joins"), TagRule("window", "windowing")), oracle,
      numReduceCols = Seq(("avg", "score")))
    val rows = summary.orderBy("topic_group").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("joins", "windowing"))
    assert(rows.map(_.getAs[Long]("count_of_topic_group")).toSeq == Seq(2L, 1L))
    assert(rows.head.getAs[Double]("avg_of_score") == 87.5)

    // Q4: top-1 topic group by count (the corpus' num_topk epilogue shape)
    val top = NumTopK(summary,
      LogicalOp.NumTopK("count_of_topic_group", 1, "desc"),
      tiebreak = Seq("topic_group"))
    assert(top.select("topic_group").as[String].collect().toSeq == Seq("joins"))

    // the session left an addressable catalog: nodes + granularity lineage
    assert(cat.all.size == 3) // root, Q1, Q2
    assert(q3r.dims("topic").granularities.contains("topic_group"))
  }
}
