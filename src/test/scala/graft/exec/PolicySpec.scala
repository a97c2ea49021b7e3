package graft.exec

import graft.SparkSpec
import graft.oracle.{BatchedOracle, DeterministicOracle}
import graft.plan.LogicalOp

/** The cost/quality policy layer (palimpzest parity, r18): the same NL
  * condition lowers to different physical strategies by objective, the
  * oracle meter counts every out-of-band judgment (driver-side enum
  * picks AND executor-side batched rows through one accumulator), and
  * the per-operator explain surfaces strategy + calls + estimated $.
  */
class PolicySpec extends SparkSpec {
  import spark.implicits._
  private val oracle = DeterministicOracle.default

  private def events = (1 to 400).map { i =>
    val k = i % 4 match {
      case 0 => "error"; case 1 => "click"; case 2 => "view"
      case _ => "signup"
    }
    (i.toLong, k)
  }.toDF("id", "kind")

  test("MinCost lowers to enum pushdown, MaxQuality to per-row judge; " +
      "same rows, strictly fewer calls under MinCost; explain carries " +
      "strategy, calls, and $") {
    val minC = Policied.dice(events, "kind", "error", oracle,
      Policy.MinCost, usdPerCall = 0.01)
    val maxQ = Policied.dice(events, "kind", "error", oracle,
      Policy.MaxQuality, usdPerCall = 0.01)
    assert(minC.strategy == Dice.EnumStrategy)
    assert(maxQ.strategy == Dice.SemFallback)
    val gotMin = minC.df.select("id").as[Long].collect().sorted.toSeq
    val gotMax = maxQ.df.select("id").as[Long].collect().sorted.toSeq
    assert(gotMin == gotMax && gotMin.nonEmpty, "value-identical results")
    val (rMin, rMax) = (minC.report(), maxQ.report())
    // enum: 3 distinct values are not the condition token -> 3 judgments;
    // per-row: every non-null row -> 400
    assert(rMin.oracleCalls == 3L, rMin.explain)
    assert(rMax.oracleCalls == 400L, rMax.explain)
    assert(rMin.estUsd < rMax.estUsd)
    assert(rMin.explain.contains("strategy=enumerable") &&
      rMin.explain.contains("oracle_calls=3") &&
      rMin.explain.contains("est_usd=$0.03"))
    assert(rMax.explain.contains("strategy=sem_filter") &&
      rMax.explain.contains("oracle_calls=400"))
    // plan-time estimates: enum bounded by the distinct count
    assert(rMin.estOracleCalls == 4L) // 4 distinct values in the column
  }

  test("numeric conditions stay zero-call under MinCost (synthesized " +
      "compare), and the meter reports 0") {
    val df = (1 to 100).map(i => (i.toLong, s"v $i")).toDF("id", "c")
      .withColumn("n", org.apache.spark.sql.functions.col("id") * 2)
    val p = Policied.dice(df, "n", "> 100", oracle, Policy.MinCost,
      usdPerCall = 1.0)
    assert(p.df.count() == 50L)
    val r = p.report()
    assert(r.oracleCalls == 0L && r.estUsd == 0.0, r.explain)
    assert(r.estOracleCalls == 0L)
  }

  test("MeteredOracle forwards whole batches to a batched inner " +
      "transport and still counts per judged text") {
    @volatile var batchRpcs = 0
    val inner = new BatchedOracle {
      def judge(t: String, c: String) = t != null && t.contains(c)
      def extract(t: String, d: String) = None
      def classify(t: String, v: Seq[graft.oracle.TagRule]) = None
      def summarize(vs: Seq[String], d: String) = ""
      def score(t: String, q: String) = 0.0
      override def judgeBatch(ts: Seq[String], c: String) = {
        batchRpcs += 1; ts.map(t => t != null && t.contains(c))
      }
    }
    val acc = spark.sparkContext.longAccumulator("test.calls")
    val m = new MeteredOracle(inner, acc)
    assert(m.judgeBatch(Seq("a err", null, "b"), "err")
      == Seq(true, false, false))
    assert(batchRpcs == 1, "one RPC per batch, not per row")
    assert(acc.value == 2L, "nulls never reach (or bill) the transport")
  }

  test("Policied.run reports plan wall time, total calls, and $ for a " +
      "whole plan (print_statistics parity)") {
    val docs = (1 to 50).map(i =>
      (i.toLong, if (i % 5 == 0) s"spark stream doc $i" else s"plain $i"))
      .toDF("doc_id", "text")
    // a non-compiling metered plan: calls counted across the cascade
    val (out, rep) = Policied.run(docs,
      Seq(LogicalOp.SemFilter(Seq("text"), "spark stream")),
      oracle, Policy.MaxQuality, usdPerCall = 0.001)
    assert(rep.resultRows == 10L && out.count() == 10L)
    assert(rep.oracleCalls == 50L, rep.explain)
    assert(rep.seconds > 0.0)
    assert(rep.explain.contains("policy=max_quality") &&
      rep.explain.contains("oracle_calls=50") &&
      rep.explain.contains("rows=10"))
    // MinCost forwards compile hooks: the deterministic oracle's
    // codegen judge runs at ZERO out-of-band calls, same answer
    val (out2, rep2) = Policied.run(docs,
      Seq(LogicalOp.SemFilter(Seq("text"), "spark stream")),
      oracle, Policy.MinCost, usdPerCall = 0.001)
    assert(rep2.resultRows == 10L && rep2.oracleCalls == 0L, rep2.explain)
    assert(out2.select("doc_id").as[Long].collect().sorted.toSeq ==
      out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("Policy.parse round-trips and refuses junk") {
    assert(Policy.parse("min_cost") == Policy.MinCost)
    assert(Policy.parse("MaxQuality") == Policy.MaxQuality)
    intercept[IllegalArgumentException](Policy.parse("fastest"))
  }
}
