package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator
import graft.oracle.{BatchedOracle, SemanticOracle, TagRule}
import graft.plan.LogicalOp

/** Execution-policy objective for oracle-backed plans — the engine's
  * analogue of the palimpzest baseline's policy knob
  * (Semantic-OLAP/baselines/palimpzest_agent.py:434-451:
  * `pz.Execute(policy = MinCost | MaxQuality, allow_code_synth, ...)`).
  *
  * A semantic condition can lower to several physical strategies whose
  * ORACLE-CALL cost and answer quality differ:
  *   - pattern / direct-compare: zero oracle calls (synthesized code);
  *   - enum pushdown: O(distinct values) calls, but only the first
  *     `maxDistinct` values are ever judged — a silent quality loss on
  *     high-cardinality columns;
  *   - per-row judgment: one call per row — the reference's plain LLM
  *     filter, maximal fidelity and maximal cost.
  *
  * [[Policy.MinCost]] picks the cheapest lowering that preserves the
  * declared semantics (today's data-shape heuristics, which already
  * minimize calls); [[Policy.MaxQuality]] refuses the code-synthesis and
  * bounded-enum approximations and judges every row — mirroring
  * palimpzest's `allow_code_synth = False` / `MaxQuality` plan.
  */
sealed abstract class Policy(val name: String)
object Policy {
  case object MinCost extends Policy("min_cost")
  case object MaxQuality extends Policy("max_quality")
  def parse(s: String): Policy = s.trim.toLowerCase match {
    case "min_cost" | "mincost" => MinCost
    case "max_quality" | "maxquality" => MaxQuality
    case other => throw new IllegalArgumentException(
      s"unknown policy '$other' (min_cost | max_quality)")
  }
}

/** Oracle-call METER: wraps any [[SemanticOracle]] and counts every
  * out-of-band judgment through a Spark accumulator, so executor-side
  * batched calls and driver-side enum picks land in ONE counter the
  * report can read after the action.
  *
  * `forwardCompile` decides what the meter stands in for:
  *   - false (default): the Catalyst `compile*` hooks are hidden — the
  *     meter emulates a non-compilable LLM transport, so EVERY judgment
  *     is an out-of-band call and gets billed. This is the MaxQuality
  *     execution shape and the cost-estimation instrument (the
  *     reference prices its plans the same way,
  *     baselines/procedures/python3/print_statistics.py:1-11);
  *   - true: compile hooks forward to the inner oracle — compiled
  *     (codegen) paths run at zero oracle calls and the meter counts
  *     only genuinely out-of-band judgments. This is the MinCost
  *     execution shape: the cheapest correct plan, honestly billed.
  *
  * Counting unit: one judged TEXT (the per-prompt cost a metered
  * transport bills), not one RPC — a batched judge of 64 rows counts 64.
  */
final class MeteredOracle(inner: SemanticOracle, val calls: LongAccumulator,
    forwardCompile: Boolean = false)
    extends BatchedOracle {
  override def compileJudge(c: String): Option[org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column] =
    if (forwardCompile) inner.compileJudge(c) else None
  override def compileExtract(d: String): Option[org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column] =
    if (forwardCompile) inner.compileExtract(d) else None
  override def compileExtractAll(d: String): Option[org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column] =
    if (forwardCompile) inner.compileExtractAll(d) else None
  override def compileClassify(v: Seq[TagRule]): Option[org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column] =
    if (forwardCompile) inner.compileClassify(v) else None
  override def compileScore(q: String): Option[org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column] =
    if (forwardCompile) inner.compileScore(q) else None
  override def judge(text: String, condition: String): Boolean = {
    calls.add(1L); inner.judge(text, condition)
  }
  override def extract(text: String, desc: String): Option[String] = {
    calls.add(1L); inner.extract(text, desc)
  }
  override def classify(text: String, vocab: Seq[TagRule]): Option[String] = {
    calls.add(1L); inner.classify(text, vocab)
  }
  override def summarize(values: Seq[String], desc: String): String = {
    calls.add(1L); inner.summarize(values, desc)
  }
  override def score(text: String, query: String): Double = {
    calls.add(1L); inner.score(text, query)
  }
  override def duel(a: String, b: String, query: String): Boolean = {
    calls.add(1L); inner.duel(a, b, query)
  }
  // batched variants: forward WHOLE batches to a batched inner transport
  // (one RPC there), metering per judged text; a scalar inner routes
  // through the scalar overrides above, which meter themselves.
  override def judgeBatch(texts: Seq[String], condition: String): Seq[Boolean] =
    inner match {
      case b: BatchedOracle =>
        calls.add(texts.count(_ != null)); b.judgeBatch(texts, condition)
      case _ => texts.map(t => t != null && judge(t, condition))
    }
  override def extractBatch(texts: Seq[String], desc: String): Seq[Option[String]] =
    inner match {
      case b: BatchedOracle =>
        calls.add(texts.count(_ != null)); b.extractBatch(texts, desc)
      case _ => texts.map(t => if (t == null) None else extract(t, desc))
    }
  override def classifyBatch(texts: Seq[String],
      vocab: Seq[TagRule]): Seq[Option[String]] =
    inner match {
      case b: BatchedOracle =>
        calls.add(texts.count(_ != null)); b.classifyBatch(texts, vocab)
      case _ => texts.map(t => if (t == null) None else classify(t, vocab))
    }
  override def scoreBatch(texts: Seq[String], query: String): Seq[Double] =
    inner match {
      case b: BatchedOracle =>
        calls.add(texts.count(_ != null)); b.scoreBatch(texts, query)
      case _ => texts.map(t => if (t == null) 0.0 else score(t, query))
    }
  override def duelBatch(pairs: Seq[(String, String)],
      query: String): Seq[Boolean] =
    inner match {
      case b: BatchedOracle => calls.add(pairs.size); b.duelBatch(pairs, query)
      case _ => pairs.map { case (a, b) =>
        duel(Option(a).getOrElse(""), Option(b).getOrElse(""), query)
      }
    }
}

/** Policy-directed lowering with per-operator oracle-cost accounting —
  * the engine's `print_statistics` (plan wall time, oracle calls,
  * estimated $) plus the plan-choice knob the reference's palimpzest
  * baseline exposes. The DataFrame stays lazy; [[PoliciedFilter.report]]
  * reads the meter AFTER the caller's action so `oracleCalls` is the
  * count the executed plan actually made.
  */
object Policied {

  /** One operator's cost line. `estOracleCalls` is the plan-time
    * estimate (what the optimizer decided on); `oracleCalls` is the
    * meter's post-execution truth; `estUsd` prices the actual calls.
    */
  final case class OpCost(operator: String, column: String,
      strategy: String, estOracleCalls: Long, oracleCalls: Long,
      estUsd: Double) {
    def explain: String =
      f"$operator($column) strategy=$strategy " +
        f"est_oracle_calls=$estOracleCalls oracle_calls=$oracleCalls " +
        f"est_usd=$$$estUsd%.4f"
  }

  /** A lowered policied filter: the (lazy) result, the chosen strategy,
    * and the meter. Run an action on `df`, then read [[report]].
    */
  final class PoliciedFilter(val df: DataFrame, val operator: String,
      val column: String, val strategy: Dice.Choice, val estCalls: Long,
      meter: LongAccumulator, usdPerCall: Double) {
    def report(): OpCost = OpCost(operator, column, strategy.name,
      estCalls, meter.value, meter.value * usdPerCall)
    def explain: String = report().explain
  }

  /** Dice (single-field semantic filter) under a policy.
    *
    *   - MinCost: the existing data-shape lowering ([[Dice.choose]] —
    *     pattern > enum > compare > per-row), which is already
    *     call-minimal per strategy class;
    *   - MaxQuality: per-row judgment always (no synthesized pattern
    *     code, no bounded-enum truncation) — the reference's plain
    *     LLM-filter plan.
    *
    * Estimates: pattern/compare 0; enum = bounded distinct-set size
    * (never more than [[maxDistinct]]); per-row = Catalyst's row-count
    * statistic when the plan carries one, else -1 (unknown — the meter
    * supplies the truth post-run).
    */
  def dice(df: DataFrame, column: String, condition: String,
      oracle: SemanticOracle, policy: Policy, usdPerCall: Double = 0.0,
      maxDistinct: Int = 100): PoliciedFilter = {
    val meter = df.sparkSession.sparkContext
      .longAccumulator("graft.oracle.calls")
    // MinCost runs the cheapest correct plan (compiled paths stay
    // codegen, zero calls); MaxQuality forces every judgment
    // out-of-band and bills it
    val metered = new MeteredOracle(oracle, meter,
      forwardCompile = policy == Policy.MinCost)
    val choice: Dice.Choice = policy match {
      case Policy.MaxQuality => Dice.SemFallback
      case Policy.MinCost => Dice.choose(df, column, condition)
    }
    val est: Long = choice match {
      case Dice.PatternStrategy | Dice.CompareStrategy => 0L
      case Dice.EnumStrategy =>
        math.min(ColumnStats.enumStatsCached(df, column).nDistinct,
          maxDistinct.toLong)
      case Dice.SemFallback =>
        df.queryExecution.optimizedPlan.stats.rowCount
          .map(_.toLong).getOrElse(-1L)
    }
    val out = choice match {
      case Dice.SemFallback =>
        // the batched mapPartitions path (MeteredOracle is a
        // BatchedOracle with no compile hooks) — per-partition client
        // reuse, one oracle call per batch, every row judged
        graft.ops.SemFilter(df, LogicalOp.SemFilter(Seq(column), condition),
          metered)
      case Dice.EnumStrategy =>
        FilterEnum(df, column, condition, metered)
      case _ =>
        df.filter(Dice.predicate(df, column, condition, metered))
    }
    new PoliciedFilter(out, "dice", column, choice, est, meter, usdPerCall)
  }

  /** Whole-plan execution under a policy with a plan-level cost report
    * (wall seconds + oracle calls + estimated $) — the
    * `print_statistics` surface. The plan executes EAGERLY (the report
    * needs the action); `resultRows` is the executed count.
    */
  final case class PlanReport(policy: String, seconds: Double,
      oracleCalls: Long, estUsd: Double, resultRows: Long) {
    def explain: String =
      f"policy=$policy plan_sec=$seconds%.3f oracle_calls=$oracleCalls " +
        f"est_usd=$$$estUsd%.4f rows=$resultRows"
  }

  def run(df: DataFrame, plan: Seq[LogicalOp], oracle: SemanticOracle,
      policy: Policy, usdPerCall: Double = 0.0,
      tiebreak: Seq[String] = Seq.empty): (DataFrame, PlanReport) = {
    val meter = df.sparkSession.sparkContext
      .longAccumulator("graft.oracle.calls")
    val metered = new MeteredOracle(oracle, meter,
      forwardCompile = policy == Policy.MinCost)
    val t0 = System.nanoTime()
    val out = PlanRunner.run(df, plan, metered, tiebreak)
    val rows = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    (out, PlanReport(policy.name, sec, meter.value,
      meter.value * usdPerCall, rows))
  }
}
