package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.oracle.SemanticOracle
import graft.plan.{LogicalOp, NumCondition}
import graft.ops.{KeywordFilter, NumFilter, Ops, SemFilter}

/** Column statistics gates for physical-strategy selection — the
  * data-driven validators of the reference's dice agent
  * (Semantic-OLAP/Agents/Dice_Agent.py:68-105), recast as distributed
  * aggregations (never a driver-side scan of raw rows).
  */
object ColumnStats {

  /** Digit-mask template view of a column: `\d+` -> `<*>`
    * (Operaters.py:216-219).
    */
  def templateCol(c: Column): Column =
    regexp_replace(c.cast("string"), "\\d+", "<*>")

  final case class PatternStats(nRows: Long, nTemplates: Long,
      top3Coverage: Double) {
    /** Gate per Dice_Agent.py:68-77: top-3 templates cover >80% of rows and
      * unique-template ratio <1%, or fewer than 5 templates overall.
      */
    def isHighlyPatternized: Boolean =
      nRows > 0 && (nTemplates < 5 ||
        (top3Coverage > 0.8 && nTemplates.toDouble / nRows < 0.01))
  }

  def patternStats(df: DataFrame, column: String): PatternStats = {
    val t = df.select(templateCol(col(column)).as("tpl"))
      .groupBy("tpl").count()
    val agg = t.agg(
      sum("count").as("rows"),
      count(lit(1)).as("tpls")).collect()(0)
    val nRows = agg.getLong(0)
    val nTpl = agg.getLong(1)
    val top3 = t.orderBy(col("count").desc).limit(3)
      .agg(sum("count")).collect()(0).getLong(0)
    PatternStats(nRows, nTpl, if (nRows == 0) 0 else top3.toDouble / nRows)
  }

  final case class EnumStats(nRows: Long, nDistinct: Long, avgLen: Double,
      top5Coverage: Double) {
    /** Gate per Dice_Agent.py:79-105: (<=20 distinct or <=5% distinct ratio)
      * and avg length <=30 and top-5 values cover >=90%.
      */
    def isEnumerable: Boolean =
      nRows > 0 &&
        (nDistinct <= 20 || nDistinct.toDouble / nRows <= 0.05) &&
        avgLen <= 30 && top5Coverage >= 0.9
  }

  def enumStats(df: DataFrame, column: String): EnumStats = {
    val c = col(column).cast("string")
    val byVal = df.select(c.as("v")).groupBy("v").count()
    val agg = df.agg(count(lit(1)).as("rows"),
      approx_count_distinct(c).as("nd"),
      avg(length(c)).as("alen")).collect()(0)
    val nRows = agg.getLong(0)
    val top5 = byVal.orderBy(col("count").desc).limit(5)
      .agg(sum("count")).collect()(0).getLong(0)
    EnumStats(nRows, agg.getLong(1), agg.getDouble(2),
      if (nRows == 0) 0 else top5.toDouble / nRows)
  }
}

/** `filter_pattern` physical strategy (Operaters.py:207-258): for
  * template-shaped columns, lower a semantic numeric condition to
  * `regexp_extract` + typed comparisons. The reference asks the LLM for one
  * regex per digit-masked template (amortizing oracle calls per template,
  * not per row); here the regex is derived mechanically from the template
  * (`<*>` -> capture group), so zero oracle calls and pure codegen.
  */
object FilterPattern {
  /** Regex for a template: literal text with each `<*>` as `(\d+)`. */
  def templateRegex(template: String): String =
    template.split("<\\*>", -1).map(java.util.regex.Pattern.quote)
      .mkString("(\\d+)")

  /** Predicate: extract capture group `group` of the column's dominant
    * template shape, compare numerically. Rows not matching -> null -> out.
    */
  def predicate(column: String, template: String, group: Int,
      conditions: Seq[NumCondition], logic: String): Column = {
    val rx = templateRegex(template)
    val extracted = regexp_extract(col(column).cast("string"), rx, group)
    val v = when(extracted === "", lit(null)).otherwise(extracted)
      .try_cast("double")
    val preds = conditions.map(c => Ops.cmp(v, c.op, c.threshold))
    coalesce(Ops.foldLogic(preds, logic), lit(false))
  }

  def apply(df: DataFrame, column: String, template: String, group: Int,
      conditions: Seq[NumCondition], logic: String = "and"): DataFrame =
    df.filter(predicate(column, template, group, conditions, logic))
}

/** `filter_enum_llm` physical strategy (Operaters.py:281-313): for
  * low-cardinality columns, collect a bounded distinct set (first 100),
  * let the oracle pick values to keep ONCE, then broadcast-`isin` — oracle
  * work O(distinct), row work pure codegen. The deterministic pick keeps a
  * distinct value when it appears among the condition's tokens.
  */
object FilterEnum {
  def keepSet(df: DataFrame, column: String, condition: String,
      oracle: SemanticOracle, maxDistinct: Int = 100): Seq[String] = {
    val distinct = df.select(col(column).cast("string")).na.drop()
      .distinct().limit(maxDistinct)
      .collect().map(_.getString(0)).toSeq.sorted
    val toks = graft.oracle.DeterministicOracle.tokens(condition).toSet
    distinct.filter(v => toks.contains(v.toLowerCase) ||
      oracle.judge(v, condition))
  }

  def apply(df: DataFrame, column: String, condition: String,
      oracle: SemanticOracle): DataFrame = {
    val keep = keepSet(df, column, condition, oracle)
    df.filter(col(column).cast("string").isin(keep: _*))
  }
}

/** The dice verb (Agents/Dice_Agent.py:140-222): single-field filter with
  * physical strategy selection, priority pattern > enum > direct compare >
  * sem_filter fallback (Dice_Agent.py:175-196).
  */
object Dice {
  sealed trait Choice { def name: String }
  case object PatternStrategy extends Choice { val name = "pattern_based" }
  case object EnumStrategy extends Choice { val name = "enumerable" }
  case object CompareStrategy extends Choice { val name = "direct_compare" }
  case object SemFallback extends Choice { val name = "sem_filter" }

  /** `llm_has_simple_filter` analogue (Dice_Agent.py:107-135): parse the
    * condition as `<op> <number>` / `<number>` comparisons without an LLM.
    */
  private val cmpRe =
    """^\s*(>=|<=|!=|==|=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$""".r

  def parseCompare(condition: String): Option[NumCondition] =
    condition match {
      case cmpRe(op, num) =>
        Some(NumCondition("", num.toDouble, if (op == "=") "==" else op))
      case _ => None
    }

  def choose(df: DataFrame, column: String, condition: String): Choice = {
    if (parseCompare(condition).isDefined) {
      if (ColumnStats.patternStats(df, column).isHighlyPatternized)
        PatternStrategy
      else CompareStrategy
    } else if (ColumnStats.enumStats(df, column).isEnumerable) EnumStrategy
    else SemFallback
  }

  /** Run the dice verb: pick a strategy from the data and lower to the
    * cheapest physical filter that preserves the semantics.
    */
  def apply(df: DataFrame, column: String, condition: String,
      oracle: SemanticOracle): DataFrame = choose(df, column, condition) match {
    case PatternStrategy =>
      val cond = parseCompare(condition).get
      // dominant template of the column (top count, tie -> lexical)
      val tpl = df.select(ColumnStats.templateCol(col(column)).as("tpl"))
        .groupBy("tpl").count()
        .orderBy(col("count").desc, col("tpl").asc).limit(1)
        .collect()(0).getString(0)
      FilterPattern(df, column, tpl, 1, Seq(cond))
    case CompareStrategy =>
      val cond = parseCompare(condition).get.copy(column = column)
      NumFilter(df, LogicalOp.NumFilter(Seq(cond), "and"))
    case EnumStrategy =>
      FilterEnum(df, column, condition, oracle)
    case SemFallback =>
      SemFilter(df, LogicalOp.SemFilter(Seq(column), condition), oracle)
  }
}

/** The slice verb (Agents/Slice_Agent.py:38-108): cross-field filter lowered
  * to `AND(keyword_filter(or), sem_filter)` (Exection_Agent.py:246-257) —
  * the cheap keyword prefilter shrinks the semantic filter's input. Keyword
  * variants come from the condition tokens with super-string dedup
  * (Slice_Agent.py:30-36: drop any keyword containing another keyword).
  */
object Slice {
  def keywords(condition: String): Seq[String] = {
    val toks = graft.oracle.DeterministicOracle.tokens(condition)
    toks.filterNot(t => toks.exists(o => o != t && t.contains(o)))
  }

  def apply(df: DataFrame, columns: Seq[String], condition: String,
      oracle: SemanticOracle): DataFrame = {
    val kw = keywords(condition)
    val pre =
      if (kw.isEmpty) df
      else KeywordFilter(df,
        LogicalOp.KeywordFilter(columns, kw, "or", "contains"))
    SemFilter(pre, LogicalOp.SemFilter(columns, condition), oracle)
  }
}
