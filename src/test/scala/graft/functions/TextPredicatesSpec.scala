package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextPredicatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "Spark JOIN basics"), (2L, "window functions"),
    (3L, "spark and window"), (4L, ""), (5L, null.asInstanceOf[String])
  ).toDF("id", "t")

  private def ids(c: org.apache.spark.sql.Column): Seq[Long] =
    df.filter(c).select("id").as[Long].collect().sorted.toSeq

  test("containsAll/Any/None match the folded-contains formulation") {
    assert(ids(TextPredicates.containsAll(col("t"), Seq("spark", "window"))) == Seq(3L))
    assert(ids(TextPredicates.containsAny(col("t"), Seq("JOIN", "window"))) == Seq(1L, 2L, 3L))
    assert(ids(TextPredicates.containsNone(col("t"), Seq("spark", "window"))) == Seq(4L))
    // null text -> null -> filtered, like the built-in contains
    assert(!ids(TextPredicates.containsAny(col("t"), Seq(""))).contains(5L))
  }

  test("interpreted eval equals codegen eval") {
    // force interpreted path by evaluating the expression directly
    val e = MultiContains(
      org.apache.spark.sql.catalyst.expressions.Literal("Spark JOIN basics"),
      Seq("spark", "join"), matchAny = false, negate = false)
    assert(e.eval(null) == true)
    val e2 = e.copy(negate = true)
    assert(e2.eval(null) == false)
    val e3 = MultiContains(
      org.apache.spark.sql.catalyst.expressions.Literal("abc"),
      Seq("x", "b"), matchAny = true, negate = false)
    assert(e3.eval(null) == true)
  }

  test("keyword_filter routes contains/irrelevant through MultiContains") {
    import graft.ops.KeywordFilter
    import graft.plan.LogicalOp
    val both = KeywordFilter(df, LogicalOp.KeywordFilter(
      Seq("t"), Seq("spark", "window"), "and", "contains"))
      .select("id").as[Long].collect().toSeq
    assert(both == Seq(3L))
    // reference semantics: fold positive contains by logic, negate the fold
    // (Operaters.py:17-40). or-irrelevant = none present; null column
    // becomes "" under concat_ws, so row 5 passes either way
    val irrOr = KeywordFilter(df, LogicalOp.KeywordFilter(
      Seq("t"), Seq("spark", "window"), "or", "irrelevant"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(irrOr == Seq(4L, 5L))
    // and-irrelevant = NOT(all present)
    val irrAnd = KeywordFilter(df, LogicalOp.KeywordFilter(
      Seq("t"), Seq("spark", "window"), "and", "irrelevant"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(irrAnd == Seq(1L, 2L, 4L, 5L))
  }

  test("empty keyword list: all-semantics true, any-semantics false") {
    assert(ids(TextPredicates.containsAll(col("t"), Seq.empty)) == Seq(1L, 2L, 3L, 4L))
    assert(ids(TextPredicates.containsAny(col("t"), Seq.empty)) == Seq.empty)
  }
}
