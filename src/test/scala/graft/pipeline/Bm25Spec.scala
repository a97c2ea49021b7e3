package graft.pipeline

import graft.SparkSpec

/** BM25: hand-computed scores, matched-row shape, tokenization edge
  * cases, and the plan contract (no corpus self-join, broadcast stats).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "durian")).toDF("id", "text")

  test("scores match the Robertson formula, hand-computed") {
    val (k1, b) = (1.2, 0.75)
    val out = Bm25TestAccess.run(corpus, Seq("apple", "banana"), k1, b)
      .collect { case (id, term, tf, dfq, dl, score, total) =>
        ((id, term), (tf, dfq, dl, score, total))
      }.toMap
    val n = 3.0; val avgdl = 2.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def contrib(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
    val a1 = contrib(2, 1, 3) // apple in d1
    val b1 = contrib(1, 2, 3) // banana in d1
    val b2 = contrib(1, 2, 2) // banana in d2
    assert(out.keySet == Set((1L, "apple"), (1L, "banana"), (2L, "banana")))
    assert(out((1L, "apple"))._1 == 2L && out((1L, "apple"))._2 == 1L &&
      out((1L, "apple"))._3 == 3)
    assert(math.abs(out((1L, "apple"))._4 - a1) < 1e-12)
    assert(math.abs(out((1L, "banana"))._4 - b1) < 1e-12)
    assert(math.abs(out((2L, "banana"))._4 - b2) < 1e-12)
    assert(math.abs(out((1L, "apple"))._5 - (a1 + b1)) < 1e-12)
    assert(math.abs(out((2L, "banana"))._5 - b2) < 1e-12)
  }

  test("query casing and duplicates collapse; unmatched docs absent") {
    val out = Bm25TestAccess.run(corpus, Seq("APPLE", "apple"), 1.2, 0.75)
    assert(out.map(_._1).toSet == Set(1L))
    assert(out.size == 1)
  }

  test("a term absent from the corpus contributes nothing, others score") {
    val out = Bm25TestAccess.run(corpus, Seq("cherry", "zzz"), 1.2, 0.75)
    assert(out.map(r => (r._1, r._2)).toSet == Set((2L, "cherry")))
  }

  test("dominant-term doc outranks a longer diluted doc") {
    val df = Seq(
      (1L, "spark spark spark"),
      (2L, "spark a a a a a a a a a a a a a a a a a a a")).toDF("id", "text")
    val out = Bm25TestAccess.run(df, Seq("spark"), 1.2, 0.75)
      .map(r => r._1 -> r._7).toMap
    assert(out(1L) > out(2L))
  }

  test("no corpus self-join: stats sides are broadcast") {
    val plan = Frequency.bm25(corpus, "id", "text", Seq("apple"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"),
      "global stats must broadcast, never a data-path Cartesian")
  }
}

/** Collects bm25 output into tuples for assertion-side arithmetic. */
private object Bm25TestAccess {
  def run(df: org.apache.spark.sql.DataFrame, terms: Seq[String],
      k1: Double, b: Double)
      : Seq[(Long, String, Long, Long, Int, Double, Double)] =
    Frequency.bm25(df, "id", "text", terms, k1, b)
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getDouble(5), r.getDouble(6)))
}
