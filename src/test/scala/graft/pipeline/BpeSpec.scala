package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic corpus from the BPE paper's running example, as documents
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).map(Tuple1(_)).toDF("text")

  test("train learns the hand-computed merges in order (lexicographic ties)") {
    // pair frequencies: (e,s)=9 (s,t)=9 (t,</w>)=9 tie -> lexicographic
    // picks (e,s); then (es,t)=9, (est,</w>)=9, then (l,o)=(o,w)=7 tie ->
    // (l,o), then (lo,w)=7
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    assert(merges.map(m => (m.a, m.b)) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
  }

  test("tokenize applies merges in rank order") {
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    val toks = Bpe.tokenize(Seq(("newest low lowest", 1)).toDF("text", "id"),
      "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("n", "e", "w", "est</w>", "low", "</w>",
      "low", "est</w>"))
  }

  test("training stops early when no pair repeats") {
    val merges = Bpe.train(Seq(Tuple1("ab cd")).toDF("text"), "text", 50)
    // every pair occurs once -> below the min frequency of 2, no merges
    assert(merges.isEmpty)
  }

  test("detokenize rebuilds whitespace-normalized text for any merges") {
    val df = Seq(
      (1L, "  Mixed   CASE \t text  "),
      (2L, "single"),
      (3L, "")).toDF("id", "text")
    val merges = Bpe.train(corpus, "text", 5)
    val out = Bpe.tokenize(df, "text", merges)
      .select(col("id"), Bpe.detokenize(col("tokens")).as("r"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "mixed case text"), (2L, "single"),
      (3L, "")))
  }
}
