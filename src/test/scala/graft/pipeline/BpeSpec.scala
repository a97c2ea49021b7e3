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

  // the end-of-word marker is the reserved private-use codepoint U+E000
  // (a text-valued "</w>" would collide with scraped XML — see Bpe.endMark)
  private val M = "\uE000"

  test("train learns the hand-computed merges in order (lexicographic ties)") {
    // pair frequencies: (e,s)=9 (s,t)=9 (t,M)=9 tie -> lexicographic
    // picks (e,s); then (es,t)=9, (est,M)=9, then (l,o)=(o,w)=7 tie ->
    // (l,o), then (lo,w)=7  [M sorts above ascii letters so (est,M) only
    // wins its round by frequency order, same as the paper's </w>]
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    assert(merges.map(m => (m.a, m.b)) == Seq(
      ("e", "s"), ("es", "t"), ("est", M), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
  }

  test("tokenize applies merges in rank order") {
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    val toks = Bpe.tokenize(Seq(("newest low lowest", 1)).toDF("text", "id"),
      "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("n", "e", "w", s"est$M", "low", M,
      "low", s"est$M"))
  }

  test("memoized, join-dict, and per-row tokenize forms all agree") {
    val df = Seq((1L, "newest low lowest"), (2L, "  low   WIDEST "),
      (3L, ""), (4L, "unseen words here")).toDF("id", "text")
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    val memo = Bpe.tokenize(df, "text", merges)
      .select("id", "tokens").as[(Long, Seq[String])].collect().toMap
    val dict = Bpe.tokenizeDict(df, "text", merges)
      .select("id", "tokens").as[(Long, Seq[String])].collect().toMap
    val perRow = Bpe.tokenizePerRow(df, "text", merges)
      .select("id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(memo == perRow)
    assert(dict == perRow)
    assert(memo(3L).isEmpty)
    // a memo cap of zero degrades to pure per-occurrence work, same output
    val capped = Bpe.tokenize(df, "text", merges, memoCap = 0)
      .select("id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(capped == perRow)
  }

  test("detokenize is safe against literal '</w>' in corpus text") {
    // scraped XML: the old text-valued sentinel would turn these
    // characters into spaces; the reserved-codepoint marker cannot occur
    val df = Seq((1L, "a</w>b <tag></w>")).toDF("id", "text")
    val merges = Bpe.train(corpus, "text", 5)
    val out = Bpe.tokenize(df, "text", merges)
      .select(Bpe.detokenize(col("tokens"))).as[String].head()
    assert(out == "a</w>b <tag></w>")
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
