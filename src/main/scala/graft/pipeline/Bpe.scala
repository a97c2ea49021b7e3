package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed TRAINING (Sennrich et al.
  * 2016 — learn merges from corpus statistics) plus tokenization with the
  * learned merges. The real thing, not the regex token-count
  * approximation in TextAnalysis.
  *
  * Scale shape: the 100 TB part — scanning the corpus — is ONE distributed
  * explode + hash aggregate down to the distinct-word frequency table
  * (shuffle bounded by vocabulary, not corpus size; the ngramCounts
  * shape), capped to the `maxWords` most frequent words with a
  * deterministic (freq DESC, word ASC) order. The merge-learning loop then
  * runs driver-side over that bounded table — which is how production BPE
  * trainers work (the loop is O(vocab × merges) integer counting; pushing
  * each round through a Spark job would pay ~1s of scheduling per merge to
  * save microseconds of compute). Ties on pair frequency break
  * lexicographically, so training is deterministic on any partitioning.
  *
  * Tokenization is DICTIONARY-ENCODED: merges run once per distinct word
  * (the same distinct-word shape train uses), and the word→tokens mapping
  * joins back by position — see [[tokenize]]. The merge list itself is
  * broadcast (bounded by nMerges).
  */
object Bpe {

  /** A learned merge: adjacent symbols `a`+`b` fuse into `a+b`. Rank is
    * the training order = application priority.
    */
  final case class BpeMerge(rank: Int, a: String, b: String)

  /** End-of-word marker — a PRIVATE-USE codepoint, not the classic
    * text-valued "&lt;/w&gt;": scraped XML/HTML routinely contains that
    * literal substring, and a text-valued sentinel would make
    * [[detokenize]] turn those input characters into spaces (silent
    * losslessness break). U+E000 cannot collide because [[toSymbols]]
    * normalizes any input occurrence of it to U+FFFD (the Unicode
    * replacement character) — the sentinel is non-occurring BY
    * CONSTRUCTION, the same normalization family as the lowercasing the
    * tokenizer already applies.
    */
  private[pipeline] val endMark = "\uE000"

  private def toSymbols(word: String): Seq[String] =
    word.map(ch => if (ch == '\uE000') "\uFFFD" else ch.toString) :+ endMark

  /** One greedy merge application to one symbol sequence. */
  private def applyMerge(sym: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from the corpus' lowercased whitespace words.
    * One distributed job (word frequencies, capped at `maxWords` by
    * descending frequency), then the standard driver-side merge loop over
    * the bounded table. Returns the ordered merge list.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 200000): Seq[BpeMerge] = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordFreq = df
      .select(explode(TextAnalysis.tokensCol(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect()
    val words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (toSymbols(w).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var continue = true
    while (continue && merges.length < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sym, f) =>
        var i = 0
        while (i < sym.length - 1) {
          val k = (sym(i), sym(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        if (n < 2) continue = false // nothing left worth merging
        else {
          merges += BpeMerge(merges.length, a, b)
          var j = 0
          while (j < words.length) {
            words(j) = (applyMerge(words(j)._1, a, b).toArray, words(j)._2)
            j += 1
          }
        }
      }
    }
    merges.toSeq
  }

  /** Word-level tokenizer as a UDF over one word (merge list broadcast). */
  private def tokenizeWordUdf(df: DataFrame,
      merges: Seq[BpeMerge]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ordered = merges.sortBy(_.rank).map(m => (m.a, m.b))
    val bc = df.sparkSession.sparkContext.broadcast(ordered)
    udf { w: String =>
      var sym = toSymbols(w)
      bc.value.foreach { case (a, b) => sym = applyMerge(sym, a, b) }
      sym
    }
  }

  /** Tokenize `textCol` with a learned merge list: adds an array<string>
    * `tokens` column (end-of-word markers kept — `x` + U+E000 means "x at
    * word end").
    *
    * DICTIONARY-ENCODED VIA A PER-TASK MEMO: the O(merges) greedy loop
    * runs once per DISTINCT word per task, not once per occurrence. Zipf
    * says a 100 TB corpus has billions of word occurrences over a
    * vocabulary orders of magnitude smaller, so per-corpus work collapses
    * to O(task-distinct-vocab × merges + occurrences) — and the operator
    * stays a PURE MAP: zero shuffles, streaming-safe, nothing collected.
    * The memo is per task (caches don't survive task boundaries), capped
    * at `memoCap` entries so a pathological vocabulary degrades to
    * per-occurrence work rather than memory pressure. For vocabularies
    * too large even per task, [[tokenizeDict]] trades the memo for a
    * distinct+join pipeline (bounded state, two shuffles).
    */
  def tokenize(df: DataFrame, textCol: String, merges: Seq[BpeMerge],
      memoCap: Int = 200000): DataFrame = {
    val ordered = merges.sortBy(_.rank).map(m => (m.a, m.b))
    val bc = df.sparkSession.sparkContext.broadcast(ordered)
    // captured by the closure -> deserialized once per task, so the map
    // amortizes across all of the task's rows (never across tasks)
    val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
    val tokUdf = udf { text: String =>
      if (text == null) Seq.empty[String]
      else {
        val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        words.toSeq.flatMap { w =>
          memo.get(w) match {
            case Some(t) => t
            case None =>
              var sym = toSymbols(w)
              bc.value.foreach { case (a, b) => sym = applyMerge(sym, a, b) }
              if (memo.size < memoCap) memo.update(w, sym)
              sym
          }
        }
      }
    }
    df.withColumn("tokens", tokUdf(col(textCol)))
  }

  /** The join-back dictionary form of [[tokenize]] for vocabularies too
    * large to memoize per task: posexplode the words, distinct them, run
    * the merges once per corpus-distinct word (the same distinct-word
    * table train scans), join the word→tokens mapping back (the vocab
    * side is the small one — AQE broadcasts it when it fits), and
    * reassemble per row in word order. Row identity rides on
    * `monotonically_increasing_id`, which is NONDETERMINISTIC across
    * re-executions whenever a shuffle sits upstream (post-shuffle row
    * order within a partition depends on block fetch order) — and the id
    * frame feeds TWO plan branches (the exploded-words subtree and the
    * final join), each of which would re-evaluate it independently. So
    * the id frame is MATERIALIZED once (`localCheckpoint`) before
    * branching: both branches then read the same pinned ids. Batch-only,
    * like the rest of this variant.
    */
  def tokenizeDict(df: DataFrame, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val tokWord = tokenizeWordUdf(df, merges)
    val withId = df.withColumn("__bpe_row", monotonically_increasing_id())
      .localCheckpoint(true)
    val words = withId.select(col("__bpe_row"),
      posexplode_outer(TextAnalysis.tokensCol(lower(col(textCol))))
        .as(Seq("__bpe_pos", "__bpe_w")))
    val vocab = words.select(col("__bpe_w")).where(col("__bpe_w").isNotNull)
      .distinct()
      .withColumn("__bpe_toks", tokWord(col("__bpe_w")))
    val perRow = words.where(col("__bpe_w").isNotNull)
      .join(vocab, Seq("__bpe_w"))
      .groupBy("__bpe_row")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__bpe_pos"), col("__bpe_toks")))),
        s => s.getField("__bpe_toks"))).as("tokens"))
    withId.join(perRow, Seq("__bpe_row"), "left")
      .withColumn("tokens",
        coalesce(col("tokens"), array().cast("array<string>")))
      .drop("__bpe_row")
  }

  /** Per-occurrence tokenization: a pure map, zero extra shuffles. The
    * right form for streaming micro-batches and tiny merge lists, where
    * the dictionary join's shuffles cost more than re-merging repeated
    * words. Same output as [[tokenize]].
    */
  def tokenizePerRow(df: DataFrame, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val ordered = merges.sortBy(_.rank).map(m => (m.a, m.b))
    val bc = df.sparkSession.sparkContext.broadcast(ordered)
    val tokUdf = udf { text: String =>
      if (text == null) Seq.empty[String]
      else {
        val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        words.toSeq.flatMap { w =>
          var sym = toSymbols(w)
          bc.value.foreach { case (a, b) => sym = applyMerge(sym, a, b) }
          sym
        }
      }
    }
    df.withColumn("tokens", tokUdf(col(textCol)))
  }

  /** The tokenizer's losslessness invariant: tokens of a word, markers
    * stripped and concatenated, rebuild the normalized word. Exposed as a
    * column so gates can pin it corpus-wide. Safe against marker-lookalike
    * input text because the marker is a reserved codepoint (see
    * [[endMark]]).
    */
  def detokenize(tokens: Column): Column =
    trim(regexp_replace(concat_ws("", tokens),
      java.util.regex.Pattern.quote(endMark), " "))
}
