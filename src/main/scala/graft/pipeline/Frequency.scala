package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) estimation as a mergeable one-pass
  * aggregate — the "which domains / languages / templates dominate this
  * corpus" primitive that at 100 TB cannot afford a full groupBy+sort when
  * only the head of the distribution matters.
  *
  * Algorithm: Misra-Gries summaries (the classic deterministic
  * frequent-items sketch; equivalently "space-saving" up to bookkeeping).
  * A summary of size k guarantees, for a stream of n items:
  *
  *   - every item with true frequency > n/(k+1) IS in the summary
  *     (no false negatives above the threshold);
  *   - each reported count undercounts by at most n/(k+1);
  *   - when the column has <= k distinct values no eviction ever fires,
  *     so counts are EXACT — the regime the correctness gate pins.
  *
  * Merging two summaries (Agarwal et al., "Mergeable Summaries") keeps the
  * same bound, which is exactly what Spark's partial aggregation needs:
  * each task builds a local summary over its partition (map-side, no
  * shuffle of raw items), and the final merge folds the per-partition
  * summaries — shuffle volume is O(partitions * k), independent of n.
  */
object Frequency {

  /** The Misra-Gries buffer: item -> retained count. Kept as an immutable
    * Map so Spark's ExpressionEncoder serializes it natively.
    */
  private final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k >= 1, "summary size k must be >= 1")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
      val key = if (item == null) "" else item
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < k => b.updated(key, 1L)
        case None =>
          // decrement-all step: drop zeros, forget the new item
          b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }
    }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from everything and keep
        // positives: the mergeable-summaries rule that preserves the
        // n/(k+1) error bound
        val cut = combined.values.toSeq.sortBy(-_)(Ordering.Long).apply(k)
        combined.flatMap { case (i, c) =>
          if (c > cut) Some(i -> (c - cut)) else None
        }
      }
    }

    def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (i, c) => (-c, i) }

    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** The sketch as a Column aggregate: array<struct<_1 item, _2 count>>,
    * ordered by descending retained count then item.
    */
  def misraGries(c: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k)).apply(c.cast("string"))

  /** Heavy hitters of `valueCol` as rows (item, est_count), one aggregation
    * pass. With <= k distinct values the counts are exact (see class doc).
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.agg(misraGries(col(valueCol), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("est_count"))

  /** Document frequency of every lowercased whitespace token: (term, df).
    * One explode + two hash aggregates; shuffle volume is bounded by the
    * vocabulary, not the corpus (map-side partials collapse repeats).
    */
  /** Corpus-frequency TOKEN-RANK quality score — the deterministic
    * stand-in for CCNet's KenLM perplexity filter, the same way
    * DeterministicOracle stands in for the LLM: a document built from
    * common language scores low, rare-token/garbage-heavy text scores
    * high, and the corpus itself is the model. Per document:
    *
    *   - `mean_rank`: mean over its token OCCURRENCES of the token's
    *     corpus frequency rank (1 = most frequent; ties break count
    *     desc then token asc, so the ranking is total and
    *     reproducible); out-of-vocabulary tokens take rank
    *     vocabSize + 1;
    *   - `oov_cnt`: how many occurrences fell outside the top
    *     `vocabSize` vocabulary.
    *
    * Exactness: the score is an exact integer rank sum divided once —
    * no float accumulation — so it hash-matches any engine that
    * replays the definition (the gate's DuckDB oracle does).
    *
    * Scale shape: one token-count aggregate (map-side combined), a
    * driver-bounded top-`vocabSize` collect broadcast back as a lookup
    * (the vocabulary is a PARAMETER, never corpus-sized), one
    * broadcast join from the exploded tokens, one per-doc aggregate.
    * The corpus shuffles token COUNTS once; raw text never re-shuffles.
    * Documents with no tokens score 0 with 0 OOV.
    */
  def tokenRankScore(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val spark = df.sparkSession
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokensCol(lower(col(textCol)))).as("__tok"))
    val vocab: Array[(String, Long)] = toks.groupBy("__tok")
      .agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tok").asc)
      .limit(vocabSize) // TakeOrdered: driver collect bounded by the param
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), i + 1L) }
    val ranks = spark.createDataFrame(vocab.toSeq).toDF("__tok", "__rank")
    val oovRank = vocabSize + 1L
    toks.join(broadcast(ranks), Seq("__tok"), "left")
      .groupBy(idCol)
      .agg(
        (sum(coalesce(col("__rank"), lit(oovRank))).cast("double") /
          count(lit(1)).cast("double")).as("mean_rank"),
        sum(when(col("__rank").isNull, 1L).otherwise(0L)).as("oov_cnt"))
      // blank docs have no token rows: restore them at score 0
      .join(df.select(col(idCol)), Seq(idCol), "right")
      .na.fill(Map("mean_rank" -> 0.0, "oov_cnt" -> 0L))
  }

  def documentFrequency(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(TextAnalysis.tokensCol(lower(col(textCol)))))
          .as("term"))
      .groupBy("term").agg(count(lit(1)).as("doc_freq"))

  /** Top-k characteristic terms per document, TF-IDF style. Rows:
    * (idCol, term, tf, doc_freq, rank, score) where score = tf *
    * (ln((N+1)/(doc_freq+1)) + 1) — smoothed IDF. The RANKING is computed
    * on exact integers (tf DESC, doc_freq ASC, term ASC), which is the
    * TF-IDF order within a document up to log monotonicity; the double
    * score is attached for consumers but never decides a tie, so results
    * are bit-stable across engines and partitionings.
    *
    * Scale: explode + two aggregates + one window partitioned by doc — the
    * window state is one doc's vocabulary, never the corpus. The doc count
    * N rides in as a broadcast scalar.
    */
  /** BM25 relevance of every document against a bag of query terms — the
    * classic full-text ranking function (Robertson/Spärck Jones; the
    * Lucene/Elasticsearch default), as one declarative pipeline:
    *
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
    *                         (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *
    * Shape at scale: the corpus is scanned ONCE for (tf, dl); rows
    * explode only to terms that match the query (the filter sits inside
    * the explode's input), document frequency aggregates over that
    * already-query-restricted table, and the global (N, avgdl) scalars
    * ride in as a broadcast one-row frame — no self-join against a full
    * posting list, no driver loop. Per query-term work is a hash
    * aggregate; everything else is codegen'd column math.
    *
    * Output: one row per (document, matched term) with the exact integer
    * retrieval stats (tf, doc_freq, dl) plus the double `score`
    * contribution and the per-document total `doc_score`. Rank/threshold
    * downstream on doc_score; exact cross-engine comparisons should use
    * the integer stats (double ln() is engine-faithful but summation
    * order across >2 terms is not).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs >= 1 query term")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = TextAnalysis.tokensCol(lower(col(textCol)))
    val docs = df.select(col(idCol), toks.as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    val matched = docs
      .select(col(idCol), col("__dl"),
        explode(filter(col("__toks"),
          t => t.isInCollection(terms))).as("term"))
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = matched.groupBy("term")
      .agg(count(lit(1)).as("doc_freq"))
    val globals = docs.agg(count(lit(1)).as("n_docs"),
      avg(col("__dl")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("doc_freq") + lit(0.5)) /
        (col("doc_freq") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("__dl") / col("avgdl")))
    val perTerm = matched.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(globals))
      .withColumn("score", contrib)
    val perDoc = perTerm.groupBy(idCol)
      .agg(sum(col("score")).as("doc_score"))
    perTerm.join(perDoc, Seq(idCol))
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"),
        col("__dl").as("dl"), col("score"), col("doc_score"))
  }

  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol),
      explode(TextAnalysis.tokensCol(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("doc_freq").asc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("score", col("tf") *
        (log((col("n_docs") + 1).cast("double") /
          (col("doc_freq") + 1).cast("double")) + 1))
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"),
        col("rank"), col("score"))
  }
}
