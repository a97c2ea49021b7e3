package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a (small, curated) TARGET corpus. The
  * standard pretraining move for "give me Wikipedia-and-books-like
  * documents out of Common Crawl".
  *
  * Both distributions are bag-of-features unigram models over hashed
  * n-grams; a document's importance weight is
  *
  *   log w(d) = Σ_f  [ log p_target(f) − log p_raw(f) ]     (f with
  *              multiplicity, add-α smoothing on both models)
  *
  * and selection is top-k by `log w + Gumbel noise` (Gumbel-top-k IS
  * sampling-without-replacement from the softmax — the paper's
  * estimator), or plain top-k at temperature → 0.
  *
  * 100 TB shape: the two feature models are ONE aggregate each over the
  * corpus (map-side combined, ≤ `buckets` rows out); their log-ratio
  * collapses into a single float array broadcast to every executor
  * (80 KB at the paper's 10k buckets), so weighting is one scan of the
  * raw corpus with a row-local kernel — no join, no shuffle; selection
  * is a TakeOrdered (driver holds k rows, never the corpus). With
  * `buckets = 0` features stay raw token strings (λ becomes a
  * token-keyed join) — exact, SQL-replayable, for oracles and small
  * targeted runs; hashing is the scale path exactly as in the paper.
  *
  * Determinism: weights are pure arithmetic over counts; Gumbel noise
  * is seeded per (id, seed) through xxhash64, so a resample is
  * reproducible bit-for-bit on any cluster layout.
  */
object Dsir {

  /** Features of one document: lowercased whitespace tokens plus joined
    * i..i+j-1 grams for every gram length up to `n` ("a_b" for bigrams
    * — the paper's unigram+bigram default is n = 2).
    */
  def featuresCol(textCol: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    val toks = TextAnalysis.tokensCol(lower(textCol))
    val grams = (1 to n).map { g =>
      if (g == 1) toks
      else {
        // zip the token array with itself shifted g-1 times; every
        // slice shares one length so the zips align position-wise
        val parts = (0 until g).map(o => slice(toks, lit(o + 1),
          greatest(size(toks) - lit(g - 1), lit(0))))
        parts.tail.foldLeft(parts.head)((acc, p) =>
          zip_with(acc, p, (a, b) => concat_ws("_", a, b)))
      }
    }
    concat(grams: _*)
  }

  private def bucketed(feats: Column, buckets: Int): Column =
    if (buckets <= 0) feats
    else transform(feats, f => pmod(xxhash64(f), lit(buckets)))

  /** One distribution's feature counts: (feature, cnt) — `feature` is a
    * string token/n-gram (buckets = 0) or a LONG bucket id. One
    * map-side-combined aggregate; ≤ min(vocab, buckets) rows out.
    */
  def featureCounts(df: DataFrame, textCol: String, n: Int,
      buckets: Int): DataFrame =
    df.select(explode(bucketed(featuresCol(col(textCol), n), buckets))
        .as("feature"))
      .groupBy("feature").agg(count(lit(1)).as("cnt"))

  /** The log-ratio model λ: (feature, lambda) with
    * λ(f) = ln((ct_f + α)/(Nt + α·B)) − ln((cr_f + α)/(Nr + α·B)),
    * B = `buckets` (hashed mode) or the UNION vocabulary size (exact
    * mode) — every feature of either corpus gets a row, so raw-only
    * features carry their (smoothed-zero-target) penalty explicitly.
    */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
      n: Int = 2, buckets: Int = 10000, alpha: Double = 1.0): DataFrame = {
    val tc = featureCounts(target, textCol, n, buckets)
      .withColumnRenamed("cnt", "ct")
    val rc = featureCounts(raw, textCol, n, buckets)
      .withColumnRenamed("cnt", "cr")
    val joined = tc.join(rc, Seq("feature"), "full_outer")
      .select(col("feature"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val agg = joined.agg(sum("ct"), sum("cr"), count(lit(1))).head()
    val nt = agg.getLong(0); val nr = agg.getLong(1)
    val b = if (buckets > 0) buckets.toLong else agg.getLong(2)
    joined.select(col("feature"),
      (log((col("ct") + alpha) / (nt + alpha * b)) -
        log((col("cr") + alpha) / (nr + alpha * b))).as("lambda"))
  }

  /** Per-document importance weights against λ: (idCol, logw). Hashed
    * mode broadcasts λ as ONE float array and weighs each document
    * row-locally (no join); exact mode joins exploded features with the
    * λ table. Features absent from λ (possible only in exact mode when
    * weighing documents outside `raw`) contribute 0.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      lambda: DataFrame, n: Int, buckets: Int): DataFrame = {
    if (buckets > 0) {
      val arr = new Array[Double](buckets)
      lambda.select("feature", "lambda").collect().foreach { r =>
        arr(r.getLong(0).toInt) = r.getDouble(1)
      }
      val bc = df.sparkSession.sparkContext.broadcast(arr)
      val weigh = udf { fs: Seq[Long] =>
        val l = bc.value
        var s = 0.0
        var i = 0
        while (i < fs.length) { s += l(fs(i).toInt); i += 1 }
        s
      }
      df.select(col(idCol),
        weigh(bucketed(featuresCol(col(textCol), n), buckets)).as("logw"))
    } else {
      df.select(col(idCol),
          explode(featuresCol(col(textCol), n)).as("feature"))
        .join(lambda, Seq("feature"), "left")
        .groupBy(idCol)
        .agg(sum(coalesce(col("lambda"), lit(0.0))).as("logw"))
        .join(df.select(col(idCol)), Seq(idCol), "right")
        .na.fill(Map("logw" -> 0.0)) // blank docs: weight 0
    }
  }

  /** Select `k` documents from `raw` that look like `target`:
    * Gumbel-top-k over the importance weights (`seed = Some(s)` — the
    * paper's sampler, reproducible bit-for-bit) or plain top-k
    * (`seed = None`, temperature → 0). Ties inside top-k break by id.
    * Returns the selected rows of `raw` with their `logw` attached;
    * the corpus never leaves the executors — selection is a
    * TakeOrdered of k slim (id, score) rows.
    */
  def resample(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, k: Int, n: Int = 2, buckets: Int = 10000,
      alpha: Double = 1.0, seed: Option[Long] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val lambda = logRatios(target, raw, textCol, n, buckets, alpha)
    val w = importanceWeights(raw, idCol, textCol, lambda, n, buckets)
    val score = seed match {
      case Some(s) =>
        // seeded Gumbel(0,1): u from the high 53 bits of
        // xxhash64(id, seed) — open interval, then −ln(−ln u)
        val u = (shiftrightunsigned(xxhash64(col(idCol), lit(s)), 11)
          .cast("double") + lit(0.5)) / lit(9007199254740992.0)
        col("logw") + -log(-log(u))
      case None => col("logw")
    }
    val picked = w.select(col(idCol), col("logw"), score.as("__score"))
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(k) // TakeOrderedAndProject: k rows to the driver's heir
      .drop("__score")
    raw.join(picked, Seq(idCol))
  }
}
