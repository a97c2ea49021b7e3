package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINABLE quality classifier — the model-based document filter every
  * production pretraining pipeline runs beside the heuristic scores
  * (GPT-3/CCNet train a linear classifier of "looks like reference
  * text" vs "looks like raw crawl" and keep the high scorers; fastText
  * supervised mode is the usual tool). This is the same model,
  * Spark-first:
  *
  *   - '''features''': hashing-trick bag of words — token →
  *     `pmod(hash(token), dim)`, binary PRESENCE per distinct token,
  *     plus a bias slot. No vocabulary to build, no driver state that
  *     grows with the corpus: `dim` bounds everything; featurization
  *     is one row-local linear pass.
  *   - '''training''': batch logistic regression by gradient descent.
  *     Each iteration is ONE distributed pass: broadcast the weight
  *     array (dim+1 doubles — a few hundred KB at the usual 2^15..2^18
  *     dims), compute each row's error `sigmoid(w·x) − y` row-locally,
  *     then `explode(features) → groupBy(featureIdx) → sum(err·x)` —
  *     a shuffle of at most `dim+1` keys, never corpus-sized. The
  *     gradient collects bounded by `dim+1`.
  *   - '''scoring''': row-local — broadcast weights, one map, no
  *     shuffle. At 100 TB scoring is a pure scan.
  *
  * Determinism: zero-init weights, fixed step count — no RNG anywhere.
  * Floating-point gradient sums vary at the ulp level with partition
  * count, so SCORES are deterministic only to ~1e-12; thresholded
  * LABELS on a separable/margined problem are exactly stable (the
  * correctness gate pins labels, the spec pins accuracy).
  */
object QualityModel {

  final case class Model(dim: Int, weights: Array[Double],
      bigrams: Boolean = false) {
    require(weights.length == dim + 1,
      s"weights must be dim+1 (bias last), got ${weights.length}")
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Row-local hashed features: (index, 1.0) PRESENCE pairs over
    * distinct tokens. MurmurHash3 over lowercased `\W+` tokens —
    * stable across JVMs and partitionings, internal to the model
    * (nothing else must match it). Presence (not TF) keeps each
    * feature's scale independent of document LENGTH: under
    * length-normalized TF a discriminative token in a 500-token
    * document contributes 1/500 of the gradient it does in a 10-token
    * one, and convergence slows with the corpus's document length —
    * the wrong coupling for a filter that must train over web-scale
    * documents in a fixed iteration budget.
    */
  private def featurize(text: String, dim: Int,
      bigrams: Boolean = false): Array[(Int, Double)] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    if (toks.isEmpty) return Array.empty
    val seen = new java.util.HashSet[Int]()
    toks.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t)
      seen.add(((h % dim) + dim) % dim); ()
    }
    // hashed word BIGRAMS (fastText's default wordNgrams=2): the
    // feature that separates ORDER — "alpha beta" vs "beta alpha" have
    // identical unigram sets. Same hashed space, presence semantics.
    if (bigrams && toks.length >= 2) {
      var k = 0
      while (k < toks.length - 1) {
        val h = scala.util.hashing.MurmurHash3
          .stringHash(toks(k) + "\u0001" + toks(k + 1))
        seen.add(((h % dim) + dim) % dim)
        k += 1
      }
    }
    val out = new Array[(Int, Double)](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = (it.next(), 1.0); j += 1 }
    out
  }

  private def dot(w: Array[Double], dim: Int,
      f: Seq[(Int, Double)]): Double = {
    var z = w(dim) // bias
    f.foreach { case (i, v) => z += w(i) * v }
    z
  }

  /** Train on `labelCol` (0/1) over `textCol`. One aggregation job per
    * iteration; driver state is the weight vector only.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 15, iters: Int = 30, lr: Double = 2.0,
      reg: Double = 0.0, bigrams: Boolean = false): Model = {
    val spark = df.sparkSession
    val dimB = dim
    val bigramsB = bigrams
    val featUdf = udf { t: String => featurize(t, dimB, bigramsB) }
    val feats = df.select(
      col(labelCol).cast("double").as("__y"),
      featUdf(col(textCol)).as("__f"))
      .localCheckpoint() // featurize once, not once per iteration
    try {
      val n = feats.count().toDouble
      require(n > 0, "cannot train on an empty frame")
      val w = Array.fill(dim + 1)(0.0)
      for (_ <- 0 until iters) {
        val bw = spark.sparkContext.broadcast(w)
        // row-local error against the broadcast weights
        val err = udf { (y: Double, f: Seq[(Int, Double)]) =>
          sigmoid(dot(bw.value, dimB, f)) - y
        }
        val withErr = feats.withColumn("__e", err(col("__y"), col("__f")))
        // gradient: one explode + one <= dim+1-key aggregation; the
        // bias slot rides the same job as index `dim`
        val grad = withErr.select(explode(
          concat(col("__f"),
            array(struct(lit(dimB).as("_1"), lit(1.0).as("_2"))))).as("fe"),
          col("__e"))
          .groupBy(col("fe._1").as("i"))
          .agg(sum(col("__e") * col("fe._2")).as("g"))
          .collect() // bounded by dim+1 rows
        grad.foreach { r =>
          val i = r.getInt(0)
          w(i) -= lr * (r.getDouble(1) / n + reg * w(i))
        }
        bw.destroy()
      }
      Model(dim, w, bigrams)
    } finally { feats.unpersist(blocking = false); () }
  }

  /** P(label=1) per row — row-local scan, broadcast weights. */
  def scoreCol(model: Model, text: Column): Column = {
    val w = model.weights; val dim = model.dim
    val bg = model.bigrams
    val score = udf { t: String =>
      sigmoid(dot(w, dim, featurize(t, dim, bg).toSeq))
    }
    score(text)
  }

  /** Thresholded keep/drop label. */
  def predictCol(model: Model, text: Column,
      threshold: Double = 0.5): Column =
    (scoreCol(model, text) >= lit(threshold)).cast("int")

  /** Persist the model as one tiny parquet table (index, weight) —
    * train once on the labeled sample, score whole corpora in any
    * later session. dim+1 rows, one file.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    // the bigram flag rides a sentinel row (i = -1) — absent in models
    // saved before the flag existed, which therefore load unigram-only
    val flag = if (model.bigrams) Seq((-1, 1.0)) else Seq.empty
    (flag ++ model.weights.zipWithIndex
      .map { case (w, i) => (i, w) }).toDF("i", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Model = {
    val rows = spark.read.parquet(path).orderBy("i").collect()
    val (sentinel, weights) = rows.partition(_.getInt(0) < 0)
    require(weights.nonEmpty, s"$path holds no model")
    Model(weights.length - 1, weights.map(_.getDouble(1)),
      bigrams = sentinel.exists(_.getDouble(1) == 1.0))
  }
}
