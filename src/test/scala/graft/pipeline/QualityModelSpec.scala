package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trainable quality classifier: logistic regression over hashing-trick
  * features, one bounded aggregation per iteration. A planted separable
  * problem must reach exact accuracy with partition-invariant labels;
  * an unseen-vocabulary row scores at the bias.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog",
      "lorem ipsum dolor sit amet consectetur adipiscing elit",
      "a stitch in time saves nine and more besides",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump today")
    (0 until 200).map { i =>
      val marker = if (i % 2 == 0) "qualhi" else "quallo"
      (i.toLong, s"${base(i % base.size)} $marker", i % 2 == 0)
    }.toDF("id", "text", "good")
      .withColumn("label", col("good").cast("int"))
  }

  test("planted separable markers: exact accuracy, labels invariant " +
      "under repartitioning") {
    val m = QualityModel.train(planted, "text", "label",
      dim = 1 << 12, iters = 30)
    val preds = planted.withColumn("pred",
      QualityModel.predictCol(m, col("text")))
    assert(preds.filter(col("pred") =!= col("label")).isEmpty,
      "a separable marker problem must classify exactly")
    // the model is driver state; scoring is row-local, so labels must
    // not depend on how the corpus is partitioned
    val re = planted.repartition(13).withColumn("pred",
      QualityModel.predictCol(m, col("text")))
    assert(re.filter(col("pred") =!= col("label")).isEmpty)
    // training itself must be partition-stable at the LABEL level too
    val m2 = QualityModel.train(planted.repartition(7), "text", "label",
      dim = 1 << 12, iters = 30)
    val p2 = planted.withColumn("pred",
      QualityModel.predictCol(m2, col("text")))
    assert(p2.filter(col("pred") =!= col("label")).isEmpty)
  }

  test("scores separate the classes with margin; unseen vocabulary " +
      "falls back to the bias") {
    val m = QualityModel.train(planted, "text", "label",
      dim = 1 << 12, iters = 30)
    val scored = planted.withColumn("s",
      QualityModel.scoreCol(m, col("text")))
    val loHi = scored.groupBy("label")
      .agg(max(when(col("label") === 0, col("s"))).as("max0"),
        min(when(col("label") === 1, col("s"))).as("min1"))
      .agg(max("max0").as("max0"), max("min1").as("min1"))
      .head()
    assert(loHi.getDouble(1) > loHi.getDouble(0),
      s"class score ranges must separate, got $loHi")
    // all-unseen tokens: every feature weight is untouched (0), so the
    // score is exactly sigmoid(bias)
    val bias = 1.0 / (1.0 + math.exp(-m.weights(m.dim)))
    val unseen = Seq((1L, "zzzzq wwwwq vvvvq")).toDF("id", "text")
      .withColumn("s", QualityModel.scoreCol(m, col("text")))
      .head().getDouble(2)
    assert(math.abs(unseen - bias) < 1e-12)
    // empty/null text scores at the bias too, never throws
    val edge = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .withColumn("s", QualityModel.scoreCol(m, col("text")))
      .select("s").as[Double].collect()
    assert(edge.forall(s => math.abs(s - bias) < 1e-12))
  }

  test("save/load round-trips the model exactly: scores bit-identical") {
    val m = QualityModel.train(planted, "text", "label",
      dim = 1 << 10, iters = 10)
    val path = java.nio.file.Files
      .createTempDirectory("qm_model").toString + "/m"
    QualityModel.save(spark, m, path)
    val m2 = QualityModel.load(spark, path)
    assert(m2.dim == m.dim)
    assert(m2.weights.toSeq == m.weights.toSeq)
    val a = planted.withColumn("s", QualityModel.scoreCol(m, col("text")))
      .select("s").as[Double].collect().toSeq
    val b = planted.withColumn("s", QualityModel.scoreCol(m2, col("text")))
      .select("s").as[Double].collect().toSeq
    assert(a == b)
  }

  // the word-ORDER corpus: unigram sets are IDENTICAL across classes
  // ("alpha beta" vs "beta alpha"), so only bigram features can learn
  private lazy val ordered = {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog",
      "lorem ipsum dolor sit amet consectetur adipiscing elit",
      "a stitch in time saves nine and more besides",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump today")
    // sentence index (i/2) and class (i%2) are INDEPENDENT: every
    // sentence appears with both markers on both sides of the split,
    // so no unigram or boundary feature correlates with the class —
    // the order bigram is the ONLY signal
    (0 until 200).map { i =>
      val marker = if (i % 2 == 0) "alpha beta" else "beta alpha"
      (i.toLong, s"${base((i / 2) % base.size)} $marker", 1 - i % 2)
    }.toDF("id", "text", "label")
  }

  test("word-bigram features learn an ORDER rule and GENERALIZE to a " +
      "held-out split; unigram features cannot learn it at all") {
    val train = ordered.filter(col("id") < 140)   // 70%
    val test = ordered.filter(col("id") >= 140)   // unseen 30%
    val bg = QualityModel.train(train, "text", "label",
      dim = 1 << 15, iters = 30, bigrams = true)
    val heldOutAcc = test.withColumn("pred",
      QualityModel.predictCol(bg, col("text")))
      .filter(col("pred") === col("label")).count().toDouble /
      test.count()
    assert(heldOutAcc == 1.0,
      s"bigram model must carry the order rule to unseen docs, " +
      s"got $heldOutAcc")
    // negative control: the unigram model sees identical feature sets
    // for both classes — even TRAINING accuracy must sit at chance
    val ug = QualityModel.train(train, "text", "label",
      dim = 1 << 15, iters = 30)
    val trainAcc = train.withColumn("pred",
      QualityModel.predictCol(ug, col("text")))
      .filter(col("pred") === col("label")).count().toDouble /
      train.count()
    assert(trainAcc < 0.75,
      s"unigram features carry NO order signal — near-chance " +
      s"expected, got $trainAcc")
  }

  test("save/load round-trips the bigram flag (scores identical " +
      "through persistence); legacy unigram models load unchanged") {
    val m = QualityModel.train(ordered, "text", "label",
      dim = 1 << 12, iters = 10, bigrams = true)
    assert(m.bigrams)
    val path = java.nio.file.Files
      .createTempDirectory("qm_model_bg").toString + "/m"
    QualityModel.save(spark, m, path)
    val m2 = QualityModel.load(spark, path)
    assert(m2.bigrams && m2.dim == m.dim &&
      m2.weights.toSeq == m.weights.toSeq)
    val a = ordered.withColumn("s", QualityModel.scoreCol(m, col("text")))
      .select("s").as[Double].collect().toSeq
    val b = ordered.withColumn("s", QualityModel.scoreCol(m2, col("text")))
      .select("s").as[Double].collect().toSeq
    assert(a == b)
  }

  test("hash collisions stay inside dim; tiny dim still trains") {
    val m = QualityModel.train(planted, "text", "label",
      dim = 32, iters = 50, lr = 3.0)
    // 32 buckets force collisions — accuracy may drop but the model
    // must stay well-formed and better than chance on the planted set
    val acc = planted.withColumn("pred",
      QualityModel.predictCol(m, col("text")))
      .filter(col("pred") === col("label")).count() / 200.0
    assert(acc > 0.6, s"collided model should still beat chance, $acc")
    assert(m.weights.length == 33)
  }
}
