package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and strip) evaluation documents whose
  * word n-grams leak from a training corpus — the standard "n-gram overlap"
  * check run before training on scraped data (the reference has no
  * analogue; this is north-star pipeline surface, SURVEY §7/M6).
  *
  * 100 TB posture: a pure inverted-index formulation. The train side
  * collapses to its DISTINCT shingle set in one hash aggregate (map-side
  * partials — shuffle volume is bounded by the distinct-shingle count, not
  * the corpus size); the test side meets it in a LEFT SEMI equi-join
  * partitioned by shingle. No doc-by-doc pairing, no broadcast of anything
  * unbounded, and the fraction compare is exact integer arithmetic — no
  * float boundary to disagree about at any scale.
  */
object Decontaminate {

  /** Per-test-document contamination counts against the train corpus:
    * (idCol, n_shingles, n_contaminated) where n_shingles counts the doc's
    * DISTINCT word n-grams and n_contaminated how many of those occur
    * anywhere in train. Docs with fewer than n tokens report (0, 0).
    */
  def overlapCounts(test: DataFrame, idCol: String, textCol: String,
      train: DataFrame, trainTextCol: String, n: Int = 8): DataFrame = {
    // one-kernel shingle emission (TextAnalysis.shinglesUdf): the Catalyst
    // wordShingles lambda tree re-tokenizes per element and measures ~6x
    // slower on exactly this shape — the train-side explode dominates the
    // whole operator's cost, so the kernel is the difference between the
    // corpus scan being the bottleneck and the (cheap) semi join being it
    val sh = TextAnalysis.shinglesUdf(n)(col(textCol))
    val testSh = test.select(col(idCol),
      explode(array_distinct(sh)).as("__sh"))
    val trainSh = train.select(
      explode(array_distinct(TextAnalysis.shinglesUdf(n)(col(trainTextCol))))
        .as("__sh"))
      .distinct()
    val contaminated = testSh.join(trainSh, Seq("__sh"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    test.select(col(idCol), size(array_distinct(sh)).cast("long")
        .as("n_shingles"))
      .join(contaminated, Seq(idCol), "left")
      .na.fill(0L, Seq("n_contaminated"))
  }

  /** [[overlapCounts]] with a BLOOM PREFILTER on the test side: a filter
    * built over the train shingle set (size set by `expectedShingles` /
    * `fpp`, never by corpus size) drops test shingles that cannot match
    * BEFORE they reach the exchange; the exact semi join then removes
    * the false positives, so counts are identical by construction
    * (`ops.BloomJoin` mechanics, native codegen probe).
    *
    * This matters because decontamination is usually checked against a
    * FIXED benchmark suite: train shingles are ~corpus-sized, but the
    * overlap is tiny — so nearly every test shingle shuffled by the
    * plain form is wasted motion. With a 1% fpp bloom the test-side
    * exchange carries ~(true overlap + 1%) of its former volume.
    */
  def overlapCountsBloom(test: DataFrame, idCol: String, textCol: String,
      train: DataFrame, trainTextCol: String, n: Int = 8,
      expectedShingles: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val sh = TextAnalysis.shinglesUdf(n)(col(textCol))
    val testSh = test.select(col(idCol),
      explode(array_distinct(sh)).as("__sh"))
    val trainSh = train.select(
      explode(array_distinct(TextAnalysis.shinglesUdf(n)(col(trainTextCol))))
        .as("__sh"))
      .distinct()
    val contaminated = graft.ops.BloomJoin
      .prunedSemiJoin(testSh, trainSh, "__sh", "__sh", expectedShingles, fpp)
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    test.select(col(idCol), size(array_distinct(sh)).cast("long")
        .as("n_shingles"))
      .join(contaminated, Seq(idCol), "left")
      .na.fill(0L, Seq("n_contaminated"))
  }

  /** Keep test docs whose contaminated-shingle share is at most `maxFrac`
    * (compared as integers: contaminated * 1000 <= shingles * round(frac *
    * 1000) — exact at any scale). Docs too short to carry any n-gram are
    * kept: nothing measurable leaked.
    */
  def decontaminate(test: DataFrame, idCol: String, textCol: String,
      train: DataFrame, trainTextCol: String, n: Int = 8,
      maxFrac: Double = 0.0): DataFrame = {
    val permille = math.round(maxFrac * 1000)
    val keep = overlapCounts(test, idCol, textCol, train, trainTextCol, n)
      .filter(col("n_contaminated") * 1000 <= col("n_shingles") * permille)
      .select(idCol)
    test.join(keep, Seq(idCol), "left_semi")
  }
}
