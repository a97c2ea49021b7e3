package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training pipelines need REPRODUCIBLE row selection: the same row lands
  * in the same split on every run, every engine, and every partitioning —
  * which rules out RNG-based `sample()` (seed semantics are engine- and
  * partitioning-specific). The standard answer is a content hash of a
  * stable key: bucket = md5(key || salt) mod 100, then threshold buckets.
  * Pure codegen'd expressions — no shuffle, no state, trivially
  * embarrassingly parallel at any scale; changing `salt` draws an
  * independent re-split.
  */
object Sampling {

  /** Deterministic bucket in [0, 100): md5 over (key, salt), first 4 hex
    * chars as an integer, mod 100. Engine-portable: md5 is md5.
    */
  def hashBucket(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 4), 16, 10)
      .cast("long") % 100).cast("int")

  /** Keep a deterministic `percent`% of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, percent: Int,
      salt: String = "graft"): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent in [0,100]")
    df.filter(hashBucket(col(keyCol), salt) < percent)
  }

  /** Assign every row a split label from cumulative percentage cuts, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)` (must sum to 100).
    */
  def splitColumn(key: Column, cuts: Seq[(String, Int)],
      salt: String = "graft"): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = hashBucket(key, salt)
    val bounds = cuts.scanLeft(0)(_ + _._2).tail
    cuts.zip(bounds).init.foldRight(lit(cuts.last._1): Column) {
      case (((name, _), hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
  }

  /** Attach a `split` column (train/val/test by default). */
  def withSplit(df: DataFrame, keyCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "graft"): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), cuts, salt))

  /** Deterministic STRATIFIED sample: keep `percents(stratum)`% of each
    * stratum's rows by key hash (strata absent from the map keep 0%).
    * The language-rebalancing primitive of corpus curation (downsample
    * dominant languages/sources without an RNG): same hash rule as
    * [[hashSample]], so membership is reproducible across engines and
    * independent of partitioning, and a row's fate never changes when
    * other strata's percentages do. Pure codegen — the per-stratum
    * threshold folds to one CASE expression; no shuffle, no per-stratum
    * job, no driver state.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      percents: Map[String, Int], salt: String = "graft"): DataFrame = {
    require(percents.values.forall(p => p >= 0 && p <= 100),
      "stratum percents in [0,100]")
    val threshold = percents.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((stratum, pct), els) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(els)
      }
    df.filter(hashBucket(col(keyCol), salt) < threshold)
  }

  /** Token-budget sequence packing: assign documents to contiguous packs
    * of ~`budget` tokens — the "fill 4k-token training sequences" pass of
    * corpus assembly. Contract: rows are ordered deterministically by
    * `orderCol` WITHIN each shard; a document starts pack p when the
    * tokens before it total in [p*budget, (p+1)*budget) — the document
    * that straddles a boundary stays whole in the pack it starts in (the
    * standard greedy-contiguous rule: packs may overrun by at most one
    * document).
    *
    * Scale: one running-sum window PARTITIONED BY the shard — packing
    * parallelism is the shard count, never a global single-partition
    * sort. Shard first (hash split, language, source file), pack within.
    */
  def packBudget(df: DataFrame, orderCol: String, tokens: Column,
      budget: Long, shardCol: String): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer division (`div`, not `/`): Column./ is double division,
      // which would lose exactness past 2^53 cumulative tokens per shard
      .withColumn("pack_id", expr(s"__before div ${budget}L"))
      .drop("__before")
  }
}
