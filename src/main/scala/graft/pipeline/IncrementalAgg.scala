package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: a materialized per-group aggregate
  * (count, exact decimal sum, min, max) kept as a parquet state table and
  * folded forward with each new data delta — the ETL pattern that at
  * 100 TB replaces "rescan all history every day" with "aggregate today's
  * partition and merge" (work proportional to the delta plus the group
  * count, not to history).
  *
  * The maintained statistics are all insert-monotone (count/sum add,
  * min/max only tighten), so folding deltas in any order equals the full
  * recompute EXACTLY — decimal sums make that bit-stable, and the
  * q_incremental_agg gate pins incremental == from-scratch in DuckDB.
  * Deletions/updates need retraction counts (count can go to zero; min/max
  * need a rebuild) — out of scope here, documented not silently wrong:
  * `update` is append-only by contract.
  */
object IncrementalAgg {

  private val stateCols = Seq("cnt", "sum_exact", "min_v", "max_v")

  private def aggregate(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(28,2)")).as("sum_exact"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /** Initialize the state table from a first batch. */
  def init(df: DataFrame, path: String, keys: Seq[String],
      valueCol: String): Unit =
    aggregate(df, keys, valueCol).write.mode("overwrite").parquet(path)

  /** Fold an append-only delta into the state: aggregate the delta (the
    * only scan of raw data), full-outer merge with the state on the group
    * keys, write the new state. Work = O(delta + |groups|).
    */
  def update(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], valueCol: String): Unit = {
    val state = spark.read.parquet(path)
    val d = aggregate(delta, keys, valueCol)
      .select(keys.map(col) ++ stateCols.map(c => col(c).as(s"d_$c")): _*)
    val merged = state.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) +
          coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_exact"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("d_sum_exact"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("sum_exact"),
        least(col("min_v"), col("d_min_v")).as("min_v"),
        greatest(col("max_v"), col("d_max_v")).as("max_v")): _*)
      // lineage truncation before overwriting the path we just read
      // (bounded: |groups| rows of fixed-width state)
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(path)
  }

  /** The maintained aggregate, sums emitted as doubles for consumers. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("sum_v", col("sum_exact").cast("double"))
      .drop("sum_exact")
}
