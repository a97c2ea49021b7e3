package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for heavy-hitter group keys.
  *
  * A single hot key (one giant `sem_group` tag, one dominant template)
  * funnels its whole partition through one task at 100 TB. Two remedies:
  *
  *   - AQE skew-join splitting (on by default in Spark 3.2+) handles
  *     joins; aggregations need salting:
  *   - [[saltedAgg]] runs any algebraic aggregation in two phases: a
  *     map-side-style partial over (key, salt) — `salts`-way parallelism
  *     for every key — then a final merge over the key. Correct for any
  *     aggregate with a merge decomposition (count/sum/min/max here;
  *     extendable by passing partial+final pairs).
  */
object Skew {

  /** Deterministic salt column in [0, salts). Derived from a hash of the
    * whole row (via a uuid-free, shuffle-stable expression) so re-runs
    * salt identically.
    */
  def saltCol(salts: Int, over: Seq[Column]): Column =
    pmod(hash(over: _*), lit(salts))

  /** Two-phase salted count+sum aggregation.
    *
    * @param keys     group-by key columns
    * @param sumCols  columns to sum (exact decimal path)
    * @param salts    fan-out per key (parallelism for the hottest key)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      salts: Int = 16, saltOver: Seq[Column] = Seq.empty): DataFrame = {
    val over = if (saltOver.nonEmpty) saltOver
               else df.columns.map(col).toSeq
    val salted = df.withColumn("__salt", saltCol(salts, over))
    val partialAggs =
      count(lit(1)).as("__cnt") +:
      sumCols.map(c => sum(col(c).cast("decimal(18,2)")).as(s"__sum_$c"))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sum(col("__cnt")).as(s"count") +:
      sumCols.map(c => sum(col(s"__sum_$c")).cast("double").as(s"sum_of_$c"))
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
