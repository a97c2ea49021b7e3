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

  /** Salted (skew-safe) equi-join: the explicit form of what AQE's
    * skew-join split does at runtime, usable when AQE is off (streaming
    * micro-batches), when the skew is known up front, or when the planner
    * under-estimates it.
    *
    * The LEFT (large, skewed) side gets a deterministic salt in
    * [0, salts); the RIGHT side is replicated `salts` times; the join key
    * becomes (key, salt), so one hot key's rows spread over `salts` tasks
    * instead of one straggler. Row-for-row identical to the plain join
    * for LEFT-PRESERVING join types (each left row meets each right row
    * exactly once — at the left row's own salt). Right-preserving types
    * (right/full outer) are rejected: the replicated right side would
    * emit each unmatched right row `salts` times. Cost: right side
    * shuffles `salts`x — size the fan-out to the hot key, not to the
    * cluster.
    */
  private val LeftPreservingJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(LeftPreservingJoinTypes contains joinType.toLowerCase,
      s"saltedJoin only supports left-preserving join types " +
      s"(${LeftPreservingJoinTypes.mkString(", ")}); '$joinType' would " +
      "emit each unmatched right row salts times because the right side " +
      "is replicated per salt")
    val l = left.withColumn("__salt",
      saltCol(salts, left.columns.map(col).toSeq))
    val r = right.crossJoin(
        broadcast(right.sparkSession.range(salts).toDF("__salt")))
      .withColumn("__salt", col("__salt").cast("int"))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
