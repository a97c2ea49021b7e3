package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) building: turn a change log
  * (key, change_ts, attributes…) into versioned dimension rows with
  * validity intervals — the warehouse-standard way to keep history
  * queryable, and the natural partner of the as-of join (AsOfJoin.scala)
  * for "what did this dimension look like when the fact happened".
  *
  * One window pass per key ordered by (change_ts, tiebreak): valid_from =
  * the change time, valid_to = the NEXT change's time (null while
  * current), is_current = no later change exists. A fact row joins its
  * version via `fact.ts >= valid_from AND (valid_to IS NULL OR fact.ts <
  * valid_to)` — or equivalently with the as-of join on valid_from.
  * Consecutive identical versions can optionally be collapsed first
  * (dedupeConsecutive) so a re-delivered unchanged record doesn't split
  * an interval.
  */
object Scd {

  /** Versioned rows: input columns + (valid_to, is_current); the change
    * timestamp column IS valid_from. `tiebreak` makes equal-timestamp
    * deliveries deterministic.
    */
  def buildType2(log: DataFrame, key: String, tsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tiebreak))
    log.withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Drop log records whose tracked attributes equal the key's previous
    * record (null-safe) — re-deliveries and no-op updates don't split
    * validity intervals.
    */
  def dedupeConsecutive(log: DataFrame, key: String, tsCol: String,
      tiebreak: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "need >= 1 tracked attribute")
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tiebreak))
    val sameAsPrev: Column = attrs
      .map(a => col(a) <=> lag(col(a), 1).over(w))
      .reduce(_ && _) && lag(col(tsCol), 1).over(w).isNotNull
    log.withColumn("__same", sameAsPrev)
      .filter(!col("__same")).drop("__same")
  }
}
