package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: ordered funnels and
  * retention cohorts — the two queries every product-analytics engine
  * (and training-data curriculum built from interaction logs) runs first.
  * Pure window/aggregate compositions: one shuffle by user for the funnel
  * (both window passes share the partitioning, Catalyst reuses the
  * Exchange), one aggregate pair for cohorts. No driver-side state.
  */
object Behavior {

  /** Strictly-ordered funnel: how many users performed step 1, step 2
    * AFTER their first step-1 event, step 3 after THAT, ... Returns one
    * row per funnel step: (step 1-indexed, event_type, users).
    *
    * Semantics: a user reaches step i+1 if any step-i+1 event is strictly
    * later than their earliest qualifying step-i event (the standard
    * unordered-window funnel). Running mins are computed per user in event
    * order with a deterministic (ts, tiebreak) ordering.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], tiebreak: String): DataFrame =
    funnelImpl(events, userCol, typeCol, tsCol, steps, tiebreak, None)

  /** Time-bounded funnel: step i+1 counts only if it happens within
    * `maxGap` of the time step i was reached — "clicked within an hour of
    * viewing", the form real product analytics runs. `maxGap` is in the
    * ts column's own units (same-typed literal: nanos for epoch-nanos
    * timestamps, an interval for timestamps).
    *
    * Semantics are the EARLIEST-QUALIFYING chain: t_0 = first step-1
    * event; t_{i+1} = first step-i+1 event in (t_i, t_i + maxGap]. The
    * greedy chain is deterministic and one-window-pass computable (the
    * same running-min construction as [[funnel]] — the Exchange is shared
    * across all step passes), and it is expressible in plain window SQL,
    * which the gate exploits. A backtracking variant (restart the window
    * from a later step-i occurrence when the greedy chain dies) would
    * find strictly more conversions but needs per-user DP; documented
    * trade, not silently different.
    */
  def windowedFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], tiebreak: String,
      maxGap: Column): DataFrame =
    funnelImpl(events, userCol, typeCol, tsCol, steps, tiebreak,
      Some(maxGap))

  private def funnelImpl(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], tiebreak: String,
      maxGap: Option[Column]): DataFrame = {
    require(steps.nonEmpty, "funnel needs >= 1 step")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // qual(i) = this row's ts if it advances step i (right type, strictly
    // after — and within maxGap of — the running min of step i-1's
    // qualifying time)
    val enriched = steps.zipWithIndex.foldLeft(
      (events, Option.empty[Column])) { case ((df, prevMin), (step, i)) =>
      val qual = prevMin match {
        case None => when(col(typeCol) === step, col(tsCol))
        case Some(p) =>
          val inWindow = maxGap match {
            case None      => col(tsCol) > p
            case Some(gap) => col(tsCol) > p && col(tsCol) <= p + gap
          }
          when(col(typeCol) === step && inWindow, col(tsCol))
      }
      val d2 = df.withColumn(s"__q$i", qual)
        .withColumn(s"__m$i", min(col(s"__q$i")).over(w))
      (d2, Some(col(s"__m$i")))
    }._1
    val perUser = enriched.groupBy(userCol)
      .agg(steps.indices.map(i =>
        max(col(s"__q$i").isNotNull).as(s"__r$i")).head,
        steps.indices.map(i =>
          max(col(s"__q$i").isNotNull).as(s"__r$i")).tail: _*)
    val counts = perUser.agg(
      steps.indices.map(i =>
        sum(col(s"__r$i").cast("long")).as(s"__n$i")).head,
      steps.indices.map(i =>
        sum(col(s"__r$i").cast("long")).as(s"__n$i")).tail: _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("event_type"),
        coalesce(col(s"__n$i"), lit(0L)).as("users"))
    }
    counts.select(explode(array(stepRows: _*)).as("s"))
      .select(col("s.step"), col("s.event_type"), col("s.users"))
  }

  /** Retention cohorts: users grouped by the week of their first event;
    * one row per (cohort_week, active_week) with the distinct-user count.
    * Weeks are ISO date_trunc strings so the output is engine-portable.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: Column): DataFrame = {
    val week = (c: Column) => date_format(date_trunc("week", c), "yyyy-MM-dd")
    val firstSeen = events.groupBy(userCol)
      .agg(min(tsCol).as("__first"))
      .select(col(userCol), week(col("__first")).as("cohort_week"))
    events.select(col(userCol), week(tsCol).as("active_week"))
      .distinct()
      .join(firstSeen, userCol)
      .groupBy("cohort_week", "active_week")
      .agg(countDistinct(userCol).as("n_users"))
  }
}
