package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming layer over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming surface (SURVEY.md §2f) — this is the
  * engine's extension point: the same operators exposed over unbounded
  * input with watermarks and stateful sessionization. Transform builders
  * are batch/stream agnostic (a DataFrame in, a DataFrame out), so the
  * correctness gate runs them on the batch table while `readStream` runs
  * them continuously.
  */
object EventStreams {

  /** Attach a native TimestampType `event_time` column for windowing,
    * whatever the physical ts dtype is (long nanos on legacy data,
    * TIMESTAMP_NTZ on current parquet — see [[graft.EventTs]]).
    */
  def withEventTime(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.withColumn("event_time", graft.EventTs.time(events, tsCol))

  /** Tumbling-window counts + exact sums per event type. On a stream, add
    * `withWatermark` upstream; on batch input it computes the final answer.
    */
  def windowedStats(events: DataFrame, window: String = "1 hour"): DataFrame =
    withEventTime(events)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window)
        .as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming variant with a watermark (late data bounded at `lateness`). */
  def streamingWindowedStats(stream: DataFrame, window: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  // ------------------------------------------------------ streaming dedup

  /** Streaming exact dedup on a set of key columns: emits one row per key —
    * the first micro-batch to carry a key wins (within a single batch the
    * surviving row is unspecified, as with Spark's dropDuplicates). State is
    * bounded by the watermark (`dropDuplicatesWithinWatermark` evicts key
    * state once the key's event time passes it — unbounded-run-safe, unlike
    * plain dropDuplicates whose state grows forever). The streaming face of
    * [[graft.pipeline.Dedup.exactDedup]].
    */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String],
      lateness: String = "10 minutes"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  // ----------------------------------------------- stateful sessionization

  final case class Event(user_id: Long, event_type: String, value: Double,
      ts_micros: Long)
  final case class Session(user_id: Long, n_events: Int, total_value: Double,
      start_micros: Long, end_micros: Long)

  /** Per-user session aggregation with a processing-gap timeout — the
    * `flatMapGroupsWithState` pattern for custom streaming state. Emits a
    * session when the user goes quiet for `gapMicros` (event-time gap,
    * checked on every new batch for that key).
    */
  def sessionize(events: Dataset[Event], gapMicros: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[Session]) =>
          // order within the batch; state carries the open session
          val sorted = evs.toSeq.sortBy(_.ts_micros)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_micros - s.end_micros <= gapMicros =>
                open = Some(s.copy(n_events = s.n_events + 1,
                  total_value = s.total_value + e.value,
                  end_micros = e.ts_micros))
              case Some(s) =>
                closed += s
                open = Some(Session(user, 1, e.value, e.ts_micros, e.ts_micros))
              case None =>
                open = Some(Session(user, 1, e.value, e.ts_micros, e.ts_micros))
            }
          }
          open match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          closed.result().iterator
      }
  }

  /** Batch-mode sessionization (same gap semantics, window functions):
    * the deterministic oracle for the streaming path and a useful batch
    * operator in its own right. One shuffle on user_id.
    */
  def sessionizeBatch(events: DataFrame, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_micros")
    events
      .withColumn("ts_micros", graft.EventTs.micros(events))
      .withColumn("prev_ts", lag("ts_micros", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts_micros") - col("prev_ts") > gapMicros, 1).otherwise(0))
      .withColumn("session_idx", sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).cast("int").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min("ts_micros").as("start_micros"),
        max("ts_micros").as("end_micros"))
  }
}
