package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-aware adapter for the events table's `ts` column.
  *
  * The driver's events.parquet has shipped with two physical types across
  * environments: parquet TIMESTAMP(NANOS), which Spark <4.1 (with
  * `spark.sql.legacy.parquet.nanosAsLong`) surfaced as epoch-nano LONGs,
  * and parquet TIMESTAMP(MICROS) without timezone, which Spark 4.x reads
  * natively as TIMESTAMP_NTZ. Every consumer derives event time through
  * this one object instead of assuming a dtype, so the next environment
  * shift changes ONE match — not seventeen query gates (the round-7
  * regression: every raw `ts div 1000` site threw DATATYPE_MISMATCH at
  * analysis time once the legacy conf became a no-op).
  *
  * All engine sessions run with `spark.sql.session.timeZone=UTC`, so the
  * NTZ→TIMESTAMP cast is instant-preserving (naive wall clock == UTC) and
  * `unix_micros` of it is exact epoch micros. Works on batch AND streaming
  * DataFrames (only `df.schema` is consulted, never an action).
  */
object EventTs {

  def dataType(df: DataFrame, tsCol: String = "ts"): DataType =
    df.schema(tsCol).dataType

  /** Epoch-micros LONG derivation of the ts column — the engine's shared
    * cross-engine unit (DuckDB oracles read the same files at micro
    * precision via `epoch_ns(ts) // 1000`).
    */
  def micros(df: DataFrame, tsCol: String = "ts"): Column =
    dataType(df, tsCol) match {
      // integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceeds 2^53, a
      // double division would round the low digits away
      case LongType         => expr(s"$tsCol div 1000")
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case TimestampType    => unix_micros(col(tsCol))
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported dtype $other")
    }

  /** Native TimestampType event-time column — for window()/watermarks and
    * calendar functions (year/day/date_trunc).
    */
  def time(df: DataFrame, tsCol: String = "ts"): Column =
    dataType(df, tsCol) match {
      case LongType         => timestamp_micros(expr(s"$tsCol div 1000"))
      case TimestampNTZType => col(tsCol).cast(TimestampType)
      case TimestampType    => col(tsCol)
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported dtype $other")
    }

  /** A literal comparable against the RAW ts column, in the column's own
    * dtype — so range predicates stay on the stored column and push down
    * to parquet row-group stats (a derived-column bound never prunes).
    * The instant is given in epoch nanos (the unit the gate cuts were
    * authored in).
    */
  def atNanos(df: DataFrame, epochNanos: Long,
      tsCol: String = "ts"): Column = {
    val sec = Math.floorDiv(epochNanos, 1000000000L)
    val nano = Math.floorMod(epochNanos, 1000000000L)
    dataType(df, tsCol) match {
      case LongType => lit(epochNanos)
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.ofEpochSecond(sec, nano.toInt,
          java.time.ZoneOffset.UTC))
      case TimestampType =>
        lit(java.time.Instant.ofEpochSecond(sec, nano))
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported dtype $other")
    }
  }

  /** One-line engine-assumption report for the harness preflight: if the
    * environment shifts the events schema again, the round's first
    * artifact says so instead of seventeen gates silently vanishing.
    */
  def preflight(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = {
    val ts = try {
      spark.read.parquet(s"$sfDir/events.parquet")
        .schema("ts").dataType.simpleString
    } catch { case e: Throwable => s"UNREADABLE(${e.getClass.getSimpleName})" }
    // catalog lookup, NOT parseExpression: parsing builds an unresolved
    // function without consulting the registry, so it cannot fail
    val ext =
      if (spark.catalog.functionExists("multi_contains")) "registered"
      else "MISSING"
    s"[graft-preflight] spark=${spark.version} events.ts=$ts " +
      s"extensions=$ext tz=${spark.conf.get("spark.sql.session.timeZone")}"
  }
}
