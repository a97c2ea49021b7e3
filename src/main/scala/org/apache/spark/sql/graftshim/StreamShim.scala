package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway a v1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * needs: `MicroBatchExecution` asserts that the DataFrame a source's
  * `getBatch` returns carries `isStreaming = true`, and the only way to
  * stamp an arbitrary (join/union/diff-shaped) batch plan with that flag
  * is `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * That method is `private[sql]`, so this object lives in an
  * `org.apache.spark.sql.*` subpackage — the standard connector
  * technique (Spark's own Kafka source accesses the same API from
  * `org.apache.spark.sql.kafka010`). Nothing else in the engine imports
  * Spark internals this way; keep it that way.
  */
object StreamShim {

  /** Re-issue `df`'s physical plan as a streaming-flagged DataFrame with
    * the same schema. The underlying RDD is planned now but computed
    * only when the micro-batch runs.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    val ss = cdf.sparkSession.asInstanceOf[ClassicSession]
    ss.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse doorway, for a v1 streaming
    * [[org.apache.spark.sql.execution.streaming.Sink]]: the DataFrame
    * `addBatch` receives is still streaming-flagged, so feeding it to
    * an ordinary multi-action batch computation (a keyed merge) trips
    * the "streaming sources must be executed with writeStream" check.
    * Pin the micro-batch's rows ONCE (copy + cache — the incremental
    * plan must not re-execute per downstream job) and re-issue them as
    * a plain batch frame; `unpin` releases the cache after the fold.
    */
  def pinBatch(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    val ss = cdf.sparkSession.asInstanceOf[ClassicSession]
    val rdd = cdf.queryExecution.toRdd.map(_.copy()).cache()
    (ss.internalCreateDataFrame(rdd, df.schema, isStreaming = false),
      rdd)
  }
}
