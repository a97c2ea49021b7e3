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
}
