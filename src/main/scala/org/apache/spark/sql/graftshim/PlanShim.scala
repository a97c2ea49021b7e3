package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.ColumnarRule

/** Accessibility-only (like [[ParquetReadShim]]): the `private[sql]`
  * session-state reads the graft planner hooks need. No behavior.
  */
object PlanShim {

  /** The session's installed columnar rules — what lets a scan ask
    * "is the graft sort-restore rule active in THIS session?" before
    * making an ordering claim that only that rule keeps sound.
    */
  def columnarRules(spark: SparkSession): Seq[ColumnarRule] =
    spark.asInstanceOf[ClassicSession].sessionState.columnarRules
}
