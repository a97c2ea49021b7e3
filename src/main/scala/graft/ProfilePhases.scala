package graft

import org.apache.spark.sql.SparkSession

/** Split per-query wall time into plan/build, physical planning, and
  * execution, twice, for named queries.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"PHASES $name%-24s r$round build=${(t1 - t0) / 1e9}%5.2f plan=${(t2 - t1) / 1e9}%5.2f exec=${(t3 - t2) / 1e9}%5.2f")
      }
    }
    spark.stop()
  }
}
