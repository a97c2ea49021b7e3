package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Action-level profiler for one or more gates: runs each named query
  * (warm, second run reported) and prints every Spark ACTION's wall ms
  * with the head of its executed plan — the "where inside the lifecycle
  * does the time go" view (guide §1.1). Driver-side gaps (planning,
  * manifest IO, listings) are whatever the action list does not cover.
  */
object ProfileJobs {
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
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    def planHead(qe: QueryExecution): String = {
      val p = qe.executedPlan
      def leaves(s: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        s.collectLeaves().map(_.nodeName).distinct
      val scans = try qe.sparkPlan.collectLeaves().map { l =>
        val s = l.simpleString(200)
        val f = s.indexOf("Location")
        if (f >= 0) s.substring(f).take(80) else l.nodeName.take(40)
      }.distinct.take(3).mkString(" | ") catch { case _: Throwable => "?" }
      s"${p.nodeName.take(40)}  <- $scans"
    }
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        lines.add((System.nanoTime(),
          f"    ${ns / 1e6}%8.1f ms  $fn%-18s ${planHead(qe).take(150)}"))
      override def onFailure(fn: String, qe: QueryExecution,
          e: Exception): Unit = ()
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case t: Throwable =>
        System.err.println(s"warm $name: $t") }
      Thread.sleep(500)
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(f"\n==== $name warm wall=$wall%6.2f s ====")
      val ls = lines.toArray(Array.empty[(Long, String)]).sortBy(_._1)
      ls.foreach(l => println(l._2))
      val actMs = ls.map(_._2.trim.split(" ").head.toDouble).sum
      println(f"    sum(action wall) = ${actMs / 1000}%6.2f s  " +
        f"(driver-side remainder = ${wall - actMs / 1000}%6.2f s)")
    }
    spark.stop()
  }
}
