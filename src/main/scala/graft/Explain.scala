package graft
import org.apache.spark.sql.SparkSession
/** Plan audit utility: prints formatted physical plans for selected
  * SparkEntry queries (pushdown / broadcast / codegen inspection).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { q =>
      println(s"\n========== $q ==========")
      try SparkEntry.queries(q)(spark, dir).explain("formatted")
      catch { case t: Throwable =>
        println(s"EXPLAIN FAILED: ${t.getClass.getSimpleName}: " +
          String.valueOf(t.getMessage).take(300))
      }
    }
    spark.stop()
  }
}
