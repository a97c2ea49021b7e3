package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: runs each named query twice in one session
  * and prints (first, second) wall seconds. A large first/second gap means
  * the query is plan-compile-bound (Catalyst + Janino), not execution-bound
  * — the two need different remedies.
  */
object Profile {
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
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); val b = once()
      println(f"PROFILE $name%-28s first=$a%6.2f second=$b%6.2f")
    }
    spark.stop()
  }
}
