package graft
import org.apache.spark.sql.SparkSession

// scratch probe for round-4 timing checks; deleted before commit
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.drop(1) match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("q_stream_join_outer", "q_stream_dedup_wm", "q_multimodal_ann")
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm + timed
      val r0 = fn(spark, sfDir).collect()
      val t0 = System.nanoTime()
      val r = fn(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $n rows=${r.length} warmRows=${r0.length} time=$dt%.2f s")
      r.take(8).foreach(x => println(s"  $x"))
    }
    spark.stop()
  }
}
