package graft

import org.apache.spark.sql.SparkSession

/** Measures the driver-side cost of `spark.read.parquet` plan setup
  * (file listing + footer schema inference) per call — the fixed
  * overhead every gate pays per base-table reference.
  */
object ProfileRead {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("orders", "lineitem", "customer", "part", "supplier",
      "events", "documents", "embeddings")
    // warm
    tables.foreach(n => spark.read.parquet(s"$sfDir/$n.parquet").schema)
    (1 to 3).foreach { round =>
      val t0 = System.nanoTime()
      tables.foreach { n =>
        spark.read.parquet(s"$sfDir/$n.parquet").schema
      }
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"round $round: ${tables.size} reads, ${dt}%8.1f ms total, " +
        f"${dt / tables.size}%6.1f ms/read")
    }
    // and the analysis cost of a trivial query on a fresh read vs reused
    val t1 = System.nanoTime()
    (1 to 20).foreach { _ =>
      spark.read.parquet(s"$sfDir/orders.parquet")
        .filter("o_orderkey > 0").queryExecution.executedPlan
    }
    println(f"fresh read+plan x20: ${(System.nanoTime() - t1) / 1e6}%8.1f ms")
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val t2 = System.nanoTime()
    (1 to 20).foreach { _ =>
      df.filter("o_orderkey > 0").queryExecution.executedPlan
    }
    println(f"reused read+plan x20: ${(System.nanoTime() - t2) / 1e6}%8.1f ms")
    spark.stop()
  }
}
