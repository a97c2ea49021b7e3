package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Selective-verification utility: dumps the NAMED gate queries' results
  * (parquet) plus oracle_sql.json so a DuckDB compare can check a handful
  * of gates in seconds instead of re-running the full Verify sweep.
  * Usage: runMain graft.Probe <sfDir> <outDir> q1 q2 ...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$n")
        println(f"PROBE $n ok ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        println(s"PROBE $n FAILED: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
