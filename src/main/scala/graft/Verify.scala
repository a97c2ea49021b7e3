package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only — the driver passes 2):
    // comma-separated query names to dump, instead of all of them
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // no-op on Spark 4.x (events.parquet is TIMESTAMP(MICROS) now) but
      // restores the legacy long-nanos read if the data ever reverts to
      // TIMESTAMP(NANOS); EventTs handles either dtype
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine-assumption preflight: if the environment shifts under the
    // repo again (round 7: ts dtype), the run's first line says so
    System.err.println(EventTs.preflight(spark, sfDir))
    new java.io.File(outDir).mkdirs()
    // Per-query run health (r18): wall seconds + cumulative task GC —
    // the bench's attribution seam, carried into the correctness run
    // so a judge can see whether a slow correctness pass was code or
    // box without a separate bench (VERDICT r17 item 8).
    val gcMsAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) gcMsAcc.addAndGet(te.taskMetrics.jvmGCTime)
      })
    // a dump failure must be LOUD: round 7's driver silently omitted
    // failed queries from CORRECTNESS, so 17 breakages read as a green
    // round. Collect name → error and publish _failed.json beside
    // oracle_sql.json (empty object when all dumps succeed).
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val timings =
      scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val gc0 = gcMsAcc.get(); val t0 = System.nanoTime()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      timings(name) =
        ((System.nanoTime() - t0) / 1e9, gcMsAcc.get() - gc0)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
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
    Files.writeString(Paths.get(s"$outDir/_failed.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    // per-query {sec, gc_ms}: beside the dump for the driver AND as a
    // repo artifact (the outDir is ephemeral; BENCH_LAST.json precedent)
    val tJson = timings
      .map { case (k, (s, g)) =>
        s"${q(k)}: {" + "\"sec\":" + "%.4f".format(s) +
          s""","gc_ms":$g}"""
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_timings.json"), tJson)
    if (only.isEmpty) // partial local probes must not pose as the round's run
      try Files.writeString(Paths.get("VERIFY_TIMINGS.json"), tJson)
      catch { case _: Throwable => }
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} FAILED dumps: ${failed.keys.mkString(",")}")
    spark.stop()
  }
}
