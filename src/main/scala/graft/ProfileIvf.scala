package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the IvfPq persisted-index gate (round-13 task:
  * count jobs + commits in build and probe, warmed).
  */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val d = j.stageInfos.map(_.name.takeWhile(_ != '\n'))
          .mkString(" | ").take(120)
        starts.put(j.jobId, (j.time, d))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = starts.remove(j.jobId)
        if (st != null)
          descs.add(f"${(j.time - st._1) / 1000.0}%6.2fs  ${st._2}")
      }
    })
    def timed[T](tag: String)(f: => T): T = {
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get(); descs.clear()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(300)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] ${sec}%.2f s, jobs=${jobs.get() - j0}")
      if (sys.env.contains("PROFILE_JOBS")) {
        val it = descs.iterator()
        while (it.hasNext) println("  job: " + it.next())
      }
      r
    }
    args.drop(1).foreach { name =>
      val g = SparkEntry.queries(name)
      timed(s"$name cold")(g(spark, sfDir).count())
      timed(s"$name warm1")(g(spark, sfDir).count())
      timed(s"$name warm2")(g(spark, sfDir).count())
    }
    val q = SparkEntry.queries("q_sim_search_ivfpq_index")
    timed("gate cold")(q(spark, sfDir).count())
    timed("gate warm1")(q(spark, sfDir).count())
    descs.clear()
    timed("gate warm2")(q(spark, sfDir).count())
    val it = descs.iterator()
    while (it.hasNext) println("  job: " + it.next())
    // now the build itself, fresh path
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    timed("build")(graft.pipeline.Similarity.IvfPq.build(
      emb, "vec_id", "embedding", dim = 64, cells = 8, m = 8, kSub = 64))
    val idx2 = graft.pipeline.Similarity.IvfPq.build(
      emb, "vec_id", "embedding", dim = 64, cells = 8, m = 8, kSub = 64)
    val p2 = java.nio.file.Files.createTempDirectory("ivf_prof").toString
    timed("save")(graft.pipeline.Similarity.IvfPq.save(idx2, s"$p2/idx"))
    timed("probe")(graft.pipeline.Similarity.IvfPq.topKPersisted(
      spark, s"$p2/idx", emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", k = 1, nProbe = 2).count())
    val it2 = descs.iterator()
    while (it2.hasNext) println("  job: " + it2.next())
    spark.stop()
  }
}
