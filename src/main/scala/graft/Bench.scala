package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Controlled-rerun support (SURVEY §6 protocol): a comma-separated
    // gate list runs ONLY those queries, still bracketed by both
    // anchors — the harness for attributing a flagged gate's move
    // without a 6-minute full pass. Unset (the driver's case) = all.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected = only match {
      case Some(s) => SparkEntry.queries.filter { case (k, _) => s(k) }
      case None => SparkEntry.queries
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-gate attribution counters: cumulative task GC time and
    // scheduler-side overhead (task duration minus executor run /
    // deserialize / result-serialize time). A gate whose wall time moves
    // while its gc+sched share moves with it drifted with the BOX, not
    // the code — the per-gate analogue of the two global anchors below.
    // Listener events can lag the blocking action by a beat, so a gate's
    // delta may smear slightly into its successor; attribution is for
    // diagnosis, not scoring, and the smear is noise at that granularity.
    val gcMsAcc = new AtomicLong(0L)
    val schedMsAcc = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && te.taskInfo != null) {
          gcMsAcc.addAndGet(m.jvmGCTime)
          val sched = te.taskInfo.duration - m.executorRunTime -
            m.executorDeserializeTime - m.resultSerializationTime
          if (sched > 0) schedMsAcc.addAndGet(sched)
        }
      }
    })
    // engine-assumption preflight (see EventTs.preflight)
    System.err.println(EventTs.preflight(spark, sfDir))
    // Untimed warmup pass: run every query once first so JVM JIT, Janino
    // codegen, encoder resolution, and parquet footer caches are hot before
    // measurement — the timed pass below reports steady-state throughput
    // (standard JMH/TPC methodology; cold-start is a fixed per-process cost,
    // not a per-query property of the engine).
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, sfDir).count() catch {
          case t: Throwable =>
            // the timed pass will record the failure; this line just
            // keeps the first diagnosis one run shorter
            System.err.println(s"[bench] warmup: $name threw " +
              s"${t.getClass.getSimpleName}: " +
              String.valueOf(t.getMessage).take(200))
        }
      }
    } catch { case t: Throwable =>
      System.err.println(s"[bench] warmup aborted: $t")
    }
    // SELF-CALIBRATION anchor: a fixed synthetic aggregate+join (pure
    // spark.range — no data dependency, no disk) timed in this same JVM.
    // Cross-round bench comparisons divide by it to cancel box-speed
    // drift — round 6's "1.43x regression" was environment, and proving
    // that took two controlled re-runs; this makes the harness answer it.
    def anchorOnce(): Double = {
      val t0 = System.nanoTime()
      val fact = spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("id % 100000 AS k", "(id * 2654435761) % 1000 AS v")
      val dim = spark.range(0L, 100000L, 1L, 8)
        .selectExpr("id AS k", "id % 7 AS w")
      fact.join(dim, "k")
        .selectExpr("k % 1024 AS g", "v * w AS x")
        .groupBy("g").sum("x").count()
      (System.nanoTime() - t0) / 1e9
    }
    // IO anchor: the CPU anchor cannot see fsync/metadata contention on
    // a shared box, but the streaming gates are state-store-commit bound
    // (many small writes + renames). Time exactly that access pattern —
    // 200 × 16 KiB create/write/force/rename/delete — so a round where
    // streaming gates drift while CPU gates hold can be attributed
    // without controlled re-runs.
    def anchorIoOnce(): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft_io_anchor")
      val buf = java.nio.ByteBuffer.wrap(Array.fill(16384)(7.toByte))
      val t0 = System.nanoTime()
      (0 until 200).foreach { i =>
        val tmp = dir.resolve(s"t$i")
        val ch = java.nio.channels.FileChannel.open(tmp,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        buf.rewind(); ch.write(buf); ch.force(true); ch.close()
        java.nio.file.Files.move(tmp, dir.resolve(s"f$i"))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      (0 until 200).foreach(i =>
        java.nio.file.Files.deleteIfExists(dir.resolve(s"f$i")))
      java.nio.file.Files.deleteIfExists(dir)
      dt
    }
    anchorOnce() // warm the anchor's own codegen before timing it
    anchorIoOnce()
    // two timed passes, best per query: single-run numbers on a shared box
    // carry GC/scheduler noise; the min is the steady-state capability.
    // SORTED execution order: the map's hash order shifts whenever a gate
    // is added, silently changing every query's predecessor (GC and page-
    // cache state) — round 6's two phantom "regressions" were exactly
    // that. Name order is stable across rounds, so per-query comparisons
    // stay like-for-like.
    // A thrown query must surface as a FAILURE, never as elapsed-to-throw:
    // round 7's 17 analysis-time breakages timed at ~0.06 s each and
    // IMPROVED the total. Failures record NaN here and are emitted in a
    // separate "failed" list (omitted from "queries" and the total).
    // (seconds, gcMsDelta, schedMsDelta) per gate — the counter deltas
    // bracket the same interval the wall clock does
    def timedPass(): Map[String, (Double, Long, Long)] =
      selected.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          val gc0 = gcMsAcc.get(); val sd0 = schedMsAcc.get()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
            }
          val sec = if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
          name -> ((sec, gcMsAcc.get() - gc0, schedMsAcc.get() - sd0))
      }.toMap
    val a1 = anchorOnce()
    val io1 = anchorIoOnce()
    val p1 = timedPass()
    val a2 = anchorOnce()
    val io2 = anchorIoOnce()
    val p2 = timedPass()
    val anchor = math.min(a1, a2)
    val anchorIo = math.min(io1, io2)
    // min of the two passes; NaN-poisoning keeps a query that failed in
    // EITHER pass out of the timed set (math.min(NaN, x) propagates only
    // via the explicit isNaN check — java's min returns NaN already, but
    // be explicit about the contract). Attribution follows the pass that
    // supplied the reported (min) time so gc/sched describe the same run.
    val all = p1.map { case (k, (v, g1, s1)) =>
      val (w, g2, s2) = p2(k)
      k -> (if (v.isNaN || w.isNaN) (Double.NaN, 0L, 0L)
            else if (v <= w) (v, g1, s1) else (w, g2, s2))
    }
    val failedQs = all.filter(_._2._1.isNaN).keys.toSeq.sorted
    val attrs = all.collect { case (k, (v, g, s)) if !v.isNaN => k -> (g, s) }
    val results = all.collect { case (k, (v, _, _)) if !v.isNaN => k -> v }
    // 4 decimals (0.1 ms): full doubles balloon the line past consumer
    // truncation limits (round 6 lost 103 of 169 timings that way)
    def fmt(v: Double): String = "%.4f".format(v)
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failedQs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-gate [gcMs, schedulerMs] for the reported run — integers and a
    // separate field so the "queries" consumer format stays untouched
    val attrJson = attrs.toSeq.sortBy(_._1)
      .map { case (k, (g, s)) => "\"" + k + s"\":[$g,$s]" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""anchor_sec":${fmt(anchor)},"anchor_io_sec":${fmt(anchorIo)},""" +
        s""""n_queries":${results.size},""" +
        s""""n_failed":${failedQs.size},"failed":$failedJson,""" +
        s""""queries":$qs,"attr":$attrJson,"sf":"$sfDir"}"""
    spark.stop()
    // emit AFTER spark.stop() on stdout, stderr, and a file: the consumer
    // greps one JSON line out of sbt+log4j noise, so redundancy is cheap
    // insurance against stream interleaving (round 1's line was lost)
    println(json)
    System.err.println(json)
    // a controlled-subset run must never masquerade as the round's
    // full bench artifact
    val outName = if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_LAST.json"
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outName), json)
    catch { case _: Throwable => }
  }
}
