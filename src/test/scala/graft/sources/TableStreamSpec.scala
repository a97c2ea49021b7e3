package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The graft-table STREAMING SOURCE: version-log offsets, snapshot+delta
  * start modes, rate limiting, checkpoint restart, and the
  * schema-pinned-at-definition contract.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(tag: String): File = {
    val d = Files.createTempDirectory(s"graft_tstream_$tag").toFile
    d.deleteOnExit()
    d
  }

  private def baseDf: DataFrame =
    (0L until 20L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  /** Drain every available micro-batch of `stream` into collected rows,
    * tagged with the micro-batch id (foreachBatch, AvailableNow).
    */
  private def drain(stream: DataFrame, ckpt: String,
      sink: scala.collection.mutable.ArrayBuffer[(Long, Row)]): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        val rows = df.collect()
        sink.synchronized { sink ++= rows.map(r => (id, r)) }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def readTableStream(path: String,
      opts: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.readStream.format("graft-table").option("path", path)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("default start: full snapshot at current version, then deltas") {
    val base = freshBase("snap")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((3L, "name_3_v2", 333.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)

    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    val stream = readTableStream(path)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq ==
      Seq("id", "name", "score", "op"))
    drain(stream, ckpt, sink)

    // snapshot of v1: 20 rows, all op=+1, with the updated image of key 3
    assert(sink.size == 20)
    assert(sink.forall { case (_, r) => r.getAs[Int]("op") == 1 })
    assert(sink.exists { case (_, r) =>
      r.getAs[Long]("id") == 3L && r.getAs[String]("name") == "name_3_v2" })

    // a post-start commit arrives as its change feed: old@-1 + new@+1
    Merge.upsert(spark, path,
      Seq((5L, "name_5_v2", 555.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    sink.clear()
    drain(readTableStream(path), ckpt, sink)
    val byOp = sink.map(_._2).groupBy(_.getAs[Int]("op"))
    assert(byOp(1).map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
      == Seq((5L, "name_5_v2")))
    assert(byOp(-1).map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
      == Seq((5L, "name_5")))
  }

  test("startingVersion=0 replays the whole history; deletes emit -1") {
    val base = freshBase("replay")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((7L, "gone", 0.0, true), (50L, "name_50", 500.0, false))
        .toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))

    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, Map("startingVersion" -> "0")), ckpt, sink)
    // v0 snapshot (20 inserts) + v1 feed (delete 7 at -1, insert 50 at +1)
    assert(sink.size == 22)
    val net = sink.map(_._2)
      .groupBy(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
      .view.mapValues(_.map(_.getAs[Int]("op")).sum).toMap
    assert(net((7L, "name_7")) == 0)   // +1 snapshot, -1 delete
    assert(net((50L, "name_50")) == 1)
    // net fold == the live table
    val alive = net.filter(_._2 == 1).keySet.map(_._1)
    val expect = Merge.readKeyed(spark, path).select("id")
      .as[Long].collect().toSet
    assert(alive == expect)
  }

  test("startingTimestamp starts at the first commit at-or-after the " +
      "stamp; edges map to whole-history and tail-only") {
    val base = freshBase("ts")
    val path = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((100L, "c1", 1.0)).toDF("id", "name", "score"), "id", 4)
    Merge.upsert(spark, path,
      Seq((200L, "c2", 2.0)).toDF("id", "name", "score"), "id", 4)
    val (t0, t1, t2) = (Merge.commitTime(spark, path, 0),
      Merge.commitTime(spark, path, 1), Merge.commitTime(spark, path, 2))
    def drainFrom(opts: Map[String, String], tag: String): Seq[Long] = {
      val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
      drain(readTableStream(path, opts),
        new File(base, s"ckpt_$tag").getAbsolutePath, sink)
      sink.map(_._2.getAs[Long]("id")).sorted.toSeq
    }
    // exactly at t1: commits 1 and 2
    assert(drainFrom(Map("startingTimestamp" -> t1.toString), "at1")
      == Seq(100L, 200L))
    // strictly inside (t1, t2]: commit 2 only
    assert(drainFrom(Map("startingTimestamp" -> (t1 + 1).toString), "in12")
      == Seq(200L))
    // at or before the first commit: the whole history (v0 snapshot
    // semantics: 20 base rows + both deltas)
    assert(drainFrom(Map("startingTimestamp" -> t0.toString), "all")
      .size == 22)
    // beyond the head: tail-only — nothing replays, a later commit flows
    val fut = Map("startingTimestamp" -> (t2 + 60000L).toString)
    assert(drainFrom(fut, "fut").isEmpty)
    Merge.upsert(spark, path,
      Seq((300L, "c3", 3.0)).toDF("id", "name", "score"), "id", 4)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, fut),
      new File(base, "ckpt_fut").getAbsolutePath, sink)
    assert(sink.map(_._2.getAs[Long]("id")).toSeq == Seq(300L))
    // both start options at once: refused
    val err = intercept[Exception] {
      drainFrom(Map("startingTimestamp" -> t1.toString,
        "startingVersion" -> "0"), "both")
    }
    assert(err.getMessage.contains("at most one") ||
      Option(err.getCause).exists(_.getMessage.contains("at most one")))
  }

  test("startingVersion=latest skips history entirely") {
    val base = freshBase("latest")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, Map("startingVersion" -> "latest")),
      ckpt, sink)
    assert(sink.isEmpty)
    Merge.upsert(spark, path,
      Seq((100L, "new", 1.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    drain(readTableStream(path, Map("startingVersion" -> "latest")),
      ckpt, sink)
    assert(sink.map(_._2.getAs[Long]("id")).toSeq == Seq(100L))
  }

  test("maxVersionsPerTrigger paces a backlog one commit per batch") {
    val base = freshBase("rate")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    (1 to 3).foreach { i =>
      Merge.upsert(spark, path,
        Seq((100L + i, s"new_$i", i.toDouble)).toDF("id", "name", "score"),
        "id", nBuckets = 4)
    }
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, Map(
      "startingVersion" -> "latest", // base offset = v0? no: current=3
      "maxVersionsPerTrigger" -> "1")), ckpt, sink)
    assert(sink.isEmpty) // latest: backlog predates the stream

    // now a 3-commit backlog AFTER the checkpointed offset
    (4 to 6).foreach { i =>
      Merge.upsert(spark, path,
        Seq((100L + i, s"new_$i", i.toDouble)).toDF("id", "name", "score"),
        "id", nBuckets = 4)
    }
    drain(readTableStream(path, Map(
      "startingVersion" -> "latest",
      "maxVersionsPerTrigger" -> "1")), ckpt, sink)
    // 3 inserts, delivered in 3 distinct micro-batches (1 commit each)
    assert(sink.map(_._2.getAs[Long]("id")).sorted == Seq(104L, 105L, 106L))
    assert(sink.map(_._1).distinct.size == 3)
  }

  test("maxRowsPerTrigger splits a FAT COMMIT across triggers, " +
      "exactly-once preserved") {
    val base = freshBase("rowcap")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    // statsCols opts the manifest into per-file row counts — the
    // estimates the row cap admits on
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    // anchor the checkpoint FIRST (latest resolves at first start) so
    // the fat commit lands in the stream's future
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, Map(
      "startingVersion" -> "latest",
      "maxRowsPerTrigger" -> "25")), ckpt, sink)
    assert(sink.isEmpty)
    val anchor = Merge.currentVersion(spark, path)
    // ONE fat commit: 40 new keys spread over all 4 buckets
    Merge.upsert(spark, path,
      (100L until 140L).map(i => (i, s"fat_$i", i * 1.0))
        .toDF("id", "name", "score"),
      "id", nBuckets = 4)
    assert(Merge.currentVersion(spark, path) == anchor + 1)
    // every touched bucket's feed estimate is ~(5 old + 15 new) rows;
    // a 25-row cap admits at most two buckets per trigger, so the one
    // commit MUST span >= 2 micro-batches
    val units = Merge.commitBucketRows(spark, path, anchor + 1)
    assert(units.size == 4 && units.forall(_._2.isDefined),
      s"stats-backed table must estimate every bucket, got $units")
    drain(readTableStream(path, Map(
      "startingVersion" -> "latest",
      "maxRowsPerTrigger" -> "25")), ckpt, sink)
    assert(sink.map(_._2.getAs[Long]("id")).sorted
      == (100L until 140L).toSeq,
      "every inserted key exactly once across the split batches")
    assert(sink.forall(_._2.getAs[Int]("op") == 1))
    val batches = sink.map(_._1).distinct.size
    assert(batches >= 2,
      s"a 4-bucket fat commit under a 2-bucket row cap must split, " +
        s"got $batches batch(es)")
    // re-drain: the mid-commit offsets checkpointed and normalized —
    // nothing replays
    val before = sink.size
    drain(readTableStream(path, Map(
      "startingVersion" -> "latest",
      "maxRowsPerTrigger" -> "25")), ckpt, sink)
    assert(sink.size == before, "a drained stream must not replay")
    // and with a roomy cap the next fat commit lands in ONE batch
    Merge.upsert(spark, path,
      (200L until 220L).map(i => (i, s"fat2_$i", i * 1.0))
        .toDF("id", "name", "score"),
      "id", nBuckets = 4)
    val sink2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, Map(
      "startingVersion" -> "latest",
      "maxRowsPerTrigger" -> "100000")), ckpt, sink2)
    assert(sink2.map(_._2.getAs[Long]("id")).sorted
      == (200L until 220L).toSeq)
    assert(sink2.map(_._1).distinct.size == 1,
      "a roomy cap must not split")
  }

  test("maxRowsPerTrigger composes with maxVersionsPerTrigger and " +
      "survives a RESTART parked mid-commit") {
    import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
    val base = freshBase("rowcap2")
    val path = new File(base, "tbl").getAbsolutePath
    val meta = new File(base, "meta").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    // backlog: one fat commit + one slim commit
    Merge.upsert(spark, path,
      (300L until 340L).map(i => (i, s"a_$i", 1.0))
        .toDF("id", "name", "score"), "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((400L, "b", 2.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    // drive the SOURCE directly with a FRESH instance per step — every
    // micro-batch is a full stop/start, so the parked version:units
    // offset must round-trip the checkpoint json and resume exactly
    val params0 = Map("path" -> path, "startingVersion" -> "0",
      "maxRowsPerTrigger" -> "25", "maxVersionsPerTrigger" -> "1")
    var prev: Option[String] = None
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var batches = 0
    var sawMidCommitOffset = false
    var done = false
    while (!done && batches < 30) {
      val src = new GraftTableStreamProvider().createSource(
        spark.sqlContext, meta, None, "graft-table", params0)
        .asInstanceOf[GraftTableSource]
      val end = src.latestOffset(
        prev.map(j => new SerializedOffset(j): org.apache.spark.sql
          .connector.read.streaming.Offset).orNull,
        src.getDefaultReadLimit)
      if (prev.contains(end.json)) done = true
      else {
        if (end.json.contains(":")) sawMidCommitOffset = true
        val batch = src.batchFor(
          prev.map(GraftVersionOffset.parse),
          GraftVersionOffset.parse(end.json))
        got ++= batch.collect().map(r =>
          (r.getAs[Long]("id"), r.getAs[Int]("op")))
        prev = Some(end.json)
        batches += 1
      }
      src.stop()
    }
    assert(done, s"the backlog must drain, stuck after $batches batches")
    assert(sawMidCommitOffset,
      "a 25-row cap over a 4-bucket fat commit must park mid-commit")
    assert(batches >= 4,
      s"version cap (1) x row cap (25) must take >= 4 batches, " +
        s"got $batches")
    assert(got.map(_._1).sorted.toSeq ==
      ((0L until 20L) ++ (300L until 340L) ++ Seq(400L)).sorted,
      "the full history exactly once across restarts")
    assert(got.forall(_._2 == 1), "pure-insert history: all +1 images")
  }

  test("readChangeFeed emits Delta's CDF dialect: all-insert snapshot, " +
      "then per-commit labeled changes") {
    val base = freshBase("cdf")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    // v1: update key 3, delete key 7, insert key 50
    Merge.upsert(spark, path,
      Seq((3L, "name_3_v2", 333.0, false), (7L, "x", 0.0, true),
        (50L, "name_50", 500.0, false))
        .toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))

    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    val stream = readTableStream(path, Map("readChangeFeed" -> "true"))
    assert(stream.schema.fieldNames.toSeq == Seq("id", "name", "score",
      "_change_type", "_commit_version", "_commit_timestamp"))
    drain(stream, ckpt, sink)
    // opening snapshot of v1: every live row an insert stamped v1
    assert(sink.size == 20)
    assert(sink.forall { case (_, r) =>
      r.getAs[String]("_change_type") == "insert" &&
        r.getAs[Long]("_commit_version") == 1L &&
        r.getAs[java.sql.Timestamp]("_commit_timestamp") != null })
    assert(sink.exists(_._2.getAs[Long]("id") == 50L))
    assert(!sink.exists(_._2.getAs[Long]("id") == 7L))

    // a commit landing while the stream is down replays labeled:
    // update pre/post for key 5, delete for key 11
    Merge.upsert(spark, path,
      Seq((5L, "name_5_v2", 555.0, false), (11L, "x", 0.0, true))
        .toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))
    sink.clear()
    drain(readTableStream(path, Map("readChangeFeed" -> "true")),
      ckpt, sink)
    val labeled = sink.map(_._2).map(r => (r.getAs[Long]("id"),
      r.getAs[String]("name"), r.getAs[String]("_change_type"),
      r.getAs[Long]("_commit_version"))).sortBy(t => (t._1, t._3))
    assert(labeled == Seq(
      (5L, "name_5_v2", "update_postimage", 2L),
      (5L, "name_5", "update_preimage", 2L),
      (11L, "name_11", "delete", 2L)), s"got $labeled")
  }

  test("readChangeFeed composes with maxRowsPerTrigger: a sliced fat " +
      "commit never splits or misclassifies an update pair") {
    val base = freshBase("cdfcap")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    val opts = Map("readChangeFeed" -> "true",
      "startingVersion" -> "latest", "maxRowsPerTrigger" -> "12")
    drain(readTableStream(path, opts), ckpt, sink)
    assert(sink.isEmpty)
    // ONE fat commit updating every key — 40 change images over 4
    // buckets; a 12-row cap forces a multi-batch split
    Merge.upsert(spark, path,
      (0L until 20L).map(i => (i, s"v2_$i", i * 2.0))
        .toDF("id", "name", "score"),
      "id", nBuckets = 4)
    drain(readTableStream(path, opts), ckpt, sink)
    assert(sink.map(_._1).distinct.size >= 2,
      "a 4-bucket fat commit under a 12-row cap must split")
    // every key: exactly one preimage + one postimage, in the SAME batch
    val byKey = sink.groupBy(_._2.getAs[Long]("id"))
    assert(byKey.keySet == (0L until 20L).toSet)
    byKey.foreach { case (k, rows) =>
      val types = rows.map(_._2.getAs[String]("_change_type")).sorted
      assert(types == Seq("update_postimage", "update_preimage"),
        s"key $k labeled $types")
      assert(rows.map(_._1).distinct.size == 1,
        s"key $k's update pair split across batches ${rows.map(_._1)}")
    }
  }

  test("readChangeFeed rejects tables whose columns collide with the " +
      "CDF contract") {
    val base = freshBase("cdfcol")
    val path = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(
      (0L until 5L).map(i => (i, s"t_$i")).toDF("id", "_change_type"),
      path, "id", nBuckets = 2)
    val err = intercept[IllegalArgumentException] {
      readTableStream(path, Map("readChangeFeed" -> "true"))
    }
    assert(err.getMessage.contains("_change_type"))
  }

  test("checkpoint restart resumes at the stored version, no replays") {
    val base = freshBase("restart")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path), ckpt, sink)
    assert(sink.size == 20)
    sink.clear()
    // two commits while the stream is down; restart sees exactly those
    Merge.upsert(spark, path,
      Seq((200L, "a", 1.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((201L, "b", 2.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    drain(readTableStream(path), ckpt, sink)
    assert(sink.map(_._2.getAs[Long]("id")).sorted == Seq(200L, 201L))
    // idle restart: nothing re-emitted
    sink.clear()
    drain(readTableStream(path), ckpt, sink)
    assert(sink.isEmpty)
  }

  test("schema is pinned at definition: mid-stream column add flows, " +
      "new column invisible until restart") {
    val base = freshBase("evolve")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    val pinned = readTableStream(path) // 3 data cols + op
    drain(pinned, ckpt, sink)
    sink.clear()
    Merge.upsert(spark, path,
      Seq((300L, "c", 3.0, "en")).toDF("id", "name", "score", "lang"),
      "id", nBuckets = 4, allowEvolution = true)
    drain(pinned, ckpt, sink)
    val got = sink.map(_._2).filter(_.getAs[Int]("op") == 1)
    assert(got.map(_.getAs[Long]("id")) == Seq(300L))
    assert(!got.head.schema.fieldNames.contains("lang"))
    // a fresh stream (fresh checkpoint) sees the evolved schema
    val evolved = readTableStream(path)
    assert(evolved.schema.fieldNames.contains("lang"))
  }

  test("writeStream SINK: micro-batches fold as exactly-once keyed " +
      "upserts with tombstone deletes; checkpoint wipe replays as no-ops") {
    val base = freshBase("sink")
    val tbl = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, tbl, "id", nBuckets = 4) // ids 0..19, v0
    val inDir = new File(base, "in"); inDir.mkdirs()
    val ckpt = new File(base, "ckpt").getAbsolutePath
    def row(id: Long, name: String, score: Double, del: Boolean) =
      s"""{"id": $id, "name": "$name", "score": $score, "__del": $del}"""
    // batch 1: update id 3 + insert id 100; batch 2: delete id 7
    Files.writeString(new File(inDir, "b1.json").toPath,
      Seq(row(3, "upd3", 333.0, false),
        row(100, "new100", 1.0, false)).mkString("\n"))
    new File(inDir, "b1.json").setLastModified(1700000000000L)
    Files.writeString(new File(inDir, "b2.json").toPath,
      row(7, "name_7", 70.0, true))
    new File(inDir, "b2.json").setLastModified(1700000060000L)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, name STRING, score DOUBLE, __del BOOLEAN")
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.getAbsolutePath)
        .writeStream.format("graft-table").option("path", tbl)
        .option("appId", "sink-spec").option("tombstoneCol", "__del")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run()
    val afterV = Merge.currentVersion(spark, tbl)
    assert(afterV == 2L, s"two micro-batches = two commits, got v$afterV")
    val out = Merge.readKeyed(spark, tbl)
    assert(out.count() == 20) // 20 - deleted 7 + inserted 100
    assert(out.filter($"id" === 3L).select("name").as[String].head()
      == "upd3")
    assert(out.filter($"id" === 100L).count() == 1)
    assert(out.filter($"id" === 7L).count() == 0, "tombstone delete")
    // restart on the intact checkpoint, no new input: nothing commits
    run()
    assert(Merge.currentVersion(spark, tbl) == afterV)
    // checkpoint WIPED: the file source replays both batches from
    // scratch — the (appId, batchId) stamp makes each a no-op
    def rmTree(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree); f.delete(); ()
    }
    rmTree(new File(ckpt))
    run()
    assert(Merge.currentVersion(spark, tbl) == afterV,
      "replayed batches must be exactly-once no-ops")
    assert(Merge.readKeyed(spark, tbl).count() == 20)
    // a sink on a non-table path is refused loudly
    val e = intercept[Exception] {
      spark.readStream.schema(schema).json(inDir.getAbsolutePath)
        .writeStream.format("graft-table")
        .option("path", new File(base, "nope").getAbsolutePath)
        .option("checkpointLocation",
          new File(base, "ckpt2").getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start().awaitTermination(60000)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.contains("not a committed graft table"))))
  }

  test("applyChanges folds a change feed into a keyed table") {
    val base = freshBase("apply")
    val src = new File(base, "src").getAbsolutePath
    val rep = new File(base, "rep").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 4)
    Merge.writeKeyed(baseDf, rep, "id", nBuckets = 4) // replica at v0
    Merge.upsert(spark, src,
      Seq((3L, "upd", 333.0, false), (7L, "gone", 0.0, true),
        (50L, "new", 500.0, false)).toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))
    Merge.applyChanges(spark, rep, Merge.changesBetween(spark, src, 0L, 1L))
    val a = Merge.readKeyed(spark, src).orderBy("id").collect()
    val b = Merge.readKeyed(spark, rep).orderBy("id").collect()
    assert(a.sameElements(b))
    // ill-formed: two net-positive images for one key is refused
    import spark.implicits._
    val bad = Seq((3L, "x", 1.0, 1), (3L, "y", 2.0, 1))
      .toDF("id", "name", "score", "op")
    val e = intercept[IllegalArgumentException] {
      Merge.applyChanges(spark, rep, bad)
    }
    assert(e.getMessage.contains("net-positive"))
  }

  test("applyChanges: a batch whose images cancel (A→B then B→A) is a " +
      "no-op, not a delete") {
    import spark.implicits._
    val base = freshBase("cancel")
    val rep = new File(base, "rep").getAbsolutePath
    Merge.writeKeyed(baseDf, rep, "id", nBuckets = 4)
    val before = Merge.readKeyed(spark, rep).orderBy("id").collect()
    // a union of two per-commit feeds for key 3: update A→B, revert B→A.
    // every image of key 3 nets to zero — the key ends where it started,
    // so the fold must leave it alone (deleting it would diverge a
    // replica); key 9 is a genuine delete in the same batch
    val imgA = (3L, "name_3", 30.0)
    val imgB = (3L, "name_3_v2", 333.0)
    val feed = Seq(
      (imgA._1, imgA._2, imgA._3, -1), (imgB._1, imgB._2, imgB._3, 1),
      (imgB._1, imgB._2, imgB._3, -1), (imgA._1, imgA._2, imgA._3, 1),
      (9L, "name_9", 90.0, -1)
    ).toDF("id", "name", "score", "op")
    Merge.applyChanges(spark, rep, feed)
    val after = Merge.readKeyed(spark, rep).orderBy("id").collect()
    assert(after.length == before.length - 1, "only key 9 is deleted")
    val k3 = after.filter(_.getAs[Long]("id") == 3L)
    assert(k3.length == 1 && k3(0).getAs[String]("name") == "name_3",
      "the reverted key keeps its original image")
    assert(!after.exists(_.getAs[Long]("id") == 9L))
  }

  test("streaming replication: snapshot + commits + exactly-once replay") {
    val base = freshBase("repl")
    val src = new File(base, "src").getAbsolutePath
    val rep = new File(base, "rep").getAbsolutePath
    val ckpt = new File(base, "ckpt")
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 4)
    Merge.writeKeyed(baseDf.limit(0), rep, "id", nBuckets = 4) // empty
    def replicate(): Unit = {
      val q = readTableStream(src).writeStream
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Merge.applyChanges(spark, rep, b, txn = Some(("rep-test", id)))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    replicate() // snapshot lands
    assert(Merge.readKeyed(spark, rep).count() == 20)
    Merge.upsert(spark, src,
      Seq((3L, "upd", 333.0, false), (7L, "x", 0.0, true))
        .toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))
    replicate() // the commit flows
    val a = Merge.readKeyed(spark, src).orderBy("id").collect()
    assert(Merge.readKeyed(spark, rep).orderBy("id").collect()
      .sameElements(a))
    // the worst recovery path: checkpoint wiped, full replay
    val vBefore = Merge.currentVersion(spark, rep)
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(ckpt)
    replicate()
    assert(Merge.currentVersion(spark, rep) == vBefore,
      "replayed batches must no-op via the txn stamp")
    assert(Merge.readKeyed(spark, rep).orderBy("id").collect()
      .sameElements(a))
  }

  test("CDC replication in the CDF dialect: readChangeFeed stream -> " +
      "applyChangesCdf replica") {
    val base = freshBase("cdfrepl")
    val src = new File(base, "src").getAbsolutePath
    val rep = new File(base, "rep").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 4)
    Merge.writeKeyed(baseDf.limit(0), rep, "id", nBuckets = 4)
    def replicate(): Unit = {
      val q = readTableStream(src, Map("readChangeFeed" -> "true"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Merge.applyChangesCdf(spark, rep, b,
            txn = Some(("cdf-rep-test", id)))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    replicate() // the all-insert snapshot lands
    assert(Merge.readKeyed(spark, rep).count() == 20)
    // update + delete + insert while the stream is down
    Merge.upsert(spark, src,
      Seq((3L, "upd", 333.0, false), (7L, "x", 0.0, true),
        (50L, "new", 500.0, false))
        .toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))
    replicate()
    val a = Merge.readKeyed(spark, src).orderBy("id").collect()
    assert(Merge.readKeyed(spark, rep).orderBy("id").collect()
      .sameElements(a))
    // a replayed batch no-ops via the txn stamp even in the CDF dialect
    val vBefore = Merge.currentVersion(spark, rep)
    replicate()
    assert(Merge.currentVersion(spark, rep) == vBefore)
    // unknown labels fail loudly, never silently drop
    val bad = Seq((1L, "z", 0.0, "upsert"))
      .toDF("id", "name", "score", "_change_type")
    val err = intercept[Exception] {
      Merge.applyChangesCdf(spark, rep, bad)
    }
    assert(err.getMessage.contains("unknown _change_type") ||
      Option(err.getCause).exists(
        _.getMessage.contains("unknown _change_type")))
  }

  test("PROPERTY: per-commit applyChanges replays any random history") {
    val rnd = new scala.util.Random(20260814L)
    val base = freshBase("prop")
    val src = new File(base, "src").getAbsolutePath
    val rep = new File(base, "rep").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 4)
    Merge.writeKeyed(baseDf, rep, "id", nBuckets = 4)
    (1 to 6).foreach { v =>
      // each commit: random updates, deletes, inserts over a 40-key space
      val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
        val id = rnd.nextInt(40).toLong
        val del = rnd.nextInt(4) == 0
        (id, s"v${v}_$id", rnd.nextInt(1000).toDouble, del)
      }.groupBy(_._1).map(_._2.head).toSeq // one op per key per commit
      Merge.upsert(spark, src,
        rows.toDF("id", "name", "score", "__del"),
        "id", nBuckets = 4, tombstoneCol = Some("__del"))
      Merge.applyChanges(spark, rep,
        Merge.changesBetween(spark, src, v - 1L, v.toLong))
      val a = Merge.readKeyed(spark, src).orderBy("id").collect()
      val b = Merge.readKeyed(spark, rep).orderBy("id").collect()
      assert(a.sameElements(b), s"replica diverged after commit $v")
    }
  }

  test("a stream racing a live writer sees each commit exactly once") {
    val base = freshBase("race")
    val path = new File(base, "tbl").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    drain(readTableStream(path, Map("startingVersion" -> "latest")),
      ckpt, sink)
    // writer thread commits while the reader drains repeatedly; offsets
    // are committed versions, manifests are immutable — every insert
    // must arrive exactly once, in some batch, with none duplicated
    val writer = new Thread(() => {
      (1 to 8).foreach { i =>
        Merge.upsert(spark, path,
          Seq((1000L + i, s"w$i", i.toDouble)).toDF("id", "name", "score"),
          "id", nBuckets = 4)
        Thread.sleep(30)
      }
    })
    writer.start()
    while (writer.isAlive) {
      drain(readTableStream(path, Map("startingVersion" -> "latest")),
        ckpt, sink)
    }
    writer.join()
    drain(readTableStream(path, Map("startingVersion" -> "latest")),
      ckpt, sink)
    val got = sink.map(_._2.getAs[Long]("id")).sorted.toSeq
    assert(got == (1L to 8L).map(1000L + _),
      s"each commit exactly once, got $got")
  }

  test("op column collision is rejected, opCol renames it") {
    val base = freshBase("opcol")
    val path = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(
      Seq((1L, 5)).toDF("id", "op"), path, "id", nBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      readTableStream(path)
    }
    assert(e.getMessage.contains("op"))
    val renamed = readTableStream(path, Map("opCol" -> "_change"))
    assert(renamed.schema.fieldNames.toSeq == Seq("id", "op", "_change"))
  }

  test("a non-race anchor create failure fails loudly, not silently") {
    // If persisting the once-per-checkpoint anchor fails for any reason
    // OTHER than losing the create race (here: an injected FS fault),
    // the source must propagate the error — running on an unpersisted
    // anchor would let a restart re-resolve `latest` against the moved
    // table, violating the anchor contract.
    val base = freshBase("anchorfail")
    val path = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2)
    spark.sparkContext.hadoopConfiguration.setClass(
      "fs.faultyanchor.impl", classOf[FaultyAnchorFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    val meta = s"faultyanchor://${new File(base, "meta").getAbsolutePath}"
    val e = intercept[java.io.IOException] {
      new GraftTableStreamProvider().createSource(spark.sqlContext, meta,
        None, "graft-table", Map("path" -> path))
    }
    assert(e.getMessage.contains("injected anchor create failure"))
    // and nothing half-written: the anchor does not exist afterwards
    assert(!new File(new File(base, "meta"), "anchor").exists())
  }
}

/** Local FS that fails every `create` of a file named `anchor` — the
  * injection seam for the non-race anchor-persist failure test above.
  * Everything else (exists, mkdirs, open) behaves like the local disk.
  */
class FaultyAnchorFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("faultyanchor:///")
  // every RawLocalFileSystem create overload funnels through this seam
  override protected def createOutputStreamWithMode(
      f: org.apache.hadoop.fs.Path, append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission)
      : java.io.OutputStream = {
    if (f.getName == "anchor")
      throw new java.io.IOException("injected anchor create failure")
    super.createOutputStreamWithMode(f, append, permission)
  }
}
