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
}
