package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone (zero-copy table fork, copy-on-write divergence,
  * materialization via compact) and version tags (immutable named
  * versions that survive vacuum).
  */
class CloneTagSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): File = {
    val d = Files.createTempDirectory(s"graft_clone_spec_$tag").toFile
    d.deleteOnExit()
    d
  }

  private def parquetFilesUnder(dir: String): Seq[String] = {
    val root = new File(dir)
    if (!root.exists()) Seq.empty
    else {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(_.getPath).filter(_.endsWith(".parquet"))
    }
  }

  private def baseDf =
    (0L until 100L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  test("clone refuses overlapping src/dst — a self-clone would delete " +
      "the source before referencing it") {
    val d = freshDir("guard")
    val src = new File(d, "src").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 4)
    for (dst <- Seq(src, new File(src, "nested").getAbsolutePath,
        d.getAbsolutePath)) {
      val e = intercept[IllegalArgumentException] {
        Merge.cloneTable(spark, src, dst)
      }
      assert(e.getMessage.contains("overlaps"))
    }
    // the source survived every refused attempt
    assert(Merge.readKeyed(spark, src).count() == 100)
  }

  test("clone of a source rooted under a directory named __bucket=N " +
      "still routes buckets by the file's parent dir") {
    // foreign refs are absolute; an ancestor path segment that happens
    // to be called __bucket=5 must not hijack bucket resolution
    val d = freshDir("bseg")
    val src = new File(new File(d, "__bucket=5"), "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8, statsCols = Seq("id"))
    Merge.cloneTable(spark, src, dst)
    val a = Merge.readKeyed(spark, src).orderBy("id").collect()
    val b = Merge.readKeyed(spark, dst).orderBy("id").collect()
    assert(a.sameElements(b))
    // copy-on-write on the clone touches the RIGHT bucket: the updated
    // key must come back updated, others untouched
    val stats = Merge.upsert(spark, dst,
      Seq((7L, "clone_7", 777.0)).toDF("id", "name", "score"),
      "id", nBuckets = 8)
    assert(stats.bucketsTouched == 1)
    val out = Merge.readKeyed(spark, dst)
    assert(out.filter($"id" === 7L).select("name").as[String].head() ==
      "clone_7")
    assert(out.count() == 100)
    // and point lookup (stats-pruned) resolves on the clone
    val row = Merge.lookupKey(spark, dst, 13L).collect()
    assert(row.length == 1 && row(0).getAs[String]("name") == "name_13")
  }

  test("clone is zero-copy and reads the source image") {
    val d = freshDir("zc")
    val src = new File(d, "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8,
      statsCols = Seq("id"))
    Merge.cloneTable(spark, src, dst)
    assert(parquetFilesUnder(dst).isEmpty, "a shallow clone moves no data")
    assert(Merge.currentVersion(spark, dst) == 0L)
    val a = Merge.readKeyed(spark, src).orderBy("id").collect()
    val b = Merge.readKeyed(spark, dst).orderBy("id").collect()
    assert(a.sameElements(b))
    // layout carried: lookupKey prunes and answers on the clone
    val row = Merge.lookupKey(spark, dst, 7L).collect()
    assert(row.length == 1 && row(0).getAs[String]("name") == "name_7")
  }

  test("clone and source diverge independently, copy-on-write") {
    val d = freshDir("div")
    val src = new File(d, "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8)
    Merge.cloneTable(spark, src, dst)
    val stats = Merge.upsert(spark, dst,
      Seq((7L, "clone_7", 777.0)).toDF("id", "name", "score"),
      "id", nBuckets = 8)
    assert(stats.bucketsTouched == 1)
    // the clone wrote ONLY its touched bucket locally
    assert(parquetFilesUnder(dst).nonEmpty &&
      parquetFilesUnder(dst).size <= 1)
    // source unchanged, at its own version
    assert(Merge.currentVersion(spark, src) == 0L)
    assert(Merge.readKeyed(spark, src).filter($"id" === 7L)
      .head().getAs[String]("name") == "name_7")
    assert(Merge.readKeyed(spark, dst).filter($"id" === 7L)
      .head().getAs[String]("name") == "clone_7")
    // and the other way: source moves, clone pinned to its image
    Merge.upsert(spark, src,
      Seq((8L, "src_8", 888.0)).toDF("id", "name", "score"),
      "id", nBuckets = 8)
    assert(Merge.readKeyed(spark, dst).filter($"id" === 8L)
      .head().getAs[String]("name") == "name_8")
    assert(Merge.readKeyed(spark, dst).count() == 100)
  }

  test("clone of a diverged clone resolves refs across both roots") {
    val d = freshDir("cc")
    val src = new File(d, "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    val dst2 = new File(d, "dst2").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8)
    Merge.cloneTable(spark, src, dst)
    Merge.upsert(spark, dst,
      Seq((7L, "clone_7", 777.0)).toDF("id", "name", "score"),
      "id", nBuckets = 8)
    Merge.cloneTable(spark, dst, dst2)
    assert(parquetFilesUnder(dst2).isEmpty)
    val a = Merge.readKeyed(spark, dst).orderBy("id").collect()
    val b = Merge.readKeyed(spark, dst2).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("compactVersion materializes the clone; source can then vanish") {
    val d = freshDir("mat")
    val src = new File(d, "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8)
    Merge.cloneTable(spark, src, dst)
    Merge.compactVersion(spark, dst, targetFilesPerBucket = 1)
    Merge.vacuum(spark, dst, keepVersions = 1)
    // every live ref is now local: deleting the SOURCE tree entirely
    // must not affect the clone
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new File(src))
    assert(Merge.readKeyed(spark, dst).count() == 100)
    assert(Merge.readKeyed(spark, dst).filter($"id" === 3L)
      .head().getAs[String]("name") == "name_3")
  }

  test("clone carries stats: skipping reads prune on the clone") {
    val d = freshDir("skip")
    val src = new File(d, "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8,
      statsCols = Seq("score"))
    Merge.cloneTable(spark, src, dst)
    val (sel, total) = Merge.planVersionFiles(spark, dst, 0L,
      Seq(Skipping.Bound("score", Some(955.0), None)))
    assert(total > 0 && sel.size < total,
      s"stats must prune on the clone: $sel of $total")
    val got = Merge.readKeyedWhere(spark, dst, $"score" >= 955.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (96L until 100L).toSeq)
  }

  test("tags: immutable names, survive vacuum, die with deleteTag") {
    val d = freshDir("tags")
    val path = new File(d, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.tagVersion(spark, path, "initial", 0L)
    intercept[IllegalArgumentException] {
      Merge.tagVersion(spark, path, "initial", 0L) // repoint refused
    }
    intercept[IllegalArgumentException] {
      Merge.tagVersion(spark, path, "bad name", 0L)
    }
    Merge.upsert(spark, path,
      Seq((1L, "v1", 1.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((2L, "v2", 2.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    assert(Merge.tags(spark, path).as[(String, Long)].collect().toSeq ==
      Seq(("initial", 0L)))
    Merge.vacuum(spark, path, keepVersions = 1)
    // untagged v1 is gone...
    intercept[Exception] { Merge.readVersion(spark, path, 1L).collect() }
    // ...but the tagged v0 still answers, fully
    val v0 = Merge.readTag(spark, path, "initial")
    assert(v0.count() == 100)
    assert(v0.filter($"id" === 1L).head().getAs[String]("name") == "name_1")
    // drop the tag: the next vacuum reclaims v0
    Merge.deleteTag(spark, path, "initial")
    Merge.vacuum(spark, path, keepVersions = 1)
    intercept[Exception] { Merge.readVersion(spark, path, 0L).collect() }
    intercept[IllegalArgumentException] {
      Merge.readTag(spark, path, "initial")
    }
  }

  test("Delta-dialect CDF labels per-commit changes and stamps versions") {
    val d = freshDir("cdfd")
    val path = new File(d, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((3L, "upd", 333.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    Merge.upsert(spark, path,
      Seq((7L, "x", 0.0, true), (150L, "new", 500.0, false))
        .toDF("id", "name", "score", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))
    val feed = Merge.changesBetweenCdf(spark, path, 0L, 2L)
      .select("id", "name", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(feed == Seq(
      (3L, "name_3", "update_preimage", 1L),
      (3L, "upd", "update_postimage", 1L),
      (7L, "name_7", "delete", 2L),
      (150L, "new", "insert", 2L)))
    // commit timestamps ride along and are strictly increasing
    val ts = Merge.changesBetweenCdf(spark, path, 0L, 2L)
      .select("_commit_version", "_commit_timestamp").distinct()
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._1)
    assert(ts.length == 2 && ts(0)._2.before(ts(1)._2))
  }

  test("nested types round-trip: array and struct columns through " +
      "writeKeyed, upsert, time travel, and the change feed") {
    val d = freshDir("nested")
    val path = new File(d, "tbl").getAbsolutePath
    val base = (0L until 10L).map(i =>
      (i, Seq(i * 1.0f, i * 2.0f), (s"n_$i", i.toInt)))
      .toDF("id", "vec", "meta")
    Merge.writeKeyed(base, path, "id", nBuckets = 2)
    val up = Seq((3L, Seq(9.0f, 9.0f), ("upd", 99)))
      .toDF("id", "vec", "meta")
    Merge.upsert(spark, path, up, "id", nBuckets = 2)
    val cur = Merge.readKeyed(spark, path)
    assert(cur.count() == 10)
    val r3 = cur.filter($"id" === 3L).head()
    assert(r3.getSeq[Float](r3.fieldIndex("vec")).toSeq == Seq(9.0f, 9.0f))
    assert(r3.getAs[org.apache.spark.sql.Row]("meta").getString(0) == "upd")
    // the pre-upsert version still reads the old nested values
    val v0 = Merge.readVersion(spark, path, 0L).filter($"id" === 3L).head()
    assert(v0.getAs[org.apache.spark.sql.Row]("meta").getString(0) == "n_3")
    // the change feed carries the nested images intact
    val ops = Merge.changesBetween(spark, path, 0L, 1L)
      .select("id", "op").as[(Long, Int)].collect().sorted.toSeq
    assert(ops == Seq((3L, -1), (3L, 1)))
  }

  test("tag on the source fences vacuum away from a clone's files") {
    val d = freshDir("fence")
    val src = new File(d, "src").getAbsolutePath
    val dst = new File(d, "dst").getAbsolutePath
    Merge.writeKeyed(baseDf, src, "id", nBuckets = 8)
    Merge.cloneTable(spark, src, dst) // clone of v0
    Merge.tagVersion(spark, src, "cloned", 0L)
    // source churns past v0 and vacuums hard
    Merge.upsert(spark, src,
      Seq((0L, "x", 0.0)).toDF("id", "name", "score"), "id", nBuckets = 8)
    Merge.vacuum(spark, src, keepVersions = 1)
    // the clone still reads v0's files — the tag kept them alive
    assert(Merge.readKeyed(spark, dst).count() == 100)
    assert(Merge.readKeyed(spark, dst).filter($"id" === 0L)
      .head().getAs[String]("name") == "name_0")
  }
}
