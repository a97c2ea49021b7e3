package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read DELETE via deletion vectors: no data file rewritten,
  * every read path subtracts the vectors, compaction folds them,
  * vacuum reclaims them.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_dv_spec_$tag").toFile
    d.deleteOnExit()
    new File(d, "tbl").getAbsolutePath
  }

  private def dataFiles(path: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(path)).filter(f => f.getPath.contains("__bucket=") &&
        f.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  private def baseDf =
    (0L until 100L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  test("DV delete rewrites nothing; reads, time travel, lookup all agree") {
    val path = freshDir("basic")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 8,
      statsCols = Seq("id"))
    val before = dataFiles(path)
    val stats = Merge.deleteWhereDV(spark, path, $"id" % 10 === 3)
    assert(stats.rowsDeleted == 10 && stats.version == 1L)
    assert(dataFiles(path) == before,
      "a DV delete must not touch any data file")
    val cur = Merge.readKeyed(spark, path)
    assert(cur.count() == 90)
    assert(cur.filter($"id" % 10 === 3).count() == 0)
    // time travel: v0 still has every row
    assert(Merge.readVersion(spark, path, 0L).count() == 100)
    // point lookup resolves through the vectors too
    assert(Merge.lookupKey(spark, path, 13L).isEmpty)
    assert(Merge.lookupKey(spark, path, 14L).count() == 1)
    // skipping read: bounds-pruned scan still subtracts the vectors
    val got = Merge.readKeyedWhere(spark, path, $"id" >= 10 && $"id" <= 19)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (10L to 19L).filterNot(_ == 13L))
  }

  test("DV deletes stack; re-deleting deleted rows commits nothing") {
    val path = freshDir("stack")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" < 10)
    Merge.deleteWhereDV(spark, path, $"id" >= 90)
    assert(Merge.readKeyed(spark, path).count() == 80)
    // the find scan is DV-filtered: nothing matches, no commit
    val v = Merge.currentVersion(spark, path)
    val s2 = Merge.deleteWhereDV(spark, path, $"id" < 5)
    assert(s2.rowsDeleted == 0 && Merge.currentVersion(spark, path) == v)
  }

  test("upsert after DV: rewrite folds its bucket, re-insert revives a key") {
    val path = freshDir("upsert")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" % 10 === 3)
    // updating a DV-deleted key re-inserts it (the base merge reads
    // DV-filtered rows, the update lands as a fresh insert)
    Merge.upsert(spark, path,
      Seq((13L, "revived", 1.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    val cur = Merge.readKeyed(spark, path)
    assert(cur.count() == 91)
    assert(cur.filter($"id" === 13L).head().getAs[String]("name")
      == "revived")
    // keys deleted in other (un-rewritten) buckets stay deleted
    assert(cur.filter($"id" === 23L).isEmpty ||
      cur.filter($"id" === 23L).count() == 0)
  }

  test("the change feed emits DV deletes as -1 rows") {
    val path = freshDir("cdf")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" === 7L || $"id" === 8L)
    val feed = Merge.changesBetween(spark, path, 0L, 1L)
      .select("id", "op").as[(Long, Int)].collect().sorted.toSeq
    assert(feed == Seq((7L, -1), (8L, -1)))
    val dialect = Merge.changesBetweenCdf(spark, path, 0L, 1L)
      .select("id", "_change_type").as[(Long, String)].collect()
      .sorted.toSeq
    assert(dialect == Seq((7L, "delete"), (8L, "delete")))
  }

  test("compact folds the vectors; vacuum reclaims the sidecars") {
    val path = freshDir("fold")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" % 10 === 3)
    val preFold = Merge.readKeyed(spark, path).orderBy("id").collect()
    Merge.compactVersion(spark, path, targetFilesPerBucket = 1)
    assert(Merge.readKeyed(spark, path).orderBy("id").collect()
      .sameElements(preFold))
    Merge.vacuum(spark, path, keepVersions = 1)
    val dvDir = new File(path, "_graft_dv")
    def anyParquet(f: File): Boolean =
      f.exists() && (if (f.isDirectory) f.listFiles().exists(anyParquet)
        else f.getName.endsWith(".parquet"))
    assert(!anyParquet(dvDir),
      "folded vectors must be reclaimed once unreferenced")
    assert(Merge.readKeyed(spark, path).count() == 90)
  }

  test("vacuum keeps referenced sidecars, reclaims crashed orphans") {
    val path = freshDir("vac")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" < 10)
    // a crashed deleteWhereDV attempt: sidecar written, never committed.
    // Never-referenced files wait out the ORPHAN floor (they are
    // indistinguishable from an in-flight commit), so age it past it.
    val orphan = new File(path, "_graft_dv/orphan123")
    orphan.mkdirs()
    val of = new File(orphan, "part-0.parquet")
    Files.write(of.toPath, Array[Byte](1, 2, 3))
    of.setLastModified(
      System.currentTimeMillis() - Merge.DefaultOrphanGraceMs - 60000L)
    Merge.vacuum(spark, path, keepVersions = 2) // retains v0 and v1
    assert(!new File(orphan, "part-0.parquet").exists(),
      "the orphan sidecar must be reclaimed")
    assert(Merge.readKeyed(spark, path).count() == 90,
      "the referenced sidecar must survive")
  }
}
