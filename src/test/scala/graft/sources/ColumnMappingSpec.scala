package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column mapping (Delta's name mode): rename/drop are metadata-only
  * commits; files always store physical names; every version reads
  * under its OWN mapping.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_colmap_$tag").toFile
    d.deleteOnExit()
    new File(d, "tbl").getAbsolutePath
  }

  private def baseDf =
    (0L until 100L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  private def dataFiles(path: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(path)).filter(_.getName.endsWith(".parquet"))
      .filterNot(_.getPath.contains("_graft_log"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("rename is metadata-only; each version reads under its own " +
      "mapping; writes after the rename merge correctly") {
    val path = freshDir("ren")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id", "score"))
    val before = dataFiles(path)
    Merge.renameColumn(spark, path, "score", "points")
    assert(dataFiles(path) == before, "rename must touch NO data file")
    val cur = Merge.readKeyed(spark, path)
    assert(cur.columns.toSeq == Seq("id", "name", "points"))
    assert(cur.filter($"id" === 7L).select("points").as[Double].head()
      == 70.0)
    // pre-rename version answers with the OLD name
    val v0 = Merge.readVersion(spark, path, 0L)
    assert(v0.columns.toSeq == Seq("id", "name", "score"))
    // an upsert AFTER the rename speaks the new name; merged rows from
    // pre-rename files come back correctly under it
    Merge.upsert(spark, path,
      Seq((7L, "name_7", 777.0), (200L, "new", 2.0))
        .toDF("id", "name", "points"),
      "id", nBuckets = 4)
    val after = Merge.readKeyed(spark, path)
    assert(after.count() == 101)
    assert(after.filter($"id" === 7L).select("points").as[Double].head()
      == 777.0)
    assert(after.filter($"id" === 8L).select("points").as[Double].head()
      == 80.0)
    // stats followed the rename: a bound OUTSIDE the global range
    // prunes EVERY file — possible only if each file's recorded stats
    // matched under the NEW logical name (unmatched stats keep files
    // conservatively)
    val (sel, total) = Merge.planVersionFiles(spark, path,
      Merge.currentVersion(spark, path),
      Seq(Skipping.Bound("points", Some(100000.0), Some(100001.0))))
    assert(sel.isEmpty && total == 4,
      s"renamed stats col must prune all: $sel/$total")
    // lookupKey still routes (key untouched) and returns logical names
    val row = Merge.lookupKey(spark, path, 8L).collect()
    assert(row.length == 1 && row(0).getAs[Double]("points") == 80.0)
  }

  test("rename of the BUCKETING KEY: layout follows, lookups and " +
      "upserts speak the new name") {
    val path = freshDir("renkey")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.renameColumn(spark, path, "id", "doc_id")
    assert(Merge.tableLayout(spark, path).get._1 == "doc_id")
    val stats = Merge.upsert(spark, path,
      Seq((7L, "upd", 1.0)).toDF("doc_id", "name", "score"),
      "doc_id", nBuckets = 4)
    assert(stats.bucketsTouched == 1)
    val row = Merge.lookupKey(spark, path, 7L).collect()
    assert(row.length == 1 && row(0).getAs[String]("name") == "upd")
    // the old key name is simply gone
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((1L, "x", 1.0)).toDF("id", "name", "score"), "id", 4)
    }
    assert(e.getMessage.contains("layout"))
  }

  test("change feed across a rename aligns on logical names") {
    val path = freshDir("cdf")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)          // v0
    Merge.renameColumn(spark, path, "score", "points")           // v1
    Merge.upsert(spark, path,
      Seq((3L, "name_3", 333.0)).toDF("id", "name", "points"),
      "id", nBuckets = 4)                                        // v2
    val feed = Merge.changesBetween(spark, path, 1L, 2L)
    assert(feed.columns.contains("points"))
    val rows = feed.orderBy("op").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("op") == -1 &&
      rows(0).getAs[Double]("points") == 30.0)
    assert(rows(1).getAs[Int]("op") == 1 &&
      rows(1).getAs[Double]("points") == 333.0)
  }

  test("drop is metadata-only; time travel keeps the column; re-adding " +
      "the dropped name is refused (stale data would resurface)") {
    val path = freshDir("drop")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id", "score"))
    val before = dataFiles(path)
    Merge.dropColumn(spark, path, "score")
    assert(dataFiles(path) == before, "drop must touch NO data file")
    val cur = Merge.readKeyed(spark, path)
    assert(cur.columns.toSeq == Seq("id", "name"))
    assert(Merge.readVersion(spark, path, 0L).columns.contains("score"))
    // upserts now carry the narrowed schema; merged old rows project away
    Merge.upsert(spark, path,
      Seq((7L, "upd"), (200L, "new")).toDF("id", "name"),
      "id", nBuckets = 4)
    assert(Merge.readKeyed(spark, path).count() == 101)
    // re-adding 'score' via evolution is refused: old files still hold
    // the physical column and would resurrect their values into it
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((1L, "x", 9.9)).toDF("id", "name", "score"),
        "id", nBuckets = 4, allowEvolution = true)
    }
    assert(e.getMessage.contains("PHYSICAL"))
    // renaming another column ONTO the retired name is refused too
    val e2 = intercept[IllegalArgumentException] {
      Merge.renameColumn(spark, path, "name", "score")
    }
    assert(e2.getMessage.contains("PHYSICAL"))
    // a fresh name is fine
    Merge.upsert(spark, path,
      Seq((1L, "x", 9.9)).toDF("id", "name", "rating"),
      "id", nBuckets = 4, allowEvolution = true)
    assert(Merge.readKeyed(spark, path).columns.toSeq ==
      Seq("id", "name", "rating"))
  }

  test("guards: constraints referencing the column refuse rename/drop; " +
      "key cannot be dropped; duplicate names refused") {
    val path = freshDir("guards")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.addConstraint(spark, path, "pos_score", "score >= 0")
    val e1 = intercept[IllegalArgumentException] {
      Merge.renameColumn(spark, path, "score", "points")
    }
    assert(e1.getMessage.contains("pos_score"))
    val e2 = intercept[IllegalArgumentException] {
      Merge.dropColumn(spark, path, "score")
    }
    assert(e2.getMessage.contains("pos_score"))
    Merge.dropConstraint(spark, path, "pos_score")
    Merge.renameColumn(spark, path, "score", "points") // now fine
    intercept[IllegalArgumentException] {
      Merge.renameColumn(spark, path, "name", "points") // exists
    }
    intercept[IllegalArgumentException] {
      Merge.dropColumn(spark, path, "id") // bucketing key
    }
  }

  test("addColumn refuses a RETIRED logical name and '@'-reserved names; " +
      "rename refuses '@'-reserved names (r19 review)") {
    val path = freshDir("resv")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("statsx:score"))
    // first rename retires no logical (score IS the physical); the
    // second retires 'points' into colAliases
    Merge.renameColumn(spark, path, "score", "points")
    Merge.renameColumn(spark, path, "points", "pts")
    // re-adding 'points' would let histToCur translate the new column's
    // future sidecar entries into pts's stats — refused like rename
    val e1 = intercept[IllegalArgumentException] {
      Merge.addColumn(spark, path, "points",
        org.apache.spark.sql.types.DoubleType)
    }
    assert(e1.getMessage.contains("previous logical name"), e1.getMessage)
    // '@' leads engine metadata entries (sidecar refs, the statsx
    // placeholder): a data column there would collide in the per-file
    // col->entry maps
    val e2 = intercept[IllegalArgumentException] {
      Merge.addColumn(spark, path, "@statsx",
        org.apache.spark.sql.types.DoubleType)
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Merge.renameColumn(spark, path, "pts", "@x")
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
    // schema evolution is an addColumn in disguise and enforces the
    // same reservations (an evolved-in 'points' would let histToCur
    // route its future sidecar entries into pts's stats)
    val e4 = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        baseDf.withColumnRenamed("score", "pts")
          .withColumn("points", lit(1.0)),
        "id", nBuckets = 4, allowEvolution = true)
    }
    assert(e4.getMessage.contains("previous logical name"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        baseDf.withColumnRenamed("score", "pts")
          .withColumn("@statsx", lit(1.0)),
        "id", nBuckets = 4, allowEvolution = true)
    }
    assert(e5.getMessage.contains("reserved"), e5.getMessage)
    // a fresh unreserved name is still fine
    Merge.addColumn(spark, path, "grade",
      org.apache.spark.sql.types.DoubleType)
    assert(Merge.readKeyed(spark, path).columns.contains("grade"))
  }

  test("type widening: int->long and float->double upserts; old files " +
      "read under the widened schema; old versions keep their own") {
    val path = freshDir("widen")
    val base = (0 until 100).map(i => (i.toLong, i, i.toFloat))
      .toDF("id", "n", "x")
    Merge.writeKeyed(base, path, "id", nBuckets = 4,
      statsCols = Seq("n"))
    // a retype without allowEvolution is refused, with a clear nudge
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((7L, 7000000000L, 7.5)).toDF("id", "n", "x"), "id", 4)
    }
    assert(e.getMessage.contains("allowEvolution"))
    // widen: n int->long (a value beyond int range), x float->double
    Merge.upsert(spark, path,
      Seq((7L, 7000000000L, 7.25), (200L, 1L, 0.5))
        .toDF("id", "n", "x"),
      "id", nBuckets = 4, allowEvolution = true)
    val cur = Merge.readKeyed(spark, path)
    assert(cur.schema("n").dataType.simpleString == "bigint")
    assert(cur.schema("x").dataType.simpleString == "double")
    assert(cur.count() == 101)
    // rows from pre-widen files read correctly under the wider schema
    assert(cur.filter($"id" === 8L).select("n").as[Long].head() == 8L)
    assert(cur.filter($"id" === 8L).select("x").as[Double].head() == 8.0)
    assert(cur.filter($"id" === 7L).select("n").as[Long].head()
      == 7000000000L)
    // the pre-widen version reads under its OWN narrower schema
    val v0 = Merge.readVersion(spark, path, 0L)
    assert(v0.schema("n").dataType.simpleString == "int")
    assert(v0.schema("x").dataType.simpleString == "float")
    assert(v0.count() == 100)
    // stats survive the widen: an out-of-range bound on the LONG view
    // prunes pre-widen files too (BigDecimal comparison domain)
    val (sel, _) = Merge.planVersionFiles(spark, path,
      Merge.currentVersion(spark, path),
      Seq(Skipping.Bound("n", Some(8000000000L), None)))
    assert(sel.isEmpty, s"bound above the global max must prune all: $sel")
    // a NARROWING retype stays refused even with allowEvolution
    val e2 = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((1L, 1, 1.0f)).toDF("id", "n", "x"),
        "id", 4, allowEvolution = true)
    }
    assert(e2.getMessage.contains("widening"))
    // a change feed spanning the widen casts the old side exactly up
    val feed = Merge.changesBetween(spark, path, 0L, 1L)
    assert(feed.schema("n").dataType.simpleString == "bigint")
    val k7 = feed.filter($"id" === 7L).orderBy("op").collect()
    assert(k7.length == 2 && k7(0).getAs[Long]("n") == 7L &&
      k7(1).getAs[Long]("n") == 7000000000L)
  }

  test("decimal precision growth widens; scale loss is refused") {
    val path = freshDir("widen_dec")
    val base = spark.sql(
      "SELECT id, CAST(id * 1.5 AS DECIMAL(10,2)) AS amt " +
      "FROM range(0, 50)")
    Merge.writeKeyed(base, path, "id", nBuckets = 2)
    Merge.upsert(spark, path,
      spark.sql("SELECT CAST(7 AS BIGINT) AS id, " +
        "CAST(123456789012345.67 AS DECIMAL(20,4)) AS amt"),
      "id", nBuckets = 2, allowEvolution = true)
    val cur = Merge.readKeyed(spark, path)
    assert(cur.schema("amt").dataType.simpleString == "decimal(20,4)")
    assert(cur.filter($"id" === 8L).select("amt").as[java.math.BigDecimal]
      .head().compareTo(new java.math.BigDecimal("12.00")) == 0)
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        spark.sql("SELECT CAST(1 AS BIGINT) AS id, " +
          "CAST(1 AS DECIMAL(20,1)) AS amt"),
        "id", 2, allowEvolution = true)
    }
    assert(e.getMessage.contains("widening"))
  }

  test("change feed SPANNING a rename correlates columns through " +
      "their physical identity") {
    val path = freshDir("cdf_span")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)          // v0
    Merge.renameColumn(spark, path, "score", "points")           // v1
    Merge.upsert(spark, path,
      Seq((3L, "name_3", 333.0)).toDF("id", "name", "points"),
      "id", nBuckets = 4)                                        // v2
    // from BEFORE the rename: the old side's 'score' values must land
    // under 'points', not be nulled as a "missing column"
    val feed = Merge.changesBetween(spark, path, 0L, 2L)
    val rows = feed.orderBy("op").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("op") == -1 &&
      rows(0).getAs[Double]("points") == 30.0,
      s"pre-rename image must carry its value, got ${rows.toSeq}")
    assert(rows(1).getAs[Int]("op") == 1 &&
      rows(1).getAs[Double]("points") == 333.0)
  }

  test("an upsert racing a rename loses the commit and fails FAST on " +
      "the stale column name — never a silent mis-merge") {
    val path = freshDir("renrace")
    Merge.writeKeyed((0L until 50L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "id", nBuckets = 4)
    // hold the upsert between its stage and its claim; land the rename
    // in that window, then release — the upsert's retry re-reads the
    // renamed schema and must refuse its now-stale batch loudly
    val staged = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    Merge.commitFence = () => {
      if (calls.incrementAndGet() == 1) {
        staged.countDown()
        release.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
      }
    }
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val up = Future(Merge.upsert(spark, path,
        Seq((3L, -3.0)).toDF("id", "v"), "id", 4))
      assert(staged.await(60, java.util.concurrent.TimeUnit.SECONDS))
      Merge.renameColumn(spark, path, "v", "w")
      release.countDown()
      val e = intercept[IllegalArgumentException] {
        Await.result(up, 120.seconds)
      }
      assert(e.getMessage.contains("missing") &&
        e.getMessage.contains("w"),
        s"stale-name retry must fail fast, got: ${e.getMessage}")
    } finally {
      Merge.commitFence = () => ()
      release.countDown()
    }
    // the rename won cleanly; rows untouched, new name everywhere
    val out = Merge.readKeyed(spark, path)
    assert(out.columns.toSeq == Seq("id", "w") && out.count() == 50)
    assert(out.filter($"id" === 3L).select("w").as[Double].head() == 3.0)
    // and the same upsert under the NEW name goes through
    Merge.upsert(spark, path, Seq((3L, -3.0)).toDF("id", "w"), "id", 4)
    assert(Merge.readKeyed(spark, path)
      .filter($"id" === 3L).select("w").as[Double].head() == -3.0)
  }

  test("clone carries the mapping; compaction folds files while " +
      "keeping logical names") {
    val path = freshDir("clonemap")
    val dst = freshDir("clonemap_dst")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.renameColumn(spark, path, "score", "points")
    Merge.upsert(spark, path,
      Seq((3L, "n3", 3.0)).toDF("id", "name", "points"), "id", 4)
    Merge.cloneTable(spark, path, dst)
    val c = Merge.readKeyed(spark, dst)
    assert(c.columns.toSeq == Seq("id", "name", "points"))
    assert(c.filter($"id" === 3L).select("points").as[Double].head() == 3.0)
    // compact the SOURCE: rewritten files still store physical names,
    // reads stay logical and identical
    val beforeRows = Merge.readKeyed(spark, path).orderBy("id").collect()
    Merge.compactVersion(spark, path)
    val afterRows = Merge.readKeyed(spark, path).orderBy("id").collect()
    assert(beforeRows.sameElements(afterRows))
    // and a rename AFTER compaction still reads compacted files right
    Merge.renameColumn(spark, path, "points", "score2")
    assert(Merge.readKeyed(spark, path)
      .filter($"id" === 3L).select("score2").as[Double].head() == 3.0)
  }
  test("the LAYOUT KEY cannot change type: its hash routes buckets") {
    val path = freshDir("keywiden")
    Merge.writeKeyed((0 until 50).map(i => (i, s"v_$i"))
      .toDF("id", "v"), path, "id", nBuckets = 4)
    // id is INT; a LONG-keyed batch would hash to different buckets
    // than the files holding the current rows — refused even with
    // allowEvolution
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((1L, "boom")).toDF("id", "v"), "id", nBuckets = 4,
        allowEvolution = true)
    }
    assert(e.getMessage.contains("layout key"))
    // the metadata-only widen refuses it identically
    val e2 = intercept[IllegalArgumentException] {
      Merge.widenColumn(spark, path, "id",
        org.apache.spark.sql.types.LongType)
    }
    assert(e2.getMessage.contains("layout key"))
    // and a NON-key widen on the same table is fine
    Merge.widenColumn(spark, path, "v",
      org.apache.spark.sql.types.StringType) // no-op same type
    assert(Merge.readKeyed(spark, path).count() == 50L)
  }

}
