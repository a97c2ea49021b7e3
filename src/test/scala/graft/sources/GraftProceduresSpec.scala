package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.functions._

/** `CALL <cat>.system.<proc>(...)` — the DSv2 stored-procedure surface
  * for table maintenance: compact (with Z-order), vacuum (with
  * dry_run), vacuum_retain, restore, tags, relayout, clone. Each must
  * delegate to the one Scala implementation and return its one-row
  * result; mutating verbs refuse pinned-catalog members.
  */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): File = {
    val d = Files.createTempDirectory(s"graft_proc_$tag").toFile
    d.deleteOnExit()
    d
  }

  private def mkCatalog(tag: String, root: File): String = {
    val cat = s"gproc_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    cat
  }

  private def baseDf =
    (0L until 200L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  test("CALL compact: fragmented buckets fold, named args + defaults") {
    val root = freshRoot("compact")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    // two upserts fragment every touched bucket
    Merge.upsert(spark, path,
      Seq((1L, "x", 1.0)).toDF("id", "name", "score"), "id", 4)
    Merge.upsert(spark, path,
      Seq((2L, "y", 2.0)).toDF("id", "name", "score"), "id", 4)
    val cat = mkCatalog("compact", root)
    val r = spark.sql(s"CALL $cat.system.compact(table => 't')").collect()
    assert(r.length == 1)
    // the returned version is the table's committed head (v3 when the
    // upserts fragmented a bucket past the target, v2 if the compact
    // correctly no-oped)
    assert(r(0).getAs[Long]("version")
      == Merge.currentVersion(spark, path))
    assert(r(0).getAs[Long]("files_after") <=
      r(0).getAs[Long]("files_before"))
    val now = Merge.readKeyed(spark, path)
    assert(now.count() == 200L)
    assert(now.filter($"id" === 1L).select("name").as[String].head() == "x")
  }

  test("CALL compact with zorder_by records the clustered layout") {
    val root = freshRoot("zorder")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2,
      statsCols = Seq("id", "score"))
    val cat = mkCatalog("zorder", root)
    val r = spark.sql(
      s"CALL $cat.system.compact(table => 't', zorder_by => 'id,score')")
      .collect()
    assert(r(0).getAs[Long]("version") == 1L)
    assert(Merge.readKeyed(spark, path).count() == 200L)
  }

  test("CALL vacuum reclaims superseded files; tagged versions survive") {
    val root = freshRoot("vacuum")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2)
    Merge.upsert(spark, path,
      Seq((1L, "x", 1.0)).toDF("id", "name", "score"), "id", 2)
    val cat = mkCatalog("vacuum", root)
    spark.sql(s"CALL $cat.system.create_tag(table => 't', tag => 'keep0', " +
      "version => 0)")
    Merge.upsert(spark, path,
      Seq((2L, "y", 2.0)).toDF("id", "name", "score"), "id", 2)
    val r = spark.sql(s"CALL $cat.system.vacuum(table => 't')").collect()
    assert(r(0).getAs[Long]("current_version") == 2L)
    // v1 is vacuumed away, the tagged v0 still answers
    intercept[Exception] { Merge.readVersion(spark, path, 1L).count() }
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF " +
      "'keep0'").as[Long].head() == 200L)
    // delete_tag releases it
    assert(spark.sql(s"CALL $cat.system.delete_tag('t', 'keep0')")
      .collect()(0).getAs[Boolean]("deleted"))
    // the time-based twin: the released tag's leftovers reclaim, the
    // retained head is untouched
    val vr = spark.sql(s"CALL $cat.system.vacuum_retain(table => 't', " +
      "retain_ms => 86400000)").collect()(0)
    assert(vr.getAs[Long]("current_version") == 2L)
    assert(vr.getAs[Long]("files_reclaimed") > 0L,
      "the untagged v0 leftovers must reclaim")
    assert(Merge.readKeyed(spark, path).count() == 200L)
  }

  test("CALL vacuum dry_run reports the reclaimable set, touches " +
      "nothing; the real run then reclaims exactly it") {
    val root = freshRoot("vacdry")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2)
    Merge.upsert(spark, path,
      Seq((1L, "x", 1.0)).toDF("id", "name", "score"), "id", 2)
    val cat = mkCatalog("vacdry", root)
    def dataFiles(): Int =
      org.apache.commons.io.FileUtils.listFiles(new File(path),
        Array("parquet"), true).size
    val before = dataFiles()
    val dry = spark.sql(s"CALL $cat.system.vacuum(table => 't', " +
      "dry_run => true)").collect()(0)
    assert(dry.getAs[Boolean]("dry_run"))
    val planned = dry.getAs[Long]("files_reclaimed")
    assert(planned > 0L, "the superseded v0 bucket file must be planned")
    assert(dataFiles() == before, "dry run must not touch the table")
    assert(Merge.readVersion(spark, path, 0L).count() == 200L,
      "dry run must leave v0 readable")
    val real = spark.sql(s"CALL $cat.system.vacuum(table => 't')")
      .collect()(0)
    assert(!real.getAs[Boolean]("dry_run"))
    assert(real.getAs[Long]("files_reclaimed") == planned,
      "the real run must reclaim exactly the dry run's plan")
    assert(dataFiles() < before)
  }

  test("CALL restore commits a new head with an old version's content") {
    val root = freshRoot("restore")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2)
    Merge.upsert(spark, path,
      Seq((1L, "clobbered", 0.0)).toDF("id", "name", "score"), "id", 2)
    val cat = mkCatalog("restore", root)
    val r = spark.sql(s"CALL $cat.system.restore('t', 0)").collect()
    assert(r(0).getAs[Long]("restored_version") == 2L)
    assert(Merge.readKeyed(spark, path).filter($"id" === 1L)
      .select("name").as[String].head() == "name_1")
    // history preserved: the clobbering v1 still reads
    assert(Merge.readVersion(spark, path, 1L).filter($"id" === 1L)
      .select("name").as[String].head() == "clobbered")
  }

  test("CALL relayout rewrites under the new bucket count") {
    val root = freshRoot("relayout")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2)
    val cat = mkCatalog("relayout", root)
    val r = spark.sql(s"CALL $cat.system.relayout(table => 't', " +
      "buckets => 8)").collect()
    assert(r(0).getAs[Long]("version") == 1L)
    assert(Merge.tableLayout(spark, path).contains(("id", 8)))
    assert(Merge.readKeyed(spark, path).count() == 200L)
  }

  test("CALL clone forks a queryable member with one manifest write") {
    val root = freshRoot("clone")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 2)
    Merge.upsert(spark, path,
      Seq((1L, "x", 1.0)).toDF("id", "name", "score"), "id", 2)
    val cat = mkCatalog("clone", root)
    val r = spark.sql(s"CALL $cat.system.clone(table => 't', " +
      "new_table => 't_dev', version => 0)").collect()
    assert(r(0).getAs[Long]("cloned_version") == 0L)
    // the clone is a member, reads the PRE-upsert image, and writes to
    // it do not touch the source
    assert(spark.sql(s"SELECT name FROM $cat.t_dev WHERE id = 1")
      .as[String].head() == "name_1")
    spark.sql(s"INSERT INTO $cat.t_dev VALUES (999, 'dev', 9.9)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").as[Long].head()
      == 200L)
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.clone('t', 't_dev')") // exists
    }
  }

  test("CALL copy_into loads a landing directory exactly once per file") {
    val root = freshRoot("copyinto")
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val landing = Files.createTempDirectory("graft_proc_landing").toFile
    landing.deleteOnExit()
    val tmp = Files.createTempDirectory("graft_proc_land_tmp").toFile
    (1000L until 1020L).map(i => (i, s"new_$i", i * 1.0))
      .toDF("id", "name", "score")
      .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    Files.move(
      tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      new File(landing, "batch1.parquet").toPath)
    val cat = mkCatalog("copyinto", root)
    val r = spark.sql(s"CALL $cat.system.copy_into(table => 't', " +
      s"source => '${landing.getAbsolutePath}')").collect()
    assert(r(0).getAs[Long]("files_copied") == 1L)
    assert(r(0).getAs[Long]("rows_copied") == 20L)
    assert(Merge.readKeyed(spark, path).count() == 220L)
    val again = spark.sql(s"CALL $cat.system.copy_into(table => 't', " +
      s"source => '${landing.getAbsolutePath}')").collect()
    assert(again(0).getAs[Long]("files_copied") == 0L)
    assert(again(0).getAs[Long]("files_skipped") == 1L)
    assert(Merge.readKeyed(spark, path).count() == 220L)
  }

  test("mutating procedures refuse PINNED catalog members") {
    val root = freshRoot("pinned")
    val catRoot = new File(root, "cat").getAbsolutePath
    val p1 = new File(root, "t1").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 2)
    TableCatalog.create(spark, catRoot, Map("t1" -> p1))
    val cat = mkCatalog("pinned", new File(catRoot))
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact(table => 't1')").collect()
    }
    assert(e.getMessage.contains("PINNED"))
  }

  test("unknown procedure and listProcedures") {
    val root = freshRoot("list")
    Merge.writeKeyed(baseDf, new File(root, "t").getAbsolutePath,
      "id", nBuckets = 2)
    val cat = mkCatalog("list", root)
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.frobnicate('t')").collect()
    }
    assert(e.getMessage.contains("frobnicate"))
    // the standard SQL listing rides listProcedures
    val names = spark.sql(s"SHOW PROCEDURES IN $cat.system").collect()
      .map(_.getAs[String]("procedure_name")).toSet
    assert(names == Set("compact", "vacuum", "vacuum_retain", "restore",
      "create_tag", "delete_tag", "relayout", "clone",
      "transact_compact", "copy_into", "analyze", "ndv"))
  }

  test("CALL transact_compact maintains a PINNED member atomically: " +
      "catalog version +1, pins consistent") {
    val root = freshRoot("txcompact")
    val catRoot = new File(root, "cat").getAbsolutePath
    val p1 = new File(root, "t1").getAbsolutePath
    val p2 = new File(root, "t2").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    Merge.writeKeyed(baseDf.select($"id", $"score"), p2, "id",
      nBuckets = 2)
    TableCatalog.create(spark, catRoot, Map("t1" -> p1, "t2" -> p2))
    // fragment t1 THROUGH transactions (the only legal write path);
    // filesPerBucket = 3 fragments the touched buckets deterministically
    TableCatalog.transact(spark, catRoot, Seq(TableCatalog.TxnUpsert(
      "t1", Seq((1L, "x", 1.0)).toDF("id", "name", "score"),
      filesPerBucket = 3)))
    TableCatalog.transact(spark, catRoot, Seq(TableCatalog.TxnUpsert(
      "t1", Seq((2L, "y", 2.0)).toDF("id", "name", "score"),
      filesPerBucket = 3)))
    val before = TableCatalog.state(spark, catRoot)
    val cat = mkCatalog("txcompact", new File(catRoot))
    val r = spark.sql(
      s"CALL $cat.system.transact_compact(table => 't1')").collect()
    assert(r.length == 1)
    val after = TableCatalog.state(spark, catRoot)
    assert(after.version == before.version + 1,
      "the maintenance must be ONE catalog commit")
    assert(r(0).getAs[Long]("catalog_version") == after.version)
    assert(r(0).getAs[Long]("member_version")
      == after.pins("t1").version)
    assert(after.pins("t1").version == before.pins("t1").version + 1,
      "the member's pin must move to the compacted version")
    assert(after.pins("t2") == before.pins("t2"),
      "an untouched member's pin must ride along unchanged")
    // content identical through the catalog, rows preserved
    val now = TableCatalog.readTable(spark, catRoot, "t1")
    assert(now.count() == 200L)
    assert(now.filter($"id" === 1L).select("name").as[String].head()
      == "x")
    // and the plain compact verb still refuses the pinned member
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact(table => 't1')").collect()
    }
    assert(e.getMessage.contains("PINNED"))
  }

  test("CALL transact_compact refuses a DIRECTORY-mode catalog") {
    val root = freshRoot("txdir")
    Merge.writeKeyed(baseDf, new File(root, "t").getAbsolutePath,
      "id", nBuckets = 2)
    val cat = mkCatalog("txdir", root)
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.transact_compact(table => 't')")
        .collect()
    }
    assert(e.getMessage.contains("DIRECTORY mode"))
  }
}
