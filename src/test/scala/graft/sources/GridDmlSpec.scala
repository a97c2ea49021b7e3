package graft.sources

import java.io.File
import java.nio.file.Files

import graft.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GRID DML (r17): composite-key (`writeKeyedCols`) tables are
  * WRITABLE — [[Merge.upsertGrid]] / [[Merge.upsertDVGrid]] route each
  * incoming row by the per-dimension bucket hashes into exactly the
  * cell holding its current image, so a small batch rewrites (or
  * vectors) only its keys' cells and the exchange-free
  * storage-partitioned join survives the commit.
  *
  * Builds its own session: the SQL DML rule arrives via
  * GraftExtensions, which must be present at session construction.
  */
class GridDmlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-grid-dml-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.clearActiveSession()
    SparkSession.setDefaultSession(graft.SparkSpec.session)
    s
  }
  import spark.implicits._

  private def freshRoot(tag: String): File = {
    val d = Files.createTempDirectory(s"graft_griddml_$tag").toFile
    d.deleteOnExit()
    d
  }

  private def dataFiles(path: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(path)).filter(f => f.getPath.contains("__bucket=") &&
        f.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  private def grid(path: String): Unit =
    Merge.writeKeyedCols(
      spark.range(300).selectExpr("id % 7 AS tenant", "id",
        "cast(id AS DOUBLE) AS v").toDF(),
      path, Seq("tenant", "id"), Seq(4, 8))

  test("upsertGrid: a small batch touches ONLY its key tuples' cells; " +
      "updates, inserts and tombstone deletes land in one commit; " +
      "the layout survives") {
    val root = freshRoot("cow")
    val pa = new File(root, "fa").getAbsolutePath
    grid(pa)
    val before = dataFiles(pa)
    assert(before.size == 32, "4 × 8 cells, one file each")
    // update (3, 3), insert (99, 9000), delete (5, 5) — three tuples
    val batch = Seq(
      (3L, 3L, 333.0, false),
      (99L, 9000L, 1.5, false),
      (5L, 5L, 0.0, true)).toDF("tenant", "id", "v", "__del")
    val st = Merge.upsertGrid(spark, pa, batch,
      tombstoneCol = Some("__del"))
    assert(st.rowsUpserted == 2 && st.rowsDeleted == 1 &&
      st.nBuckets == 32, s"got $st")
    val after = dataFiles(pa)
    val untouched = before.count { case (f, m) => after.get(f).contains(m) }
    assert(untouched >= 29,
      s"a 3-tuple batch must rewrite at most 3 of 32 cells " +
      s"($untouched untouched)")
    val cur = Merge.readKeyed(spark, pa)
    assert(cur.count() == 300L) // 300 - 1 + 1
    assert(cur.filter($"tenant" === 3L && $"id" === 3L)
      .select("v").as[Double].head() == 333.0)
    assert(cur.filter($"tenant" === 5L && $"id" === 5L).isEmpty)
    assert(cur.filter($"tenant" === 99L).count() == 1L)
    // same (id) under a DIFFERENT tenant is a DIFFERENT tuple: row
    // (3 % 7 = 3, 10) unaffected by any (x, 10) claim elsewhere
    assert(cur.filter($"id" === 10L).count() == 1L)
    // the caller cannot restate a different layout
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, pa, batch.drop("__del"), "id", 32)
    }
    assert(e.getMessage.contains("layout is fixed"))
    // a replayed txn no-ops — and its stats still report the grid's
    // REAL cell count, same as every committed path (r18: was -1)
    val s1 = Merge.upsertGrid(spark, pa,
      Seq((2L, 2L, 22.0)).toDF("tenant", "id", "v"),
      txn = Some(("grid-app", 7L)))
    assert(!s1.skippedDupTxn && s1.nBuckets == 32, s"got $s1")
    val replay = Merge.upsertGrid(spark, pa,
      Seq((2L, 2L, 9999.0)).toDF("tenant", "id", "v"),
      txn = Some(("grid-app", 7L)))
    assert(replay.skippedDupTxn && replay.nBuckets == 32,
      s"skip-path stats must carry the true cell count, got $replay")
  }

  test("upsertDVGrid: merge-on-read on a grid — zero data files " +
      "rewritten, old images vectored by tuple, appends cell-local") {
    val root = freshRoot("mor")
    val pa = new File(root, "fa").getAbsolutePath
    grid(pa)
    val before = dataFiles(pa)
    val batch = Seq(
      (3L, 3L, 333.0, false),
      (99L, 9000L, 1.5, false),
      (5L, 5L, 0.0, true)).toDF("tenant", "id", "v", "__del")
    val st = Merge.upsertDVGrid(spark, pa, batch,
      tombstoneCol = Some("__del"))
    assert(st.rowsUpserted == 2 && st.rowsDeleted == 2, s"got $st")
    val after = dataFiles(pa)
    assert(before.forall { case (f, m) => after.get(f).contains(m) },
      "merge-on-read grid upsert must not rewrite any data file")
    val cur = Merge.readKeyed(spark, pa)
    assert(cur.count() == 300L)
    assert(cur.filter($"tenant" === 3L && $"id" === 3L)
      .select("v").as[Double].head() == 333.0)
    assert(cur.filter($"tenant" === 5L && $"id" === 5L).isEmpty)
    // compaction folds the grid's DVs and restores the tuple sort
    Merge.compactVersion(spark, pa, resortKey = true)
    assert(Merge.readKeyed(spark, pa).count() == 300L)
    assert(Merge.readKeyed(spark, pa)
      .filter($"tenant" === 99L && $"id" === 9000L).count() == 1L)
  }

  test("SQL DML on a grid: UPDATE / three-branch MERGE / DELETE all " +
      "work tuple-routed; key-column assignment refused per dimension; " +
      "the SPJ join stays exchange-free after the writes") {
    val root = freshRoot("sql")
    val cat = "ggrid_sql"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    val pa = new File(root, "fa").getAbsolutePath
    val pb = new File(root, "fb").getAbsolutePath
    grid(pa)
    Merge.writeKeyedCols(
      spark.range(240).selectExpr("id % 7 AS tenant", "id",
        "concat('n', id) AS name").toDF(),
      pb, Seq("tenant", "id"), Seq(4, 8))
    spark.sql(s"UPDATE $cat.fa SET v = v + 1000 WHERE id < 10")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.fa WHERE id < 10")
      .as[Double].head() == (0 until 10).map(_ + 1000.0).sum)
    // UPDATE of EITHER key column is refused
    val e1 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.fa SET tenant = 0 WHERE id = 3")
    }
    assert(e1.getMessage.contains("tenant"))
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.fa SET id = 0 WHERE id = 3")
    }
    assert(e2.getMessage.contains("key column 'id'"))
    // three-branch MERGE keyed on the tuple
    Seq((3L, 3L, "del", 0.0), (4L, 4L, "upd", 44.0),
        (99L, 9100L, "ins", 9.9))
      .toDF("tenant", "id", "op", "v")
      .createOrReplaceTempView("grid_dml_src")
    spark.sql(s"""MERGE INTO $cat.fa t USING grid_dml_src u
      ON t.tenant = u.tenant AND t.id = u.id
      WHEN MATCHED AND u.op = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = u.v
      WHEN NOT MATCHED THEN INSERT (tenant, id, v)
        VALUES (u.tenant, u.id, u.v)""")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.fa WHERE tenant = 3 AND id = 3")
      .as[Long].head() == 0L)
    assert(spark.sql(
      s"SELECT v FROM $cat.fa WHERE tenant = 4 AND id = 4")
      .as[Double].head() == 44.0)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.fa WHERE tenant = 99")
      .as[Long].head() == 1L)
    // a MERGE INSERT must assign EVERY key column
    val e3 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.fa t USING grid_dml_src u
        ON t.tenant = u.tenant AND t.id = u.id
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (u.id, u.v)""")
    }
    assert(e3.getMessage.contains("tenant"))
    // DELETE (hook route + command route)
    spark.sql(s"DELETE FROM $cat.fa WHERE id >= 290")
    assert(spark.sql(s"SELECT count(*) FROM $cat.fa WHERE id >= 290")
      .as[Long].head() == 0L)
    spark.sql(s"DELETE FROM $cat.fa WHERE id % 97 = 1") // untranslatable
    assert(spark.sql(s"SELECT count(*) FROM $cat.fa WHERE id % 97 = 1")
      .as[Long].head() == 0L)
    // after all that DML the grid still joins exchange-free
    spark.conf.set("spark.graft.bucketedScan", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(s"SELECT a.id FROM $cat.fa a JOIN $cat.fb b " +
        "ON a.tenant = b.tenant AND a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketScan") &&
        !plan.contains("Exchange"),
        s"post-DML grid join must stay exchange-free:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.graft.bucketedScan", "false")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("grid CDC: the change feed diffs by key TUPLE, the CDF dialect " +
      "labels tuple updates, and a streaming replica of a grid folds " +
      "exactly — the q_spj grid story has its pipeline half") {
    val root = freshRoot("cdc")
    val src = new File(root, "src").getAbsolutePath
    val rep = new File(root, "rep").getAbsolutePath
    grid(src)
    val batch = Seq(
      (3L, 3L, 333.0, false),   // update
      (99L, 9000L, 1.5, false), // insert
      (5L, 5L, 0.0, true))      // delete
      .toDF("tenant", "id", "v", "__del")
    Merge.upsertGrid(spark, src, batch, tombstoneCol = Some("__del"))
    // slim dialect: update = -1/+1 on the SAME tuple; same id under a
    // different tenant is untouched
    val feed = Merge.changesBetween(spark, src, 0L, 1L)
    val got = feed.select("tenant", "id", "op")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(got == Seq((3L, 3L, -1), (3L, 3L, 1), (5L, 5L, -1),
      (99L, 9000L, 1)), s"grid feed: $got")
    // CDF dialect classifies the tuple update as pre+post
    val cdf = Merge.changesBetweenCdf(spark, src, 0L, 1L)
      .select("tenant", "id", "_change_type")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(cdf == Seq((3L, 3L, "update_postimage"),
      (3L, 3L, "update_preimage"), (5L, 5L, "delete"),
      (99L, 9000L, "insert")), s"grid CDF: $cdf")
    // replication: a grid replica folds the feed via applyChanges —
    // snapshot (v0 image as all-insert) then the churn commit
    Merge.writeKeyedCols(
      Merge.readVersion(spark, src, 0L).limit(0),
      rep, Seq("tenant", "id"), Seq(4, 8))
    Merge.applyChanges(spark, rep,
      Merge.readVersion(spark, src, 0L).withColumn("op", lit(1)),
      txn = Some(("grid-rep", 0L)))
    Merge.applyChanges(spark, rep, feed, txn = Some(("grid-rep", 1L)))
    assert(Merge.readKeyed(spark, rep).count() == 300L)
    assert(Merge.readKeyed(spark, rep)
      .filter($"tenant" === 3L && $"id" === 3L)
      .select("v").as[Double].head() == 333.0)
    assert(Merge.readKeyed(spark, rep)
      .filter($"tenant" === 5L && $"id" === 5L).isEmpty)
    // a replayed apply no-ops on the txn stamp
    val vBefore = Merge.currentVersion(spark, rep)
    Merge.applyChanges(spark, rep, feed, txn = Some(("grid-rep", 1L)))
    assert(Merge.currentVersion(spark, rep) == vBefore)
    // and the replica still joins the source exchange-free
    val cat = "ggrid_cdc"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    spark.conf.set("spark.graft.bucketedScan", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(s"SELECT count(*) FROM $cat.src a " +
        s"JOIN $cat.rep b ON a.tenant = b.tenant AND a.id = b.id")
      // the global count needs its SinglePartition exchange; the JOIN
      // itself must not hash-exchange the key tuples
      assert(!j.queryExecution.executedPlan.toString
          .contains("hashpartitioning"),
        "source and replica grids must join exchange-free")
      assert(j.as[Long].head() == 300L)
    } finally {
      spark.conf.set("spark.graft.bucketedScan", "false")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("relayoutGrid: per-dimension cell counts change in ONE commit; " +
      "upserts route by the NEW layout; history reads the old files; " +
      "lookupKey names the tuple verb on a grid") {
    val root = freshRoot("relayout")
    val pa = new File(root, "fa").getAbsolutePath
    grid(pa) // (tenant, id) × (4, 8) = 32 cells
    val e = intercept[IllegalArgumentException] {
      Merge.lookupKey(spark, pa, 3L)
    }
    assert(e.getMessage.contains("lookupKeyTuple"))
    val v = Merge.relayoutGrid(spark, pa, Seq(4, 16)) // 64 cells
    assert(v == 1L)
    assert(Merge.versionGridLayout(spark, pa, v)
      .contains((Seq("tenant", "id"), Seq(4, 16))))
    assert(Merge.readKeyed(spark, pa).count() == 300L)
    assert(Merge.readVersion(spark, pa, 0L).count() == 300L,
      "history must survive the re-grid")
    // upserts route by the NEW grid automatically
    val st = Merge.upsertGrid(spark, pa,
      Seq((3L, 3L, 999.0)).toDF("tenant", "id", "v"))
    assert(st.nBuckets == 64 && st.bucketsTouched == 1)
    assert(Merge.lookupKeyTuple(spark, pa, Seq(3L, 3L))
      .select("v").as[Double].head() == 999.0)
    // dimension-count and verb-shape mismatches refuse loudly
    intercept[IllegalArgumentException] {
      Merge.relayoutGrid(spark, pa, Seq(8))
    }
    intercept[IllegalArgumentException] {
      Merge.relayout(spark, pa, 8)
    }
  }

  test("grid merge-on-read SQL DML: session opt-in vectors instead of " +
      "rewriting — no pre-existing file changes across UPDATE + MERGE") {
    val root = freshRoot("morsql")
    val cat = "ggrid_mor"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    val pa = new File(root, "fa").getAbsolutePath
    grid(pa)
    val before = dataFiles(pa)
    spark.conf.set("spark.graft.dml.mergeOnRead", "true")
    try {
      spark.sql(s"UPDATE $cat.fa SET v = -1 WHERE id = 7")
      Seq((2L, 2L, "del", 0.0), (99L, 9200L, "ins", 2.2))
        .toDF("tenant", "id", "op", "v")
        .createOrReplaceTempView("grid_mor_src")
      spark.sql(s"""MERGE INTO $cat.fa t USING grid_mor_src u
        ON t.tenant = u.tenant AND t.id = u.id
        WHEN MATCHED AND u.op = 'del' THEN DELETE
        WHEN NOT MATCHED THEN INSERT (tenant, id, v)
          VALUES (u.tenant, u.id, u.v)""")
      val after = dataFiles(pa)
      assert(before.forall { case (f, m) => after.get(f).contains(m) },
        "grid merge-on-read DML must rewrite no pre-existing file")
      assert(spark.sql(s"SELECT v FROM $cat.fa WHERE id = 7")
        .as[Double].head() == -1.0)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.fa WHERE tenant = 2 AND id = 2")
        .as[Long].head() == 0L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.fa").as[Long]
        .head() == 300L)
    } finally spark.conf.unset("spark.graft.dml.mergeOnRead")
  }
}
