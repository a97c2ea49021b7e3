package graft.sources

import java.io.File
import java.nio.file.Files

import graft.GraftExtensions
import graft.sources.v2.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `UPDATE` / `MERGE INTO` on graft tables through the injected
  * analyzer rule: one bucket-granular commit per statement, key-column
  * identity enforced, first-match-wins WHEN clauses, double-touch
  * detection, and the scan side still manifest-pruned.
  *
  * Builds its own session: the DML rule arrives via GraftExtensions,
  * which must be present at session construction.
  */
class GraftDmlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate returns the registered default, which would ignore
    // the extensions — clear it just long enough to force a fresh
    // session, then RESTORE the shared suite session as the global
    // default (clearing to NOTHING strands parallel suites whose code
    // paths reach SparkSession.active from threads with no active set)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dml-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.clearActiveSession()
    SparkSession.setDefaultSession(graft.SparkSpec.session)
    s
  }

  /** A fresh table named `t` under a fresh dir-mode catalog named
    * `g<tag>` — one catalog PER TEST, because Spark's CatalogManager
    * caches plugin instances by name and would ignore a re-pointed
    * root. Returns the table path. 200 rows (id, name, score),
    * 8 buckets, id stats recorded.
    */
  private def freshTable(tag: String): String = {
    import spark.implicits._
    val root = Files.createTempDirectory(s"graft_dml_$tag").toFile
    root.deleteOnExit()
    val path = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, s"name_$i", i * 10.0))
        .toDF("id", "name", "score"),
      path, "id", nBuckets = 8, statsCols = Seq("id"))
    spark.conf.set(s"spark.sql.catalog.g$tag",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.g$tag.root", root.getAbsolutePath)
    path
  }

  test("UPDATE with WHERE: matched rows rewritten, one commit, " +
      "history preserved") {
    import spark.implicits._
    val path = freshTable("upd")
    val v0 = Merge.currentVersion(spark, path)
    spark.sql(
      "UPDATE gupd.t SET name = 'boosted', score = score + 0.5 " +
      "WHERE id < 3")
    assert(Merge.currentVersion(spark, path) == v0 + 1)
    val now = Merge.readKeyed(spark, path)
    assert(now.count() == 200L)
    val hit = now.filter($"id" < 3).orderBy("id")
      .select("name", "score").as[(String, Double)].collect().toSeq
    assert(hit == Seq(("boosted", 0.5), ("boosted", 10.5),
      ("boosted", 20.5)))
    assert(now.filter($"id" === 5L).select("name").as[String].head()
      == "name_5")
    // the pre-update version still answers
    assert(Merge.readVersion(spark, path, v0).filter($"id" === 0L)
      .select("name").as[String].head() == "name_0")
  }

  test("UPDATE without WHERE touches every row; key assignment refused") {
    import spark.implicits._
    val path = freshTable("updall")
    spark.sql("UPDATE gupdall.t SET score = 0.0")
    val now = Merge.readKeyed(spark, path)
    assert(now.agg(sum("score")).as[Double].head() == 0.0)
    assert(now.count() == 200L)
    val e = intercept[Exception] {
      spark.sql("UPDATE gupdall.t SET id = id + 1")
    }
    assert(e.getMessage.contains("key column"))
  }

  test("UPDATE value of a different numeric type is store-assigned " +
      "to the column type") {
    import spark.implicits._
    val path = freshTable("updcast")
    spark.sql("UPDATE gupdcast.t SET score = 7 WHERE id = 1")
    val got = Merge.readKeyed(spark, path).filter($"id" === 1L)
      .select("score").as[Double].head()
    assert(got == 7.0)
    assert(Merge.readKeyed(spark, path).schema("score").dataType
      == org.apache.spark.sql.types.DoubleType)
  }

  test("MERGE INTO: update + conditional delete + insert + " +
      "not-matched-by-source, ONE commit") {
    import spark.implicits._
    val path = freshTable("merge")
    // keep only ids 0..9 in the target's source-matched world:
    //  - id 0: matched, op=del  -> deleted
    //  - id 1: matched, op=upd  -> updated
    //  - id 500: not matched    -> inserted
    //  - ids 2..199: not matched by source, id >= 100 -> deleted
    Seq((0L, "z", 0.0, "del"), (1L, "one_v2", 11.0, "upd"),
      (500L, "fresh", 5.0, "upd"))
      .toDF("id", "name", "score", "op")
      .createOrReplaceTempView("dml_src")
    val v0 = Merge.currentVersion(spark, path)
    spark.sql("""
      MERGE INTO gmerge.t AS t USING dml_src AS s ON t.id = s.id
      WHEN MATCHED AND s.op = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET name = s.name, score = s.score
      WHEN NOT MATCHED THEN INSERT (id, name, score)
        VALUES (s.id, s.name, s.score)
      WHEN NOT MATCHED BY SOURCE AND t.id >= 100 THEN DELETE
    """)
    assert(Merge.currentVersion(spark, path) == v0 + 1,
      "the whole MERGE must be one commit")
    val now = Merge.readKeyed(spark, path)
    // 200 - 1 (id 0) - 100 (ids 100..199) + 1 (id 500) = 100
    assert(now.count() == 100L)
    assert(now.filter($"id" === 0L).isEmpty)
    assert(now.filter($"id" === 1L).select("name", "score")
      .as[(String, Double)].head() == ("one_v2", 11.0))
    assert(now.filter($"id" === 500L).select("name", "score")
      .as[(String, Double)].head() == ("fresh", 5.0))
    assert(now.filter($"id" >= 100L && $"id" < 500L).isEmpty)
    assert(now.filter($"id" === 50L).select("name").as[String].head()
      == "name_50")
  }

  test("MERGE star forms: UPDATE SET * / INSERT *") {
    import spark.implicits._
    val path = freshTable("star")
    Seq((3L, "starred", 33.0), (777L, "new_star", 77.0))
      .toDF("id", "name", "score")
      .createOrReplaceTempView("dml_star_src")
    spark.sql("""
      MERGE INTO gstar.t t USING dml_star_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val now = Merge.readKeyed(spark, path)
    assert(now.count() == 201L)
    assert(now.filter($"id" === 3L).select("name").as[String].head()
      == "starred")
    assert(now.filter($"id" === 777L).select("name", "score")
      .as[(String, Double)].head() == ("new_star", 77.0))
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns evolve the " +
      "table, pre-evolution rows align null") {
    import spark.implicits._
    val path = freshTable("evolve")
    val v0 = Merge.currentVersion(spark, path)
    Seq((3L, "evolved", 33.0, "eu"), (777L, "fresh", 77.0, "us"))
      .toDF("id", "name", "score", "region")
      .createOrReplaceTempView("dml_evolve_src")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO gevolve.t t
      USING dml_evolve_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val now = Merge.readKeyed(spark, path)
    assert(now.columns.toSeq == Seq("id", "name", "score", "region"),
      s"the table must have evolved, got ${now.columns.toSeq}")
    assert(now.count() == 201L)
    assert(now.filter($"id" === 3L).select("name", "region")
      .as[(String, String)].head() == ("evolved", "eu"))
    assert(now.filter($"id" === 777L).select("region").as[String].head()
      == "us")
    // untouched pre-evolution rows read null in the added column
    assert(now.filter($"id" === 5L).select("region").head().isNullAt(0))
    // two commits: the addColumn evolution, then the merge
    assert(Merge.currentVersion(spark, path) == v0 + 2,
      "evolution + merge must be exactly two commits")
    // WITHOUT the clause the same statement keeps failing resolution
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO gevolve.t t USING dml_evolve_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET t.extra_only = s.id
      """)
    }
    assert(e.getMessage != null)
  }

  test("MERGE unassigned insert columns become NULL; WHEN clause " +
      "order is first-match-wins") {
    import spark.implicits._
    val path = freshTable("order")
    Seq((1L, "a"), (900L, "b")).toDF("id", "tag")
      .createOrReplaceTempView("dml_ord_src")
    spark.sql("""
      MERGE INTO gorder.t t USING dml_ord_src s ON t.id = s.id
      WHEN MATCHED AND s.tag = 'a' THEN UPDATE SET name = 'first'
      WHEN MATCHED THEN UPDATE SET name = 'second'
      WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, 'inserted')
    """)
    val now = Merge.readKeyed(spark, path)
    assert(now.filter($"id" === 1L).select("name").as[String].head()
      == "first")
    val ins = now.filter($"id" === 900L)
      .select("name", "score").collect().head
    assert(ins.getString(0) == "inserted" && ins.isNullAt(1),
      "unassigned insert column must be NULL")
  }

  test("MERGE NOT MATCHED BY SOURCE can UPDATE, not just DELETE") {
    import spark.implicits._
    val path = freshTable("nmbsu")
    Seq(1L, 2L).toDF("id").createOrReplaceTempView("dml_nmbs_src")
    spark.sql("""
      MERGE INTO gnmbsu.t t USING dml_nmbs_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET name = 'seen'
      WHEN NOT MATCHED BY SOURCE AND t.id < 5 THEN UPDATE
        SET name = 'stale'
    """)
    val now = Merge.readKeyed(spark, path)
    assert(now.filter($"name" === "seen").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(now.filter($"name" === "stale").select("id").as[Long]
      .collect().sorted.toSeq == Seq(0L, 3L, 4L))
    assert(now.filter($"id" === 7L).select("name").as[String].head()
      == "name_7")
    assert(now.count() == 200L)
  }

  test("MERGE that touches one target key twice fails loudly") {
    import spark.implicits._
    freshTable("dup")
    Seq((1L, "x"), (1L, "y")).toDF("id", "name")
      .createOrReplaceTempView("dml_dup_src")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO gdup.t t USING dml_dup_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET name = s.name
      """)
    }
    assert(e.getMessage.contains("more than once"))
  }

  test("UPDATE WHERE on the key is manifest-pruned at the scan") {
    val path = freshTable("prune")
    GraftTable.lastScanFiles = None
    spark.sql("UPDATE gprune.t SET name = 'pruned' WHERE id = 7")
    val Some((sel, total)) = GraftTable.lastScanFiles
    assert(sel < total && sel >= 1,
      s"the UPDATE's find-scan must prune files: selected $sel of $total")
    import spark.implicits._
    assert(Merge.readKeyed(spark, path).filter($"id" === 7L)
      .select("name").as[String].head() == "pruned")
  }

  test("DELETE with a subquery or an untranslatable predicate runs " +
      "through the command; translatable DELETE stays on the hook") {
    import spark.implicits._
    val path = freshTable("del")
    Seq(3L, 5L).toDF("bad_id").createOrReplaceTempView("dml_del_src")
    val v0 = Merge.currentVersion(spark, path)
    // subquery: impossible for SupportsDelete, handled by the command
    spark.sql(
      "DELETE FROM gdel.t WHERE id IN (SELECT bad_id FROM dml_del_src)")
    assert(Merge.currentVersion(spark, path) == v0 + 1)
    assert(Merge.readKeyed(spark, path).count() == 198L)
    assert(Merge.readKeyed(spark, path)
      .filter($"id" === 3L || $"id" === 5L).isEmpty)
    // arbitrary expression: also the command
    spark.sql("DELETE FROM gdel.t WHERE id % 97 = 1")
    // survivors of {0..199} \ {3,5}: remove 1, 98, 195
    assert(Merge.readKeyed(spark, path).count() == 195L)
    // plainly translatable: the SupportsDelete hook (deleteWhere) —
    // same observable contract, one commit
    val vh = Merge.currentVersion(spark, path)
    spark.sql("DELETE FROM gdel.t WHERE id >= 190")
    assert(Merge.currentVersion(spark, path) == vh + 1)
    assert(Merge.readKeyed(spark, path).agg(max("id")).as[Long].head()
      < 190L)
  }

  test("UPDATE with a subquery condition binds the embedded plan") {
    import spark.implicits._
    val path = freshTable("updsub")
    Seq(7L, 9L).toDF("hot_id").createOrReplaceTempView("dml_upd_src")
    spark.sql("UPDATE gupdsub.t SET name = 'hot' " +
      "WHERE id IN (SELECT hot_id FROM dml_upd_src)")
    assert(Merge.readKeyed(spark, path).filter($"name" === "hot")
      .select("id").as[Long].collect().sorted.toSeq == Seq(7L, 9L))
  }

  test("UPDATE with a SCALAR-subquery value; DELETE with correlated " +
      "EXISTS") {
    import spark.implicits._
    val path = freshTable("subx")
    Seq((1L, 111.0)).toDF("k", "s").createOrReplaceTempView("dml_subx")
    spark.sql("UPDATE gsubx.t SET score = " +
      "(SELECT max(s) FROM dml_subx) WHERE id = 2")
    assert(Merge.readKeyed(spark, path).filter($"id" === 2L)
      .select("score").as[Double].head() == 111.0)
    spark.sql("DELETE FROM gsubx.t WHERE EXISTS " +
      "(SELECT 1 FROM dml_subx x WHERE x.k = t.id)")
    assert(Merge.readKeyed(spark, path).filter($"id" === 1L).isEmpty)
    assert(Merge.readKeyed(spark, path).count() == 199L)
  }

  test("DML composes with column mapping: UPDATE and MERGE speak the " +
      "RENAMED column over pre-rename files") {
    import spark.implicits._
    val path = freshTable("ren")
    spark.sql("ALTER TABLE gren.t RENAME COLUMN name TO title")
    spark.sql("UPDATE gren.t SET title = 'renamed' WHERE id = 1")
    assert(Merge.readKeyed(spark, path).filter($"id" === 1L)
      .select("title").as[String].head() == "renamed")
    Seq((2L, "merged")).toDF("id", "title")
      .createOrReplaceTempView("dml_ren_src")
    spark.sql("""
      MERGE INTO gren.t t USING dml_ren_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET title = s.title
    """)
    val now = Merge.readKeyed(spark, path)
    assert(now.filter($"id" === 2L).select("title").as[String].head()
      == "merged")
    // untouched pre-rename files still read under the new name
    assert(now.filter($"id" === 9L).select("title").as[String].head()
      == "name_9")
  }

  test("two racing UPDATEs on disjoint keys both land (commit-fence " +
      "serialization)") {
    import spark.implicits._
    val path = freshTable("race")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = Seq("id < 10", "id >= 190").map { where =>
      new Thread(() => {
        try spark.sql(s"UPDATE grace.t SET name = 'raced' WHERE $where")
        catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"racing UPDATEs must serialize: ${errs.peek}")
    assert(Merge.currentVersion(spark, path) == 2L)
    assert(Merge.readKeyed(spark, path).filter($"name" === "raced")
      .count() == 20L)
  }

  test("DML refuses PINNED catalog members") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dml_pin")
      .toFile
    base.deleteOnExit()
    val catRoot = new java.io.File(base, "cat").getAbsolutePath
    val p1 = new java.io.File(base, "t1").getAbsolutePath
    Merge.writeKeyed(Seq((1L, "a")).toDF("id", "v"), p1, "id", 2)
    TableCatalog.create(spark, catRoot, Map("t1" -> p1))
    spark.conf.set("spark.sql.catalog.gdmlpin",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdmlpin.root", catRoot)
    val e = intercept[Exception] {
      spark.sql("UPDATE gdmlpin.t1 SET v = 'x' WHERE id = 1")
    }
    assert(e.getMessage.contains("pinned"))
    assert(spark.sql("SELECT v FROM gdmlpin.t1 WHERE id = 1")
      .as[String].head() == "a")
  }

  test("the streaming MERGE idiom: foreachBatch + SQL MERGE INTO " +
      "(Delta's streaming-upsert pattern)") {
    import spark.implicits._
    val path = freshTable("smerge")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_dml_smerge_ckpt").toFile
    ckpt.deleteOnExit()
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    in.addData((1L, "s1"), (300L, "s300"))
    val q = in.toDF().toDF("id", "name")
      .writeStream
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.createOrReplaceTempView("dml_smerge_batch")
        b.sparkSession.sql("""
          MERGE INTO gsmerge.t t USING dml_smerge_batch s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET name = s.name
          WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)
        """)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val now = Merge.readKeyed(spark, path)
    assert(now.filter($"id" === 1L).select("name").as[String].head()
      == "s1")
    assert(now.filter($"id" === 300L).select("name").as[String].head()
      == "s300")
    assert(now.count() == 201L)
  }

  test("UPDATE/MERGE on a non-graft relation still gets Spark's error") {
    import spark.implicits._
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("plain_view")
    // Spark's own refusal (the exact exception type is Spark's
    // business — 4.1 throws SparkUnsupportedOperationException); what
    // matters is that OUR rule left the statement alone
    val e = intercept[Exception] {
      spark.sql("UPDATE plain_view SET v = 'x' WHERE id = 1")
    }
    assert(!e.getMessage.contains("graft"))
  }

  test("merge-on-read SQL DML: with spark.graft.dml.mergeOnRead=true " +
      "UPDATE/DELETE/MERGE — DELETE branches included (r17 " +
      "tombstones) — rewrite no data file") {
    import spark.implicits._
    val path = freshTable("mor")
    def dataFiles(): Map[String, Long] = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new File(path)).filter(f => f.getPath.contains("__bucket=") &&
          f.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = dataFiles()
    spark.conf.set("spark.graft.dml.mergeOnRead", "true")
    try {
      spark.sql("UPDATE gmor.t SET name = 'upd' WHERE id = 7")
      spark.sql("DELETE FROM gmor.t WHERE id >= 170")
      Seq((3L, "mrg", 3.0), (500L, "ins", 5.0))
        .toDF("id", "name", "score")
        .createOrReplaceTempView("sqlmor_src")
      spark.sql("""MERGE INTO gmor.t t USING sqlmor_src u ON t.id = u.id
        WHEN MATCHED THEN UPDATE SET name = u.name, score = u.score
        WHEN NOT MATCHED THEN INSERT (id, name, score)
          VALUES (u.id, u.name, u.score)""")
      val after = dataFiles()
      assert(before.forall { case (f, m) => after.get(f).contains(m) },
        "merge-on-read DML must not rewrite any pre-existing data file")
      val t = spark.sql("SELECT * FROM gmor.t")
      assert(t.count() == 171L) // 200 - 30 deleted + 1 inserted
      assert(t.filter($"id" === 7L).select("name").as[String].head()
        == "upd")
      assert(t.filter($"id" === 3L).select("name").as[String].head()
        == "mrg")
      assert(t.filter($"id" === 500L).count() == 1L)
      // a three-branch MERGE with a DELETE stays merge-on-read too:
      // the delete is pure DV positions, no image appended
      Seq((11L, "del", "", 0.0), (13L, "upd", "mrg13", 13.0),
          (600L, "ins", "new600", 6.0))
        .toDF("id", "op", "name", "score")
        .createOrReplaceTempView("sqlmor_del")
      spark.sql("""MERGE INTO gmor.t t USING sqlmor_del u ON t.id = u.id
        WHEN MATCHED AND u.op = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = u.name, score = u.score
        WHEN NOT MATCHED THEN INSERT (id, name, score)
          VALUES (u.id, u.name, u.score)""")
      val after3 = dataFiles()
      assert(before.forall { case (f, m) => after3.get(f).contains(m) },
        "a MERGE with a DELETE branch must stay merge-on-read: no " +
        "pre-existing data file rewritten")
      assert(spark.sql("SELECT * FROM gmor.t WHERE id = 11").count()
        == 0L)
      assert(spark.sql("SELECT name FROM gmor.t WHERE id = 13")
        .as[String].head() == "mrg13")
      assert(spark.sql("SELECT * FROM gmor.t WHERE id = 600").count()
        == 1L)
      assert(spark.sql("SELECT count(*) FROM gmor.t").as[Long].head()
        == 171L)
      // INSERT INTO joins the merge-on-read posture too (r17): a new
      // key appends, a replaced key's old image vectors — still no
      // pre-existing file rewritten
      spark.sql("INSERT INTO gmor.t VALUES (900, 'ins_mor', 9.0), " +
        "(7, 'upd2', 7.7)")
      val after4 = dataFiles()
      assert(before.forall { case (f, m) => after4.get(f).contains(m) },
        "merge-on-read INSERT must not rewrite any pre-existing file")
      assert(spark.sql("SELECT count(*) FROM gmor.t").as[Long].head()
        == 172L)
      assert(spark.sql("SELECT name FROM gmor.t WHERE id = 7")
        .as[String].head() == "upd2")
    } finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    // conf off: UPDATE goes back to copy-on-write — no NEW deletion
    // vectors (the old data files stay on disk either way: immutable,
    // still referenced by retained versions, so a disk listing cannot
    // distinguish the paths — the sidecar count can)
    def dvSidecars(): Int = {
      val d = new File(path, "_graft_dv")
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      if (!d.exists()) 0
      else walk(d).count(_.getName.endsWith(".parquet"))
    }
    val preCow = dvSidecars()
    spark.sql("UPDATE gmor.t SET name = 'cow' WHERE id = 8")
    assert(dvSidecars() == preCow,
      "with the conf off, UPDATE must be copy-on-write — no new DVs")
    assert(spark.sql("SELECT name FROM gmor.t WHERE id = 8")
      .as[String].head() == "cow")
  }
}
