package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `CREATE TABLE` / CTAS / `DROP TABLE` on the directory-mode catalog:
  * creation commits an empty v0 under the declared layout (bucket
  * transform or properties), after which INSERT/DML/SELECT all work by
  * name; DROP deletes the table root; pinned-catalog mode keeps
  * refusing both.
  */
class GraftDdlSpec extends SparkSpec {
  import spark.implicits._

  private def mkCatalog(tag: String): (String, File) = {
    val root = Files.createTempDirectory(s"graft_ddl_$tag").toFile
    root.deleteOnExit()
    val cat = s"gddl_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    (cat, root)
  }

  test("CREATE TABLE with a bucket transform, then INSERT and SELECT") {
    val (cat, root) = mkCatalog("bucket")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(8, id))")
    val path = new File(root, "t").getAbsolutePath
    assert(Merge.currentVersion(spark, path) == 0L)
    assert(Merge.tableLayout(spark, path).contains(("id", 8)))
    assert(spark.sql(s"SELECT * FROM $cat.t").isEmpty)
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT * FROM $cat.t ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    // row-level SQL works on the fresh table too (UPDATE/MERGE need
    // the extension session — GraftDmlSpec covers them on a created
    // table's twin surface, DELETE rides the DSv2 hook directly)
    spark.sql(s"DELETE FROM $cat.t WHERE id = 2")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t")
      .as[Long].head() == 1L)
  }

  test("column DEFAULT values: omitted columns and the DEFAULT keyword " +
      "fill from the declared defaults") {
    val (cat, root) = mkCatalog("defv")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE DEFAULT 2.5, " +
      "tag STRING DEFAULT 'none') PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 9.0, 'x')")
    assert(spark.sql(s"SELECT * FROM $cat.t ORDER BY id")
      .as[(Long, Double, String)].collect().toSeq == Seq(
      (1L, 2.5, "none"), (2L, 2.5, "none"), (3L, 9.0, "x")))
    val path = new File(root, "t").getAbsolutePath
    assert(Merge.currentVersion(spark, path) == 3L)
    // the defaults SURVIVE commits: a Scala upsert (whose batch frame
    // carries no metadata) must not strip them from the manifest schema
    Merge.upsert(spark, path,
      Seq((10L, 1.0, "up")).toDF("id", "v", "tag"), "id", nBuckets = 4)
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (11)")
    assert(spark.sql(s"SELECT v, tag FROM $cat.t WHERE id = 11")
      .as[(Double, String)].head() == ((2.5, "none")))
    // the manifest stores the metadata-bearing schema in the lossless
    // JSON form; plain tables keep the human-readable DDL form
    val stored = Merge.versionSchema(spark, path,
      Merge.currentVersion(spark, path)).get
    assert(stored.fields.exists(_.metadata.contains("CURRENT_DEFAULT")),
      s"defaults lost from the stored schema: $stored")
  }

  test("GENERATED ALWAYS AS columns: the engine recomputes on every " +
      "write; bad expressions refused at CREATE") {
    val (cat, root) = mkCatalog("genc")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (id * 2), " +
      "tag STRING) PARTITIONED BY (bucket(4, id))")
    // omitted -> computed; explicit MATCHING value -> kept
    spark.sql(s"INSERT INTO $cat.t (id, tag) VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 4, 'b')")
    assert(spark.sql(s"SELECT id, twice, tag FROM $cat.t ORDER BY id")
      .as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 2L, "a"), (2L, 4L, "b")))
    // the engine OWNS the value: an explicit stale/wrong image
    // recomputes — the rule that keeps UPDATE/MERGE correct (a
    // row-level update of a referenced column carries the OLD
    // generated value in its new image; recompute brings it in sync)
    val path = new File(root, "t").getAbsolutePath
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 99, 'c')")
    assert(spark.sql(s"SELECT twice FROM $cat.t WHERE id = 3")
      .as[Long].head() == 6L,
      "an explicit mismatching value must recompute, not win")
    // the UPDATE shape through the Scala verb: new image carries the
    // stale generated value beside the changed input column
    Merge.upsert(spark, path,
      Seq((3L, 6L, "c2")).toDF("id", "twice", "tag")
        .withColumn("id", col("id") * 2) // id 3 -> 6; stale twice = 6
        .select("id", "twice", "tag"),
      "id", nBuckets = 4)
    assert(spark.sql(s"SELECT twice FROM $cat.t WHERE id = 6")
      .as[Long].head() == 12L,
      "a stale carried value must recompute from the new inputs")
    // a Scala upsert computes null/omitted values too — one engine rule
    Merge.upsert(spark, path,
      Seq((10L, null.asInstanceOf[java.lang.Long], "up"))
        .toDF("id", "twice", "tag"),
      "id", nBuckets = 4)
    assert(spark.sql(s"SELECT twice FROM $cat.t WHERE id = 10")
      .as[Long].head() == 20L)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        messages(t.getCause)
    // bad expressions fail the CREATE, not the first INSERT
    val unknown = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad1 (id BIGINT, " +
        "g BIGINT GENERATED ALWAYS AS (nope + 1)) " +
        "PARTITIONED BY (bucket(2, id))")
    }
    // (Spark's own analyzer may refuse first, our catalog check second
    // — either way the CREATE fails naming the problem)
    assert(messages(unknown).exists(m =>
      m.contains("generated column g") || m.contains("nope")),
      s"got ${messages(unknown)}")
    val chained = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad2 (id BIGINT, " +
        "g1 BIGINT GENERATED ALWAYS AS (id + 1), " +
        "g2 BIGINT GENERATED ALWAYS AS (g1 + 1)) " +
        "PARTITIONED BY (bucket(2, id))")
    }
    assert(messages(chained).exists(m =>
      m.contains("generated column g2") || m.contains("g1")),
      s"got ${messages(chained)}")
  }

  test("IDENTITY columns: generated past the persisted high-water " +
      "mark; explicit values advance it; misuse refused at CREATE") {
    val (cat, root) = mkCatalog("ident")
    // BY DEFAULT admits explicit values (ALWAYS refuses them on
    // INSERT — tested below)
    spark.sql(s"CREATE TABLE $cat.t (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 10 " +
      "INCREMENT BY 5), v STRING) PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a'), ('b'), ('c')")
    assert(spark.sql(s"SELECT id, v FROM $cat.t ORDER BY id")
      .as[(Long, String)].collect().toSeq ==
      Seq((10L, "a"), (15L, "b"), (20L, "c")))
    // GENERATED ALWAYS: the SQL INSERT doorway (where insert-vs-update
    // is distinguishable) refuses explicit values
    spark.sql(s"CREATE TABLE $cat.strict (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    val refused = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.strict VALUES (7, 'nope')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        msgs(t.getCause)
    assert(msgs(refused).exists(m => m.contains("GENERATED ALWAYS")),
      s"got ${msgs(refused)}")
    spark.sql(s"INSERT INTO $cat.strict (v) VALUES ('ok')") // minting fine
    assert(spark.sql(s"SELECT id FROM $cat.strict").as[Long].head() == 1L)
    // an explicit id (BY DEFAULT table) advances the mark: the next
    // generated value is past it, never a replay of the gap
    spark.sql(s"INSERT INTO $cat.t VALUES (100, 'x')")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('d')")
    val afterX = spark.sql(s"SELECT id FROM $cat.t WHERE v = 'd'")
      .as[Long].head()
    assert(afterX == 105L, s"next id after explicit 100 must be 105, " +
      s"got $afterX")
    // the persisted mark SURVIVES maintenance that rewrites files
    val path = new File(root, "t").getAbsolutePath
    Merge.compactVersion(spark, path)
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('e')")
    assert(spark.sql(s"SELECT id FROM $cat.t WHERE v = 'e'")
      .as[Long].head() == 110L)
    // a Scala upsert mints ids for null rows too — one engine, one rule
    Merge.upsert(spark, path,
      Seq((null.asInstanceOf[java.lang.Long], "f"),
        (null.asInstanceOf[java.lang.Long], "g"))
        .toDF("id", "v"),
      "id", nBuckets = 4)
    assert(spark.sql(s"SELECT id FROM $cat.t WHERE v IN ('f','g') " +
      "ORDER BY id").as[Long].collect().toSeq == Seq(115L, 120L))
    // misuse fails the CREATE: non-integral type, two identity columns
    // (Spark's own analyzer may refuse the type first, our catalog
    // check second — either way the CREATE fails)
    val bad1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad1 (" +
        "id DOUBLE GENERATED ALWAYS AS IDENTITY, v STRING) " +
        "PARTITIONED BY (bucket(2, v))")
    }
    assert(bad1.toString.toLowerCase.contains("identity") ||
      bad1.toString.contains("BIGINT or INT"), bad1.toString)
    val bad2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad2 (" +
        "a BIGINT GENERATED ALWAYS AS IDENTITY, " +
        "b BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) " +
        "PARTITIONED BY (bucket(2, a))")
    }
    assert(bad2.getMessage.contains("one identity column"),
      bad2.getMessage)
  }

  test("IDENTITY minting is parallel: a many-partition batch mints a " +
      "contiguous gap-free id range past the mark") {
    val (cat, root) = mkCatalog("identpar")
    spark.sql(s"CREATE TABLE $cat.t (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 " +
      "INCREMENT BY 3), v STRING) PARTITIONED BY (bucket(8, id))")
    val path = new File(root, "t").getAbsolutePath
    // 500 null-id rows spread over 13 partitions — the minting must
    // produce EXACTLY hwm + step·(1..500), no collisions, no gaps,
    // whatever partition each row sits in
    val batch = spark.range(500).repartition(13)
      .selectExpr("CAST(null AS BIGINT) AS id", "concat('v', id) AS v")
    Merge.upsert(spark, path, batch, "id", nBuckets = 8)
    val ids = spark.sql(s"SELECT id FROM $cat.t").as[Long].collect()
    assert(ids.length == 500 && ids.distinct.length == 500)
    assert(ids.sorted.toSeq == (1 to 500).map(i => 100L + 3L * (i - 1)),
      "minted ids must be the contiguous stepped range past the mark")
    // second batch continues past the persisted mark
    Merge.upsert(spark, path,
      spark.range(10).repartition(4)
        .selectExpr("CAST(null AS BIGINT) AS id",
          "concat('w', id) AS v"),
      "id", nBuckets = 8)
    val all = spark.sql(s"SELECT id FROM $cat.t").as[Long].collect()
    assert(all.length == 510 && all.distinct.length == 510)
    assert(all.max == 100L + 3L * 509)
  }

  test("IDENTITY high-water mark is monotonic: deleting the max-id row " +
      "never re-mints its id (persisted mark, not live-file stats)") {
    val (cat, root) = mkCatalog("identhwm")
    spark.sql(s"CREATE TABLE $cat.t (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('a'), ('b'), ('c')")
    // ids 1,2,3 issued; delete the CURRENT MAX — the bucket rewrite
    // drops its file stats, which is exactly what a stats-derived mark
    // would fall back past
    spark.sql(s"DELETE FROM $cat.t WHERE id = 3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 2L)
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('d')")
    val reMinted = spark.sql(s"SELECT id FROM $cat.t WHERE v = 'd'")
      .as[Long].head()
    assert(reMinted == 4L,
      s"id 3 was already issued (then deleted) — the next insert must " +
      s"mint 4, got $reMinted")
    // same through the Scala tombstone-upsert delete path
    val path = new File(root, "t").getAbsolutePath
    Merge.upsert(spark, path,
      Seq((4L, "d", true)).toDF("id", "v", "__del"),
      "id", nBuckets = 4, tombstoneCol = Some("__del"))
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('e')")
    assert(spark.sql(s"SELECT id FROM $cat.t WHERE v = 'e'")
      .as[Long].head() == 5L)
    // the mark survives INSERT OVERWRITE (truncate-like): replacing the
    // table with low ids must not reset it
    spark.sql(s"INSERT OVERWRITE $cat.t VALUES (1, 'only')")
    spark.sql(s"INSERT INTO $cat.t (v) VALUES ('f')")
    assert(spark.sql(s"SELECT id FROM $cat.t WHERE v = 'f'")
      .as[Long].head() == 6L,
      "INSERT OVERWRITE must not lower the identity mark")
  }

  test("CREATE TABLE with TBLPROPERTIES layout + statsCols") {
    val (cat, root) = mkCatalog("props")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('key' = 'id', 'buckets' = '4', " +
      "'statsCols' = 'id')")
    val path = new File(root, "t").getAbsolutePath
    assert(Merge.tableLayout(spark, path).contains(("id", 4)))
    spark.sql(s"INSERT INTO $cat.t VALUES (7, 1.5)")
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE id = 7")
      .as[Double].head() == 1.5)
  }

  test("CTAS: create + populate in one ATOMIC statement") {
    val (cat, root) = mkCatalog("ctas")
    (0L until 50L).map(i => (i, s"n_$i")).toDF("id", "name")
      .createOrReplaceTempView("ddl_ctas_src")
    spark.sql(s"CREATE TABLE $cat.t PARTITIONED BY (bucket(4, id)) " +
      "AS SELECT * FROM ddl_ctas_src")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t")
      .as[Long].head() == 50L)
    assert(spark.sql(s"SELECT name FROM $cat.t WHERE id = 7")
      .as[String].head() == "n_7")
    // the staged write published by RENAME and cleaned its staging dir
    val staging = new File(root, "_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      s"staging not cleaned: ${Option(staging.listFiles()).map(_.toSeq)}")
  }

  test("ABORTED CTAS leaves neither table nor files (atomicity)") {
    val (cat, root) = mkCatalog("ctas_abort")
    spark.udf.register("ddl_ctas_boom", (i: Long) =>
      if (i == 25L) throw new RuntimeException("boom at 25") else i)
    (0L until 50L).toDF("id").createOrReplaceTempView("ddl_abort_src")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t PARTITIONED BY (bucket(4, id)) " +
        "AS SELECT ddl_ctas_boom(id) AS id FROM ddl_abort_src")
    }
    // no table in the catalog, no directory in the root, no staging junk
    assert(spark.sql(s"SHOW TABLES IN $cat").isEmpty)
    assert(!new File(root, "t").exists(),
      "aborted CTAS must not leave a table directory")
    val staging = new File(root, "_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      s"staging not cleaned: ${Option(staging.listFiles()).map(_.toSeq)}")
  }

  test("REPLACE TABLE AS SELECT is refused (history is append-only)") {
    val (cat, _) = mkCatalog("rtas")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    Seq(1L).toDF("id").createOrReplaceTempView("ddl_rtas_src")
    val e = intercept[Exception] {
      spark.sql(s"REPLACE TABLE $cat.t PARTITIONED BY (bucket(2, id)) " +
        "AS SELECT * FROM ddl_rtas_src")
    }
    assert(e.getMessage.contains("append-only"),
      s"unexpected refusal: ${e.getMessage}")
  }

  test("duplicate CREATE refused; IF NOT EXISTS no-ops; missing key " +
      "layout refused") {
    val (cat, _) = mkCatalog("dup")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    intercept[org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT) " +
        "PARTITIONED BY (bucket(2, id))")
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.t (id BIGINT) " +
      "PARTITIONED BY (bucket(2, id))") // no-op, no error
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.nolayout (id BIGINT)")
    }
    assert(e.getMessage.contains("layout"))
  }

  test("DROP TABLE deletes the root; IF EXISTS on a missing name") {
    val (cat, root) = mkCatalog("drop")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    assert(new File(root, "t").exists())
    spark.sql(s"DROP TABLE $cat.t")
    assert(!new File(root, "t").exists())
    assert(spark.sql(s"SHOW TABLES IN $cat").isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t") // no error
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: commit-time CHECK from SQL") {
    val (cat, root) = mkCatalog("ck")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 1.5), (2, 2.5)")
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    // the constraint is recorded on the table and reported via DSv2
    val path = new File(root, "t").getAbsolutePath
    assert(Merge.tableConstraints(spark, path) == Seq(("v_pos", "v > 0")))
    // a violating write is refused at commit time...
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (3, -1.0)")
    }
    assert(e.getMessage.contains("v_pos"))
    // ...a conforming one lands
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 3.5)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t")
      .as[Long].head() == 3L)
    // adding a constraint the EXISTING rows violate is refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT v_big CHECK (v > 2)")
    }
    // DROP releases it; IF EXISTS tolerates a missing name
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT v_pos")
    spark.sql(s"INSERT INTO $cat.t VALUES (4, -4.0)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT nope")
    }
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT IF EXISTS nope")
  }

  test("ALTER COLUMN TYPE: metadata-only widening; narrowing and the " +
      "layout key refused") {
    import spark.implicits._
    val (cat, root) = mkCatalog("widen")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, n INT, x FLOAT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 7, CAST(1.5 AS FLOAT))")
    val path = new File(root, "t").getAbsolutePath
    val dataMtimes = org.apache.commons.io.FileUtils
      .listFiles(new File(path), Array("parquet"), true)
      .toArray.map(_.asInstanceOf[File]).map(f => f.getName -> f
        .lastModified).toMap
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN x TYPE DOUBLE")
    // no data file moved: metadata-only at any table size
    val after = org.apache.commons.io.FileUtils
      .listFiles(new File(path), Array("parquet"), true)
      .toArray.map(_.asInstanceOf[File]).map(f => f.getName -> f
        .lastModified).toMap
    assert(after == dataMtimes, "widening must not touch data files")
    // pre-widen file reads under the wider schema; wide inserts land
    assert(spark.sql(s"SELECT n, x FROM $cat.t WHERE id = 1")
      .as[(Long, Double)].head() == ((7L, 1.5)))
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 7000000000, 2.5)")
    assert(spark.sql(s"SELECT n FROM $cat.t WHERE id = 2")
      .as[Long].head() == 7000000000L)
    // narrowing and key retyping stay refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN n TYPE INT")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE INT")
    }
  }

  test("SHOW TBLPROPERTIES / DESCRIBE EXTENDED surface the layout, " +
      "stats and constraint contracts") {
    val (cat, _) = mkCatalog("props2")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('key' = 'id', 'buckets' = '4', " +
      "'statsCols' = 'id,bloom:v')")
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("key").contains("id"))
    assert(props.get("buckets").contains("4"))
    assert(props.get("statsCols").contains("id,bloom:v"))
    assert(props.get("constraints").exists(_.contains("v_pos")))
    assert(props.contains("version"))
  }

  test("pinned-catalog mode refuses CREATE and DROP") {
    val base = Files.createTempDirectory("graft_ddl_pinned").toFile
    base.deleteOnExit()
    val catRoot = new File(base, "cat").getAbsolutePath
    val p1 = new File(base, "t1").getAbsolutePath
    Merge.writeKeyed(Seq((1L, "a")).toDF("id", "v"), p1, "id", 2)
    TableCatalog.create(spark, catRoot, Map("t1" -> p1))
    val cat = "gddl_pinned"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", catRoot)
    intercept[UnsupportedOperationException] {
      spark.sql(s"CREATE TABLE $cat.t2 (id BIGINT) " +
        "PARTITIONED BY (bucket(2, id))")
    }
    intercept[UnsupportedOperationException] {
      spark.sql(s"DROP TABLE $cat.t1")
    }
    // the member is untouched
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t1")
      .as[Long].head() == 1L)
  }
}
