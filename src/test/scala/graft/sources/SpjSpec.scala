package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.v2.GraftBucketScan

/** STORAGE-PARTITIONED JOINS: two graft tables bucketed on the same key
  * with the same bucket count join with NO shuffle exchange when the
  * native bucket scan is enabled — the scan reports the on-disk layout
  * as KeyGroupedPartitioning and Spark aligns partition values instead
  * of exchanging 2× the data. The fallback paths (scan disabled, dirty
  * table, mismatched layouts) keep shuffling and stay row-identical.
  */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private def mkCatalog(tag: String): (String, File) = {
    val root = Files.createTempDirectory(s"graft_spj_$tag").toFile
    root.deleteOnExit()
    val cat = s"gspj_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    (cat, root)
  }

  private def withSpj[A](body: => A): A = {
    spark.conf.set("spark.graft.bucketedScan", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // SPJ plans a sort-merge join over the reported partitioning; the
    // broadcast path would bypass the exchange question entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.graft.bucketedScan", "false")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  test("co-bucketed tables join with ZERO shuffle; rows identical to " +
      "the shuffled plan") {
    val (cat, _) = mkCatalog("join")
    spark.sql(s"CREATE TABLE $cat.facts (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.dims (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.range(200).selectExpr("id", "cast(id * 1.5 as double) AS v")
      .createOrReplaceTempView("spj_src_f")
    spark.range(150).selectExpr("id", "concat('n', id) AS name")
      .createOrReplaceTempView("spj_src_d")
    spark.sql(s"INSERT INTO $cat.facts SELECT * FROM spj_src_f")
    spark.sql(s"INSERT INTO $cat.dims SELECT * FROM spj_src_d")
    // no ORDER BY in the probe query — a global sort adds its own
    // (legitimate) range exchange; sort driver-side instead
    val q = s"SELECT f.id, f.v, d.name FROM $cat.facts f " +
      s"JOIN $cat.dims d ON f.id = d.id"
    val expected = spark.sql(
      "SELECT f.id, f.v, d.name FROM spj_src_f f " +
      "JOIN spj_src_d d ON f.id = d.id")
      .as[(Long, Double, String)].collect().toSeq.sorted
    // baseline: native scan off -> the join shuffles both sides
    val off = spark.sql(q)
    assert(shuffles(off) >= 2,
      s"control: expected shuffled join, got\n${off.queryExecution}")
    assert(off.as[(Long, Double, String)].collect().toSeq.sorted ==
      expected)
    withSpj {
      val on = spark.sql(q)
      val plan = on.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ must plan the join with NO exchange:\n$plan")
      assert(on.as[(Long, Double, String)].collect().toSeq.sorted ==
        expected, "SPJ rows must equal the shuffled join's")
      // columnar transitions are visible with AQE off (the adaptive
      // plan string hides them inside its result stage)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val noAqe = spark.sql(q)
        val p2 = noAqe.queryExecution.executedPlan.toString
        assert(p2.contains("ColumnarToRow"),
          s"atomic schemas must read VECTORIZED on the native scan:\n$p2")
        assert(!p2.contains("Exchange"), s"still exchange-free:\n$p2")
        assert(noAqe.as[(Long, Double, String)].collect().toSeq.sorted ==
          expected)
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("mismatched bucket counts fall back to a shuffled join, " +
      "rows still correct") {
    val (cat, _) = mkCatalog("mismatch")
    spark.sql(s"CREATE TABLE $cat.a (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.b (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(60).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_mm_a")
    spark.range(60).selectExpr("id", "concat('x', id) AS name")
      .createOrReplaceTempView("spj_mm_b")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM spj_mm_a")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM spj_mm_b")
    withSpj {
      val j = spark.sql(s"SELECT a.id, a.v, b.name FROM $cat.a a " +
        s"JOIN $cat.b b ON a.id = b.id ORDER BY a.id")
      assert(j.as[(Long, Double, String)].collect().length == 60,
        "mismatched layouts must still join correctly")
    }
  }

  test("COMPOSITE bucket keys (grid layout): tables bucketed on the " +
      "same (k1, k2) tuple join exchange-free through per-dimension " +
      "transforms and tuple partition keys; a partial-key join keeps " +
      "its shuffle; an unsupported tuple member degrades to V1") {
    val (cat, root) = mkCatalog("multi")
    def p(n: String) = new File(root, n).getAbsolutePath
    val fa = spark.range(300).selectExpr("id % 7 AS tenant", "id",
      "cast(id AS DOUBLE) AS v").toDF()
    val fb = spark.range(240).selectExpr("id % 7 AS tenant", "id",
      "concat('n', id) AS name").toDF()
    Merge.writeKeyedCols(fa, p("fa"), Seq("tenant", "id"), Seq(4, 8))
    Merge.writeKeyedCols(fb, p("fb"), Seq("tenant", "id"), Seq(4, 8))
    val q = s"SELECT a.tenant, a.id, a.v, b.name FROM $cat.fa a " +
      s"JOIN $cat.fb b ON a.tenant = b.tenant AND a.id = b.id"
    // control: scan off -> shuffled join, 240 matched rows
    val off = spark.sql(q)
    assert(shuffles(off) >= 2, "control must shuffle")
    val expected = off.as[(Long, Long, Double, String)].collect()
      .toSeq.sorted
    assert(expected.size == 240)
    withSpj {
      val on = spark.sql(q)
      val plan = on.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketScan"),
        s"composite layout must build the native scan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"the (tenant, id) co-bucketed join must not exchange:\n$plan")
      // grid files are sorted by the KEY TUPLE and each cell is one
      // file, so the scan claims (k1 asc, k2 asc) and the merge join
      // is a sort-free zipper — no Sort on top of no Exchange
      assert(!plan.linesIterator.exists(l =>
          l.contains(" Sort [") && !l.contains("SortMergeJoin")),
        s"the key-tuple-sorted grid join must plan with NO Sort:\n$plan")
      assert(on.as[(Long, Long, Double, String)].collect()
        .toSeq.sorted == expected,
        "composite SPJ rows must equal the shuffled join's")
      // joining on ONE tuple member does not satisfy the layout: the
      // plan keeps its exchange and stays correct
      val partial = spark.sql(s"SELECT count(*) FROM $cat.fa a " +
        s"JOIN $cat.fb b ON a.id = b.id")
      assert(partial.queryExecution.executedPlan.toString
        .contains("Exchange"),
        "a partial-key join must NOT be declared co-partitioned")
      assert(partial.as[Long].head() == 240L)
    }
    // a DOUBLE tuple member is outside the V2 function's hashable set:
    // the table still reads (V1 bridge), never a planning failure
    Merge.writeKeyedCols(fa.withColumn("dkey", org.apache.spark.sql
      .functions.col("v")), p("fd"), Seq("tenant", "dkey"), Seq(2, 2))
    withSpj {
      val r = spark.sql(s"SELECT id, v FROM $cat.fd")
      assert(!r.queryExecution.executedPlan.toString
        .contains("GraftBucketScan"),
        "unsupported tuple types must degrade to the V1 bridge")
      assert(r.count() == 300L)
    }
    // runtime pruning works PER DIMENSION on the grid: a broadcast-
    // joined 2-key dim delivers In filters on both columns, and only
    // the matching (b_tenant, b_id) cells keep files — 2 keys prune
    // to <= 2 of the 32 grid cells
    spark.conf.set("spark.graft.bucketedScan", "true")
    try {
      GraftBucketScan.lastRuntimePrune = None
      // a real (file-backed) dim: DPP only fires when the filtering
      // side is a scan with a selective predicate, not a local relation
      Seq((0L, 0L, "hot"), (1L, 8L, "hot"), (2L, 9L, "cold"))
        .toDF("tenant", "id", "tag")
        .write.mode("overwrite").parquet(p("dim_pq"))
      spark.read.parquet(p("dim_pq"))
        .createOrReplaceTempView("spj_multi_dim")
      val j = spark.sql(s"SELECT f.id, f.v FROM $cat.fa f " +
        "JOIN spj_multi_dim d ON f.tenant = d.tenant AND f.id = d.id " +
        "WHERE d.tag = 'hot'")
      assert(j.collect().length == 2)
      val prune = GraftBucketScan.lastRuntimePrune
      assert(prune.isDefined,
        "the runtime In-filters must reach the grid scan")
      assert(prune.get._1 <= 4 && prune.get._2 == 32,
        s"2 keys must prune to <= 2x2 of 32 grid cells, got $prune")
    } finally spark.conf.set("spark.graft.bucketedScan", "false")
  }

  test("composite grid FROM SQL: CREATE TABLE with one bucket " +
      "transform per dimension, INSERT INTO loads the empty grid, the " +
      "two-column join is exchange-free, plain INSERT then refuses, " +
      "INSERT OVERWRITE replaces with history intact") {
    val (cat, _) = mkCatalog("multisql")
    spark.sql(s"CREATE TABLE $cat.ga (tenant BIGINT, id BIGINT, " +
      "v DOUBLE) PARTITIONED BY (bucket(4, tenant), bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.gb (tenant BIGINT, id BIGINT, " +
      "name STRING) PARTITIONED BY (bucket(4, tenant), bucket(8, id))")
    spark.range(200).selectExpr("id % 5 AS tenant", "id",
      "cast(id AS DOUBLE) AS v").createOrReplaceTempView("spj_msql_a")
    spark.range(160).selectExpr("id % 5 AS tenant", "id",
      "concat('n', id) AS name").createOrReplaceTempView("spj_msql_b")
    // the INITIAL load of an empty grid lands as a full replace
    spark.sql(s"INSERT INTO $cat.ga SELECT * FROM spj_msql_a")
    spark.sql(s"INSERT INTO $cat.gb SELECT * FROM spj_msql_b")
    withSpj {
      val j = spark.sql(s"SELECT a.id FROM $cat.ga a JOIN $cat.gb b " +
        "ON a.tenant = b.tenant AND a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketScan") &&
        !plan.contains("Exchange"),
        s"the SQL-created grid must join exchange-free:\n$plan")
      assert(j.count() == 160L)
    }
    // a SECOND plain INSERT upserts by key TUPLE (r17 grid DML):
    // replaying the same keys is idempotent, new tuples append
    spark.sql(s"INSERT INTO $cat.ga SELECT * FROM spj_msql_a")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ga").as[Long]
      .head() == 200L,
      "re-inserting the same key tuples must merge, not duplicate")
    spark.sql(s"INSERT INTO $cat.ga " +
      "SELECT 99 AS tenant, 9000 + id AS id, 1.5 AS v FROM range(3)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ga").as[Long]
      .head() == 203L, "new key tuples must insert")
    // INSERT OVERWRITE = versioned full replace
    spark.sql(s"INSERT OVERWRITE $cat.ga " +
      s"SELECT * FROM spj_msql_a WHERE id < 100")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ga").as[Long]
      .head() == 100L)
    val root2 = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val gaPath = new File(root2, "ga").getAbsolutePath
    assert(Merge.currentVersion(spark, gaPath) == 4L,
      "every grid write must be a versioned commit, not a reset")
    assert(Merge.readVersion(spark, gaPath, 3L).count() == 203L,
      "history must survive the grid overwrite")
    withSpj {
      val j2 = spark.sql(s"SELECT a.id FROM $cat.ga a JOIN $cat.gb b " +
        "ON a.tenant = b.tenant AND a.id = b.id")
      assert(!j2.queryExecution.executedPlan.toString.contains("Exchange"),
        "the replaced grid keeps its layout and SPJ")
      assert(j2.count() == 100L)
    }
  }

  test("composite grid LIFECYCLE: DV deletes subtract through the " +
      "native scan with the join exchange-free; compact folds them and " +
      "preserves layout + zipper; single-key upsert refuses loudly; a " +
      "renamed grid key keeps SPJ") {
    val (cat, root) = mkCatalog("multilc")
    def p(n: String) = new File(root, n).getAbsolutePath
    val fa = spark.range(300).selectExpr("id % 7 AS tenant", "id",
      "cast(id AS DOUBLE) AS v").toDF()
    val fb = spark.range(240).selectExpr("id % 7 AS tenant", "id",
      "concat('n', id) AS name").toDF()
    Merge.writeKeyedCols(fa, p("fa"), Seq("tenant", "id"), Seq(4, 8))
    Merge.writeKeyedCols(fb, p("fb"), Seq("tenant", "id"), Seq(4, 8))
    import org.apache.spark.sql.functions.col
    // merge-on-read delete on the grid: 24 of the 240 matched ids die
    val st = Merge.deleteWhereDV(spark, p("fa"), col("id") % 10 === 0L)
    assert(st.rowsDeleted == 30L)
    val q = s"SELECT a.id FROM $cat.fa a JOIN $cat.fb b " +
      "ON a.tenant = b.tenant AND a.id = b.id"
    withSpj {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketScan") && !plan.contains("Exchange"),
        s"DV-bearing grid must keep the exchange-free native join:\n$plan")
      assert(j.count() == 216L, "grid DV subtraction must be exact")
    }
    // compact folds the DVs, preserves the grid layout AND key-tuple
    // sort (sortKeysOf reads layoutCols), so the zipper survives
    Merge.compactVersion(spark, p("fa"))
    withSpj {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") && !plan.linesIterator.exists(
          l => l.contains(" Sort [") && !l.contains("SortMergeJoin")),
        s"compacted grid join must stay exchange-free AND sort-free:\n" +
        plan)
      assert(j.count() == 216L)
    }
    // a single-key upsert CLAIM against the grid's recorded layout
    // still fails fast instead of misrouting tuples
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, p("fa"),
        spark.range(3).selectExpr("0L AS tenant", "id",
          "1.0 AS v").toDF(), "id", 32)
    }
    assert(e.getMessage.contains("layout is fixed"),
      s"upsert must name the layout mismatch, got: ${e.getMessage}")
    // schema evolution guards extend to grid keys: dropping or
    // retyping a key column would break the routing
    intercept[IllegalArgumentException] {
      Merge.dropColumn(spark, p("fa"), "tenant")
    }
    intercept[IllegalArgumentException] {
      Merge.widenColumn(spark, p("fa"), "id",
        org.apache.spark.sql.types.DecimalType(20, 0))
    }
    // renaming a grid KEY column keeps the layout (layoutCols renamed
    // with the schema) and SPJ still aligns positionally
    Merge.renameColumn(spark, p("fa"), "tenant", "org")
    withSpj {
      val j = spark.sql(s"SELECT a.id FROM $cat.fa a JOIN $cat.fb b " +
        "ON a.org = b.tenant AND a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketScan") && !plan.contains("Exchange"),
        s"the renamed grid key must keep SPJ:\n$plan")
      assert(j.count() == 216L)
    }
  }

  test("live deletion vectors are subtracted INSIDE the native scan " +
      "(row-index skip mask) — and the co-bucketed join stays " +
      "exchange-free on a DV-bearing table") {
    val (cat, root) = mkCatalog("dv")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"CREATE TABLE $cat.u (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(40).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_dv_src")
    spark.range(40).selectExpr("id", "concat('n', id) AS name")
      .createOrReplaceTempView("spj_dv_src_u")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM spj_dv_src")
    spark.sql(s"INSERT INTO $cat.u SELECT * FROM spj_dv_src_u")
    val path = new File(root, "t").getAbsolutePath
    Merge.deleteWhereDV(spark, path,
      org.apache.spark.sql.functions.col("id") < 10L)
    // a second DV commit stacks sidecars — the mask must union them
    Merge.deleteWhereDV(spark, path,
      org.apache.spark.sql.functions.col("id") === 39L)
    withSpj {
      val scan = spark.sql(s"SELECT id, v FROM $cat.t")
      assert(scan.queryExecution.executedPlan.toString
        .contains("GraftBucketScan"),
        "a DV-bearing version must still build the NATIVE scan")
      val ids = scan.as[(Long, Double)].collect().map(_._1).sorted
      assert(ids.toSeq == (10L until 39L),
        s"both DV commits must subtract exactly, got ${ids.length} rows")
      // pushed filters skip row groups; the row INDEX stays exact, so
      // the mask still lands on the right positions
      val filtered = spark.sql(
        s"SELECT count(*) FROM $cat.t WHERE id >= 20")
        .as[Long].head()
      assert(filtered == 19L, s"filtered DV read: $filtered")
      // the 100 TB point: merge-on-read does NOT surrender SPJ
      val j = spark.sql(s"SELECT t.id, t.v, u.name FROM $cat.t t " +
        s"JOIN $cat.u u ON t.id = u.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"the DV-bearing co-bucketed join must stay shuffle-free:\n$plan")
      assert(j.count() == 29L)
      // the sidecar set decodes ONCE per executor, not once per split
      // (single-JVM local mode: all tasks share the one cache) — the
      // second full read is pure cache hits
      graft.sources.v2.GraftBucketDvReaderFactory.decodes.set(0L)
      assert(spark.sql(s"SELECT id, v FROM $cat.t").count() == 29L)
      val d1 = graft.sources.v2.GraftBucketDvReaderFactory.decodes.get()
      assert(d1 <= 2L, s"one decode per sidecar SET expected, got $d1")
      assert(spark.sql(s"SELECT id, v FROM $cat.t").count() == 29L)
      assert(graft.sources.v2.GraftBucketDvReaderFactory.decodes.get() == d1,
        "the second read must be served from the decode cache")
      // compaction folds the DVs physically; results identical after
      Merge.compactVersion(spark, path)
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long]
        .head() == 29L)
    }
  }

  test("DV subtraction stays VECTORIZED: a scan under live deletion " +
      "vectors still plans ColumnarToRow, the selection preserves " +
      "values exactly, and decode allocation is one long per deleted " +
      "row (sorted arrays, not boxed sets)") {
    val (cat, root) = mkCatalog("dvcol")
    val path = new File(root, "t").getAbsolutePath
    // multi-file buckets: the monotone skip cursor must survive file
    // AND batch boundaries inside a bucket
    Merge.writeKeyed(spark.range(4000).selectExpr("id",
        "cast(id % 997 AS DOUBLE) AS v", "concat('s', id) AS s").toDF(),
      path, "id", 4, filesPerBucket = 3)
    import org.apache.spark.sql.functions.col
    Merge.deleteWhereDV(spark, path, col("id") % 10 < 3) // ~30%
    withSpj {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        graft.sources.v2.GraftBucketDvReaderFactory.decodes.set(0L)
        graft.sources.v2.GraftBucketDvReaderFactory.decodedPositions
          .set(0L)
        val q = spark.sql(s"SELECT id, v, s FROM $cat.t")
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("GraftBucketScan"),
          s"DV-bearing table must keep the native scan:\n$plan")
        assert(plan.contains("ColumnarToRow"),
          s"the DV path must NOT fall back to row mode:\n$plan")
        val got = q.as[(Long, Double, String)].collect()
        val expect = (0L until 4000L).filterNot(_ % 10 < 3)
          .map(i => (i, (i % 997).toDouble, s"s$i"))
        assert(got.length == expect.size,
          s"live rows: got ${got.length}, want ${expect.size}")
        assert(got.toSet == expect.toSet,
          "selection must keep exactly the live rows' values")
        // decode allocation bound: the skip set is a sorted long[] —
        // 8 bytes per deleted row — and decodes once per executor
        val deleted = 4000 - expect.size
        val d = graft.sources.v2.GraftBucketDvReaderFactory.decodes.get()
        assert(d >= 1L)
        assert(graft.sources.v2.GraftBucketDvReaderFactory
          .decodedPositions.get() == d * deleted,
          s"decoded positions must be exactly $deleted per decode")
        // pushed filters skip row groups; the columnar row index stays
        // exact, so the mask still lands on the right positions
        val filtered = spark.sql(
          s"SELECT count(*) FROM $cat.t WHERE id >= 2000").as[Long].head()
        assert(filtered == 1400L, s"filtered columnar DV read: $filtered")
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("ROW-GROUP-LEVEL DV SKIPPING (r17): a clustered delete whose " +
      "positions cover whole row groups skips their decode entirely; " +
      "values stay exact; a scattered delete skips nothing") {
    val (cat, root) = mkCatalog("dvrg")
    val path = new File(root, "t").getAbsolutePath
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    // small row groups so one file holds many (the writer checks the
    // block size every few hundred rows)
    hc.setInt("parquet.block.size", 64 * 1024)
    val seam = graft.sources.v2.GraftBucketDvReaderFactory
    val oldMin = seam.rowGroupSkipMinPositions
    try {
      Merge.writeKeyed(spark.range(40000).selectExpr("id",
          "concat('pad_padding_padding_', id) AS s").toDF(),
        path, "id", 1) // ONE bucket: the file is sorted by id, so a
        // key-range delete is CONTIGUOUS positions
      seam.rowGroupSkipMinPositions = 64
      import org.apache.spark.sql.functions.col
      // clustered: the first half of the (sorted) file dies
      Merge.deleteWhereDV(spark, path, col("id") < 20000L)
      withSpj {
        seam.skippedRowGroups.set(0L)
        val q = spark.sql(s"SELECT id, s FROM $cat.t")
        assert(q.queryExecution.executedPlan.toString
          .contains("GraftBucketScan"))
        val got = q.as[(Long, String)].collect()
        assert(got.length == 20000 &&
          got.forall { case (i, s) =>
            i >= 20000L && s == s"pad_padding_padding_$i" },
          "row-group skipping must not change a single value")
        assert(seam.skippedRowGroups.get() > 0L,
          "a half-file clustered delete must skip whole row groups")
        // count through the same scan agrees
        assert(spark.sql(s"SELECT count(*) FROM $cat.t")
          .as[Long].head() == 20000L)
      }
      // SCATTERED control: every row group keeps live rows — nothing
      // skippable, and the ordinary masked read stays exact
      val p2 = new File(root, "t2").getAbsolutePath
      Merge.writeKeyed(spark.range(40000).selectExpr("id",
          "concat('pad_padding_padding_', id) AS s").toDF(),
        p2, "id", 1)
      Merge.deleteWhereDV(spark, p2, col("id") % 3 === 0L)
      withSpj {
        seam.skippedRowGroups.set(0L)
        val n = spark.sql(s"SELECT count(*) FROM $cat.t2")
          .as[Long].head()
        assert(n == (0L until 40000L).count(_ % 3 != 0))
        assert(seam.skippedRowGroups.get() == 0L,
          "a scattered delete covers no row group — nothing to skip")
      }
    } finally {
      seam.rowGroupSkipMinPositions = oldMin
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
    }
  }

  private def sortNodes(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains(" Sort [") && !l.contains("SortMergeJoin"))

  test("merge-on-read upsert drops the sorted contract (Sorts " +
      "re-plan, join stays exchange-free); compactVersion(resortKey) " +
      "restores the sort-free zipper") {
    val (cat, root) = mkCatalog("morsort")
    val pa = new File(root, "a").getAbsolutePath
    val pb = new File(root, "b").getAbsolutePath
    Merge.writeKeyed(spark.range(200)
      .selectExpr("id", "cast(id as double) AS v").toDF(), pa, "id", 4)
    Merge.writeKeyed(spark.range(200)
      .selectExpr("id", "concat('n', id) AS name").toDF(), pb, "id", 4)
    withSpj {
      def plan(): String = spark.sql(
        s"SELECT a.id, a.v, b.name FROM $cat.a a JOIN $cat.b b " +
        "ON a.id = b.id").queryExecution.executedPlan.toString
      val p0 = plan()
      assert(!p0.contains("Exchange") && sortNodes(p0) == 0,
        s"baseline co-bucketed join must be exchange- AND sort-free:\n$p0")
      // merge-on-read upsert: appended files overlap the old key
      // ranges, so the sorted contract drops — Sorts re-plan, the
      // partitioning (and the exchange-free join) survives
      Merge.upsertDV(spark, pa,
        spark.range(5, 6).selectExpr("id", "cast(555.5 as double) AS v")
          .toDF(), "id", 4)
      val p1 = plan()
      assert(!p1.contains("Exchange"),
        s"the mor-upserted side must keep SPJ:\n$p1")
      assert(sortNodes(p1) > 0,
        s"overlapping appended files must re-plan the Sorts:\n$p1")
      assert(spark.sql(s"SELECT v FROM $cat.a WHERE id = 5")
        .as[Double].head() == 555.5)
      // one maintenance pass: full key-sorted rewrite restores the flag
      val cs = Merge.compactVersion(spark, pa, resortKey = true)
      assert(cs.bucketsRewritten == 4, s"resortKey rewrites ALL: $cs")
      val p2 = plan()
      assert(!p2.contains("Exchange") && sortNodes(p2) == 0,
        s"post-resort the zipper must be sort-free again:\n$p2")
      val j = spark.sql(s"SELECT a.id, a.v FROM $cat.a a " +
        s"JOIN $cat.b b ON a.id = b.id WHERE a.id = 5")
        .as[(Long, Double)].head()
      assert(j == ((5L, 555.5)))
    }
  }

  test("key-sorted scan: the co-bucketed merge join plans with no " +
      "Exchange AND no Sort; a zOrder rewrite brings the Sorts back") {
    val (cat, root) = mkCatalog("sorted")
    spark.sql(s"CREATE TABLE $cat.a (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.b (id BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.range(300).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_sort_a")
    spark.range(300).selectExpr("id", "cast(id * 2 as double) AS w")
      .createOrReplaceTempView("spj_sort_b")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM spj_sort_a")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM spj_sort_b")
    val q = s"SELECT a.id, a.v, b.w FROM $cat.a a " +
      s"JOIN $cat.b b ON a.id = b.id"
    withSpj {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"no exchange expected:\n$plan")
      assert(sortNodes(plan) == 0,
        s"key-sorted single-file buckets must elide the join sorts:\n$plan")
      assert(j.count() == 300L)
      // a zOrder rewrite sorts files by OTHER columns — the manifest
      // drops keySorted, the scan stops reporting ordering, and the
      // join sorts again (correctness never depended on the report)
      val pathB = new File(root, "b").getAbsolutePath
      Merge.compactVersion(spark, pathB, zOrderBy = Seq("w"))
      val j2 = spark.sql(q)
      val plan2 = j2.queryExecution.executedPlan.toString
      assert(sortNodes(plan2) > 0,
        s"post-zOrder files are not key-sorted — Sort must return:\n$plan2")
      assert(j2.count() == 300L)
    }
  }

  test("runtime bucket pruning: a broadcast-joined filtered dim prunes " +
      "the fact scan's buckets at execution time (DPP for buckets)") {
    val (cat, _) = mkCatalog("dpp")
    spark.sql(s"CREATE TABLE $cat.fact (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(16, id))")
    spark.sql(s"CREATE TABLE $cat.dim (id BIGINT, grp STRING) " +
      "PARTITIONED BY (bucket(16, id))")
    spark.range(400).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_dpp_f")
    spark.range(400).selectExpr("id",
      "CASE WHEN id < 3 THEN 'hot' ELSE concat('g', id) END AS grp")
      .createOrReplaceTempView("spj_dpp_d")
    spark.sql(s"INSERT INTO $cat.fact SELECT * FROM spj_dpp_f")
    spark.sql(s"INSERT INTO $cat.dim SELECT * FROM spj_dpp_d")
    spark.conf.set("spark.graft.bucketedScan", "true")
    try {
      GraftBucketScan.lastRuntimePrune = None
      // the dim filter keeps 3 keys -> at most 3 of 16 fact buckets
      // survive the runtime In-filter; broadcast join (dim is tiny)
      // is the shape Spark's runtime filtering targets by default
      val j = spark.sql(s"SELECT f.id, f.v, d.grp FROM $cat.fact f " +
        s"JOIN $cat.dim d ON f.id = d.id WHERE d.grp = 'hot'")
      val rows = j.collect()
      assert(rows.length == 3, s"got ${rows.length} rows")
      val prune = GraftBucketScan.lastRuntimePrune
      assert(prune.isDefined,
        "the runtime In-filter must reach the fact scan")
      assert(prune.get._1 <= 3 && prune.get._2 == 16,
        s"3 keys must prune to <= 3 of 16 buckets, got $prune")
    } finally spark.conf.set("spark.graft.bucketedScan", "false")
  }

  test("one-side shuffle: a graft table joined to a PLAIN frame " +
      "shuffles only the plain side, routed by the V2 bucket function") {
    val (cat, _) = mkCatalog("oneside")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.range(250).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_os_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM spj_os_src")
    spark.range(250).selectExpr("id", "concat('p', id) AS tag")
      .createOrReplaceTempView("spj_os_plain")
    withSpj {
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        val j = spark.sql(s"SELECT t.id, t.v, p.tag FROM $cat.t t " +
          "JOIN spj_os_plain p ON t.id = p.id")
        val plan = j.queryExecution.executedPlan.toString
        val exchanges = plan.linesIterator
          .count(_.contains("Exchange"))
        // exactly ONE exchange — the plain side routed INTO the graft
        // table's bucket partitioning by GraftBucketFunction; the
        // table side streams from storage unshuffled. If produceResult
        // disagreed with the writer's routing, matching keys would
        // land in different partitions and rows would VANISH — the
        // count is the end-to-end proof of the hash contract.
        assert(exchanges == 1,
          s"expected exactly one exchange (the plain side):\n$plan")
        assert(j.count() == 250L,
          "every key must meet its match under function-routed shuffle")
      } finally spark.conf.unset(
        "spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("COMPATIBLE bucket counts (8 vs 4) join with NO exchange when " +
      "allowCompatibleTransforms is on: the finer side reduces to the " +
      "gcd via the ReducibleFunction hook") {
    val (cat, _) = mkCatalog("compat")
    spark.sql(s"CREATE TABLE $cat.fine (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.coarse (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(240).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_cp_f")
    spark.range(200).selectExpr("id", "concat('x', id) AS name")
      .createOrReplaceTempView("spj_cp_c")
    spark.sql(s"INSERT INTO $cat.fine SELECT * FROM spj_cp_f")
    spark.sql(s"INSERT INTO $cat.coarse SELECT * FROM spj_cp_c")
    val q = s"SELECT f.id, f.v, c.name FROM $cat.fine f " +
      s"JOIN $cat.coarse c ON f.id = c.id"
    val expected = spark.sql(
      "SELECT f.id, f.v, c.name FROM spj_cp_f f " +
      "JOIN spj_cp_c c ON f.id = c.id")
      .as[(Long, Double, String)].collect().toSeq.sorted
    withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".allowCompatibleTransforms.enabled", "true")
      try {
        val j = spark.sql(q)
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"8⋈4 must reduce to gcd 4 and plan with NO exchange:\n$plan")
        // rows identical to the plain join — the modular reduction
        // (pmod(h,8) % 4 == pmod(h,4)) must align every key pair
        assert(j.as[(Long, Double, String)].collect().toSeq.sorted ==
          expected, "compatible-transform SPJ rows must match")
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing" +
        ".allowCompatibleTransforms.enabled")
    }
    // COPRIME counts decline reduction (gcd 1 would serialize the
    // join): same conf, but the plan keeps its shuffles, rows correct
    spark.sql(s"CREATE TABLE $cat.three (id BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(3, id))")
    spark.sql(s"INSERT INTO $cat.three SELECT id, " +
      "cast(id * 3 as double) FROM spj_cp_f")
    withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".allowCompatibleTransforms.enabled", "true")
      try {
        val j2 = spark.sql(s"SELECT f.id, t.w FROM $cat.fine f " +
          s"JOIN $cat.three t ON f.id = t.id")
        assert(j2.count() == 240L,
          "coprime-count fallback must still join correctly")
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing" +
        ".allowCompatibleTransforms.enabled")
    }
  }

  test("DATE-keyed co-bucketed tables join exchange-free (widened SPJ " +
      "key types); TIMESTAMP routing matches the writer bit-for-bit") {
    val (cat, _) = mkCatalog("datekey")
    spark.sql(s"CREATE TABLE $cat.a (d DATE, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, d))")
    spark.sql(s"CREATE TABLE $cat.b (d DATE, name STRING) " +
      "PARTITIONED BY (bucket(8, d))")
    spark.range(120).selectExpr(
      "date_add(date'2024-01-01', cast(id as int)) AS d",
      "cast(id as double) AS v").createOrReplaceTempView("spj_date_a")
    spark.range(120).selectExpr(
      "date_add(date'2024-01-01', cast(id as int)) AS d",
      "concat('n', id) AS name").createOrReplaceTempView("spj_date_b")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM spj_date_a")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM spj_date_b")
    withSpj {
      val j = spark.sql(s"SELECT a.d, a.v, b.name FROM $cat.a a " +
        s"JOIN $cat.b b ON a.d = b.d")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"date-keyed SPJ must plan with no exchange:\n$plan")
      assert(j.count() == 120L,
        "every date key must meet its match — partition values aligned")
    }
  }

  test("V2 bucket function routing == the writer's pmod(xxhash64) for " +
      "every supported key type (the SPJ hash contract)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{expr, lit, pmod, xxhash64}
    val n = 16
    val cases: Seq[(DataType, Seq[Any], Any => Any)] = Seq(
      (LongType, Seq(0L, 1L, -7L, 123456789012L), identity),
      (IntegerType, Seq(0, 1, -7, 2000000000), identity),
      (StringType, Seq("", "a", "key_42", "ä ünicode"),
        (v: Any) => org.apache.spark.unsafe.types.UTF8String
          .fromString(v.asInstanceOf[String])),
      (DateType, Seq(0, 19723, -3650), identity),          // days
      (TimestampType, Seq(0L, 1700000000000000L, -1L), identity), // µs
      (TimestampNTZType, Seq(0L, 1700000000000000L, -1L), identity))
    for ((dt, vals, toInternal) <- cases) {
      val bound = graft.sources.v2.GraftBucketFunction.bind(
        StructType(Seq(StructField("n", IntegerType),
          StructField("k", dt))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog
          .functions.ScalarFunction[java.lang.Long]]
      // the writer's own routing expression, evaluated by the engine
      // over the EXTERNAL forms of the same values
      val sqlCol = dt match {
        case DateType => expr("date_add(date'1970-01-01', cast(v as int))")
        case TimestampType => expr("timestamp_micros(v)")
        case TimestampNTZType =>
          expr("cast(timestamp_micros(v) as timestamp_ntz)")
        case _ => expr(s"cast(v as ${dt.sql})")
      }
      val df = vals.map(v => Tuple1(v match {
        case i: Int => i.toLong
        case l: Long => l
        case s: String => 0L // strings ride the literal path below
      })).toDF("v")
      val expected: Seq[Long] = dt match {
        case StringType => vals.map(s =>
          spark.range(1).select(
            pmod(xxhash64(lit(s)), lit(n.toLong))).head().getLong(0))
        case _ => df.select(
          pmod(xxhash64(sqlCol), lit(n.toLong))).collect()
          .map(_.getLong(0)).toSeq
      }
      val got = vals.map(v =>
        bound.produceResult(InternalRow(n, toInternal(v))).longValue())
      assert(got == expected,
        s"$dt routing mismatch: function $got vs writer $expected")
    }
  }

  test("an unsupported key type (DECIMAL) degrades to the shuffled V1 " +
      "plan — no planning failure, rows correct") {
    val (cat, _) = mkCatalog("dec")
    spark.sql(s"CREATE TABLE $cat.a (k DECIMAL(10,2), v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE $cat.b (k DECIMAL(10,2), name STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.range(30).selectExpr("cast(id as decimal(10,2)) AS k",
      "cast(id as double) AS v").createOrReplaceTempView("spj_dec_a")
    spark.range(30).selectExpr("cast(id as decimal(10,2)) AS k",
      "concat('n', id) AS name").createOrReplaceTempView("spj_dec_b")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM spj_dec_a")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM spj_dec_b")
    withSpj {
      // bucketScanUnits gates on the key type -> native scan never
      // built -> V1 bridge; and even a direct bind() refuses with
      // UnsupportedOperationException (the failure mode Spark's V2
      // function resolution swallows), never a planning crash
      val j = spark.sql(s"SELECT a.k, a.v, b.name FROM $cat.a a " +
        s"JOIN $cat.b b ON a.k = b.k")
      assert(j.count() == 30L)
      assert(!j.queryExecution.executedPlan.toString
        .contains("GraftBucketScan"),
        "a decimal-keyed table must not build the native scan")
      intercept[UnsupportedOperationException] {
        graft.sources.v2.GraftBucketFunction.bind(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.DecimalType(10, 2)))))
      }
    }
  }

  test("runtime bucket pruning composes with the DV skip mask: pruned " +
      "buckets skip the sidecar pass, surviving buckets still " +
      "subtract their deleted rows") {
    val (cat, root) = mkCatalog("dvdpp")
    spark.sql(s"CREATE TABLE $cat.fact (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(16, id))")
    spark.sql(s"CREATE TABLE $cat.dim (id BIGINT, grp STRING) " +
      "PARTITIONED BY (bucket(16, id))")
    spark.range(400).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_dvdpp_f")
    spark.range(400).selectExpr("id",
      "CASE WHEN id IN (7, 8) THEN 'hot' ELSE concat('g', id) END AS grp")
      .createOrReplaceTempView("spj_dvdpp_d")
    spark.sql(s"INSERT INTO $cat.fact SELECT * FROM spj_dvdpp_f")
    spark.sql(s"INSERT INTO $cat.dim SELECT * FROM spj_dvdpp_d")
    val factPath = new File(root, "fact").getAbsolutePath
    // DV-delete id=7: one of the two hot keys dies merge-on-read
    Merge.deleteWhereDV(spark, factPath,
      org.apache.spark.sql.functions.col("id") === 7L)
    spark.conf.set("spark.graft.bucketedScan", "true")
    try {
      GraftBucketScan.lastRuntimePrune = None
      val j = spark.sql(s"SELECT f.id, f.v FROM $cat.fact f " +
        s"JOIN $cat.dim d ON f.id = d.id WHERE d.grp = 'hot'")
      val rows = j.collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(8L),
        s"id 7 is DV-dead, id 8 survives the pruned scan: " +
        rows.mkString(","))
      val prune = GraftBucketScan.lastRuntimePrune
      assert(prune.exists(p => p._1 <= 2 && p._2 == 16),
        s"2 hot keys must prune to <= 2 of 16 buckets, got $prune")
    } finally spark.conf.set("spark.graft.bucketedScan", "false")
  }

  test("per-FILE splits: multi-file buckets join correctly (Spark " +
      "sorts grouped splits), partiallyClusteredDistribution gives a " +
      "hot bucket its own tasks, plain scans parallelize per file") {
    val (cat, root) = mkCatalog("splits")
    val pathA = new File(root, "a").getAbsolutePath
    // 3 files per bucket from the start — the multi-file shape of a
    // skewed/hot bucket (compactVersion is over-target-selective and
    // would leave 1-file buckets alone); the dir-mode catalog resolves
    // the written table like any CREATEd one
    Merge.writeKeyed(
      spark.range(400).selectExpr("id", "cast(id as double) AS v"),
      pathA, "id", nBuckets = 4, filesPerBucket = 3)
    spark.sql(s"CREATE TABLE $cat.b (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(400).selectExpr("id", "concat('n', id) AS name")
      .createOrReplaceTempView("spj_sp_b")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM spj_sp_b")
    val plan = Merge.bucketScanUnits(spark, pathA,
      Merge.currentVersion(spark, pathA), Seq.empty).get
    val scan = new graft.sources.v2.GraftBucketScan(pathA,
      Merge.currentVersion(spark, pathA),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v DOUBLE"),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v DOUBLE"),
      Array.empty, plan.keyCols, plan.bucketNs, plan.keySorted,
      plan.units, plan.dvFiles, plan.colMap)
    val parts = scan.planInputPartitions()
    assert(parts.length == plan.units.map(_._2.size.max(1)).sum &&
      parts.length > plan.units.size,
      s"per-FILE splits expected, got ${parts.length} partitions for " +
      s"${plan.units.size} buckets")
    withSpj {
      // grouped multi-file buckets lose the ordering claim -> Spark
      // plans Sorts; the join stays exchange-free and EXACT (this is
      // the case a stale per-partition ordering claim would corrupt)
      val j = spark.sql(s"SELECT a.id, a.v, b.name FROM $cat.a a " +
        s"JOIN $cat.b b ON a.id = b.id")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"still exchange-free:\n$p")
      assert(sortNodes(p) > 0,
        s"grouped multi-file splits must bring the Sort back:\n$p")
      assert(j.count() == 400L)
      // the hot-bucket skew escape: partially clustered keeps the
      // multi-file side UNGROUPED (a task per file) and replicates
      // the other side's matching partitions — still no full shuffle
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled", "true")
      try {
        val j2 = spark.sql(s"SELECT a.id, a.v, b.name FROM $cat.a a " +
          s"JOIN $cat.b b ON a.id = b.id")
        val p2 = j2.queryExecution.executedPlan.toString
        assert(!p2.contains("Exchange"),
          s"partially clustered must not add a shuffle:\n$p2")
        assert(j2.count() == 400L,
          "replicated partitions must join exactly")
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled")
    }
  }

  test("COLUMN-MAPPED tables stay on the native scan: renamed columns " +
      "read correctly (physical names at the reader doorway only), " +
      "filters prune under the rename, the join stays exchange-free") {
    val (cat, root) = mkCatalog("cmap")
    spark.sql(s"CREATE TABLE $cat.a (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.b (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.range(160).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_cm_a")
    spark.range(160).selectExpr("id", "concat('n', id) AS name")
      .createOrReplaceTempView("spj_cm_b")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM spj_cm_a")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM spj_cm_b")
    // metadata-only renames: files keep the ORIGINAL physical names,
    // the manifest records logical->physical (colMap non-empty)
    val pathA = new File(root, "a").getAbsolutePath
    Merge.renameColumn(spark, pathA, "v", "score")
    Merge.renameColumn(spark, pathA, "id", "key")
    withSpj {
      val scan = spark.sql(s"SELECT key, score FROM $cat.a")
      assert(scan.queryExecution.executedPlan.toString
        .contains("GraftBucketScan"),
        "a column-mapped version must still build the native scan")
      assert(scan.as[(Long, Double)].collect().sortBy(_._1).toSeq ==
        (0L until 160L).map(i => (i, i.toDouble)))
      // pushed filter on a RENAMED column: renamed at the reader
      // doorway, still correct (and still only advisory pruning)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.a WHERE score >= 100.0")
        .as[Long].head() == 60L)
      // the rename does not cost the zero-shuffle join (key column
      // renamed on one side only — join on the LOGICAL names)
      val j = spark.sql(s"SELECT a.key, a.score, b.name FROM $cat.a a " +
        s"JOIN $cat.b b ON a.key = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"the renamed co-bucketed join must stay shuffle-free:\n$plan")
      assert(j.count() == 160L)
      // colMap + DVs TOGETHER (the full CDC steady state)
      Merge.deleteWhereDV(spark, pathA,
        org.apache.spark.sql.functions.col("key") < 10L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.a").as[Long]
        .head() == 150L)
      assert(spark.sql(s"SELECT min(key) FROM $cat.a WHERE key >= 0")
        .as[Long].head() == 10L)
    }
  }

  test("a time-traveled table reports the PINNED version's bucket " +
      "layout, not the post-relayout head's") {
    val (cat, root) = mkCatalog("pinned")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(50).selectExpr("id", "cast(id as double) AS v")
      .createOrReplaceTempView("spj_pin_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM spj_pin_src")
    val path = new File(root, "t").getAbsolutePath
    val pinned = Merge.currentVersion(spark, path)
    Merge.relayout(spark, path, newBuckets = 8)
    def bucketCount(t: graft.sources.v2.GraftTable): String =
      t.partitioning().map(_.describe()).mkString(",")
    val head = graft.sources.v2.GraftTable.resolve(
      spark, path, None, None, None)
    assert(bucketCount(head).contains("8"),
      s"head reports the new layout: ${bucketCount(head)}")
    val old = graft.sources.v2.GraftTable.resolve(
      spark, path, Some(pinned), None, None)
    assert(bucketCount(old).contains("4"),
      s"the pinned resolution must report ITS version's layout, got " +
      bucketCount(old))
  }

  test("groupBy on the bucket key also skips its exchange under the " +
      "native scan (co-partitioned aggregation)") {
    val (cat, _) = mkCatalog("agg")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.range(100).selectExpr("id % 20 AS id",
      "cast(id as double) AS v")
      .groupBy("id")
      .agg(org.apache.spark.sql.functions.sum("v").as("v"))
      .createOrReplaceTempView("spj_agg_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM spj_agg_src")
    withSpj {
      val g = spark.sql(
        s"SELECT id, sum(v) AS s FROM $cat.t GROUP BY id")
      val plan = g.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"key-grouped aggregation must not exchange:\n$plan")
      assert(g.count() == 20L)
    }
  }
}
