package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.v2.GraftTable
import org.apache.spark.sql.functions._

/** The DSv2 doorway: `spark.read.format("graft-table")` and the
  * `GraftCatalog` session catalog must resolve the version log with
  * manifest-stats pruning, and the one registered name must still fall
  * back to the v1 streaming source for `readStream`.
  */
class GraftTableV2Spec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): File = {
    val d = Files.createTempDirectory(s"graft_v2_spec_$tag").toFile
    d.deleteOnExit()
    d
  }

  private def baseDf =
    (0L until 200L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  test("format(graft-table) batch read equals readKeyed") {
    val path = new File(freshDir("eq"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 8)
    val v2 = spark.read.format("graft-table").option("path", path).load()
    assert(v2.schema == Merge.readKeyed(spark, path).schema)
    val a = v2.orderBy("id").collect()
    val b = Merge.readKeyed(spark, path).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("pushed filters prune the file plan via manifest stats") {
    val path = new File(freshDir("prune"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 8,
      statsCols = Seq("id"))
    GraftTable.lastScanFiles = None
    val df = spark.read.format("graft-table").option("path", path).load()
      .filter($"id" === 7L)
    // the DSv2 negotiation reports the pushed filter in the plan
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed filters in plan:\n$plan")
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("name") == "name_7")
    val Some((sel, total)) = GraftTable.lastScanFiles
    assert(sel < total && sel >= 1,
      s"stats pruning must drop files: selected $sel of $total")
  }

  test("column pruning reaches the scan: one required column") {
    val path = new File(freshDir("prunecol"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val df = spark.read.format("graft-table").option("path", path).load()
      .select("name")
    val leafOutputs = df.queryExecution.executedPlan.collectLeaves()
      .map(_.output.map(_.name))
    assert(leafOutputs.exists(_ == Seq("name")),
      s"scan should output only 'name', got $leafOutputs")
    assert(df.distinct().count() == 200L)
  }

  test("time travel options: versionAsOf, tagAsOf, timestampAsOf; " +
      "snapshot pinned at load") {
    val path = new File(freshDir("tt"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    val t0 = Merge.commitTime(spark, path, 0L)
    Merge.tagVersion(spark, path, "v-zero", 0L)
    Merge.upsert(spark, path,
      Seq((7L, "v1", 7.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    def nameOf7(df: org.apache.spark.sql.DataFrame): String =
      df.filter($"id" === 7L).select("name").as[String].head()
    val rd = spark.read.format("graft-table").option("path", path)
    assert(nameOf7(rd.load()) == "v1")
    assert(nameOf7(rd.option("versionAsOf", "0").load()) == "name_7")
    val rd2 = spark.read.format("graft-table").option("path", path)
    assert(nameOf7(rd2.option("tagAsOf", "v-zero").load()) == "name_7")
    val rd3 = spark.read.format("graft-table").option("path", path)
    assert(nameOf7(rd3.option("timestampAsOf", t0.toString).load())
      == "name_7")
    // pinned snapshot: a frame loaded BEFORE a commit still reads its
    // own version after the commit lands
    val pinned = spark.read.format("graft-table").option("path", path).load()
    Merge.upsert(spark, path,
      Seq((7L, "v2", 7.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    assert(nameOf7(pinned) == "v1")
  }

  test("merge-on-read deletion vectors apply through the DSv2 read") {
    val path = new File(freshDir("dv"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" < 50L)
    val v2 = spark.read.format("graft-table").option("path", path).load()
    assert(v2.count() == 150L && v2.agg(min("id")).as[Long].head() == 50L)
  }

  test("readStream on the same registered name still rides the v1 " +
      "streaming source") {
    val base = freshDir("stream")
    val path = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf.limit(5), path, "id", nBuckets = 2)
    val q = spark.readStream.format("graft-table").option("path", path)
      .load()
      .writeStream.format("memory").queryName("v2_fallback_sink")
      .option("checkpointLocation",
        new File(base, "ckpt").getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("v2_fallback_sink").collect()
    assert(got.length == 5 && got.forall(_.getAs[Int]("op") == 1))
  }

  test("GraftCatalog dir mode: SELECT from plain SQL with pruning") {
    val root = freshDir("cat_dir")
    val p1 = new File(root, "orders").getAbsolutePath
    val p2 = new File(root, "items").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 8, statsCols = Seq("id"))
    Merge.writeKeyed(
      (0L until 50L).map(i => (i, s"item_$i")).toDF("id", "item"),
      p2, "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gdir",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdir.root", root.getAbsolutePath)
    val got = spark.sql(
      "SELECT o.id, o.name, i.item FROM gdir.orders o " +
      "JOIN gdir.items i ON o.id = i.id WHERE o.id = 7")
      .collect()
    assert(got.length == 1 && got(0).getString(2) == "item_7")
    assert(spark.sql("SHOW TABLES IN gdir").collect()
      .map(_.getAs[String]("tableName")).toSet == Set("orders", "items"))
  }

  test("GraftCatalog catalog mode: SQL reads the PINNED cross-table " +
      "snapshot, not the members' drifted heads") {
    val root = freshDir("cat_pin")
    val catRoot = new File(root, "cat").getAbsolutePath
    val p1 = new File(root, "t1").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    TableCatalog.create(spark, catRoot, Map("t1" -> p1))
    // an out-of-band commit above the pin must stay invisible to SQL
    Merge.upsert(spark, p1,
      Seq((7L, "drifted", 0.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gpin",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpin.root", catRoot)
    val got = spark.sql("SELECT name FROM gpin.t1 WHERE id = 7")
      .as[String].collect()
    assert(got.toSeq == Seq("name_7"),
      "catalog SQL must read the pinned version")
  }

  test("SQL time travel: VERSION AS OF number and tag") {
    val root = freshDir("cat_tt")
    val p1 = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    Merge.tagVersion(spark, p1, "first", 0L)
    Merge.upsert(spark, p1,
      Seq((7L, "now", 0.0)).toDF("id", "name", "score"), "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gtt", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt.root", root.getAbsolutePath)
    assert(spark.sql("SELECT name FROM gtt.t WHERE id = 7")
      .as[String].head() == "now")
    assert(spark.sql("SELECT name FROM gtt.t VERSION AS OF 0 WHERE id = 7")
      .as[String].head() == "name_7")
    assert(spark.sql(
      "SELECT name FROM gtt.t VERSION AS OF 'first' WHERE id = 7")
      .as[String].head() == "name_7")
  }

  test("batch CDF read: readChangeFeed with inclusive startingVersion " +
      "and endingVersion; misuse refused") {
    val path = new File(freshDir("cdf"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)          // v0
    Merge.upsert(spark, path,
      Seq((3L, "upd3", 333.0)).toDF("id", "name", "score"), "id", 4) // v1
    Merge.upsert(spark, path,
      Seq((5L, "name_5", 50.0, true), (500L, "new", 5.0, false))
        .toDF("id", "name", "score", "__d"),
      "id", 4, tombstoneCol = Some("__d"))                       // v2
    val all = spark.read.format("graft-table").option("path", path)
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load()
    assert(all.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    val got = all.select("id", "_change_type", "_commit_version")
      .orderBy("_commit_version", "_change_type", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, "update_postimage", 1L),
      (3L, "update_preimage", 1L), (5L, "delete", 2L),
      (500L, "insert", 2L)))
    // bounded range: only v1's changes
    val v1only = spark.read.format("graft-table").option("path", path)
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("endingVersion", "1").load()
    assert(v1only.select("_commit_version").distinct()
      .as[Long].collect().toSeq == Seq(1L))
    // misuse is refused loudly: startingVersion=0 is a STREAM start
    // shape (snapshot of v0 + deltas), so a batch load resolves to the
    // stream-only table and fails Spark's batch-capability check
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load()
    }
    // ...and a stream-shaped start combined with endingVersion is
    // contradictory whichever surface was meant
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .option("endingVersion", "1").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .option("versionAsOf", "1").load()
    }
    // a NUMERIC startingVersion BEYOND THE HEAD is a legal STREAM
    // start ("tail the next commit" — the v1 source's (v-1, None)
    // anchoring), so resolution cannot reject it eagerly; a BATCH read
    // of that shape still fails LOUDLY with the valid range when the
    // scan plans — never the opaque capability error
    val past = intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "99")
        .load().collect()
    }
    assert(past.getMessage.contains("[1, 2]"), past.getMessage)
    // ...and beyond an EXPLICIT endingVersion the shape can only mean
    // a batch range: loud at resolution
    val pastEnd = intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "99")
        .option("endingVersion", "2").load()
    }
    assert(pastEnd.getMessage.contains("[1, 2]"), pastEnd.getMessage)
    val neg = intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "-3")
        .load()
    }
    assert(neg.getMessage.contains("[1, 2]"), neg.getMessage)
  }

  test("readStream readChangeFeed with a beyond-head startingVersion " +
      "tails the table's NEXT commits (stream-only start shape)") {
    val base = freshDir("cdf_future")
    val path = new File(base, "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf.limit(5), path, "id", nBuckets = 2)   // v0
    // head is v0; start at v1 = "the first commit that hasn't landed"
    def run(tag: String): Seq[(Long, String, Long)] = {
      val q = spark.readStream.format("graft-table").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load()
        .writeStream.format("memory").queryName(s"cdf_future_$tag")
        .option("checkpointLocation",
          new File(base, s"ckpt_$tag").getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.table(s"cdf_future_$tag")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    }
    assert(run("a").isEmpty, "nothing committed beyond the start yet")
    Merge.upsert(spark, path,
      Seq((777L, "tail", 7.0)).toDF("id", "name", "score"), "id", 2) // v1
    assert(run("b") == Seq((777L, "insert", 1L)),
      "only v1's changes must flow from the beyond-head start")
  }

  test("aggregate pushdown: COUNT(*)/MIN/MAX answer from the manifest " +
      "with no aggregate node and no data I/O; inexact cases fall back") {
    val path = new File(freshDir("agg"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id", "score"))
    val rd = spark.read.format("graft-table").option("path", path).load()
    val agg = rd.agg(count(lit(1)).as("n"), min("id").as("mn"),
      max("score").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") &&
      !plan.contains("SortAggregate") &&
      plan.contains("PushedAggregates: [COUNT(*)"),
      s"a manifest-answered aggregate must have NO aggregate node:\n$plan")
    val row = agg.collect()(0)
    assert(row.getAs[Long]("n") == 200L &&
      row.getAs[Long]("mn") == 0L &&
      row.getAs[Double]("mx") == 1990.0)
    // strings are truncated in stats — MIN(name) must NOT push
    val sAgg = rd.agg(min("name"))
    assert(sAgg.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"))
    assert(sAgg.as[String].head() == "name_0")
    // live deletion vectors: COUNT(*) still pushes — gross manifest
    // count minus ONE job over the deleted-row-count-sized sidecars —
    // while extremes fall back (a deleted row could be the extreme),
    // so a COMBINED aggregate falls back too
    Merge.deleteWhereDV(spark, path, $"id" >= 100L)
    val rd2 = spark.read.format("graft-table").option("path", path).load()
    val cnt = rd2.agg(count(lit(1)).as("n"))
    val cntPlan = cnt.queryExecution.executedPlan.toString
    assert(!cntPlan.matches("(?s).*(Hash|Sort)Aggregate.*") &&
      cntPlan.contains("PushedAggregates: [COUNT(*)"),
      s"a DV-bearing count(*) must stay pushed (sidecar-adjusted):\n" +
      cntPlan)
    assert(cnt.as[Long].head() == 100L,
      "the pushed count must subtract the live DV rows exactly")
    val agg2 = rd2.agg(count(lit(1)).as("n"), max("id").as("mx"))
    assert(agg2.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"),
      "DV tables must not push EXTREMES (so combined aggs fall back)")
    val row2 = agg2.collect()(0)
    assert(row2.getAs[Long]("n") == 100L && row2.getAs[Long]("mx") == 99L)
    // INERT DV entries: an upsert rewrites its touched buckets, the
    // old files leave the manifest, and their DV rows must stop
    // subtracting — the re-added keys count again
    Merge.upsert(spark, path, baseDf.filter($"id" >= 100L), "id", 4)
    val rd3 = spark.read.format("graft-table").option("path", path).load()
    val cnt3 = rd3.agg(count(lit(1)).as("n"))
    assert(cnt3.queryExecution.executedPlan.toString
      .contains("PushedAggregates: [COUNT(*)"))
    assert(cnt3.as[Long].head() == 200L,
      "DV entries for rewritten (dropped) files are inert")
    // a filtered aggregate keeps the ordinary (pruned) scan
    val agg3 = rd.filter($"id" < 50L).agg(count(lit(1)))
    assert(agg3.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"))
    assert(agg3.as[Long].head() == 50L)
  }

  test("COUNT(col)/SUM(col) pushdown: null counts and exact integral " +
      "sums answer from the manifest; non-integral, DV-bearing, and " +
      "Long-overflow cases fall back; all-null sums to SQL NULL") {
    // ids 0..199; v null on multiples of 10 (20 nulls), else id*3;
    // dead always null — its SUM must come back NULL, its COUNT 0
    val df = (0L until 200L).map(i =>
        (i, if (i % 10 == 0) None else Some(i * 3L), None: Option[Long],
          i * 1.5))
      .toDF("id", "v", "dead", "d")
      .withColumn("dec", expr("cast(id * 1.25 as decimal(10,2))"))
    val path = new File(freshDir("aggsum"), "tbl").getAbsolutePath
    Merge.writeKeyed(df, path, "id", nBuckets = 4,
      statsCols = Seq("id", "v", "dead", "d", "dec"))
    val rd = spark.read.format("graft-table").option("path", path).load()
    val agg = rd.agg(count($"v").as("nv"), sum($"v").as("sv"),
      count($"dead").as("nd"), sum($"dead").as("sd"),
      count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*(Hash|Sort)Aggregate.*") &&
      plan.contains("PushedAggregates"),
      s"count(col)/sum(col) must be manifest-answered:\n$plan")
    val row = agg.collect()(0)
    assert(row.getAs[Long]("nv") == 180L && row.getAs[Long]("n") == 200L)
    assert(row.getAs[Long]("sv") ==
      (0L until 200L).filter(_ % 10 != 0).map(_ * 3L).sum)
    assert(row.getAs[Long]("nd") == 0L && row.isNullAt(row.fieldIndex("sd")),
      "an all-null column counts 0 and sums to SQL NULL")
    // SUM over a DECIMAL column pushes too — exact at the column's
    // scale, result typed decimal(p+10, s) like Spark's own Sum
    val decAgg = rd.agg(sum($"dec").as("sd"))
    assert(!decAgg.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"),
      "sum(decimal) must be manifest-answered")
    val decRow = decAgg.collect()(0)
    assert(decRow.getAs[java.math.BigDecimal]("sd")
      .compareTo(new java.math.BigDecimal("24875.00")) == 0,
      s"exact decimal sum expected, got ${decRow.get(0)}")
    // SUM over a DOUBLE column must NOT push (FP addition order)
    val dAgg = rd.agg(sum($"d"))
    assert(dAgg.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"))
    assert(dAgg.as[Double].head() == (0L until 200L).map(_ * 1.5).sum)
    // live DVs: a deleted row's nullness/value is unknown — fall back
    Merge.deleteWhereDV(spark, path, $"id" === 7L)
    val rd2 = spark.read.format("graft-table").option("path", path).load()
    val dvAgg = rd2.agg(count($"v").as("nv"), sum($"v").as("sv"))
    assert(dvAgg.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"),
      "count(col)/sum(col) must decline under live deletion vectors")
    val dvRow = dvAgg.collect()(0)
    assert(dvRow.getAs[Long]("nv") == 179L &&
      dvRow.getAs[Long]("sv") ==
        (0L until 200L).filter(i => i % 10 != 0 && i != 7L).map(_ * 3L).sum)
    // a sum beyond Long range declines instead of wrapping
    val bigPath = new File(freshDir("aggovf"), "tbl").getAbsolutePath
    Merge.writeKeyed(
      (0L until 4L).map(i => (i, Long.MaxValue / 2)).toDF("id", "v"),
      bigPath, "id", nBuckets = 2, statsCols = Seq("id", "v"))
    val ovf = spark.read.format("graft-table").option("path", bigPath)
      .load().agg(sum($"v"))
    assert(ovf.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"),
      "a Long-overflowing manifest sum must decline, not wrap")
  }

  test("ANALYZE records stats as one metadata commit: agg pushdown " +
      "lights up on a stats-less table, logical names survive a " +
      "rename, and live DVs analyze GROSS (r17) — the count still " +
      "subtracts the vectors") {
    val path = new File(freshDir("analyze"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4) // NO statsCols
    // rename first: analyze must record stats under LOGICAL names
    Merge.renameColumn(spark, path, "score", "points")
    val rd0 = spark.read.format("graft-table").option("path", path).load()
    assert(rd0.agg(count(lit(1))).queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"),
      "without stats the aggregate must plan a real scan")
    val (v, n) = Merge.analyzeTable(spark, path, Seq("id", "points"))
    assert(v == 2L && n == 4)
    val rd = spark.read.format("graft-table").option("path", path).load()
    val agg = rd.agg(count(lit(1)).as("n"), count($"points").as("np"),
      sum($"id").as("si"), min($"points").as("mn"),
      max($"points").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") &&
      !plan.matches("(?s).*(Hash|Sort)Aggregate.*"),
      s"post-analyze aggregates must be manifest-answered:\n$plan")
    val row = agg.collect()(0)
    assert(row.getAs[Long]("n") == 200L && row.getAs[Long]("np") == 200L)
    assert(row.getAs[Long]("si") == (0L until 200L).sum)
    assert(row.getAs[Double]("mn") == 0.0 &&
      row.getAs[Double]("mx") == 1990.0)
    // the stats also prune: a bounded filter reads a file subset
    assert(rd.filter($"id" === 13L).count() == 1L)
    // live DVs analyze GROSS (r17): no compaction needed — recorded
    // rows stay physical so the COUNT adjustment subtracts exactly
    Merge.deleteWhereDV(spark, path, $"id" === 3L)
    val (v2, _) = Merge.analyzeTable(spark, path, Seq("id", "points"))
    val rd2 = spark.read.format("graft-table").option("path", path).load()
    val cnt = rd2.agg(count(lit(1)).as("n"))
    assert(cnt.queryExecution.executedPlan.toString
      .contains("PushedAggregates"),
      "COUNT(*) must stay manifest-answered under live DVs")
    assert(cnt.as[Long].head() == 199L && v2 > v)
    // and after compaction folds the vectors, everything still agrees
    Merge.compactVersion(spark, path)
    val (v3, _) = Merge.analyzeTable(spark, path, Seq("id", "points"))
    val rd3 = spark.read.format("graft-table").option("path", path).load()
    val cnt3 = rd3.agg(count(lit(1)).as("n"))
    assert(cnt3.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(cnt3.as[Long].head() == 199L && v3 > v2)
  }

  test("MIN/MAX pushdown survives DVs that cannot attain the extremes: " +
      "deletes confined to non-extreme files keep the manifest answer; " +
      "a delete touching an extreme-attaining file still declines") {
    val path = new File(freshDir("aggdvx"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    // which buckets hold the extreme ids (0 and 199)? delete only
    // rows from OTHER buckets, so no touched file can attain either
    val bOf = spark.range(200)
      .select($"id", pmod(xxhash64($"id"), lit(4L)).as("b"))
      .as[(Long, Long)].collect().toMap
    val spare = (1L until 199L)
      .filter(i => bOf(i) != bOf(0L) && bOf(i) != bOf(199L)).take(10)
    assert(spare.size == 10, "fixture needs 10 non-extreme-bucket ids")
    val st = Merge.deleteWhereDV(spark, path, $"id".isin(spare: _*))
    assert(st.rowsDeleted == 10L)
    val rd = spark.read.format("graft-table").option("path", path).load()
    val agg = rd.agg(count(lit(1)).as("n"), min("id").as("mn"),
      max("id").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*(Hash|Sort)Aggregate.*") &&
      plan.contains("PushedAggregates"),
      s"non-extreme DVs must keep MIN/MAX pushed:\n$plan")
    val row = agg.collect()(0)
    assert(row.getAs[Long]("n") == 190L &&
      row.getAs[Long]("mn") == 0L && row.getAs[Long]("mx") == 199L)
    // now delete the max row itself: its file attains the extreme, so
    // the pushdown must decline and the fallback computes the true max
    Merge.deleteWhereDV(spark, path, $"id" === 199L)
    val rd2 = spark.read.format("graft-table").option("path", path).load()
    val agg2 = rd2.agg(max("id").as("mx"))
    assert(agg2.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"),
      "an extreme-attaining DV must still decline MIN/MAX")
    assert(agg2.as[Long].head() == 198L)
  }

  test("reported statistics drive join planning: a small graft table " +
      "broadcasts instead of shuffle-joining") {
    val path = new File(freshDir("stats"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    val small = spark.read.format("graft-table").option("path", path)
      .load()
    val big = spark.range(0L, 1000000L).toDF("id")
    val plan = big.join(small, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a KB-sized graft table must broadcast, got:\n$plan")
  }

  test("LIMIT pushdown prunes to a file prefix covering the limit") {
    val path = new File(freshDir("lim"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    // the prefix plan: covering 5 rows needs one ~50-row file, not 4
    val prefix = Merge.readVersionLimited(spark, path, 0L, 5)
    val n = prefix.count()
    assert(n < 200L && n >= 5L, s"prefix must cover 5 of 200, got $n")
    val got = spark.read.format("graft-table").option("path", path)
      .load().limit(5).collect()
    assert(got.length == 5 &&
      got.forall(_.getAs[String]("name").startsWith("name_")))
  }

  test("LIMIT pushdown under LIVE deletion vectors: the prefix is " +
      "sized by NET counts, still reads a strict file subset, and " +
      "delivers only live rows") {
    val path = new File(freshDir("limdv"), "tbl").getAbsolutePath
    // 8 buckets x 1 file, 200 rows -> ~25 gross rows per file
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 8,
      statsCols = Seq("id"))
    // merge-on-read delete HALF the rows: gross-count sizing would
    // under-deliver by ~2x; net-count sizing must cover the limit
    val st = Merge.deleteWhereDV(spark, path, $"id" % 2 === 0L)
    assert(st.rowsDeleted == 100L)
    Merge.lastLimitPrefix = None
    val prefix = Merge.readVersionLimited(spark, path, 1L, 40)
    val rows = prefix.collect()
    assert(rows.length >= 40 && rows.length < 100,
      s"net-sized prefix must cover 40 of the 100 live, got " +
      rows.length)
    assert(rows.forall(_.getAs[Long]("id") % 2 != 0L),
      "the prefix read must still subtract the DVs")
    val (read, total) = Merge.lastLimitPrefix.get
    assert(read < total, s"must read a strict prefix, got $read/$total")
    // end to end: the DSv2 limit is exact and all-live
    val got = spark.read.format("graft-table").option("path", path)
      .load().limit(40).collect()
    assert(got.length == 40 &&
      got.forall(_.getAs[Long]("id") % 2 != 0L))
    // an over-the-top limit keeps every live row (prefix = everything)
    assert(spark.read.format("graft-table").option("path", path)
      .load().limit(500).count() == 100L)
  }

  test("DSv2 writes: append upserts under the recorded layout; " +
      "overwrite replaces in ONE versioned commit; history survives") {
    val path = new File(freshDir("wr"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    // append via the DataFrameWriter doorway = keyed upsert
    Seq((7L, "w7", 7.7), (500L, "w500", 5.0)).toDF("id", "name", "score")
      .write.format("graft-table").option("path", path)
      .mode("append").save()
    val afterAppend = Merge.readKeyed(spark, path)
    assert(afterAppend.count() == 201)
    assert(afterAppend.filter($"id" === 7L).select("name").as[String]
      .head() == "w7")
    // overwrite = one replace commit; the log and history survive
    Seq((1L, "only", 1.0)).toDF("id", "name", "score")
      .write.format("graft-table").option("path", path)
      .mode("overwrite").save()
    assert(Merge.readKeyed(spark, path).count() == 1)
    assert(Merge.currentVersion(spark, path) == 2L)
    assert(Merge.readVersion(spark, path, 1L).count() == 201,
      "overwrite must preserve history, not reset the log")
    // a time-traveled resolution refuses writes (Delta's rule)
    val e = intercept[Exception] {
      Seq((2L, "x", 2.0)).toDF("id", "name", "score")
        .write.format("graft-table").option("path", path)
        .option("versionAsOf", "0").mode("append").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.contains("time-traveled"))))
  }

  test("SQL INSERT INTO / INSERT OVERWRITE through the catalog " +
      "(directory mode); pinned-catalog DML is refused") {
    val root = freshDir("cat_ins")
    val p1 = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gins", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gins.root", root.getAbsolutePath)
    spark.sql("INSERT INTO gins.t VALUES (7, 'sql7', 77.0), " +
      "(900, 'sql900', 9.0)")
    val after = spark.sql("SELECT count(*) FROM gins.t").as[Long].head()
    assert(after == 201L)
    assert(spark.sql("SELECT name FROM gins.t WHERE id = 7")
      .as[String].head() == "sql7")
    spark.sql("INSERT OVERWRITE gins.t VALUES (1, 'only', 1.0)")
    assert(spark.sql("SELECT count(*) FROM gins.t").as[Long].head() == 1L)
    assert(Merge.readVersion(spark, p1, 1L).count() == 201L)
    // pinned-catalog mode: members are written only through transact —
    // the catalog resolves a PINNED (non-writable) version
    val cat = new File(root, "cat").getAbsolutePath
    val p2 = new File(root, "m").getAbsolutePath
    Merge.writeKeyed(baseDf, p2, "id", nBuckets = 4)
    TableCatalog.create(spark, cat, Map("m" -> p2))
    spark.conf.set("spark.sql.catalog.gpc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpc.root", cat)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gpc.m VALUES (1, 'x', 1.0)")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.contains("time-traveled"))))
  }

  test("SQL ALTER TABLE: rename/add/drop column land as metadata-only " +
      "commits; other DDL and pinned members stay refused") {
    val root = freshDir("cat_alter")
    val p1 = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.galt", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.galt.root", root.getAbsolutePath)
    val files = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new File(p1)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    spark.sql("ALTER TABLE galt.t RENAME COLUMN score TO points")
    spark.sql("ALTER TABLE galt.t ADD COLUMN rank BIGINT")
    assert(spark.sql("SELECT id, name, points, rank FROM galt.t " +
      "WHERE id = 7").collect().head.isNullAt(3),
      "added column reads null on existing rows")
    assert(spark.sql("SELECT points FROM galt.t WHERE id = 7")
      .as[Double].head() == 70.0)
    spark.sql("ALTER TABLE galt.t DROP COLUMN rank")
    assert(!spark.table("galt.t").columns.contains("rank"))
    // three DDL statements, zero data files touched
    def walk2(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk2) else Seq(f)
    val after = walk2(new File(p1))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(after == files, "column DDL must touch no data file")
    // time travel still answers pre-DDL shapes
    assert(spark.sql("SELECT score FROM galt.t VERSION AS OF 0 " +
      "WHERE id = 7").as[Double].head() == 70.0)
    // a NON-widening retype is refused by the widen path (lossless
    // widening itself is GraftDdlSpec's ALTER COLUMN TYPE test)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE galt.t ALTER COLUMN points TYPE STRING")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.contains("widening"))))
  }

  test("SQL DELETE FROM and TRUNCATE TABLE: fenced commits, history " +
      "preserved; pinned members refused") {
    val root = freshDir("cat_del")
    val p1 = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    // catalog name must be unique ACROSS SUITES: GraftDmlSpec's
    // freshTable("del") also mints a catalog named "gdel", and when
    // the suites overlap, whoever resolves the name first pins the
    // plugin instance with ITS root — the later conf re-point is
    // silently ignored (the same CatalogManager caching freshTable's
    // own comment documents within one session)
    spark.conf.set("spark.sql.catalog.gv2del",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gv2del.root", root.getAbsolutePath)
    spark.sql("DELETE FROM gv2del.t WHERE id < 50")
    assert(spark.sql("SELECT count(*) FROM gv2del.t").as[Long].head()
      == 150L)
    assert(spark.sql("SELECT min(id) FROM gv2del.t").as[Long].head()
      == 50L)
    assert(Merge.currentVersion(spark, p1) == 1L)
    assert(Merge.readVersion(spark, p1, 0L).count() == 200L,
      "the delete must be a commit, not a reset")
    spark.sql("TRUNCATE TABLE gv2del.t")
    assert(spark.sql("SELECT count(*) FROM gv2del.t").as[Long].head()
      == 0L)
    assert(Merge.readVersion(spark, p1, 1L).count() == 150L,
      "truncation time-travels like any other commit")
    // a pinned-catalog member refuses SQL DML (transact-only contract)
    val cat = new File(root, "cat").getAbsolutePath
    val p2 = new File(root, "m").getAbsolutePath
    Merge.writeKeyed(baseDf, p2, "id", nBuckets = 4)
    TableCatalog.create(spark, cat, Map("m" -> p2))
    spark.conf.set("spark.sql.catalog.gdel2", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdel2.root", cat)
    intercept[Exception] {
      spark.sql("DELETE FROM gdel2.m WHERE id < 10")
    }
    assert(Merge.readKeyed(spark, p2).count() == 200L,
      "the refused delete must not have touched the pinned member")
  }

  test("namespaces: SHOW NAMESPACES and USE work; namespace DDL refused") {
    val root = freshDir("cat_ns")
    val p1 = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gns", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gns.root", root.getAbsolutePath)
    assert(spark.sql("SHOW NAMESPACES IN gns").collect()
      .map(_.getString(0)).toSeq == Seq("default"))
    spark.sql("USE gns.default")
    try assert(spark.sql("SELECT count(*) FROM t").as[Long].head() == 200L)
    finally spark.sql("USE spark_catalog.default")
    intercept[Exception] {
      spark.sql("CREATE NAMESPACE gns.extra")
    }
  }

  test("replaceWhere: selective overwrite in ONE commit; stray rows " +
      "and append mode refused") {
    val path = new File(freshDir("rw"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 8)
    val v0 = Merge.currentVersion(spark, path)
    // replace ids < 50 with a 3-row batch (one key kept, two new)
    val batch = Seq((7L, "kept_new", 7.7), (300L, "oops", 1.0))
      .toDF("id", "name", "score")
    // a batch row OUTSIDE the predicate is refused, nothing committed
    val e = intercept[Exception] {
      batch.write.format("graft-table").option("path", path)
        .option("replaceWhere", "id < 50").mode("overwrite").save()
    }
    assert(e.getMessage.contains("replaceWhere"))
    assert(Merge.currentVersion(spark, path) == v0)
    // a conforming batch replaces exactly the matched slice
    Seq((7L, "kept_new", 7.7), (8L, "added", 8.8))
      .toDF("id", "name", "score")
      .write.format("graft-table").option("path", path)
      .option("replaceWhere", "id < 50").mode("overwrite").save()
    assert(Merge.currentVersion(spark, path) == v0 + 1,
      "the selective overwrite must be one commit")
    val now = Merge.readKeyed(spark, path)
    // 200 - 50 (matched) + 2 (batch) = 152
    assert(now.count() == 152L)
    assert(now.filter($"id" === 7L).select("name").as[String].head()
      == "kept_new")
    assert(now.filter($"id" === 8L).select("name").as[String].head()
      == "added")
    assert(now.filter($"id" === 10L).isEmpty, "unreplaced matched row dies")
    assert(now.filter($"id" === 150L).select("name").as[String].head()
      == "name_150", "rows outside the predicate are untouched")
    // append mode cannot replace
    intercept[Exception] {
      Seq((1L, "x", 1.0)).toDF("id", "name", "score")
        .write.format("graft-table").option("path", path)
        .option("replaceWhere", "id < 50").mode("append").save()
    }
    ()
  }

  test("bare DELETE FROM (no WHERE) empties the table as one commit " +
      "with history intact") {
    val path = new File(freshDir("delall"), "tbl").getAbsolutePath
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gdall",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdall.root",
      new File(path).getParent)
    spark.sql("DELETE FROM gdall.tbl")
    assert(Merge.readKeyed(spark, path).count() == 0L)
    assert(Merge.currentVersion(spark, path) == 1L)
    assert(Merge.readVersion(spark, path, 0L).count() == 200L)
  }

  test("unsupported DDL is refused loudly (RENAME TABLE breaks clone " +
      "foreign refs, so it stays out even in directory mode)") {
    val root = freshDir("cat_ro")
    val p1 = new File(root, "t").getAbsolutePath
    Merge.writeKeyed(baseDf, p1, "id", nBuckets = 4)
    spark.conf.set("spark.sql.catalog.gro", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gro.root", root.getAbsolutePath)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gro.t RENAME TO t2")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(
        _.contains("read-only"))))
    // the table is untouched and still resolves
    assert(spark.sql("SELECT count(*) AS n FROM gro.t").as[Long].head()
      == 200L)
  }
}
