package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.v2.GraftTable
import org.apache.spark.sql.functions._

/** Per-file BLOOM FILTER skipping (`bloom:col` stats specs): equality
  * predicates prune data files on high-cardinality unsorted columns
  * whose [min, max] interval spans everything — the Delta
  * bloom-filter-index idea carried in the manifest stats. Pruning must
  * be conservative (results identical to an unpruned filter), survive
  * upserts and renames, and reach the DSv2 scan.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_bloom_$tag").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    // `name` is high-cardinality and UNSORTED within each bucket file
    // (files sort by id), so min/max alone could never prune it
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, s"name_${i * 7919 % 200}", i * 10.0))
        .toDF("id", "name", "score"),
      path, "id", nBuckets = 8,
      statsCols = Seq("id", "bloom:name"))
    path
  }

  private def eqBound(c: String, v: Any) =
    Seq(Skipping.Bound(c, Some(v), Some(v)))

  test("equality on a bloom-indexed column prunes files; results " +
      "stay identical to the unpruned filter") {
    val path = freshTable("eq")
    val v = Merge.currentVersion(spark, path)
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("name", "name_77"))
    assert(total == 8 && sel.size < total && sel.nonEmpty,
      s"bloom must prune: selected ${sel.size} of $total")
    val got = Merge.readKeyedWhere(spark, path, $"name" === "name_77")
      .select("id").as[Long].collect().sorted.toSeq
    val want = Merge.readKeyed(spark, path)
      .filter($"name" === "name_77")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("equality on an ABSENT value prunes every file") {
    val path = freshTable("absent")
    val v = Merge.currentVersion(spark, path)
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("name", "no_such_name"))
    assert(total == 8 && sel.isEmpty,
      s"an absent value must prune all files, kept $sel")
    assert(Merge.readKeyedWhere(spark, path,
      $"name" === "no_such_name").isEmpty)
  }

  test("RANGE bounds on a bloom-only column never prune (no interval " +
      "stats recorded), and never error") {
    val path = freshTable("range")
    val v = Merge.currentVersion(spark, path)
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      Seq(Skipping.Bound("name", Some("name_0"), None)))
    assert(sel.size == total, "no min/max for a bloom-only column: keep")
  }

  test("upsert refreshes the touched bucket's bloom and keeps the rest") {
    val path = freshTable("upsert")
    Merge.upsert(spark, path,
      Seq((1000L, "brand_new", 1.0)).toDF("id", "name", "score"),
      "id", nBuckets = 8)
    val v = Merge.currentVersion(spark, path)
    // the new value is findable and prunes to (at most) its own file
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("name", "brand_new"))
    assert(sel.size < total && sel.nonEmpty)
    assert(Merge.readKeyedWhere(spark, path, $"name" === "brand_new")
      .select("id").as[Long].head() == 1000L)
    // pre-upsert values still probe correctly through carried blooms
    assert(Merge.readKeyedWhere(spark, path, $"name" === "name_77")
      .count() ==
      Merge.readKeyed(spark, path).filter($"name" === "name_77").count())
  }

  test("column rename carries the bloom index to the new name") {
    val path = freshTable("rename")
    Merge.renameColumn(spark, path, "name", "title")
    val v = Merge.currentVersion(spark, path)
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("title", "name_77"))
    assert(sel.size < total && sel.nonEmpty,
      s"bloom must follow the rename: selected ${sel.size} of $total")
    assert(Merge.readKeyedWhere(spark, path, $"title" === "name_77")
      .count() > 0)
  }

  test("the DSv2 scan prunes on a pushed equality over the bloom column") {
    val path = freshTable("dsv2")
    GraftTable.lastScanFiles = None
    val rows = spark.read.format("graft-table").option("path", path)
      .load().filter($"name" === "name_77").collect()
    assert(rows.nonEmpty)
    val Some((sel, total)) = GraftTable.lastScanFiles
    assert(sel < total && sel >= 1,
      s"pushed equality must bloom-prune: selected $sel of $total")
  }

  test("key equality bucket-hash prunes files with NO stats recorded") {
    val d = Files.createTempDirectory("graft_bloom_nostats").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    Merge.writeKeyed( // no statsCols at all
      (0L until 200L).map(i => (i, s"n_$i")).toDF("id", "v"),
      path, "id", nBuckets = 8)
    val v = Merge.currentVersion(spark, path)
    // an equality on the LAYOUT KEY names one bucket structurally
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("id", 7L))
    assert(total == 8 && sel.size == 1,
      s"key equality must keep exactly the key's bucket, kept $sel")
    assert(Merge.readKeyedWhere(spark, path, $"id" === 7L)
      .select("v").as[String].head() == "n_7")
    // a RANGE on the key cannot bucket-prune (hash scatters ranges)
    val (selR, _) = Merge.planVersionFiles(spark, path, v,
      Seq(Skipping.Bound("id", Some(0L), Some(10L))))
    assert(selR.size == total)
    // and the DSv2 pushed key equality rides the same pruning
    GraftTable.lastScanFiles = None
    assert(spark.read.format("graft-table").option("path", path).load()
      .filter($"id" === 7L).count() == 1L)
    assert(GraftTable.lastScanFiles.exists { case (s, t) =>
      s == 1 && t == 8 })
  }

  test("IN-lists and equality-OR chains prune as POINT SETS: buckets " +
      "by key hash, files by per-value bloom probes") {
    val d = Files.createTempDirectory("graft_bloom_in").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, s"name_${i * 7919 % 200}"))
        .toDF("id", "name"),
      path, "id", nBuckets = 8, statsCols = Seq("bloom:name"))
    val v = Merge.currentVersion(spark, path)
    // key IN-list: keeps at most the two keys' buckets (no key stats)
    val inBounds = Skipping.impliedBounds($"id".isin(3L, 7L))
    val (selIn, total) = Merge.planVersionFiles(spark, path, v, inBounds)
    assert(total == 8 && selIn.size <= 2 && selIn.nonEmpty,
      s"IN on the key must keep its buckets only: ${selIn.size} of $total")
    assert(Merge.readKeyedWhere(spark, path, $"id".isin(3L, 7L))
      .count() == 2L)
    // equality-OR chain carries the union point set
    val orBounds = Skipping.impliedBounds($"id" === 3L || $"id" === 7L)
    val (selOr, _) = Merge.planVersionFiles(spark, path, v, orBounds)
    assert(selOr.size <= 2 && selOr.nonEmpty)
    // bloom IN-list: one present + one absent value keeps only the
    // present value's file(s); the interval HULL alone could not
    val present = s"name_${3 * 7919 % 200}"
    val bBounds = Skipping.impliedBounds(
      $"name".isin(present, "zz_nope"))
    val (selB, _) = Merge.planVersionFiles(spark, path, v, bBounds)
    assert(selB.size < total && selB.nonEmpty,
      s"per-value bloom probes must prune: ${selB.size} of $total")
    assert(Merge.readKeyedWhere(spark, path,
      $"name".isin(present, "zz_nope")).count() == 1L)
    // all-absent IN prunes everything
    val (selNone, _) = Merge.planVersionFiles(spark, path, v,
      Skipping.impliedBounds($"name".isin("zz_a", "zz_b")))
    assert(selNone.isEmpty)
    // DSv2 pushed In rides the same pruning
    GraftTable.lastScanFiles = None
    assert(spark.read.format("graft-table").option("path", path).load()
      .filter($"id".isin(3L, 7L)).count() == 2L)
    assert(GraftTable.lastScanFiles.exists { case (s, t) =>
      s <= 2 && t == 8 })
  }

  test("DATE equality probes the bloom (epoch-day internal form)") {
    val d = Files.createTempDirectory("graft_bloom_date").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i,
        java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1)
          .plusDays((i * 37) % 365)))).toDF("id", "day"),
      path, "id", nBuckets = 8, statsCols = Seq("bloom:day"))
    val v = Merge.currentVersion(spark, path)
    val present = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1)
      .plusDays((7 * 37) % 365))
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("day", present))
    assert(sel.nonEmpty && sel.size < total,
      s"date bloom must prune: ${sel.size} of $total")
    val absent = java.sql.Date.valueOf("1999-01-01")
    val (selA, _) = Merge.planVersionFiles(spark, path, v,
      eqBound("day", absent))
    assert(selA.isEmpty)
    assert(Merge.readKeyedWhere(spark, path, $"day" === present).count()
      == Merge.readKeyed(spark, path).filter($"day" === present).count())
  }

  test("integer equality probes the bloom exactly (internal-form hash)") {
    val d = Files.createTempDirectory("graft_bloom_int").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    // bloom over a LONG column whose values are unsorted per file
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, (i * 7919) % 1000)).toDF("id", "code"),
      path, "id", nBuckets = 8, statsCols = Seq("bloom:code"))
    val v = Merge.currentVersion(spark, path)
    val present = (7L * 7919) % 1000
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("code", present))
    assert(sel.nonEmpty && sel.size < total)
    val (selAbsent, _) = Merge.planVersionFiles(spark, path, v,
      eqBound("code", 999999L))
    assert(selAbsent.isEmpty)
    assert(Merge.readKeyedWhere(spark, path, $"code" === present)
      .count() ==
      Merge.readKeyed(spark, path).filter($"code" === present).count())
  }

  test("widenColumn drops the STALE narrow-hash blooms: point lookups " +
      "on the widened column still find pre-widen rows") {
    import org.apache.spark.sql.types.LongType
    val d = Files.createTempDirectory("graft_bloom_widen").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    // v is INT at write time: every file's bloom hashed xxhash64(int)
    Merge.writeKeyed(
      (0 until 200).map(i => (i.toLong, (i * 7919) % 1000))
        .toDF("id", "v"),
      path, "id", nBuckets = 8, statsCols = Seq("bloom:v"))
    Merge.widenColumn(spark, path, "v", LongType)
    // probes now hash xxhash64(long) — with the stale int-hash blooms
    // still in the manifest, every file would report "absent" and the
    // matching rows would silently vanish
    val target = (3 * 7919) % 1000
    val v1 = Merge.currentVersion(spark, path)
    val (sel, _) = Merge.planVersionFiles(spark, path, v1,
      eqBound("v", target))
    assert(sel.nonEmpty,
      "stale narrow-hash blooms must not prune pre-widen files")
    val got = Merge.readKeyedWhere(spark, path, $"v" === target)
      .select("id").as[Long].collect().toSeq.sorted
    val want = Merge.readKeyed(spark, path).filter($"v" === target)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == want && got.contains(3L), s"lost rows: $got vs $want")
    // the `bloom:v` SPEC survives the widen: files written after it
    // index under the wide type. Pre-widen files now carry NO bloom
    // (conservative keep); the post-widen file's wide-hash bloom still
    // prunes — an absent-value probe drops exactly that file.
    Merge.upsert(spark, path,
      Seq((1000L, 7000000000L)).toDF("id", "v"), "id", nBuckets = 8)
    val v2 = Merge.currentVersion(spark, path)
    // a ~1%-FPP bloom may false-positive any single probe value, so the
    // exact-count form (== totalNew - 1) could fail spuriously on a
    // sizing/seed change. Assert soundness per probe (never MORE files
    // than the manifest, and the read finds nothing), and pruning
    // effectiveness across several probes (all nine false-positiving
    // together ~ 1e-18).
    val probes = (999999991L to 999999999L).toSeq
    var prunedSomewhere = false
    probes.foreach { p =>
      val (selAbsent, totalNew) = Merge.planVersionFiles(spark, path, v2,
        eqBound("v", p))
      assert(selAbsent.size <= totalNew,
        s"unsound plan for probe $p: ${selAbsent.size} of $totalNew")
      if (selAbsent.size < totalNew) prunedSomewhere = true
      assert(Merge.readKeyedWhere(spark, path, $"v" === p).isEmpty,
        s"probe $p is supposed to be absent from the data")
    }
    assert(prunedSomewhere,
      "the post-widen file's wide bloom never pruned any absent probe")
    assert(Merge.readKeyedWhere(spark, path, $"v" === 7000000000L)
      .select("id").as[Long].collect().toSeq == Seq(1000L))
  }

  test("upsert(allowEvolution) widening drops untouched buckets' " +
      "stale blooms too") {
    val d = Files.createTempDirectory("graft_bloom_widen_up").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0 until 200).map(i => (i.toLong, (i * 7919) % 1000))
        .toDF("id", "v"),
      path, "id", nBuckets = 8, statsCols = Seq("bloom:v"))
    // the batch speaks LONG for v: evolution widens the table schema
    // but rewrites only id=5000's bucket — the other 7 buckets keep
    // their files, whose blooms hashed the narrow type
    Merge.upsert(spark, path,
      Seq((5000L, 123456789L)).toDF("id", "v"), "id", nBuckets = 8,
      allowEvolution = true)
    // every original value must remain findable — ids 0..9 span more
    // buckets than the one the upsert touched
    for (i <- 0 until 10) {
      val target = (i * 7919) % 1000
      val got = Merge.readKeyedWhere(spark, path, $"v" === target)
        .select("id").as[Long].collect().toSeq
      assert(got.contains(i.toLong),
        s"id=$i (v=$target) vanished after evolution-widening upsert")
    }
    assert(Merge.readKeyedWhere(spark, path, $"v" === 123456789L)
      .select("id").as[Long].collect().toSeq == Seq(5000L))
  }

  test("EXTERNAL bloom sidecars (bloomx:, r17): the manifest stores a " +
      "byte-sized ref per file, sidecar files hold the filters, the " +
      "planner reads them LAZILY and prunes identically; vacuum keeps " +
      "live sidecars and reclaims superseded ones") {
    val d = Files.createTempDirectory("graft_bloomx").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, s"name_${i * 7919 % 200}", i * 10.0))
        .toDF("id", "name", "score"),
      path, "id", nBuckets = 8,
      statsCols = Seq("id", "bloomx:name"))
    // the manifest carries REFS, not blobs: every bloom value is tiny
    val v = Merge.currentVersion(spark, path)
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val sidecars = walk(new File(path, "_graft_bloom"))
      .filter(_.getName.endsWith(".bf"))
    assert(sidecars.size == 8, s"one sidecar per file, got $sidecars")
    // lazy read: pruning consults sidecars only for point bounds, and
    // only for candidate files — counted by the seam
    Skipping.bloomSidecarReads.set(0L)
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("name", "name_77"))
    assert(total == 8 && sel.size < total && sel.nonEmpty,
      s"external bloom must prune like inline: ${sel.size} of $total")
    val reads1 = Skipping.bloomSidecarReads.get()
    assert(reads1 > 0L && reads1 <= 8L,
      s"the planner must have lazily read <= 8 sidecars, read $reads1")
    // a RANGE bound never touches a sidecar
    Skipping.bloomSidecarReads.set(0L)
    Merge.planVersionFiles(spark, path, v,
      Seq(Skipping.Bound("id", Some(10L), None)))
    assert(Skipping.bloomSidecarReads.get() == 0L,
      "range bounds must not read bloom sidecars")
    // absent value: every file pruned, via sidecar probes (decode-once
    // cached: the second plan reads NOTHING new)
    val (sel2, _) = Merge.planVersionFiles(spark, path, v,
      eqBound("name", "no_such_name"))
    assert(sel2.isEmpty, s"absent value must prune all, kept $sel2")
    Skipping.bloomSidecarReads.set(0L)
    Merge.planVersionFiles(spark, path, v, eqBound("name", "name_77"))
    assert(Skipping.bloomSidecarReads.get() == 0L,
      "repeat plans must hit the sidecar cache")
    // results stay identical to the unpruned filter
    val got = Merge.readKeyedWhere(spark, path, $"name" === "name_77")
      .select("id").as[Long].collect().sorted.toSeq
    val want = Merge.readKeyed(spark, path)
      .filter($"name" === "name_77")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
    // an upsert rewrites its bucket: fresh sidecars for the new files,
    // the untouched buckets keep their refs, pruning still exact
    Merge.upsert(spark, path,
      Seq((7L, "renamed_7", 1.0)).toDF("id", "name", "score"), "id", 8)
    val (sel3, _) = Merge.planVersionFiles(spark, path,
      Merge.currentVersion(spark, path), eqBound("name", "renamed_7"))
    assert(sel3.size == 1,
      s"the rewritten bucket's fresh sidecar must index the new value")
    // vacuum: superseded sidecars reclaim, live ones survive
    val reclaimed = Merge.vacuum(spark, path, keepVersions = 1,
      orphanGraceMs = 0L)
    assert(reclaimed.exists(_.contains("_graft_bloom/")),
      s"the replaced bucket's old sidecar must reclaim: $reclaimed")
    val (sel4, _) = Merge.planVersionFiles(spark, path,
      Merge.currentVersion(spark, path), eqBound("name", "name_77"))
    assert(sel4.size == sel.size || sel4.size == sel.size - 1,
      "post-vacuum pruning still works off live sidecars")
    assert(Merge.readKeyedWhere(spark, path, $"name" === "name_77")
      .select("id").as[Long].collect().sorted.toSeq
      == want.filterNot(_ == 7L))
  }

  test("EXTERNAL range stats (statsx:, r18): the manifest keeps one " +
      "ref-sized placeholder per file, pruning is IDENTICAL to inline " +
      "stats, sidecars read lazily (statsx bounds only, candidates only, " +
      "decode-once cached), merge-on-read appends refresh them, and " +
      "vacuum reclaims superseded sidecars") {
    val d = Files.createTempDirectory("graft_statsx").toFile
    d.deleteOnExit()
    val inlineP = new File(d, "ti").getAbsolutePath
    val extP = new File(d, "tx").getAbsolutePath
    // the honest keyed shape where range stats prune: CDC-style
    // merge-on-read APPENDS — each batch's files carry a tight ts
    // window even though the key hash scatters ids across buckets
    def slice(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 100L).map(i =>
        (i, i, i * 5L, s"r_${"%06d".format(i)}_payload")).toDF("id", "ts", "v", "s")
    for (p <- Seq(inlineP, extP)) {
      val cols =
        if (p == extP) Seq("statsx:ts", "statsx:v", "statsx:s")
        else Seq("ts", "v", "s")
      Merge.writeKeyed(slice(0L), p, "id", nBuckets = 8, statsCols = cols)
      Merge.upsertDV(spark, p, slice(1000L), "id", 8)
      Merge.upsertDV(spark, p, slice(2000L), "id", 8)
    }
    val vi = Merge.currentVersion(spark, inlineP)
    val vx = Merge.currentVersion(spark, extP)
    // ref-shaped manifest: placeholders + sidecar refs, SMALLER than
    // the inline twin (one ref amortizes the whole statsx column set)
    val mi = java.nio.file.Files.readString(
      new File(inlineP, s"_graft_log/v$vi.json").toPath)
    val mxs = java.nio.file.Files.readString(
      new File(extP, s"_graft_log/v$vx.json").toPath)
    assert(mxs.contains("statsx") && mxs.contains("@_graft_bloom/"),
      mxs.take(400))
    assert(mxs.length < mi.length,
      s"statsx manifest must be smaller: ${mxs.length} vs ${mi.length}")
    // pruning parity on a range bound over the LAST slice only
    val b = Seq(Skipping.Bound("ts", Some(2000L), Some(2050L)))
    val (si, ti) = Merge.planVersionFiles(spark, inlineP, vi, b)
    Skipping.statsSidecarReads.set(0L)
    val (sx, tx) = Merge.planVersionFiles(spark, extP, vx, b)
    assert(ti == tx && ti > 16, s"3 slices of files, got $ti/$tx")
    assert(sx.size == si.size && sx.size <= 8 && sx.nonEmpty,
      s"statsx must prune like inline: ${sx.size} vs ${si.size} of $tx")
    val reads1 = Skipping.statsSidecarReads.get()
    assert(reads1 > 0L && reads1 <= tx.toLong,
      s"lazy candidate reads only, got $reads1")
    // a bound on a NON-statsx column never reads a sidecar
    Skipping.statsSidecarReads.set(0L)
    Merge.planVersionFiles(spark, extP, vx,
      Seq(Skipping.Bound("id", Some(10L), Some(10L))))
    assert(Skipping.statsSidecarReads.get() == 0L)
    // repeat plans hit the decode-once cache
    Skipping.statsSidecarReads.set(0L)
    Merge.planVersionFiles(spark, extP, vx, b)
    assert(Skipping.statsSidecarReads.get() == 0L)
    // manifest-answered aggregates resolve sidecars too (r18: the
    // statsx agg-decline trade, closed) — exact MIN/MAX/COUNT/SUM with
    // zero data I/O, equal to the inline twin's answers
    assert(Merge.versionColumnBounds(spark, extP, vx, "ts") ==
      Merge.versionColumnBounds(spark, inlineP, vi, "ts"))
    assert(Merge.versionColumnBounds(spark, extP, vx, "ts") ==
      Some((Some(0L), Some(2099L))))
    val agg = Merge.versionColumnAggStats(spark, extP, vx, "ts")
    assert(agg.map(_._1) == Some(300L), agg)
    assert(agg.flatMap(_._2).map(_.longValueExact) == Some(314850L), agg)
    // results identical to the unpruned filter (skipping-planned read)
    val got = Merge.readKeyedWhere(spark, extP,
        $"ts" >= 2000L && $"ts" <= 2050L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (2000L to 2050L).toSeq)
    // the DSv2 scan's pushed range filter prunes through statsx too
    GraftTable.lastScanFiles = None
    assert(spark.read.format("graft-table").option("path", extP).load()
      .filter($"ts" >= 2000L && $"ts" <= 2050L).count() == 51L)
    assert(GraftTable.lastScanFiles.exists { case (se, to) => se < to },
      s"pushed range must statsx-prune: ${GraftTable.lastScanFiles}")
    // a copy-on-write upsert rewrites its bucket: fresh sidecar indexes
    // the new value, results stay right
    Merge.upsert(spark, extP,
      Seq((7L, 999999L, 1L, "w")).toDF("id", "ts", "v", "s"), "id", 8)
    assert(Merge.readKeyedWhere(spark, extP, $"ts" === 999999L)
      .select("id").as[Long].collect().toSeq == Seq(7L))
    // vacuum reclaims the replaced bucket's superseded sidecar
    val reclaimed = Merge.vacuum(spark, extP, keepVersions = 1,
      orphanGraceMs = 0L)
    assert(reclaimed.exists(_.endsWith(".sx")),
      s"superseded statsx sidecar must reclaim: $reclaimed")
    assert(Merge.readKeyed(spark, extP).count() == 300L)
  }

  test("column rename preserves each stats spec's OWN prefix (r18 fix: " +
      "bloomx used to downgrade to inline bloom, statsx went stale and " +
      "crashed the next commit); pre-rename sidecars keep pruning via " +
      "the column mapping") {
    val d = Files.createTempDirectory("graft_sx_rename").toFile
    d.deleteOnExit()
    // bloomx table: rename must keep the EXTERNAL spec
    val pb = new File(d, "tb").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, s"v_$i")).toDF("id", "label"),
      pb, "id", nBuckets = 8, statsCols = Seq("bloomx:label"))
    Merge.renameColumn(spark, pb, "label", "tag")
    Merge.upsert(spark, pb, Seq((1000L, "fresh")).toDF("id", "tag"),
      "id", 8)
    val vb = Merge.currentVersion(spark, pb)
    val (selB, totB) = Merge.planVersionFiles(spark, pb, vb,
      eqBound("tag", "v_77"))
    assert(selB.size < totB && selB.nonEmpty,
      s"bloomx pruning must survive rename+upsert: ${selB.size}/$totB")
    assert(Merge.readKeyedWhere(spark, pb, $"tag" === "fresh")
      .select("id").as[Long].head() == 1000L)
    // statsx table: the renamed spec follows; the NEXT commit's stats
    // aggregate must not crash; pre-rename sidecars still prune via
    // the physical-name translation
    val px = new File(d, "tx").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, i * 3L, s"p_$i")).toDF("id", "v", "s"),
      px, "id", nBuckets = 8, statsCols = Seq("statsx:v"))
    Merge.upsertDV(spark, px,
      (5000L until 5100L).map(i => (i, i * 3L, s"p_$i"))
        .toDF("id", "v", "s"), "id", 8)
    Merge.renameColumn(spark, px, "v", "val")
    // post-rename COW upsert: recomputes stats under the renamed spec
    Merge.upsert(spark, px,
      Seq((7L, 999999L, "w")).toDF("id", "val", "s"), "id", 8)
    val vx = Merge.currentVersion(spark, px)
    // a bound on the NEW name prunes to the MoR slice's files (their
    // sidecars were written pre-rename under the old name)
    val (selX, totX) = Merge.planVersionFiles(spark, px, vx,
      Seq(Skipping.Bound("val", Some(15000L), Some(15150L))))
    assert(selX.size < totX && selX.nonEmpty,
      s"statsx pruning must survive the rename: ${selX.size}/$totX")
    assert(Merge.readKeyedWhere(spark, px,
        $"val" >= 15000L && $"val" <= 15150L)
      .select("id").as[Long].collect().sorted.toSeq ==
      (5000L to 5050L).toSeq)
    // ANALYZE accepts statsx specs (r18 fix: the spec used to reach the
    // aggregate unstripped and crash); fresh sidecars serve pushdown
    val (vA, nA) = Merge.analyzeTable(spark, px,
      Seq("id", "statsx:val"))
    assert(nA > 0)
    assert(Merge.versionColumnBounds(spark, px, vA, "val") ==
      Some((Some(0L), Some(999999L))))
    // dropping the statsx column removes its spec too (r18 fix): the
    // NEXT commit's stats aggregate must not reference the gone column
    Merge.dropColumn(spark, px, "val")
    Merge.upsert(spark, px, Seq((8L, "z")).toDF("id", "s"), "id", 8)
    assert(Merge.readKeyedWhere(spark, px, $"id" === 8L)
      .select("s").as[String].head() == "z")
  }

  test("statsx sidecars survive TWO renames (r19): entries written under " +
      "the intermediate logical name translate through the recorded " +
      "rename history, and retired logical names are reserved") {
    val d = Files.createTempDirectory("graft_sx_rename2").toFile
    d.deleteOnExit()
    val p = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, i * 3L, s"p_$i")).toDF("id", "v", "s"),
      p, "id", nBuckets = 8, statsCols = Seq("statsx:v"))
    Merge.renameColumn(spark, p, "v", "v2")
    // this slice's sidecars are written UNDER the intermediate name v2
    Merge.upsertDV(spark, p,
      (5000L until 5100L).map(i => (i, i * 3L, s"p_$i")).toDF("id", "v2", "s"),
      "id", 8)
    Merge.renameColumn(spark, p, "v2", "v3")
    val v = Merge.currentVersion(spark, p)
    // a nothing-matches bound must prune EVERY file: the first era's
    // sidecars store the physical name, the second era's the retired
    // intermediate — both translate to v3 (with colMap alone, the
    // second era's files fail open and stay selected)
    val (selNone, tot) = Merge.planVersionFiles(spark, p, v,
      Seq(Skipping.Bound("v3", Some(999000L), Some(999100L))))
    assert(tot > 8, s"two eras of files expected, got $tot")
    assert(selNone.isEmpty,
      s"every sidecar era must translate and prune: $selNone")
    // positive probe: the second slice answers under the final name
    assert(Merge.readKeyedWhere(spark, p,
        $"v3" >= 15000L && $"v3" <= 15150L)
      .select("id").as[Long].collect().sorted.toSeq ==
      (5000L to 5050L).toSeq)
    // manifest-answered bounds resolve BOTH eras' sidecars
    assert(Merge.versionColumnBounds(spark, p, v, "v3") ==
      Some((Some(0L), Some(15297L))))
    // a retired logical name cannot be reclaimed by a later rename:
    // immutable sidecars still reference it
    val bad = intercept[IllegalArgumentException] {
      Merge.renameColumn(spark, p, "s", "v2")
    }
    assert(bad.getMessage.contains("previous logical name"), bad.getMessage)
  }

  test("pre-r19 manifests with the BARE 'statsx' placeholder name still " +
      "prune and answer manifest aggregates (legacy normalization, r19 " +
      "review): the @-rename must not orphan existing tables' sidecars") {
    val d = Files.createTempDirectory("graft_sx_legacy").toFile
    d.deleteOnExit()
    val src = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 200L).map(i => (i, i * 3L)).toDF("id", "v"),
      src, "id", nBuckets = 4, statsCols = Seq("statsx:v"))
    // simulate the r18 on-disk format by rewriting the manifests'
    // placeholder entries to the bare name, into a FRESH directory (the
    // manifest cache is path-keyed)
    val legacy = new File(d, "t_legacy")
    def copyRewrite(from: File, to: File): Unit = {
      if (from.isDirectory) {
        to.mkdirs(); from.listFiles().foreach(f =>
          copyRewrite(f, new File(to, f.getName)))
      } else if (from.getName.endsWith(".json")) {
        val body = new String(Files.readAllBytes(from.toPath), "UTF-8")
        Files.write(to.toPath,
          body.replace("\"c\":\"@statsx\"", "\"c\":\"statsx\"")
            .getBytes("UTF-8"))
      } else Files.copy(from.toPath, to.toPath)
    }
    copyRewrite(new File(src), legacy)
    val p = legacy.getAbsolutePath
    val v = Merge.currentVersion(spark, p)
    val logBodies = new File(legacy, "_graft_log").listFiles()
      .filter(_.getName.endsWith(".json"))
      .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8"))
    assert(logBodies.exists(_.contains("\"c\":\"statsx\"")) &&
      logBodies.forall(!_.contains("@statsx")),
      "precondition: the legacy table must carry the bare name only")
    // a nothing-matches bound prunes EVERY file through the legacy
    // placeholder's sidecar ref
    val (selNone, tot) = Merge.planVersionFiles(spark, p, v,
      Seq(Skipping.Bound("v", Some(999000L), Some(999100L))))
    assert(tot >= 4 && selNone.isEmpty,
      s"legacy placeholder must still prune: ${selNone.size} of $tot")
    // an in-range bound keeps files (min/max=None must NOT read as
    // "all-null column")
    val (selIn, _) = Merge.planVersionFiles(spark, p, v,
      Seq(Skipping.Bound("v", Some(0L), Some(597L))))
    assert(selIn.size == tot, s"in-range must keep all: ${selIn.size}/$tot")
    // manifest-answered bounds resolve the legacy sidecars too
    assert(Merge.versionColumnBounds(spark, p, v, "v") ==
      Some((Some(0L), Some(597L))))
  }

  test("per-file NDV sketches (ndv:): approximate COUNT DISTINCT answers " +
      "from the manifest by unioning live files' sketches; DML " +
      "re-sketches only touched files (untouched blobs byte-identical); " +
      "live DVs decline; rename follows; ANALYZE heals a pre-spec table") {
    val d = Files.createTempDirectory("graft_ndv").toFile
    d.deleteOnExit()
    val p = new File(d, "t").getAbsolutePath
    Merge.writeKeyed(
      (0L until 2000L).map(i => (i, i % 500, s"s_$i")).toDF("id", "v", "s"),
      p, "id", nBuckets = 8, statsCols = Seq("ndv:v"))
    val v0 = Merge.currentVersion(spark, p)
    val est0 = Merge.versionColumnNdv(spark, p, v0, "v").get
    assert(math.abs(est0 - 500.0) <= 500 * 0.03,
      s"v0 estimate outside the 3% contract: $est0 vs 500")
    // one new key (one new distinct value): exactly one bucket rewrites
    def ndvBlobs(version: Long): Map[String, String] = {
      val body = new String(Files.readAllBytes(
        new File(p, s"_graft_log/v$version.json").toPath), "UTF-8")
      """\{"f":"([^"]+)","c":"ndv:v","mn":null,"mx":null(?:,"r":\d+)?,"bf":"([^"]+)"""".r
        .findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap
    }
    Merge.upsert(spark, p,
      Seq((5000L, 123456L, "s_new")).toDF("id", "v", "s"), "id", 8)
    val v1 = Merge.currentVersion(spark, p)
    val est1 = Merge.versionColumnNdv(spark, p, v1, "v").get
    assert(math.abs(est1 - 501.0) <= 501 * 0.03,
      s"post-upsert estimate outside the contract: $est1 vs 501")
    val (b0, b1) = (ndvBlobs(v0), ndvBlobs(v1))
    val carried = b0.keySet.intersect(b1.keySet)
    assert(carried.nonEmpty && carried.forall(f => b0(f) == b1(f)),
      "untouched files' sketch blobs must carry over byte-identical")
    assert(b1.size == b0.size + 1 ||
      b1.exists { case (f, b) => !b0.get(f).contains(b) },
      "the touched bucket must have re-sketched")
    // rename: the spec and entries follow the logical name
    Merge.renameColumn(spark, p, "v", "w")
    val v2 = Merge.currentVersion(spark, p)
    assert(Merge.versionColumnNdv(spark, p, v2, "w") == Some(est1))
    assert(Merge.versionColumnNdv(spark, p, v2, "v").isEmpty)
    // live DVs decline: gross sketches cannot subtract deleted rows
    Merge.upsertDV(spark, p,
      Seq((7L, 999999L, "s_7")).toDF("id", "w", "s"), "id", 8)
    val v3 = Merge.currentVersion(spark, p)
    assert(Merge.versionColumnNdv(spark, p, v3, "w").isEmpty,
      "a live deletion vector must decline the manifest NDV answer")
    // ANALYZE heals a table written before the spec existed
    val p2 = new File(d, "t2").getAbsolutePath
    Merge.writeKeyed(
      (0L until 1000L).map(i => (i, i % 97)).toDF("id", "v"),
      p2, "id", nBuckets = 4)
    assert(Merge.versionColumnNdv(spark, p2, 0L, "v").isEmpty)
    Merge.analyzeTable(spark, p2, Seq("ndv:v"))
    val estA = Merge.versionColumnNdv(spark, p2,
      Merge.currentVersion(spark, p2), "v").get
    assert(math.abs(estA - 97.0) <= 97 * 0.03 + 1,
      s"post-analyze estimate outside the contract: $estA vs 97")
    // ndvx: externalizes the blobs (the production posture at many
    // files): refs in the manifest, identical answer, reads cached
    val p3 = new File(d, "t3x").getAbsolutePath
    Merge.writeKeyed(
      (0L until 1000L).map(i => (i, i % 97)).toDF("id", "v"),
      p3, "id", nBuckets = 4, statsCols = Seq("ndvx:v"))
    val body3 = new String(Files.readAllBytes(
      new File(p3, "_graft_log/v0.json").toPath), "UTF-8")
    assert(body3.contains("\"c\":\"ndv:v\"") &&
      body3.contains("@_graft_bloom/"),
      "ndvx entries must hold sidecar refs under the ndv: name")
    Skipping.bloomSidecarReads.set(0L)
    val estX = Merge.versionColumnNdv(spark, p3, 0L, "v").get
    assert(estX == estA,
      s"externalized sketches must answer like inline: $estX vs $estA")
    val reads1 = Skipping.bloomSidecarReads.get()
    assert(reads1 > 0 && reads1 <= 4, s"one read per live file: $reads1")
    Merge.versionColumnNdv(spark, p3, 0L, "v")
    assert(Skipping.bloomSidecarReads.get() == reads1,
      "a repeat query must answer from the decode-once cache")
    // a bad spec is refused AT DECLARATION, even on an EMPTY table
    // (where the stats pass never runs but the spec would persist and
    // poison the first INSERT): ndv on an unsupported type, and an
    // unknown base column, both loud
    val badT = intercept[IllegalArgumentException] {
      Merge.writeKeyed(
        Seq.empty[(Long, Double)].toDF("id", "price"),
        new File(d, "t3").getAbsolutePath, "id", nBuckets = 2,
        statsCols = Seq("ndv:price"))
    }
    assert(badT.getMessage.contains("int/long/string/binary"),
      badT.getMessage)
    val badC = intercept[IllegalArgumentException] {
      Merge.analyzeTable(spark, p2, Seq("ndv:nope"))
    }
    assert(badC.getMessage.contains("not in"), badC.getMessage)
  }

  test("statsx sidecar codec round-trips hostile stat strings (tabs, " +
      "newlines, unicode, truncation sentinels) and caches decode-once") {
    val d = Files.createTempDirectory("graft_sx_codec").toFile
    d.deleteOnExit()
    val root = new org.apache.hadoop.fs.Path(d.getAbsolutePath)
    val fs = root.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val entries = Seq(
      Skipping.FileStats("f", "c1", Some("a\tb\nc"), Some("z￿￿"),
        rows = 10L, nulls = 2L, sum = Some("-123456789012345678901234567890")),
      Skipping.FileStats("f", "c2", None, None, rows = 10L, nulls = 10L),
      Skipping.FileStats("f", "héllo wörld", Some(""), Some("emoji 😀"),
        rows = 0L, nulls = -1L))
    val rel = "_graft_bloom/t/x.sx"
    val p = new org.apache.hadoop.fs.Path(root, rel)
    fs.mkdirs(p.getParent)
    val o = fs.create(p, true)
    try o.write(Skipping.encodeStatsSidecar(entries)) finally o.close()
    Skipping.statsSidecarReads.set(0L)
    val back = Skipping.readStatsSidecar(fs, root,
      Skipping.BloomRefMark + rel, "__bucket=0/part-0.parquet")
    assert(back == entries.map(_.copy(file = "__bucket=0/part-0.parquet")))
    assert(Skipping.statsSidecarReads.get() == 1L)
    // repeat read: decode-once cache, no second fs read counted
    Skipping.readStatsSidecar(fs, root, Skipping.BloomRefMark + rel, "g")
    assert(Skipping.statsSidecarReads.get() == 1L)
    // unreadable ref: empty, never throws — pruning keeps the file
    assert(Skipping.readStatsSidecar(fs, root,
      Skipping.BloomRefMark + "_graft_bloom/t/missing.sx", "f").isEmpty)
  }

  test("a data column literally named 'statsx' cannot collide with the " +
      "placeholder entry (r19): its plain stats prune normally beside " +
      "statsx: sidecars, and '@'-prefixed stats specs are rejected") {
    val d = Files.createTempDirectory("graft_sx_name").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    // `statsx` is a REAL data column with inline range stats; `v` is
    // externalized — before the @-placeholder the per-file col->entry
    // map collided and a bound on `statsx` could wrongly prune
    val df = (0L until 200L).map(i => (i, i, i * 3L))
      .toDF("id", "statsx", "v")
    Merge.writeKeyed(df, path, "id", nBuckets = 4,
      statsCols = Seq("statsx", "statsx:v"))
    val v = Merge.currentVersion(spark, path)
    // a bound on the real column must see ITS min/max, not the
    // placeholder's None/None ("all-null") — every file has rows in
    // [0,199], so nothing may prune under an in-range bound
    val (selIn, total) = Merge.planVersionFiles(spark, path, v,
      Seq(Skipping.Bound("statsx", Some(0L), Some(199L))))
    assert(selIn.size == total && total >= 4,
      s"in-range bound must keep every file: ${selIn.size} of $total")
    // and an out-of-range bound prunes ALL files off the inline stats
    val (selOut, _) = Merge.planVersionFiles(spark, path, v,
      Seq(Skipping.Bound("statsx", Some(10000L), None)))
    assert(selOut.isEmpty, s"out-of-range bound must prune: $selOut")
    // rows still read correctly through the scan
    assert(Merge.readKeyedWhere(spark, path, $"statsx" < 5L).count() == 5L)
    // the reserved prefix is rejected loudly at spec time
    val bad = intercept[IllegalArgumentException] {
      Merge.writeKeyed(df, new File(d, "t2").getAbsolutePath, "id",
        nBuckets = 2, statsCols = Seq("@statsx"))
    }
    assert(bad.getMessage.contains("reserved"), bad.getMessage)
  }

  test("lookupKey prunes WITHIN the bucket off a bloomx: key index " +
      "(r18): a point lookup on a multi-file bucket lazily probes the " +
      "candidates' sidecars instead of scanning the bucket's history") {
    val d = Files.createTempDirectory("graft_bloomx_lookup").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    // 4 files per bucket and ONLY an external bloom on the key — no
    // plain `id` min/max entry, so pre-r18 lookupKey skipped the
    // within-bucket prune entirely on this layout
    Merge.writeKeyed(
      (0L until 800L).map(i => (i, s"p_$i", i * 2.0))
        .toDF("id", "name", "score"),
      path, "id", nBuckets = 8, statsCols = Seq("bloomx:id"),
      filesPerBucket = 4)
    val v = Merge.currentVersion(spark, path)
    val (sel, total) = Merge.planVersionFiles(spark, path, v,
      eqBound("id", 77L))
    // ~32 files (a (bucket, sub) split can come up empty): what matters
    // is multi-file buckets exist and the probe narrows within one
    assert(total > 24, s"8 buckets x ~4 files, got $total")
    assert(sel.size <= 2 && sel.nonEmpty,
      s"the sidecar must prune within the ~4-file bucket, kept ${sel.size}")
    // lookupKey rides the same planning path: sidecars consulted
    // (lazily, candidates only) and the row found
    Skipping.bloomSidecarReads.set(0L)
    val row = Merge.lookupKey(spark, path, 77L)
      .select("id", "name").as[(Long, String)].collect().toSeq
    assert(row == Seq((77L, "p_77")))
    // decode-once cache may already hold this bucket's refs from the
    // planVersionFiles call above — so assert the CEILING (never more
    // than the bucket's candidate files), and correctness above
    assert(Skipping.bloomSidecarReads.get() <= 4L,
      "lookupKey must probe at most the bucket's own sidecars")
    // absent key, present bucket: provably-empty without a scan
    assert(Merge.lookupKey(spark, path, 5000L).isEmpty)
  }
}
