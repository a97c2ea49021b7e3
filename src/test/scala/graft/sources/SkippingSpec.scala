package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Skipping.Bound

/** Sidecar file-stats index: pruning must be real (fewer files planned)
  * and conservative (pruned read ≡ full filter, always).
  */
class SkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_skip_spec_$tag").toFile
    d.deleteOnExit()
    new File(d, "tbl").getAbsolutePath
  }

  private val rows = (0 until 1000).map { i =>
    (i.toLong, i.toDouble / 10.0, f"k$i%04d",
      java.sql.Timestamp.valueOf(f"2024-01-${i / 40 + 1}%02d 00:00:00"))
  }

  private def writeTable(tag: String): String = {
    val path = freshDir(tag)
    val df = rows.toDF("id", "score", "name", "ts")
    Skipping.writeIndexed(df, path, clusterCols = Seq("id"), files = 10,
      statsCols = Seq("id", "score", "name", "ts"))
    path
  }

  test("numeric range bound prunes files and matches the full filter") {
    val path = writeTable("num")
    val bounds = Seq(Bound("id", Some(120), Some(180)))
    val (sel, total) = Skipping.planFiles(spark, path, bounds)
    assert(total == 10)
    assert(sel.size < total, s"index must prune, planned ${sel.size}/$total")
    val pruned = Skipping.readSkipping(spark, path, bounds)
      .select("id").as[Long].collect().sorted
    assert(pruned.toSeq == (120L to 180L))
  }

  test("bounds on a non-cluster column still correct (range not tight)") {
    val path = writeTable("cross")
    // score tracks id/10 so the clustered layout keeps it tight too, but
    // correctness must hold regardless of what the planner prunes
    val bounds = Seq(Bound("score", Some(50.05), Some(55.0)))
    val expected = rows.filter(r => r._2 >= 50.05 && r._2 <= 55.0).map(_._1)
    val got = Skipping.readSkipping(spark, path, bounds)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("string and timestamp bounds prune and agree with a plain filter") {
    val path = writeTable("str_ts")
    val sBounds = Seq(Bound("name", Some("k0100"), Some("k0150")))
    val (sSel, sTot) = Skipping.planFiles(spark, path, sBounds)
    assert(sSel.size < sTot)
    assert(Skipping.readSkipping(spark, path, sBounds).count() == 51)

    val tBounds = Seq(
      Bound("ts", Some("2024-01-03"), Some("2024-01-04 00:00:00")))
    val (tSel, tTot) = Skipping.planFiles(spark, path, tBounds)
    assert(tSel.size < tTot)
    val expected = rows.count { r =>
      !r._4.before(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")) &&
        !r._4.after(java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))
    }
    assert(Skipping.readSkipping(spark, path, tBounds).count() == expected)
  }

  test("open-ended and multi-column bounds compose") {
    val path = writeTable("multi")
    val bounds = Seq(Bound("id", Some(900), None),
      Bound("score", None, Some(95.0)))
    val got = Skipping.readSkipping(spark, path, bounds)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (900L to 950L))
    val (sel, total) = Skipping.planFiles(spark, path, bounds)
    assert(sel.size < total)
  }

  test("empty selection returns an empty frame with the table schema") {
    val path = writeTable("empty")
    val bounds = Seq(Bound("id", Some(5000), None))
    val (sel, _) = Skipping.planFiles(spark, path, bounds)
    assert(sel.isEmpty)
    val out = Skipping.readSkipping(spark, path, bounds)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "score", "name", "ts"))
  }

  test("all-null stats column: files skipped under any interval bound") {
    val path = freshDir("nulls")
    val df = (0 until 100).map(i => (i.toLong, null: java.lang.Double))
      .toDF("id", "v")
    Skipping.writeIndexed(df, path, clusterCols = Seq("id"), files = 4,
      statsCols = Seq("id", "v"))
    val (sel, total) = Skipping.planFiles(spark, path,
      Seq(Bound("v", Some(0.0), Some(1.0))))
    assert(total == 4 && sel.isEmpty,
      "an interval bound can never match an all-null column")
    assert(Skipping.readSkipping(spark, path,
      Seq(Bound("v", Some(0.0), Some(1.0)))).count() == 0)
  }

  test("stats survive reread exactly: no lossy round-trip over-prunes") {
    val path = freshDir("exact")
    // adversarial doubles: values whose decimal text forms are lossy
    val df = Seq((1L, 0.1 + 0.2), (2L, 1.0 / 3.0), (3L, -0.0))
      .toDF("id", "v")
    Skipping.writeIndexed(df, path, clusterCols = Seq("id"), files = 1,
      statsCols = Seq("v"))
    // bound exactly AT the stored max: file must be kept (inclusive)
    val (sel, _) = Skipping.planFiles(spark, path,
      Seq(Bound("v", Some(1.0 / 3.0), None)))
    assert(sel.size == 1)
    assert(Skipping.readSkipping(spark, path,
      Seq(Bound("v", Some(1.0 / 3.0), None))).count() == 1)
  }

  test("impliedBounds extracts conjunct intervals; OR and functions " +
      "contribute nothing; strict widens to inclusive") {
    import org.apache.spark.sql.functions.{col, length, lit}
    val b1 = Skipping.impliedBounds(
      col("id") >= 100L && col("id") < 300L && col("name") === "k0042")
    assert(b1.contains(Bound("id", Some(100L), None)))
    assert(b1.contains(Bound("id", None, Some(300L)))) // widened, sound
    assert(b1.contains(Bound("name", Some("k0042"), Some("k0042"))))
    // flipped operand order
    assert(Skipping.impliedBounds(lit(5L) < col("id")) ==
      Seq(Bound("id", Some(5L), None)))
    // unbounded-union OR and function calls: nothing extracted (the
    // residual covers it)
    assert(Skipping.impliedBounds(
      col("id") > 5L || col("id") < 2L).isEmpty)
    assert(Skipping.impliedBounds(length(col("name")) > 3).isEmpty)
    // OR hull: both branches bound the same column → the union interval
    assert(Skipping.impliedBounds(
      (col("id") >= 10L && col("id") <= 20L) ||
        (col("id") >= 50L && col("id") <= 60L)) ==
      Seq(Bound("id", Some(10L), Some(60L))))
    assert(Skipping.impliedBounds(
      col("name").startsWith("a") || col("name").startsWith("b")) ==
      Seq(Bound("name", Some("a"), Some("c"))))
    // one branch unbounded above: the hull keeps the shared lower bound
    assert(Skipping.impliedBounds(
      (col("id") >= 10L && col("id") <= 20L) || col("id") >= 50L) ==
      Seq(Bound("id", Some(10L), None)))
    // different columns across branches: no shared column, nothing
    assert(Skipping.impliedBounds(
      col("id") <= 20L || col("score") <= 2.0).isEmpty)
    // but an AND sibling of an OR still contributes
    val b2 = Skipping.impliedBounds(
      (col("id") > 5L || col("score") < 2.0) && col("id") <= 700L)
    assert(b2 == Seq(Bound("id", None, Some(700L))))
  }

  test("impliedBounds: IN-lists become [min,max] hulls CARRYING their " +
      "point sets; startsWith becomes a sound prefix interval") {
    import org.apache.spark.sql.functions.col
    val in = Skipping.impliedBounds(col("id").isin(250L, 20L, 700L))
    assert(in.map(b => (b.column, b.lower, b.upper)) ==
      Seq(("id", Some(20L), Some(700L))))
    assert(in.head.points.map(_.toSet) == Some(Set(250L, 20L, 700L)))
    val ins = Skipping.impliedBounds(col("name").isin("k05", "k02", "k09"))
    assert(ins.map(b => (b.column, b.lower, b.upper)) ==
      Seq(("name", Some("k02"), Some("k09"))))
    assert(ins.head.points.map(_.toSet) == Some(Set("k05", "k02", "k09")))
    val pre = Skipping.impliedBounds(col("name").startsWith("k00"))
    assert(pre == Seq(Bound("name", Some("k00"), Some("k01"))))
    // the prefix interval must CONTAIN every extension of the prefix —
    // including ones past a naive prefix+MAX bound
    val weird = "k00" + "\uffff\uffff"
    assert("k00" <= weird && weird <= "k01")
    // MAX-char prefix: upper side drops rather than lying
    assert(Skipping.impliedBounds(col("name").startsWith("\uffff")) ==
      Seq(Bound("name", Some("\uffff"), None)))
    // correctness through the read path: IN + prefix prune and match
    val path = writeTable("inpre")
    val pred = col("id").isin(10L, 20L, 30L) && col("name").startsWith("k00")
    val got = Skipping.readWhere(spark, path, pred).orderBy("id").collect()
    val want = spark.read.parquet(path).filter(pred).orderBy("id").collect()
    assert(got.sameElements(want) && got.length == 3)
    val (sel, total) = Skipping.planFiles(spark, path,
      Skipping.impliedBounds(pred))
    assert(sel.size < total)
  }

  test("long string stats truncate soundly: bounded size, never " +
      "over-prune") {
    val path = freshDir("longstr")
    // values that differ ONLY past the 64-char truncation point
    val base = "x" * 64
    val df = Seq((1L, base + "aaa"), (2L, base + "zzz"), (3L, "short"))
      .toDF("id", "v")
    Skipping.writeIndexed(df, path, clusterCols = Seq("id"), files = 1,
      statsCols = Seq("v"))
    // stored stats are bounded, whatever the data
    val entries = Skipping.planFiles(spark, path,
      Seq(Bound("v", Some(base), None)))
    assert(Skipping.statMin(base + "y" * 100).toString.length <= 65)
    assert(Skipping.statMax(base + "y" * 100).toString.length <= 65)
    // a bound past the truncated max must still KEEP the file — the
    // incremented upper bound covers every value the prefix cut off
    val (sel, _) = Skipping.planFiles(spark, path,
      Seq(Bound("v", Some(base + "zz"), None)))
    assert(sel.size == 1, "truncated max must not over-prune")
    assert(Skipping.readSkipping(spark, path,
      Seq(Bound("v", Some(base + "zz"), None))).count() == 1)
    // and the truncated MIN stays a valid lower bound: an upper-bounded
    // read below every real value prunes or filters to empty, never errs
    assert(Skipping.readSkipping(spark, path,
      Seq(Bound("v", None, Some("a")))).count() == 0)
  }

  test("PROPERTY: readWhere ≡ read.filter for random predicate trees " +
      "(extraction + pruning never lose a row)") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.col
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val path = writeTable("prop")
    val full = spark.read.parquet(path).cache()
    full.count()
    val genCmp: Gen[Column] = for {
      c <- Gen.oneOf("id", "score", "name")
      op <- Gen.choose(0, 4)
      idV <- Gen.choose(-50L, 1100L)
      scV <- Gen.choose(-5.0, 110.0)
      nmV <- Gen.choose(0, 1100).map(i => f"k$i%04d")
    } yield {
      val (cc, v): (Column, Any) = c match {
        case "id"    => (col("id"), idV)
        case "score" => (col("score"), scV)
        case _       => (col("name"), nmV)
      }
      op match {
        case 0 => cc > org.apache.spark.sql.functions.lit(v)
        case 1 => cc >= org.apache.spark.sql.functions.lit(v)
        case 2 => cc < org.apache.spark.sql.functions.lit(v)
        case 3 => cc <= org.apache.spark.sql.functions.lit(v)
        case 4 => cc === org.apache.spark.sql.functions.lit(v)
      }
    }
    val genIn: Gen[Column] = Gen.listOfN(3, Gen.choose(0L, 1100L))
      .map(vs => col("id").isin(vs: _*))
    val genPre: Gen[Column] = Gen.choose(0, 99)
      .map(i => col("name").startsWith(f"k$i%02d"))
    def genPred(depth: Int): Gen[Column] =
      if (depth == 0) Gen.frequency(4 -> genCmp, 1 -> genIn, 1 -> genPre)
      else Gen.frequency(
        2 -> genCmp,
        2 -> (for {a <- genPred(depth - 1); b <- genPred(depth - 1)}
          yield a && b),
        1 -> (for {a <- genPred(depth - 1); b <- genPred(depth - 1)}
          yield a || b))
    (1 to 40).foreach { i =>
      genPred(2).apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach { pred =>
          val want = full.filter(pred).count()
          val got = Skipping.readWhere(spark, path, pred).count()
          assert(got == want,
            s"seed $i: pruned read lost rows ($got != $want) for $pred")
        }
    }
    full.unpersist()
  }

  test("readWhere ≡ read.filter(pred) and prunes when it can") {
    import org.apache.spark.sql.functions.col
    val path = writeTable("where")
    val pred = col("id") >= 800L &&
      col("ts") >= java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
    val got = Skipping.readWhere(spark, path, pred)
      .orderBy("id").collect()
    val want = spark.read.parquet(path).filter(pred)
      .orderBy("id").collect()
    assert(got.sameElements(want))
    val (sel, total) = Skipping.planFiles(spark, path,
      Skipping.impliedBounds(pred))
    assert(sel.size < total, s"must prune, got ${sel.size}/$total")
    // a predicate the extractor can't use still reads correctly
    val hard = (col("id") % 7) === 3L
    assert(Skipping.readWhere(spark, path, hard).count() ==
      spark.read.parquet(path).filter(hard).count())
  }

  test("pre-epoch fractional-second timestamps convert exactly: " +
      "floor-division micros, Catalyst-identical bloom hash") {
    import org.apache.spark.sql.functions.{lit, xxhash64}
    import org.apache.spark.sql.types.TimestampType
    // −0.5 s is −500000 micros; truncating division said +500000
    val half = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")
    assert(Skipping.tsMicros(half) == -500000L)
    assert(Skipping.encode(half) == "-500000")
    assert(Skipping.boundKey(TimestampType, half) == -500000L)
    // string-form bounds take the same path
    assert(Skipping.boundKey(TimestampType, "1969-12-31 23:59:59.5") ==
      -500000L)
    // encoded-domain ordering is monotone ACROSS the epoch (the old
    // fold put −0.5 s at +500000, above +0.2 s)
    val plus = java.sql.Timestamp.valueOf("1970-01-01 00:00:00.2")
    assert(Skipping.encode(half).toLong < Skipping.encode(plus).toLong)
    // the driver-side probe hash must equal what `xxhash64(col)`
    // produced on the write side (the bloom's contents)
    for (t <- Seq(half, plus,
        java.sql.Timestamp.valueOf("1969-06-15 07:08:09.123456"),
        java.sql.Timestamp.valueOf("2024-03-01 10:00:00.000001"))) {
      val sparkHash = spark.range(1)
        .select(xxhash64(lit(t)).as("h")).head().getLong(0)
      assert(Skipping.bloomHashOf(TimestampType, t).contains(sparkHash),
        s"driver hash diverges from Catalyst for $t")
    }
  }

  test("a pre-epoch fractional timestamp row survives bloom and " +
      "interval pruning end-to-end") {
    import org.apache.spark.sql.functions.lit
    val d = Files.createTempDirectory("graft_skip_preepoch").toFile
    d.deleteOnExit()
    val path = new File(d, "t").getAbsolutePath
    // millisecond-grain timestamps straddling the epoch: most rows are
    // pre-1970 with fractional seconds
    val df = (0 until 200).map(i =>
        (i.toLong, new java.sql.Timestamp(i * 137L - 5000L)))
      .toDF("id", "ts")
    Merge.writeKeyed(df, path, "id", nBuckets = 8,
      statsCols = Seq("ts", "bloom:ts"))
    val target = new java.sql.Timestamp(3 * 137L - 5000L) // −4.589 s
    val v = Merge.currentVersion(spark, path)
    val (sel, _) = Merge.planVersionFiles(spark, path, v,
      Seq(Bound("ts", Some(target), Some(target))))
    assert(sel.nonEmpty,
      "the file holding the pre-epoch row must survive pruning")
    val got = Merge.readKeyedWhere(spark, path, $"ts" === lit(target))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L), s"lost the pre-epoch row: got $got")
  }
}
