package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit-time CHECK constraints (Delta's ADD CONSTRAINT surface): a
  * batch that breaks a recorded invariant is REFUSED atomically, null
  * passes (SQL CHECK), tombstoned deletes are exempt, and the
  * constraint set follows the table's metadata through add/drop/
  * restore.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_constraint_spec_$tag").toFile
    d.deleteOnExit()
    new File(d, "tbl").getAbsolutePath
  }

  test("a violating upsert batch is refused atomically") {
    val path = freshDir("refuse")
    Merge.writeKeyed((0L until 50L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "id", nBuckets = 4,
      constraints = Seq(("v_nonneg", "v >= 0")))
    assert(Merge.tableConstraints(spark, path) ==
      Seq(("v_nonneg", "v >= 0")))
    val bad = Seq((1L, -5.0), (2L, 2.0)).toDF("id", "v")
    val e = intercept[Merge.ConstraintViolation] {
      Merge.upsert(spark, path, bad, "id", nBuckets = 4)
    }
    assert(e.getMessage.contains("v_nonneg") &&
      e.getMessage.contains("1 row(s)"))
    // nothing committed: version and data unchanged, even the valid row
    assert(Merge.currentVersion(spark, path) == 0L)
    assert(Merge.readKeyed(spark, path).filter($"id" === 2L)
      .select("v").as[Double].head() == 2.0)
    // the clean batch then commits, and carries the constraint forward
    Merge.upsert(spark, path, Seq((2L, 22.0)).toDF("id", "v"),
      "id", nBuckets = 4)
    assert(Merge.tableConstraints(spark, path).nonEmpty)
  }

  test("a violating initial load is refused before any file is written") {
    val path = freshDir("load")
    intercept[Merge.ConstraintViolation] {
      Merge.writeKeyed(Seq((1L, -1.0)).toDF("id", "v"), path, "id",
        nBuckets = 2, constraints = Seq(("v_nonneg", "v >= 0")))
    }
    assert(!new File(path).exists(), "a refused table must leave no files")
  }

  test("null passes (SQL CHECK), and IS NOT NULL expresses NOT NULL") {
    val path = freshDir("nulls")
    Merge.writeKeyed(Seq((1L, Some(1.0), "a")).toDF("id", "v", "s"),
      path, "id", nBuckets = 2,
      constraints = Seq(("v_pos", "v > 0"), ("s_notnull", "s IS NOT NULL")))
    // null v passes v > 0 (unknown, not false); null s fails s IS NOT NULL
    Merge.upsert(spark, path,
      Seq((2L, Option.empty[Double], "b")).toDF("id", "v", "s"),
      "id", nBuckets = 2)
    val e = intercept[Merge.ConstraintViolation] {
      Merge.upsert(spark, path,
        Seq((3L, Some(3.0), null.asInstanceOf[String])).toDF("id", "v", "s"),
        "id", nBuckets = 2)
    }
    assert(e.getMessage.contains("s_notnull"))
    assert(Merge.readKeyed(spark, path).count() == 2)
  }

  test("tombstoned deletes are exempt; mixed batch checks survivors only") {
    val path = freshDir("tomb")
    Merge.writeKeyed((0L until 10L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "id", nBuckets = 2,
      constraints = Seq(("v_nonneg", "v >= 0")))
    // deleting a row whose payload would violate must be allowed (the
    // payload never lands); the surviving row still passes
    Merge.upsert(spark, path,
      Seq((4L, -99.0, true), (5L, 55.0, false)).toDF("id", "v", "__del"),
      "id", nBuckets = 2, tombstoneCol = Some("__del"))
    val out = Merge.readKeyed(spark, path)
    assert(out.count() == 9 && out.filter($"id" === 4L).count() == 0)
    assert(out.filter($"id" === 5L).select("v").as[Double].head() == 55.0)
  }

  test("addConstraint validates existing rows; dropConstraint lifts it") {
    val path = freshDir("addrop")
    Merge.writeKeyed((0L until 20L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "id", nBuckets = 4)
    // refused: row 0 has v = 0, so v > 0 does not hold on the table
    intercept[Merge.ConstraintViolation] {
      Merge.addConstraint(spark, path, "v_pos", "v > 0")
    }
    assert(Merge.currentVersion(spark, path) == 0L)
    assert(Merge.addConstraint(spark, path, "v_nonneg", "v >= 0") == 1L)
    intercept[IllegalArgumentException] {
      Merge.addConstraint(spark, path, "v_nonneg", "v >= 0") // duplicate
    }
    intercept[Merge.ConstraintViolation] {
      Merge.upsert(spark, path, Seq((1L, -1.0)).toDF("id", "v"),
        "id", nBuckets = 4)
    }
    Merge.dropConstraint(spark, path, "v_nonneg")
    Merge.upsert(spark, path, Seq((1L, -1.0)).toDF("id", "v"),
      "id", nBuckets = 4)
    assert(Merge.readKeyed(spark, path).filter($"id" === 1L)
      .select("v").as[Double].head() == -1.0)
    val ops = Merge.history(spark, path).orderBy("version")
      .select("op").as[String].collect().toSeq
    assert(ops == Seq("write", "addConstraint", "dropConstraint", "upsert"))
  }

  test("constraints follow restore (full metadata rollback)") {
    val path = freshDir("restore")
    Merge.writeKeyed(Seq((1L, 1.0)).toDF("id", "v"), path, "id",
      nBuckets = 2) // v0: no constraints
    Merge.addConstraint(spark, path, "v_nonneg", "v >= 0") // v1
    Merge.restore(spark, path, 0L) // v2 = v0's state, constraint gone
    assert(Merge.tableConstraints(spark, path).isEmpty)
    Merge.upsert(spark, path, Seq((2L, -2.0)).toDF("id", "v"),
      "id", nBuckets = 2)
    Merge.restore(spark, path, 1L) // back to the constrained state
    assert(Merge.tableConstraints(spark, path) ==
      Seq(("v_nonneg", "v >= 0")))
  }

  test("constraints survive sharded-manifest round trips") {
    val path = freshDir("sharded")
    Merge.writeKeyed((0L until 40L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "id", nBuckets = 8, manifestShardSpan = 2,
      constraints = Seq(("v_nonneg", "v >= 0")))
    Merge.upsert(spark, path, Seq((3L, 33.0)).toDF("id", "v"),
      "id", nBuckets = 8)
    assert(Merge.tableConstraints(spark, path) ==
      Seq(("v_nonneg", "v >= 0")))
    intercept[Merge.ConstraintViolation] {
      Merge.upsert(spark, path, Seq((3L, -3.0)).toDF("id", "v"),
        "id", nBuckets = 8)
    }
  }
}
