package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("k", "s", "v")
    val b = Seq((1L, "x", 1.0), (2L, "y2", 2.0), (4L, "w", 4.0))
      .toDF("k", "s", "v")
    val d = TableDiff.diff(a, b, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(d == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("null-safe compare: null==null is unchanged, null vs value is changed") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Option.empty[String])).toDF("k", "s")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("now"))).toDF("k", "s")
    val d = TableDiff.diff(a, b, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(d == Seq((2L, "changed"), (3L, "changed")),
      "key 1 (null==null) must be absent; 2 and 3 changed")
  }

  test("identical tables diff to empty") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    assert(TableDiff.diff(a, a, Seq("k")).count() == 0)
  }

  test("changeDeltas emits the +1/-1 multiset difference only") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("k", "s", "v")
    val b = Seq((1L, "x", 1.0), (2L, "y2", 2.0), (4L, "w", 4.0))
      .toDF("k", "s", "v")
    val d = TableDiff.changeDeltas(a, b, Seq("k"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    assert(d == Set(
      (2L, "y", 2.0, -1), (2L, "y2", 2.0, 1),   // changed: old out, new in
      (3L, "z", 3.0, -1),                       // removed
      (4L, "w", 4.0, 1)))                       // added; key 1 unchanged
  }

  test("older + changeDeltas reproduces newer exactly (multiset fold)") {
    val a = Seq((1L, 1.0), (2L, 2.0), (2L, 2.0), (5L, 9.0)).toDF("k", "v")
      .dropDuplicates("k") // keyed contract: one row per key
    val b = Seq((1L, 1.5), (3L, 3.0)).toDF("k", "v")
    val folded = a.withColumn("op", lit(1))
      .unionByName(TableDiff.changeDeltas(a, b, Seq("k")))
      .groupBy("k", "v").agg(sum("op").as("n"))
      .filter(col("n") > 0)
      .select("k", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(folded == Set((1L, 1.5), (3L, 3.0)))
  }

  test("schema drift fails fast instead of silently ignoring a column") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 9.0)).toDF("k", "s", "extra")
    intercept[IllegalArgumentException] { TableDiff.diff(a, b, Seq("k")) }
    intercept[IllegalArgumentException] { TableDiff.diff(b, a, Seq("k")) }
  }
}
