package graft.ops

import graft.SparkSpec

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

  test("schema drift fails fast instead of silently ignoring a column") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 9.0)).toDF("k", "s", "extra")
    intercept[IllegalArgumentException] { TableDiff.diff(a, b, Seq("k")) }
    intercept[IllegalArgumentException] { TableDiff.diff(b, a, Seq("k")) }
  }
}
