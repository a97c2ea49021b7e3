package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave correctness and the property the
  * layout exists for — per-file min/max rectangles stay tight on BOTH
  * dimensions (single-key range clustering only bounds the leading one).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit b of column i at position b*k+i") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 0L), (2L, 3L))
      .toDF("a", "b")
    val z = df.select(
      ZOrder.interleave(Seq(col("a"), col("b")), bits = 4).as("z"))
      .as[Long].collect()
    // a=1,b=0 -> bit0 of a at pos 0 = 1 ; a=0,b=1 -> bit0 of b at pos 1 = 2
    // a=3,b=0 -> 1 + 4 = 5 ; a=2,b=3 -> a:bit1->pos2=4, b:bit0->pos1=2,
    // b:bit1->pos3=8 => 14
    assert(z.toSeq == Seq(1L, 2L, 5L, 14L))
  }

  /** avg per-file span fraction of the global span, per column. */
  private def spanFractions(path: String, cols: Seq[String]): Map[String, Double] = {
    val df = spark.read.parquet(path)
    val perFile = df.groupBy(input_file_name().as("f"))
      .agg(cols.flatMap(c => Seq(min(col(c)).as(s"mn_$c"),
        max(col(c)).as(s"mx_$c"))).head,
        cols.flatMap(c => Seq(min(col(c)).as(s"mn_$c"),
          max(col(c)).as(s"mx_$c"))).tail: _*)
      .collect()
    val global = df.agg(
      cols.flatMap(c => Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))).head,
      cols.flatMap(c => Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))).tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) =>
      val gSpan = global.getDouble(2 * i + 1) - global.getDouble(2 * i)
      val fracs = perFile.map { r =>
        val mn = r.get(r.fieldIndex(s"mn_$c")).toString.toDouble
        val mx = r.get(r.fieldIndex(s"mx_$c")).toString.toDouble
        (mx - mn) / gSpan
      }
      c -> fracs.sum / fracs.length
    }.toMap
  }

  test("z-ordered files are tight rectangles in BOTH dimensions") {
    // uniform 64x64 grid: a 16-file z-layout should give each file a
    // ~quarter-span rectangle in each dim; single-key clustering leaves
    // the second dim at full span
    val n = 64
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"),
        (col("id") % n).as("y"))
    val zDir = Files.createTempDirectory("graft_zorder_spec").toFile
    zDir.deleteOnExit()
    val zPath = zDir.getAbsolutePath + "/z"
    val cPath = zDir.getAbsolutePath + "/c"
    ZOrder.writeZOrdered(grid, zPath, Seq("x", "y"), files = 16, bits = 8)
    Tables.writeClustered(grid, cPath, Seq("x"), files = 16)
    val zf = spanFractions(zPath, Seq("x", "y"))
    val cf = spanFractions(cPath, Seq("x", "y"))
    // z-order: both dims well under half the global span per file
    assert(zf("x") < 0.5 && zf("y") < 0.5, s"z spans too wide: $zf")
    // single-key clustering: leading dim tight, second dim ~full span —
    // the gap z-order closes
    assert(cf("x") < 0.5, s"clustered leading dim should be tight: $cf")
    assert(cf("y") > 0.8, s"clustered 2nd dim should span ~everything: $cf")
    assert(zf("y") < cf("y") / 2,
      s"z-order must beat clustering on the 2nd dim: $zf vs $cf")
  }

  test("interleave is a bijection on the in-range grid") {
    // every (a, b) in [0,16)^2 maps to a distinct z under 4-bit interleave
    val grid = spark.range(256)
      .select((col("id") / 16).cast("long").as("a"), (col("id") % 16).as("b"))
    val zs = grid.select(
      ZOrder.interleave(Seq(col("a"), col("b")), bits = 4).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 256)
    assert(zs.min == 0L && zs.max == 255L)
  }

  test("z-ordered copy is lossless") {
    val df = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 5L, "c"))
      .toDF("k", "t", "payload")
    val dir = Files.createTempDirectory("graft_zorder_rt").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/t"
    ZOrder.writeZOrdered(df, p, Seq("k", "t"), files = 2, bits = 8)
    val back = spark.read.parquet(p)
    assert(back.columns.sorted.toSeq == Seq("k", "payload", "t"))
    assert(back.orderBy("k").collect().map(_.getString(2)).toSeq ==
      Seq("a", "b", "c"))
  }
}
