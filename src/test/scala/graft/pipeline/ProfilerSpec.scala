package graft.pipeline

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("histogram degenerate single-valued column: one [mn, mn] bin") {
    // width 0 would make (v-mn)/w = 0/0 = NaN and floor(NaN) silently 0
    // in non-ANSI Spark while other engines diverge — the special case
    // must emit one explicit bin holding the full count
    val df = Seq.fill(7)(42.0).map(Tuple1(_)).toDF("v")
    val out = Profiler.histogram(df, "v", nBins = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Int]("bin") == 0)
    assert(r.getAs[Double]("lo") == 42.0 && r.getAs[Double]("hi") == 42.0)
    assert(r.getAs[Long]("cnt") == 7L)
  }

  test("histogram closes the top edge into the last bin") {
    val df = (0 to 10).map(_.toDouble).map(Tuple1(_)).toDF("v")
    val out = Profiler.histogram(df, "v", nBins = 5)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Int]("bin")).toSeq == Seq(0, 1, 2, 3, 4))
    // v=10.0 (the max) lands in bin 4, not a phantom bin 5
    assert(out.last.getAs[Long]("cnt") == 3L) // 8, 9, 10
  }
}
