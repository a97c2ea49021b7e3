package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_incr_spec_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/state"
  }

  test("incremental folding equals from-scratch aggregation exactly") {
    val data = (0 until 300).map { i =>
      (s"g${i % 7}", (i * 37 % 100) + i * 0.25)
    }.toDF("g", "v")
    val path = fresh("eq")
    // three arbitrary splits folded in order
    IncrementalAgg.init(data.limit(100), path, Seq("g"), "v")
    IncrementalAgg.update(spark, path,
      data.offset(100).limit(120), Seq("g"), "v")
    IncrementalAgg.update(spark, path, data.offset(220), Seq("g"), "v")
    val inc = IncrementalAgg.read(spark, path)
      .orderBy("g").collect()
    val full = data.groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        min($"v".cast("double")).as("min_v"),
        max($"v".cast("double")).as("max_v"),
        sum($"v".cast("decimal(28,2)")).cast("double").as("sum_v"))
      .orderBy("g").collect()
    assert(inc.length == full.length)
    inc.zip(full).foreach { case (a, b) =>
      assert(a.getAs[String]("g") == b.getAs[String]("g"))
      assert(a.getAs[Long]("cnt") == b.getAs[Long]("cnt"))
      assert(a.getAs[Double]("sum_v") == b.getAs[Double]("sum_v"))
      assert(a.getAs[Double]("min_v") == b.getAs[Double]("min_v"))
      assert(a.getAs[Double]("max_v") == b.getAs[Double]("max_v"))
    }
  }

  test("a delta with only new groups appends them") {
    val path = fresh("newg")
    IncrementalAgg.init(Seq(("a", 1.0)).toDF("g", "v"), path, Seq("g"), "v")
    IncrementalAgg.update(spark, path,
      Seq(("b", 5.0), ("b", 7.0)).toDF("g", "v"), Seq("g"), "v")
    val out = IncrementalAgg.read(spark, path).orderBy("g").collect()
    assert(out.map(_.getAs[String]("g")).toSeq == Seq("a", "b"))
    assert(out(1).getAs[Long]("cnt") == 2L)
    assert(out(1).getAs[Double]("sum_v") == 12.0)
  }
}
