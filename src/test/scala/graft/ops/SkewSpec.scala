package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation (heavy-hitter key)") {
    // 90% of rows share one key — the shape that serializes an unsalted agg
    val df = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble / 100)
    }.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("count"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_of_v"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), Seq("v"), salts = 8)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("salt column is deterministic and bounded") {
    val df = (1 to 100).map(i => (i, s"row$i")).toDF("a", "b")
    val s1 = df.select(Skew.saltCol(16, Seq(col("a"), col("b"))).as("s"))
      .as[Int].collect().toSeq
    val s2 = df.select(Skew.saltCol(16, Seq(col("a"), col("b"))).as("s"))
      .as[Int].collect().toSeq
    assert(s1 == s2)
    assert(s1.forall(s => s >= 0 && s < 16))
    assert(s1.distinct.size > 4) // actually spreads
  }
}
