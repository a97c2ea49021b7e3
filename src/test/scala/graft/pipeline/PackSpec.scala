package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packBudget fills packs greedily; straddler stays in its start pack") {
    // tokens: 900, 900, 900 -> before = 0, 900, 1800: packs 0,0,1 @1000
    val df = Seq((1L, 900L), (2L, 900L), (3L, 900L), (4L, 150L))
      .toDF("id", "tok")
    val out = Sampling.packBudget(df.withColumn("shard", lit("s")),
      "id", col("tok"), budget = 1000L, "shard")
      .orderBy("id").select("pack_id").as[Long].collect().toSeq
    // before: 0, 900, 1800, 2700 -> 0, 0, 1, 2
    assert(out == Seq(0L, 0L, 1L, 2L))
  }

  test("packs are independent per shard and invariant to partitioning") {
    val rows = (1L to 200L).map(i => (i, s"shard_${i % 3}", 100L + i % 7))
    def run(parts: Int) = Sampling.packBudget(
      rows.toDF("id", "shard", "tok").repartition(parts),
      "id", col("tok"), budget = 500L, "shard")
      .orderBy("id").select("pack_id").as[Long].collect().toSeq
    assert(run(1) == run(13))
    // each shard starts at pack 0
    val first = Sampling.packBudget(rows.toDF("id", "shard", "tok"),
      "id", col("tok"), budget = 500L, "shard")
      .groupBy("shard").agg(min("pack_id").as("m"))
      .select("m").as[Long].collect().toSeq
    assert(first.forall(_ == 0L))
  }
}
