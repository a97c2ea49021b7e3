package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned semi join equals plain semi join (false positives removed)") {
    val large = (0L until 1000L).map(i => (i, s"row_$i")).toDF("k", "v")
    val small = Seq(3L, 77L, 500L, 999L).toDF("sk")
    val pruned = BloomJoin.prunedSemiJoin(large, small, "k", "sk",
      expectedItems = 4, fpp = 0.01)
    val plain = large.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
    assert(pruned.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
  }

  test("exactness survives a deliberately undersized (high-FP) filter") {
    // expectedItems=1 for 50 keys: the bloom is saturated, nearly every
    // probe is a (false) positive — the exact join must still produce
    // exactly the true matches
    val large = (0L until 2000L).toDF("k")
    val small = (0L until 100L by 2).toDF("sk") // 50 even keys
    val pruned = BloomJoin.prunedSemiJoin(large, small, "k", "sk",
      expectedItems = 1, fpp = 0.5)
    assert(pruned.as[Long].collect().sorted.toSeq ==
      (0L until 100L by 2).toSeq)
  }

  test("null keys on the large side never match") {
    val large = Seq(Some(1L), None, Some(2L)).toDF("k")
    val small = Seq(1L).toDF("sk")
    val out = BloomJoin.prunedSemiJoin(large, small, "k", "sk", 1)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
