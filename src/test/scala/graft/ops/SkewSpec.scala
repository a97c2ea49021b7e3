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

  test("saltedJoin equals the plain join on hot-key data") {
    // 90% of left rows share one hot key — the scenario the salt exists for
    val left = (1 to 1000).map(i =>
      (if (i <= 900) 7L else i.toLong % 20, i)).toDF("k", "lv")
    val right = (0L until 20L).map(k => (k, s"dim_$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(left, right, "k", salts = 4)
      .orderBy("k", "lv").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedJoin rejects right-preserving join types") {
    // the right side is replicated `salts` times, so right/full outer
    // would emit each unmatched right row salts times — must fail fast
    val left = Seq((1L, "a")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    Seq("right_outer", "full_outer", "right", "full").foreach { jt =>
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(left, right, "k", salts = 4, jt)
      }
    }
  }

  test("saltedJoin preserves left_outer semantics (unmatched rows kept once)") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val out = Skew.saltedJoin(left, right, "k", salts = 8, "left_outer")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out(2).getString(1) == "orphan" && out(2).isNullAt(2),
      "unmatched left row must appear exactly once, null-extended")
  }
}
