package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)]) =
    Behavior.funnel(rows.toDF("u", "et", "ts", "id"),
      "u", "et", "ts", Seq("view", "click", "purchase"), "id")
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap

  test("funnel enforces strict event ordering per user") {
    val rows = Seq(
      // u1: full ordered funnel
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L),
      (1L, "purchase", 30L, 3L),
      // u2: clicked BEFORE viewing — click must not count
      (2L, "click", 10L, 4L), (2L, "view", 20L, 5L),
      // u3: view+click but purchase BEFORE the click — no step 3
      (3L, "view", 10L, 6L), (3L, "purchase", 15L, 7L),
      (3L, "click", 20L, 8L),
      // u4: never viewed
      (4L, "click", 10L, 9L), (4L, "purchase", 20L, 10L))
    val f = run(rows)
    assert(f(1) == 3L, "u1,u2,u3 viewed")
    assert(f(2) == 2L, "only u1 and u3 clicked after a view")
    assert(f(3) == 1L, "only u1 purchased after a qualifying click")
  }

  test("equal timestamps do not advance a step (strictly-after)") {
    val rows = Seq((1L, "view", 10L, 1L), (1L, "click", 10L, 2L))
    val f = run(rows)
    assert(f(1) == 1L && f(2) == 0L)
  }

  test("a later view cannot resurrect an earlier click") {
    // click at t=5, view at t=10: running-min of view time at the click
    // row is null — the click must not qualify retroactively
    val rows = Seq((1L, "click", 5L, 1L), (1L, "view", 10L, 2L),
      (1L, "purchase", 20L, 3L))
    val f = run(rows)
    assert(f(1) == 1L && f(2) == 0L && f(3) == 0L)
  }

  test("windowedFunnel: a step outside the gap does not count; inside does") {
    val rows = Seq(
      // u1: click 5 after the view — inside a gap of 10
      (1L, "view", 10L, 1L), (1L, "click", 15L, 2L),
      // u2: click 50 after the view — outside
      (2L, "view", 10L, 3L), (2L, "click", 60L, 4L),
      // u3: greedy chain — the EARLIEST view (t=10) starts the clock,
      // so the click at 25 misses even though a later view (t=20) was
      // within reach (documented earliest-chain semantics)
      (3L, "view", 10L, 5L), (3L, "view", 20L, 6L),
      (3L, "click", 25L, 7L))
    val f = Behavior.windowedFunnel(rows.toDF("u", "et", "ts", "id"),
      "u", "et", "ts", Seq("view", "click"), "id", maxGap = lit(10L))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(f(1) == 3L)
    assert(f(2) == 1L, "only u1's click lands within the gap")
  }

  test("windowedFunnel shares ONE user-partitioned Exchange across steps") {
    val rows = (1L to 20L).flatMap { u =>
      Seq((u, "view", u, u * 10), (u, "click", u + 1, u * 10 + 1))
    }
    val df = Behavior.windowedFunnel(rows.toDF("u", "et", "ts", "id"),
      "u", "et", "ts", Seq("view", "click", "purchase"), "id", lit(5L))
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(u#".r
      .findAllMatchIn(p).size
    assert(exchanges == 1,
      s"all step window passes must share one Exchange, saw $exchanges:\n$p")
  }

  test("funnel counts are invariant to input partitioning") {
    val rows = (1L to 50L).flatMap { u =>
      Seq((u, "view", u * 10, u * 100),
        (u, "click", u * 10 + 5, u * 100 + 1),
        (u, "purchase", u * 10 + (u % 3), u * 100 + 2))
    }
    def counts(parts: Int) = Behavior.funnel(
      rows.toDF("u", "et", "ts", "id").repartition(parts),
      "u", "et", "ts", Seq("view", "click", "purchase"), "id")
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(counts(1) == counts(7) && counts(7) == counts(32))
  }

  test("retention cohorts: each user counted once per active week") {
    val day = 86400L
    def ts(d: Int) = lit(1704067200L + d * day).cast("timestamp") // 2024-01-01
    val e = Seq(
      (1L, 0), (1L, 1), (1L, 8),   // u1: cohort wk1, active wk1+wk2
      (2L, 8), (2L, 9))            // u2: cohort wk2, active wk2
      .toDF("user_id", "d")
      .withColumn("t", to_timestamp(from_unixtime(lit(1704067200L) +
        col("d") * day)))
    val out = Behavior.retentionCohorts(e, "user_id", col("t"))
      .orderBy("cohort_week", "active_week").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", "2024-01-01", 1L),
      ("2024-01-01", "2024-01-08", 1L),
      ("2024-01-08", "2024-01-08", 1L)))
  }
}
