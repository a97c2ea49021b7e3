package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Map-side-pruned per-group top-k must be ROW-IDENTICAL to the plain
  * window form under a total order, in both directions, across
  * partitionings, with nulls and ties.
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0 until 500).map { i =>
    (i.toLong, s"g${i % 7}", (i * 37 % 101).toDouble,
      if (i % 41 == 0) null else s"s${i % 13}")
  }

  private def df = rows.toDF("id", "grp", "score", "label").repartition(9)

  private def windowForm(asc: Boolean) = {
    val dir = if (asc) col("score").asc_nulls_last
              else col("score").desc_nulls_last
    val w = Window.partitionBy("grp").orderBy(dir, col("id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
  }

  test("equals the window form, descending, ties broken by id") {
    val got = GroupTopK.topKPerGroup(df, Seq("grp"), "score", 3,
      tieCols = Seq("id")).orderBy("grp", "rank").collect()
    val exp = windowForm(asc = false).orderBy("grp", "rank").collect()
    assert(got.sameElements(exp))
  }

  test("ascending mode agrees with the ascending window") {
    val got = GroupTopK.topKPerGroup(df, Seq("grp"), "score", 3,
      asc = true, tieCols = Seq("id")).orderBy("grp", "rank").collect()
    val exp = windowForm(asc = true).orderBy("grp", "rank").collect()
    assert(got.sameElements(exp))
  }

  test("partition-invariant (1 vs 16 partitions)") {
    val a = GroupTopK.topKPerGroup(df.coalesce(1), Seq("grp"), "score", 3,
      tieCols = Seq("id")).orderBy("grp", "rank").collect()
    val b = GroupTopK.topKPerGroup(df.repartition(16), Seq("grp"), "score",
      3, tieCols = Seq("id")).orderBy("grp", "rank").collect()
    assert(a.sameElements(b))
  }

  test("k larger than the group returns the whole group, ranked") {
    val small = Seq((1L, "a", 5.0), (2L, "a", 3.0), (3L, "b", 1.0))
      .toDF("id", "grp", "score")
    val got = GroupTopK.topKPerGroup(small, Seq("grp"), "score", 10,
      tieCols = Seq("id")).orderBy("grp", "rank")
      .select("id", "rank").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1), (2L, 2), (3L, 1)))
  }

  test("string order column with nulls: nulls rank last") {
    val d = Seq((1L, "a", "zz"), (2L, "a", null), (3L, "a", "aa"))
      .toDF("id", "grp", "name")
    val got = GroupTopK.topKPerGroup(d, Seq("grp"), "name", 3,
      tieCols = Seq("id")).orderBy("rank")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L), "desc: zz, aa, then the null")
  }

  test("pre-epoch fractional-second timestamps order correctly") {
    // the floorDiv fix in keyOf: -0.5 s must map to -500000 micros and
    // order BEFORE the epoch, not +500000 micros after it (plain `/`
    // truncates toward zero). Top-1 descending per group must therefore
    // pick the epoch row, never the pre-epoch one.
    val ts = Seq(
      (1L, "g", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(0, -500000000L))), // -0.5 s
      (2L, "g", java.sql.Timestamp.from(
        java.time.Instant.EPOCH)),
      (3L, "g", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(-1, 250000000L)))  // -0.75 s
    ).toDF("id", "grp", "t")
    val top = GroupTopK.topKPerGroup(ts, Seq("grp"), "t", 1,
      tieCols = Seq("id")).collect()
    assert(top.length == 1 && top.head.getLong(0) == 2L,
      s"descending top-1 must be the epoch row, got ${top.toSeq}")
    val bottom = GroupTopK.topKPerGroup(ts, Seq("grp"), "t", 3,
      asc = true, tieCols = Seq("id"))
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(bottom == Seq(3L, 1L, 2L),
      s"ascending order must be -0.75s, -0.5s, epoch; got $bottom")
  }

  test("exact duplicate order+tie keys: both rows survive pruning") {
    val d = Seq((1L, "a", 5.0), (1L, "a", 5.0), (2L, "a", 1.0))
      .toDF("id", "grp", "score")
    val got = GroupTopK.topKPerGroup(d.coalesce(1), Seq("grp"), "score", 2,
      tieCols = Seq("id"))
    assert(got.count() == 2)
    assert(got.filter(col("id") === 1L).count() == 2,
      "interchangeable duplicates must fill both slots")
  }

  test("idCol mode: wide payload never enters the prune buffer; result " +
      "equals the window form; survivors re-join broadcast") {
    val payload = "x" * 10000
    val wide = rows.map { case (id, g, sc, lb) => (id, g, sc, lb, payload) }
      .toDF("id", "grp", "score", "label", "payload").repartition(9)
    val got = GroupTopK.topKPerGroup(wide, Seq("grp"), "score", 3,
      tieCols = Seq("id"), idCol = Some("id"))
    // identical rows to the plain-window form over the wide table
    val dirW = Window.partitionBy("grp")
      .orderBy(col("score").desc_nulls_last, col("id").asc)
    val want = wide.withColumn("rank", row_number().over(dirW))
      .filter(col("rank") <= 3)
      .orderBy("grp", "rank").collect()
    assert(got.orderBy("grp", "rank").collect().sameElements(want))
    // the full rows come back via a BROADCAST semi-join of the bounded
    // survivor-id set — the wide table is scanned, never shuffled
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast left-semi survivor fetch:\n$plan")
    // the prune itself runs on the PROJECTED view: a few scalars per
    // row, independent of payload width — the buffered schema is the
    // narrow one
    val narrow = wide.select("grp", "score", "id")
    val pruned = GroupTopK.localPrune(narrow, Seq("grp"), "score", 3,
      asc = false, Seq("id"))
    assert(pruned.schema.fieldNames.toSeq == Seq("grp", "score", "id"),
      "prune buffer must hold only group/order/tie/id columns")
    assert(!got.queryExecution.analyzed.toString.linesIterator
      .exists(l => l.contains("MapPartitions") && l.contains("payload")),
      "the payload column must not flow through the mapPartitions prune")
  }
}
