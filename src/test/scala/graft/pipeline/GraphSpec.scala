package graft.pipeline

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the hand-computed fixpoint steps on a triangle") {
    // directed cycle a->b->c->a, all out-degrees 1: every iteration
    // rank(x) = 0.15 + 0.85 * rank(prev(x)); starting from 1.0 all ranks
    // stay exactly 1.0 at every iteration
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val r = Graph.pageRank(edges, "s", "d", iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("pageRank hand-check on a star: hub accumulates, leaves drain") {
    // leaves l1,l2,l3 -> hub. iter1: hub = 0.15 + 0.85*3 = 2.7;
    // leaves have no in-edges: 0.15. iter2: hub = 0.15 + 0.85*(0.15*3)
    // = 0.5325 (leaf ranks from iter1)
    val edges = Seq(("l1", "h"), ("l2", "h"), ("l3", "h")).toDF("s", "d")
    val i1 = Graph.pageRank(edges, "s", "d", iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(i1("h") - 2.7) < 1e-12)
    assert(math.abs(i1("l1") - 0.15) < 1e-12)
    val i2 = Graph.pageRank(edges, "s", "d", iters = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(i2("h") - (0.15 + 0.85 * 3 * 0.15)) < 1e-12)
  }

  test("dangling redistribution hand-check on a star (hub is a sink)") {
    // l1,l2,l3 -> h; N=4; hub has no out-edges so its whole rank is the
    // dangling mass. iter1: dm = rank0(h) = 1.0, so every node gets
    // 0.15 + 0.85*(contrib + 1/4): hub = 0.15+0.85*3.25 = 2.9125,
    // leaves = 0.15+0.85*0.25 = 0.3625
    val edges = Seq(("l1", "h"), ("l2", "h"), ("l3", "h")).toDF("s", "d")
    val r = Graph.pageRank(edges, "s", "d", iters = 1,
      redistributeDangling = true)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("h") - (0.15 + 0.85 * (3.0 + 0.25))) < 1e-12)
    assert(math.abs(r("l1") - (0.15 + 0.85 * 0.25)) < 1e-12)
    // mass is conserved: total rank stays N
    assert(math.abs(r.values.sum - 4.0) < 1e-12)
  }

  test("checkpoint cadence changes the plan, never the values") {
    val edges = (0 until 40).map(i =>
      (s"n${i % 10}", s"n${(i * 7 + 3) % 10}")).toDF("s", "d")
    val plain = Graph.pageRank(edges, "s", "d", iters = 6)
    val chk = Graph.pageRank(edges, "s", "d", iters = 6,
      checkpointEvery = 2)
    val pv = plain.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cv = chk.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pv.keySet == cv.keySet)
    pv.foreach { case (k, v) => assert(math.abs(v - cv(k)) < 1e-9) }
    // the bounded-lineage contract: the truncated plan stops at a
    // materialized RDD scan and is a fraction of the unbounded plan
    val plainNodes = plain.queryExecution.optimizedPlan
      .numberedTreeString.linesIterator.size
    val chkNodes = chk.queryExecution.optimizedPlan
      .numberedTreeString.linesIterator.size
    assert(chk.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      "checkpointed ranks must read from a materialized scan")
    assert(chkNodes * 2 < plainNodes,
      s"lineage not truncated: $chkNodes vs $plainNodes plan lines")
  }

  test("a materialized redistribute round never shuffles edge-sized data") {
    // Production round inputs: edges pinned pre-partitioned by src,
    // nodesF pinned hash-partitioned by node (its groupBy output), ranks
    // materialized coalesced by node count. The round's plan then has
    // exactly TWO hash exchanges, both node-sized: the coalesced rank
    // table re-spreading to the edges' src partitioning, and the
    // map-side-combined contribution aggregation. The edge list itself —
    // the only input that is big at scale — feeds its join with no
    // Exchange above its scan. AQE off so the static plan is inspectable.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.functions._
      val e = (0 until 40).map(i =>
        (s"n${i % 10}", s"n${(i * 7 + 3) % 10}")).toDF("src", "dst")
        .distinct().repartition(col("src")).localCheckpoint(true)
      val nodesF = e.select(col("src").as("node"), lit(1L).as("f"))
        .union(e.select(col("dst").as("node"), lit(0L).as("f")))
        .groupBy("node")
        .agg(sum("f").as("__deg"), (sum(col("f")) > 0).as("__has_out"))
        .localCheckpoint(true)
      val ranks = nodesF.withColumn("rank", lit(1.0))
        .coalesce(1).localCheckpoint(true)
      val round = Graph.redistributeRound(e, nodesF, ranks, 0.85, 0.1)
      val p = round.queryExecution.executedPlan.toString
      val hashExchanges = "Exchange hashpartitioning".r
        .findAllMatchIn(p).size
      assert(hashExchanges <= 2,
        s"a round may move only node-sized tables (rank re-spread + " +
          s"contribution agg), saw $hashExchanges exchanges:\n$p")
      // neither exchange may move the edge list: every hash exchange in
      // the round partitions a node-sized table, so none of them may
      // carry the dst column that only edge rows have pre-aggregation
      // (the contribution agg's exchange runs AFTER map-side combine,
      // on (node, partial-sum) rows)
      p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
        .foreach(l => assert(!l.contains("dst"),
          s"an exchange is moving raw edge rows:\n$l\n$p"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("duplicate edges weight contributions, as documented") {
    // a->b twice, a->c once: deg(a)=3, b gets 2/3, c gets 1/3
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("s", "d")
    val r = Graph.pageRank(edges, "s", "d", iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("b") - (0.15 + 0.85 * 2.0 / 3)) < 1e-12)
    assert(math.abs(r("c") - (0.15 + 0.85 * 1.0 / 3)) < 1e-12)
  }
}
