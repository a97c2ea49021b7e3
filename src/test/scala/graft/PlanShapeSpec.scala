package graft

/** Physical-plan regression gates: the scale-critical plan properties the
  * engine is designed around, asserted on the real gate queries so a
  * refactor that silently breaks pushdown, pruning, broadcast, or top-k
  * planning fails here rather than only showing up in a benchmark.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("num_filter predicates push into the parquet scan") {
    val p = plan("q_num_filter")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,30.0"),
      s"missing pushed numeric filter in:\n$p")
  }

  test("date filter's redundant raw-range conjunct pushes for row-group pruning") {
    val p = plan("q_date_filter")
    assert(p.contains("GreaterThanOrEqual(ts,"), s"raw ts bound not pushed:\n$p")
  }

  test("column pruning: count query reads only its grouping column") {
    val p = plan("q_count")
    assert(p.contains("ReadSchema: struct<l_returnflag:string>"),
      s"expected single-column ReadSchema in:\n$p")
  }

  test("re-attach join broadcasts the small view side") {
    val p = plan("q_reattach")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ in:\n$p")
  }

  test("num_topk plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_num_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("keyword filter stays inside whole-stage codegen") {
    // codegen spans only appear in the final (post-AQE) plan
    val df = SparkEntry.queries("q_keyword_filter_contains")(spark, dir)
    df.collect() // count() would execute a different QueryExecution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert(p.contains("*(1)"), s"no codegen span in:\n$p")
    assert(p.toLowerCase.contains("multicontains"),
      s"keyword kernel missing in:\n$p")
  }

  test("tpch q6 predicates push into the parquet scan") {
    // the plan string truncates the PushedFilters list; match the prefix
    val p = plan("q_tpch_q6")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") &&
      p.contains("GreaterThanOrEqual(l_shipda"),
      s"missing pushed filters in:\n$p")
  }

  test("tpch q4 EXISTS shape plans as a left-semi join on one pruned column") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), s"no left-semi join in:\n$p")
    // the EXISTS probe side reads only the join key + pushed filter column
    assert(p.contains("ReadSchema: struct<l_orderkey:"),
      s"lineitem not pruned to the semi-join key in:\n$p")
  }

  test("tpch q17 per-part aggregate and brand dim both broadcast") {
    val p = plan("q_tpch_q17")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ in:\n$p")
  }

  test("tpch q10 top-20 plans as TakeOrderedAndProject with broadcast dims") {
    val p = plan("q_tpch_q10")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    // the returnflag filter reaches the fact scan
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"fact filter not pushed in:\n$p")
  }

  test("tpch q18 per-order rollup broadcasts into the fact") {
    val p = plan("q_tpch_q18")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    // the rollup side reads only the two columns it aggregates
    assert(p.contains("ReadSchema: struct<l_orderkey:") &&
      p.contains("l_quantity:"),
      s"lineitem rollup not pruned in:\n$p")
  }

  test("tpch q19 disjunctive predicate is one broadcast join, no cartesian") {
    val p = plan("q_tpch_q19")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"OR tree degenerated to a non-equi join:\n$p")
  }

  test("tpch q22 shape: anti join on pruned recent orders") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), s"no left-anti join in:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"),
      s"recent-order bound not pushed in:\n$p")
  }

  test("anti-join shape plans as LeftAnti with a pruned probe") {
    val p = plan("q_anti_join")
    assert(p.contains("LeftAnti"), s"no left-anti join in:\n$p")
    assert(p.contains("ReadSchema: struct<o_custkey:"),
      s"orders probe not pruned to the join key in:\n$p")
  }

  test("similarity joins never plan a cartesian product") {
    assert(!plan("q_fuzzy_join").contains("Cartesian"))
    assert(!plan("q_embed_join").contains("Cartesian"))
    assert(!plan("q_dedup_minhash").contains("Cartesian"))
  }

  test("range-clustered layout: disjoint per-file key ranges, filter pushes down") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("graft_clustered_spec").toString
    graft.sources.Tables.writeClustered(
      spark.read.parquet(s"$dir/events.parquet")
        .select("event_id", "user_id"), path, Seq("user_id"), files = 4)
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length > 1, "expected multiple clustered files")
    // every file owns a disjoint user_id range — the data-skipping contract
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("user_id"), max("user_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
    // and a selective predicate on the cluster key reaches the scan
    val p = spark.read.parquet(path).filter(col("user_id") === 42L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,42)"),
      s"cluster-key filter not pushed in:\n$p")
  }

  test("bloom semi-join: native codegen probe sits under the join") {
    // sf0.01: sf0.001 has no negative-balance supplier, which takes the
    // empty-build-side path (same join shape, no bloom probe to pin)
    val df = SparkEntry.queries("q_bloom_semi_join")(
      spark, "/root/testdata/sf0.01")
    val p = df.queryExecution.executedPlan.toString
    val semiAt = p.indexOf("LeftSemi")
    assert(semiAt >= 0, s"no left-semi join in:\n$p")
    // the probe is Spark's native BloomFilterMightContain (the AQE
    // runtime-filter expression), NOT a Scala UDF: it stays inside
    // whole-stage codegen with no serialization boundary
    val probeAt = p.indexOf("might_contain", semiAt)
    assert(probeAt > semiAt, s"bloom probe not under the join:\n$p")
    assert(!p.contains("UDF("),
      s"bloom probe must be the native expression, not a UDF:\n$p")
  }

  test("tpch q16 NOT IN shape plans as a left-anti join") {
    val p = plan("q_tpch_q16")
    assert(p.contains("LeftAnti"), s"no left-anti join in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"NOT IN must not plan a nested loop here:\n$p")
  }

  test("tpch q2 decorrelates to one window over the part-partitioned supply") {
    val p = plan("q_tpch_q2")
    assert(p.contains("Window"), s"expected window-min decorrelation:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("funnel's two window passes share one user-partitioned exchange") {
    val p = plan("q_funnel")
    val exchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllMatchIn(p).length
    assert(exchanges == 1,
      s"expected exactly 1 user_id exchange for all funnel windows, got $exchanges in:\n$p")
  }

  test("scd2's dedupe and build windows share one key-partitioned exchange") {
    val p = plan("q_scd2_dedup")
    val hashEx = "Exchange hashpartitioning\\(user_id".r
      .findAllMatchIn(p).length
    assert(hashEx == 1,
      s"both SCD windows must reuse one user_id exchange, got $hashEx in:\n$p")
    assert("Window".r.findAllMatchIn(p).length >= 2,
      s"expected dedupe + build windows in:\n$p")
  }

  test("table diff plans a full-outer merge join, never a nested loop") {
    val p = plan("q_table_diff")
    assert(p.contains("FullOuter"), s"no full-outer join in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"diff must stay an equi-join:\n$p")
  }

  test("skipping reader: residual bounds push into the pruned scan") {
    import graft.sources.Skipping
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_skip_plan").toString + "/tbl"
    val df = (0 until 400).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
    Skipping.writeIndexed(df, path, clusterCols = Seq("id"), files = 8)
    val out = Skipping.readSkipping(spark, path,
      Seq(Skipping.Bound("id", Some(100), Some(150))))
    val scan = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    // manifest pruning cut the file list AND the residual interval still
    // reaches the parquet reader for row-group pruning inside survivors
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(id,100)") &&
      scan.contains("LessThanOrEqual(id,150)"),
      s"residual bounds must push down:\n$scan")
    assert(out.inputFiles.length < 8,
      "the sidecar must prune files before the scan")
  }

  test("predicate-driven version read: extracted interval pushes into " +
      "the pruned scan") {
    import graft.sources.Merge
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_where_plan").toString + "/tbl"
    val df = (0 until 400).map(i => (i.toLong, i % 100)).toDF("id", "ts")
    Merge.writeKeyed(df, path, "id", nBuckets = 2,
      statsCols = Seq("ts"), filesPerBucket = 4)
    Merge.compactVersion(spark, path, targetFilesPerBucket = 4,
      clusterBy = Seq("ts"))
    val out = Merge.readKeyedWhere(spark, path,
      col("ts") >= 90 && (col("id") % 3) === 0L)
    val scan = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("GreaterThanOrEqual(ts,90)"),
      s"the extracted interval must reach the parquet reader:\n$scan")
    assert(out.inputFiles.length < 8,
      "manifest stats must prune files before the scan")
    assert(out.count() ==
      df.filter($"ts" >= 90 && ($"id" % 3) === 0L).count())
  }

  test("identically bucketed tables join with zero shuffle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    graft.sources.Tables.writeBucketed(orders, "b_orders", Seq("o_custkey"), 4)
    graft.sources.Tables.writeBucketed(cust, "b_cust", Seq("o_custkey"), 4)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = graft.sources.Tables.bucketedJoin(spark, "b_orders", "b_cust",
        Seq("o_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should move zero bytes, got:\n$plan")
      // and it is still the right answer
      val viaJoin = j.count()
      val expected = orders.join(cust, Seq("o_custkey")).count()
      assert(viaJoin == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
