package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extension wiring: cost-ordered conjuncts + SQL multi_contains.
  * Builds its own session (the extension must be present at session
  * construction), separate from the shared SparkSpec session.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently return another suite's extension-less
    // session; withExtensions + newSession-safe construction needs a clean
    // default, so clear (not stop — the SparkContext is shared) and rebuild.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions (not the spark.sql.extensions conf): the conf is a
    // static one read from the SparkContext's own conf, so it cannot apply
    // when another suite already created the context — the programmatic
    // builder hook applies either way.
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // don't leave this session as the process default: other suites'
    // getOrCreate must see their own (UTC, extension-less) SparkSpec
    // session — leaking this one would silently change their tz and
    // extension surface (suite-ordering footgun, round-7 verdict #3).
    // RESTORE the shared session rather than clearing to NOTHING:
    // a no-default world strands parallel suites whose code paths
    // reach SparkSession.active from threads with no active set
    // (the streaming sink's provider resolution, r13).
    SparkSession.clearActiveSession()
    SparkSession.setDefaultSession(graft.SparkSpec.session)
    s
  }

  test("OracleCostReorder floats a UDF conjunct after cheap predicates") {
    import spark.implicits._
    val expensive = udf { s: String => s != null && s.contains("3") }
    // range source: a LocalRelation would be folded away by the optimizer
    val df = spark.range(10).toDF("n")
      .withColumn("t", concat(lit("row"), col("n")))
      .filter(expensive(col("t")) && col("n") > 1) // expensive FIRST as written
    val optimized = df.queryExecution.optimizedPlan
    val conds = optimized.collect { case Filter(c, _) => c }
    assert(conds.nonEmpty)
    def flat(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case And(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    val conjuncts = flat(conds.head)
    assert(conjuncts.size >= 2)
    // the UDF conjunct must come last after reordering
    assert(conjuncts.last.exists(_.isInstanceOf[ScalaUDF]),
      s"expected ScalaUDF last, got: $conjuncts")
    assert(!conjuncts.head.exists(_.isInstanceOf[ScalaUDF]))
    // semantics preserved
    assert(df.select("n").as[Long].collect().sorted.toSeq == Seq(3L))
  }

  test("LevenshteinPrune prepends the length-gap guard exactly once") {
    import spark.implicits._
    // parquet-backed (a literal LocalRelation would be constant-folded
    // before the Filter survives into the optimized plan)
    val path = java.nio.file.Files
      .createTempDirectory("graft_lev_prune").toString
    Seq("alpha", "alphax", "totally different string", "beta")
      .toDF("t").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .filter(levenshtein(col("t"), lit("alpha")) <= 2)
    val opt = df.queryExecution.optimizedPlan
    val conds = opt.collect { case Filter(c, _) => c }
    assert(conds.nonEmpty)
    def flat(e: org.apache.spark.sql.catalyst.expressions.Expression):
        Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case And(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    val conjuncts = flat(conds.head)
    // guard + original comparison; the fixpoint loop must not stack guards
    val guards = conjuncts.filter(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Abs]))
    assert(guards.size == 1, s"expected exactly one length guard: $conjuncts")
    // the guard can only drop rows the DP rejects: semantics unchanged
    assert(df.as[String].collect().toSet == Set("alpha", "alphax"))
  }

  test("multi_contains is callable from SQL in all three modes") {
    import spark.implicits._
    Seq("spark joins fast", "flink streams", "SPARK and Flink")
      .toDF("t").createOrReplaceTempView("docs")
    val all = spark.sql(
      "SELECT t FROM docs WHERE multi_contains(t, array('spark'), 'all')")
      .as[String].collect().toSet
    assert(all == Set("spark joins fast", "SPARK and Flink"))
    val any = spark.sql(
      "SELECT t FROM docs WHERE multi_contains(t, array('joins','streams'), 'any')")
      .as[String].collect().toSet
    assert(any == Set("spark joins fast", "flink streams"))
    val none = spark.sql(
      "SELECT t FROM docs WHERE multi_contains(t, array('flink'), 'none')")
      .as[String].collect().toSet
    assert(none == Set("spark joins fast"))
  }

  test("graft_chunk_spans from SQL: spans reconstruct every chunk via " +
      "substring over the normalized text") {
    import spark.implicits._
    Seq((1L, (1 to 10).map(i => s"w$i").mkString("  ")), // messy gaps
        (2L, "solo"), (3L, ""))
      .toDF("id", "t").createOrReplaceTempView("span_docs")
    val rows = spark.sql(
      """SELECT id,
                size(graft_chunk_spans(t, 4, 3)) AS n,
                size(filter(graft_chunk_spans(t, 4, 3),
                  s -> substring(regexp_replace(trim(t), '\\s+', ' '),
                         s.start_char, s.end_char - s.start_char)
                       = s.chunk)) AS ok
         FROM span_docs ORDER BY id""")
      .as[(Long, Int, Int)].collect().toSeq
    assert(rows == Seq((1L, 3, 3), (2L, 1, 1), (3L, 0, 0)),
      s"every SQL span must reconstruct its chunk, got $rows")
  }

  test("graft_cap_per_group from SQL equals the Scala capPerGroup") {
    import spark.implicits._
    spark.range(100).selectExpr("id", "concat('g', id % 3) AS grp",
      "cast((id * 37) % 41 AS DOUBLE) AS score")
      .createOrReplaceTempView("cap_sql_docs")
    val got = spark.sql(
      "SELECT id FROM graft_cap_per_group('cap_sql_docs', 'grp', " +
      "'score', 'id', 7)").as[Long].collect().toSet
    val expect = graft.pipeline.Sampling.capPerGroup(
      spark.table("cap_sql_docs"), "grp", col("score"), "id", 7)
      .select("id").as[Long].collect().toSet
    assert(got == expect && got.size == 21)
  }

  test("graft_url_domain from SQL delegates to the same kernel") {
    import spark.implicits._
    val got = spark.sql(
      "SELECT graft_url_domain('https://www.Ex.COM:443/p?q#f')")
      .as[String].head()
    assert(got == "ex.com", got)
  }

  test("table functions: graft_table / _version / _asof / graft_changes " +
      "reach the version log from SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ext_tvf").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "tbl").getAbsolutePath
    // the TVF builder calls SparkSession.active — set it as a SQL
    // session would have it
    SparkSession.setActiveSession(spark)
    try {
      val base = (0L until 40L).map(i => (i, i * 1.0)).toDF("id", "v")
      graft.sources.Merge.writeKeyed(base, path, "id", nBuckets = 4)
      graft.sources.Merge.upsert(spark, path,
        Seq((1L, 100.0), (50L, 5.0)).toDF("id", "v"), "id", 4)
      assert(spark.sql(s"SELECT count(*) AS n FROM graft_table('$path')")
        .as[Long].head() == 41L)
      assert(spark.sql(
        s"SELECT v FROM graft_table('$path') WHERE id = 1")
        .as[Double].head() == 100.0)
      assert(spark.sql(
        s"SELECT count(*) AS n FROM graft_table_version('$path', 0)")
        .as[Long].head() == 40L)
      val t1 = graft.sources.Merge.commitTime(spark, path, 1)
      assert(spark.sql(
        s"SELECT count(*) AS n FROM graft_table_asof('$path', ${t1}L)")
        .as[Long].head() == 41L)
      val ops = spark.sql(
        s"SELECT op, count(*) AS n FROM graft_changes('$path', 0, 1) " +
        "GROUP BY op ORDER BY op")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(ops == Seq((-1, 1L), (1, 2L)),
        s"update old@-1 + new@+1 + insert@+1, got $ops")
      val hist = spark.sql(
        s"SELECT version, op FROM graft_history('$path') ORDER BY version")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(hist == Seq((0L, "write"), (1L, "upsert")))
      // Delta's table_changes(...) dialect: the same commit reads as
      // update pre/post images for the touched key + insert for the new
      val cdf = spark.sql(
        s"SELECT id, v, _change_type, _commit_version " +
        s"FROM graft_table_changes('$path', 0, 1) " +
        "ORDER BY id, _change_type")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(cdf == Seq(
        (1L, 100.0, "update_postimage", 1L),
        (1L, 1.0, "update_preimage", 1L),
        (50L, 5.0, "insert", 1L)), s"got $cdf")
      // predicate string → parsed → bounds-extracted skipping read
      val whr = spark.sql(
        s"SELECT count(*) AS n FROM graft_table_where('$path', " +
        "'id >= 10 AND id <= 12')").as[Long].head()
      assert(whr == 3L)
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM graft_table('/nope', 2)").collect()
      }
      assert(err.getMessage.contains("graft_table"))
      // tags from SQL: list them, read through one
      graft.sources.Merge.tagVersion(spark, path, "base", 0L)
      assert(spark.sql(s"SELECT tag, version FROM graft_tags('$path')")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("base", 0L)))
      assert(spark.sql(
        s"SELECT count(*) AS n FROM graft_table_tag('$path', 'base')")
        .as[Long].head() == 40L)
    } finally SparkSession.clearActiveSession()
  }

  test("catalog table functions read the pinned snapshot from SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ext_cat").toFile
    dir.deleteOnExit()
    val aPath = new java.io.File(dir, "a").getAbsolutePath
    val cat = new java.io.File(dir, "cat").getAbsolutePath
    SparkSession.setActiveSession(spark)
    try {
      graft.sources.Merge.writeKeyed(
        (0L until 10L).map(i => (i, i * 1.0)).toDF("id", "v"),
        aPath, "id", nBuckets = 2)
      graft.sources.TableCatalog.create(spark, cat, Map("a" -> aPath))
      graft.sources.TableCatalog.transact(spark, cat, Seq(
        graft.sources.TableCatalog.TxnUpsert("a",
          Seq((1L, 111.0)).toDF("id", "v"))))
      // an orphan above the pin (a crashed transaction's leftovers)
      // must stay invisible to the SQL surface
      graft.sources.Merge.upsert(spark, aPath,
        Seq((2L, -2.0)).toDF("id", "v"), "id", 2)
      assert(spark.sql(
        s"SELECT v FROM graft_catalog_table('$cat', 'a') WHERE id = 1")
        .as[Double].head() == 111.0)
      assert(spark.sql(
        s"SELECT v FROM graft_catalog_table('$cat', 'a') WHERE id = 2")
        .as[Double].head() == 2.0, "the orphan write must not show")
      assert(spark.sql(
        s"SELECT v FROM graft_catalog_table_at('$cat', 'a', 0) WHERE id = 1")
        .as[Double].head() == 1.0)
      val hist = spark.sql(
        s"SELECT cat_version, op FROM graft_catalog_history('$cat') " +
        "ORDER BY cat_version")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(hist == Seq((0L, "create"), (1L, "transact")))
    } finally SparkSession.clearActiveSession()
  }
  test("graft_ann_topk: persisted IVF-PQ search from pure SQL") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 64L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft_ext_ann")
      .toFile
    idx.deleteOnExit()
    val path = new java.io.File(idx, "ivfpq").getAbsolutePath
    graft.pipeline.Similarity.IvfPq.save(
      graft.pipeline.Similarity.IvfPq.build(vecs, "vec_id", "embedding",
        dim = 8, cells = 2, m = 2, kSub = 8), path)
    vecs.filter($"vec_id" < 3).toDF("qid", "embedding")
      .createOrReplaceTempView("ext_ann_queries")
    val sql = spark.sql(
      s"SELECT * FROM graft_ann_topk('$path', 'ext_ann_queries', " +
      "'qid', 'embedding', 5, 2)")
    val api = graft.pipeline.Similarity.IvfPq.topKPersisted(spark, path,
      spark.table("ext_ann_queries"), "qid", "embedding", k = 5,
      nProbe = 2)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet
    assert(key(sql) == key(api) && key(sql).nonEmpty,
      "the SQL TVF must return exactly the Scala probe's results")
    // 7-arg FILTERED form: the allowlist view's first column gates ids
    vecs.filter($"vec_id" % 2 === 0).select("vec_id")
      .createOrReplaceTempView("ext_ann_allowed")
    val fsql = spark.sql(
      s"SELECT * FROM graft_ann_topk('$path', 'ext_ann_queries', " +
      "'qid', 'embedding', 5, 2, 'ext_ann_allowed')")
    val fapi = graft.pipeline.Similarity.IvfPq.topKPersisted(spark, path,
      spark.table("ext_ann_queries"), "qid", "embedding", k = 5,
      nProbe = 2,
      allowed = Some(spark.table("ext_ann_allowed")))
    assert(key(fsql) == key(fapi) && key(fsql).nonEmpty)
    assert(key(fsql).forall(_._2 % 2 == 0),
      "a disallowed id survived the TVF filter")
  }

  test("graft_ingested lists COPY INTO's loaded source files from SQL") {
    import spark.implicits._
    SparkSession.setActiveSession(spark)
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ext_ingest").toFile
      dir.deleteOnExit()
      val path = new java.io.File(dir, "t").getAbsolutePath
      val landing = new java.io.File(dir, "landing")
      landing.mkdirs()
      graft.sources.Merge.writeKeyed(
        (0L until 5L).map(i => (i, s"v$i")).toDF("id", "v"),
        path, "id", nBuckets = 2)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ext_ingest_tmp").toFile
      Seq((10L, "x")).toDF("id", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      java.nio.file.Files.move(
        tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
        new java.io.File(landing, "a.parquet").toPath)
      graft.sources.Merge.copyInto(spark, path, landing.getAbsolutePath)
      val got = spark.sql(
        s"SELECT source_file FROM graft_ingested('$path')")
        .as[String].collect().toSeq
      assert(got.size == 1 && got.head.endsWith("a.parquet"), got)
    } finally SparkSession.clearActiveSession()
  }

  test("graft_dedup_pairs: MinHash-LSH candidates from pure SQL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark sql table formats"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_dedup_docs")
    val sql = spark.sql(
      "SELECT * FROM graft_dedup_pairs('ext_dedup_docs', 'doc_id', " +
      "'text', 80)")
    val api = graft.pipeline.Dedup.minhashCandidates(docs, "doc_id",
      col("text"), threshold = 0.8)
    assert(sql.columns.toSeq == api.columns.toSeq)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(df.columns.take(2).map(col): _*).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(sql) == key(api))
    assert(key(sql).contains((1L, 2L)) || key(sql).contains((2L, 1L)),
      s"the planted near-dup pair must surface, got ${key(sql)}")
  }

  test("SPJ ordering under compatible transforms WITH the sort-restore " +
      "rule: an equal-count key-sorted join keeps the sort-free zipper, " +
      "a reduced (8 vs 4) join gets exactly the finer side's Sort back " +
      "— exact rows both ways") {
    import spark.implicits._
    assert(graft.sources.v2.GraftSpjSortRestore.installed(spark),
      "precondition: the extensions session must carry the rule")
    val root = java.nio.file.Files
      .createTempDirectory("graft_ext_spj").toFile
    root.deleteOnExit()
    val cat = "gextspj"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.getAbsolutePath)
    def p(n: String) = new java.io.File(root, n).getAbsolutePath
    graft.sources.Merge.writeKeyed(spark.range(200)
      .selectExpr("id", "cast(id AS DOUBLE) AS v").toDF(), p("a8"),
      "id", 8)
    graft.sources.Merge.writeKeyed(spark.range(160)
      .selectExpr("id", "concat('n', id) AS name").toDF(), p("b8"),
      "id", 8)
    graft.sources.Merge.writeKeyed(spark.range(120)
      .selectExpr("id", "concat('c', id) AS tag").toDF(), p("c4"),
      "id", 4)
    def sortNodes(plan: String): Int = plan.linesIterator.count(l =>
      l.contains(" Sort [") && !l.contains("SortMergeJoin"))
    spark.conf.set("spark.graft.bucketedScan", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing" +
      ".allowCompatibleTransforms.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // equal counts: reduction never engages, so the claim holds and
      // the conf must no longer cost the zipper (r15 withdrew here)
      // plan strings must be the EXECUTED (final) adaptive plans — the
      // restore rule runs at final-stage preparation, so collect() the
      // same Dataset whose queryExecution is inspected
      val eq = spark.sql(s"SELECT a.id, a.v, b.name FROM $cat.a8 a " +
        s"JOIN $cat.b8 b ON a.id = b.id")
      val eqRows = eq.collect()
      val eqPlan = eq.queryExecution.executedPlan.toString
      assert(!eqPlan.contains("Exchange"), s"exchange-free:\n$eqPlan")
      assert(sortNodes(eqPlan) == 0,
        s"equal-count compat-on join must stay SORT-FREE:\n$eqPlan")
      assert(eqRows.map(_.getLong(0)).sorted.toSeq == (0L until 160L),
        "zipper rows must be exact")
      // mismatched counts: the finer side's 8 buckets concatenate into
      // 4 reduced keys — the rule must put ITS Sort back (the coarse
      // side's single-bucket claim stays valid), rows exact
      val red = spark.sql(s"SELECT a.id, a.v, c.tag FROM $cat.a8 a " +
        s"JOIN $cat.c4 c ON a.id = c.id")
      val redRows = red.collect()
      val redPlan = red.queryExecution.executedPlan.toString
      assert(!redPlan.contains("Exchange"),
        s"reduced join still exchange-free:\n$redPlan")
      assert(redRows.map(_.getLong(0)).sorted.toSeq == (0L until 120L),
        s"the r15 bug shape: a sort-free zipper over concatenated " +
        s"buckets drops rows — got ${redRows.length}/120")
      assert(redPlan.contains("isFinalPlan=true"),
        s"must inspect the executed adaptive plan:\n$redPlan")
      assert(sortNodes(redPlan) == 1,
        s"exactly the reduced (finer) side must re-sort:\n$redPlan")
    } finally {
      spark.conf.set("spark.graft.bucketedScan", "false")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      spark.conf.unset("spark.sql.sources.v2.bucketing" +
        ".allowCompatibleTransforms.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

}
