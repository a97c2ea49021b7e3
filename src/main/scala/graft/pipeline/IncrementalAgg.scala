package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: a materialized per-group aggregate
  * (count, exact decimal sum, min, max) kept as a parquet state table and
  * folded forward with each new data delta — the ETL pattern that at
  * 100 TB replaces "rescan all history every day" with "aggregate today's
  * partition and merge" (work proportional to the delta plus the group
  * count, not to history).
  *
  * Two delta shapes:
  *
  *   - [[update]] — APPEND-ONLY deltas. count/sum add, min/max only
  *     tighten, so folding in any order equals the full recompute EXACTLY
  *     (decimal sums make that bit-stable; the q_incremental_agg gate pins
  *     incremental == from-scratch in DuckDB).
  *   - [[updateWithRetractions]] — deltas carrying DELETES: each row is a
  *     +1 insert or -1 retraction of a previously-inserted row. count and
  *     sum are abelian-group aggregates and fold retractions exactly; a
  *     group whose count reaches zero disappears. min/max are NOT
  *     invertible — retracting a row that ties the stored extreme may
  *     expose a different one — so such groups are flagged dirty and
  *     repaired by [[rebuild]] from the net raw table, scanning ONLY the
  *     flagged groups' rows (a left-semi prune, not history).
  *
  * Contract: retractions must match prior inserts (the relational
  * "multiset difference is non-negative" rule); a group driven below zero
  * is dropped like an emptied one.
  */
object IncrementalAgg {

  private val flagCols = Seq("dirty_min", "dirty_max")

  // test seam: invoked after the new state is durably materialized and
  // before the old state files are swapped out — a spec simulates
  // executor/block loss here to prove the pivot survives it
  @volatile private[pipeline] var beforeOverwriteHook: () => Unit = () => ()

  /** Per-path state-schema memo: every update/read of a state path pays
    * parquet footer inference otherwise, and streaming maintenance
    * (foreachBatch folds) resolves the same fixed-schema path once per
    * micro-batch. Entries are written by our own writes (the exact
    * schema just written) or a first inference read, so they always
    * match the files on disk; [[init]] refreshes the entry, covering a
    * re-initialized path inside one JVM. External rewrites of a live
    * state path mid-session are out of scope (same immutable-input
    * assumption as the engine's other read memos).
    */
  private val stateSchemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]

  private def readState(spark: SparkSession, path: String): DataFrame = {
    val memo = stateSchemaMemo.get(path)
    if (memo != null) spark.read.schema(memo).parquet(path)
    else {
      val df = spark.read.parquet(path)
      stateSchemaMemo.put(path, df.schema)
      df
    }
  }

  /** Pivot of the read->fold->write cycle: land the new state DURABLY in
    * a hidden tmp dir inside the state path (one Spark job — the fold
    * computes while the old files, its input, are still in place; dot-
    * prefixed dirs are invisible to the parquet reader), then swap the
    * data files driver-side. Replaces the old localCheckpoint-then-
    * overwrite pivot, which paid a second job (blocks -> parquet) per
    * update and lost state to executor-block loss in the window; now the
    * new state is on durable storage before any old file is touched, so
    * the `checkpointDir` escape hatch is no longer needed for safety
    * (accepted and ignored for API compatibility). The only non-durable
    * window left is the driver-side rename swap; recovery there is
    * unchanged: delete the state dir and re-initialize from current data.
    */
  private def writeSwap(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fixed tmp name: overwrite mode self-cleans a crashed prior attempt
    // (the update cycle is single-writer by contract — read-modify-write)
    val tmp = new org.apache.hadoop.fs.Path(p, "._graft_state_tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    stateSchemaMemo.put(path, df.schema)
    beforeOverwriteHook()
    fs.listStatus(p)
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .foreach(st => fs.delete(st.getPath, false))
    fs.listStatus(tmp)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        // spark part names embed a per-job UUID: collisions impossible
        require(fs.rename(st.getPath, new org.apache.hadoop.fs.Path(
          p, st.getPath.getName)),
          s"failed to move new state file ${st.getPath} into $path")
      }
    fs.delete(tmp, true)
  }

  private def aggregate(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(28,2)")).as("sum_exact"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /** Initialize the state table from a first batch. */
  def init(df: DataFrame, path: String, keys: Seq[String],
      valueCol: String): Unit = {
    val state = aggregate(df, keys, valueCol)
      .withColumn("dirty_min", lit(false))
      .withColumn("dirty_max", lit(false))
    state.write.mode("overwrite").parquet(path)
    stateSchemaMemo.put(path, state.schema)
  }

  // older state tables predate the dirty flags; treat absent as clean
  private def withFlags(state: DataFrame): DataFrame =
    flagCols.foldLeft(state) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(false))
    }

  /** Fold an append-only delta into the state: aggregate the delta (the
    * only scan of raw data), full-outer merge with the state on the group
    * keys, write the new state. Work = O(delta + |groups|). Dirty flags
    * pass through: appends can neither repair nor worsen a stale extreme.
    */
  def update(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], valueCol: String,
      checkpointDir: Option[String] = None): Unit = {
    val state = withFlags(readState(spark, path))
    val d = aggregate(delta, keys, valueCol)
      .select(keys.map(col) ++
        Seq("cnt", "sum_exact", "min_v", "max_v")
          .map(c => col(c).as(s"d_$c")): _*)
    val merged = state.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) +
          coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_exact"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("d_sum_exact"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("sum_exact"),
        least(col("min_v"), col("d_min_v")).as("min_v"),
        greatest(col("max_v"), col("d_max_v")).as("max_v"),
        coalesce(col("dirty_min"), lit(false)).as("dirty_min"),
        coalesce(col("dirty_max"), lit(false)).as("dirty_max")): _*)
    writeSwap(merged, path)
  }

  /** Fold a delta with retractions: `opCol` is +1 (insert) or -1
    * (retract). One scan of the delta, one full-outer merge. Groups whose
    * retracted extreme ties-or-passes the merged min (max) candidate are
    * flagged `dirty_min` (`dirty_max`) for [[rebuild]]; emptied groups
    * (count folds to <= 0) are dropped.
    */
  def updateWithRetractions(spark: SparkSession, path: String,
      delta: DataFrame, keys: Seq[String], valueCol: String,
      opCol: String, checkpointDir: Option[String] = None): Unit = {
    val state = withFlags(readState(spark, path))
    val v = col(valueCol).cast("double")
    val adds = (c: Column) => when(col(opCol) > 0, c)
    val dels = (c: Column) => when(col(opCol) < 0, c)
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(opCol).cast("long")).as("d_cnt"),
        sum((col(opCol).cast("decimal(28,2)") *
          col(valueCol).cast("decimal(28,2)")).cast("decimal(28,2)"))
          .as("d_sum_exact"),
        min(adds(v)).as("d_add_min"), max(adds(v)).as("d_add_max"),
        min(dels(v)).as("d_del_min"), max(dels(v)).as("d_del_max"))
    val candMin = least(col("min_v"), col("d_add_min"))
    val candMax = greatest(col("max_v"), col("d_add_max"))
    val merged = state.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) +
          coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_exact"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("d_sum_exact"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("sum_exact"),
        candMin.as("min_v"),
        candMax.as("max_v"),
        (coalesce(col("dirty_min"), lit(false)) ||
          (col("d_del_min").isNotNull && col("d_del_min") <= candMin))
          .as("dirty_min"),
        (coalesce(col("dirty_max"), lit(false)) ||
          (col("d_del_max").isNotNull && col("d_del_max") >= candMax))
          .as("dirty_max")): _*)
      .filter(col("cnt") > 0)
    writeSwap(merged, path)
  }

  /** Repair flagged groups' min/max from `net` (the CURRENT raw table —
    * inserts minus retractions). Scans only the flagged groups' rows via
    * a left-semi prune; clean groups are untouched. Clears the flags.
    */
  def rebuild(spark: SparkSession, path: String, net: DataFrame,
      keys: Seq[String], valueCol: String,
      checkpointDir: Option[String] = None): Unit = {
    val state = withFlags(readState(spark, path))
    val flagged = state.filter(col("dirty_min") || col("dirty_max"))
      .select(keys.map(col): _*)
    // nothing dirty -> nothing to repair: skip without ever touching the
    // (possibly enormous) net table. The check costs one scan of the
    // bounded state parquet, not of raw data.
    if (flagged.isEmpty) return
    val fresh = net.join(flagged, keys, "left_semi")
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol).cast("double")).as("f_min"),
        max(col(valueCol).cast("double")).as("f_max"))
    val repaired = state.join(fresh, keys, "left")
      .select(keys.map(col) ++ Seq(
        col("cnt"), col("sum_exact"),
        when(col("dirty_min"), col("f_min")).otherwise(col("min_v"))
          .as("min_v"),
        when(col("dirty_max"), col("f_max")).otherwise(col("max_v"))
          .as("max_v"),
        lit(false).as("dirty_min"), lit(false).as("dirty_max")): _*)
    writeSwap(repaired, path)
  }

  /** MATERIALIZED-VIEW SYNC over a versioned [[graft.sources.Merge]]
    * table: one call brings the maintained aggregate up to the table's
    * current version and returns it. First call initializes state from
    * the current snapshot; later calls fold ONLY the bucket-pruned
    * change feed between the recorded watermark version and now
    * ([[graft.sources.Merge.changesBetween]] — work ∝ the commits, not
    * the table), repair any delete-dirtied extremes from the current
    * snapshot (dirty groups only), and advance the watermark. The
    * watermark lives in an underscore-prefixed sidecar inside the state
    * dir (invisible to the parquet reader), moved into place atomically
    * AFTER the fold. Crash posture matches the rest of IncrementalAgg:
    * the state overwrite itself is not atomic, so a crash ANYWHERE
    * mid-sync (fold or mark) leaves state that must not be re-folded —
    * recover by deleting the state dir and letting the next sync
    * re-initialize from the current snapshot (cheap relative to the
    * history the sync otherwise never rescans). The caller keeps enough
    * retained versions for the feed (vacuum `keepVersions` > commits
    * between syncs).
    */
  def syncFromTable(spark: SparkSession, statePath: String,
      tablePath: String, keys: Seq[String], valueCol: String,
      checkpointDir: Option[String] = None): Long = {
    import graft.sources.Merge
    val cur = Merge.currentVersion(spark, tablePath)
    require(cur >= 0, s"$tablePath has no version log")
    val mark = new org.apache.hadoop.fs.Path(statePath, "_graft_synced")
    val fs = mark.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeMark(v: Long): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(statePath,
        s"._graft_synced_tmp_${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(mark, false); fs.rename(tmp, mark)
    }
    val last: Option[Long] =
      if (!fs.exists(mark)) None
      else {
        val in = fs.open(mark)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      }
    last match {
      case None =>
        init(Merge.readVersion(spark, tablePath, cur), statePath, keys,
          valueCol)
        writeMark(cur)
      case Some(v) if v == cur => () // already current
      case Some(v) =>
        val feed = Merge.changesBetween(spark, tablePath, v, cur)
        updateWithRetractions(spark, statePath, feed, keys, valueCol,
          "op", checkpointDir)
        rebuild(spark, statePath,
          Merge.readVersion(spark, tablePath, cur), keys, valueCol,
          checkpointDir)
        writeMark(cur)
    }
    cur
  }

  /** The maintained aggregate, sums emitted as doubles for consumers.
    * FAILS FAST when any group is still flagged dirty — after
    * [[updateWithRetractions]] a flagged group's min/max are stale until
    * [[rebuild]] repairs them, and silently returning wrong extremes is
    * the one failure a maintained aggregate must never have. Pass
    * `allowDirty = true` (or use [[readWithFlags]]) for consumers that
    * only need the always-exact cnt/sum and accept unpaired extremes.
    * The check scans only the bounded state table, never raw data.
    */
  def read(spark: SparkSession, path: String,
      allowDirty: Boolean = false): DataFrame = {
    val state = withFlags(readState(spark, path))
    if (!allowDirty) {
      val dirty = state.filter(col("dirty_min") || col("dirty_max")).count()
      require(dirty == 0L,
        s"$dirty group(s) in $path have unrepaired min/max after a " +
        "retraction — call rebuild(...) first, or read(allowDirty = true) " +
        "/ readWithFlags(...) if stale extremes are acceptable")
    }
    state
      .withColumn("sum_v", col("sum_exact").cast("double"))
      .drop("sum_exact")
      .drop(flagCols: _*)
  }

  /** The maintained aggregate WITH its dirty_min/dirty_max flags — for
    * consumers that want to see (rather than refuse or ignore) which
    * groups' extremes are awaiting [[rebuild]].
    */
  def readWithFlags(spark: SparkSession, path: String): DataFrame =
    withFlags(readState(spark, path))
      .withColumn("sum_v", col("sum_exact").cast("double"))
      .drop("sum_exact")
}
