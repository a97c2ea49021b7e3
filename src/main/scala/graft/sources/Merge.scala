package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) for plain-parquet tables — the lakehouse
  * primitive (UPDATE existing keys + INSERT new ones in one atomic
  * commit) that raw `spark.write.parquet` lacks — with a minimal VERSION
  * LOG giving snapshot reads and time travel.
  *
  * Layout contract: the table is written `partitionBy(__bucket)` where
  * `__bucket = pmod(xxhash64(key), nBuckets)`. Data files are IMMUTABLE:
  * an upsert only ever APPENDS new files, never deletes or rewrites one.
  * Which files constitute a version is recorded in a JSON manifest under
  * `_graft_log/v{N}.json` (version, parent, relative file list). An
  * upsert:
  *
  *   1. buckets the updates and collects per-bucket row counts (bounded
  *      by nBuckets — a driver-safe collect, and the same job yields the
  *      upserted-row stat: no separate count() job);
  *   2. reads ONLY the current version's files in those buckets
  *      (manifest-level pruning — the scan cost is proportional to
  *      touched data, not table size);
  *   3. anti-joins away the replaced keys, unions the updates, appends
  *      the merged bucket slices as NEW files;
  *   4. commits manifest v{N+1} = parent's untouched-bucket files + the
  *      new files. The manifest create is the atomic commit point
  *      (create-if-absent — a concurrent committer loses and must retry);
  *      a crash before it leaves only unreferenced orphan files, cleaned
  *      by [[vacuum]], never lost or half-visible data.
  *
  * At 100 TB with, say, 4096 buckets, upserting 0.1% of keys touches a
  * few buckets and leaves every other file byte-identical (a MergeSpec
  * assertion). [[readVersion]] reads any retained historical version —
  * pairs with `ops.TableDiff` for "what changed between v3 and v7".
  * Production table formats (Iceberg/Delta) add schema evolution and
  * multi-table transactions on top; the I/O shape — immutable files,
  * manifest swap, prune by manifest — is this one. One bound to respect
  * at scale: a manifest lists every live file in one JSON document, so
  * manifest size is ∝ file count — keep files coarse (the bucket layout
  * writes one file per bucket per commit; `Tables.compact` exists for
  * the general case). Sharded/tree manifests are the production answer
  * past millions of files.
  */
object Merge {

  private def bucketCol(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong))

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def logPath(root: Path) = new Path(root, "_graft_log")

  /** Relative paths of all data files currently in the bucket dirs. */
  private def listDataFiles(fs: FileSystem, root: Path,
      buckets: Option[Set[Long]] = None): Seq[String] = {
    if (!fs.exists(root)) return Seq.empty
    val dirs = fs.listStatus(root).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("__bucket="))
    val wanted = dirs.filter { d =>
      buckets.forall(_.contains(d.getPath.getName.stripPrefix("__bucket=").toLong))
    }
    wanted.flatMap { d =>
      fs.listStatus(d.getPath).filter(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet"))
        .map(f => s"${d.getPath.getName}/${f.getPath.getName}")
    }.toSeq.sorted
  }

  private def bucketOf(relFile: String): Long =
    relFile.takeWhile(_ != '/').stripPrefix("__bucket=").toLong

  private final case class Manifest(version: Long, parent: Long,
      files: Seq[String])

  // hand-rolled JSON (flat schema, known-safe strings: bucket dirs +
  // spark part-file names never need escaping)
  private def writeManifest(fs: FileSystem, root: Path, m: Manifest): Unit = {
    val dir = logPath(root)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val target = new Path(dir, s"v${m.version}.json")
    // create-if-absent IS the commit: a concurrent writer racing to the
    // same version fails here and must re-read the log and retry
    val out = fs.create(target, false)
    try {
      val files = m.files.map(f => "\"" + f + "\"").mkString("[", ",", "]")
      out.write(
        s"""{"version":${m.version},"parent":${m.parent},"files":$files}"""
          .getBytes("UTF-8"))
    } finally out.close()
  }

  private def readManifest(spark: SparkSession, root: Path,
      version: Long): Manifest = {
    val df = spark.read
      .schema("version LONG, parent LONG, files ARRAY<STRING>")
      .json(new Path(logPath(root), s"v$version.json").toString)
    val r = df.head()
    Manifest(r.getLong(0), r.getLong(1),
      r.getSeq[String](2))
  }

  /** Latest committed version, or -1 if the table has no version log
    * (pre-versioning layout — [[readKeyed]] falls back to a raw read).
    */
  def currentVersion(spark: SparkSession, path: String): Long = {
    val (fs, root) = fsFor(spark, path)
    val dir = logPath(root)
    if (!fs.exists(dir)) return -1L
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong)
    if (vs.isEmpty) -1L else vs.max
  }

  /** Write `df` hash-bucketed by `keyCol` into `path` (the upsert-able
    * layout) and commit it as version 0. Bucket count sizes the rewrite
    * granularity: more buckets = finer copy-on-write, more directories.
    */
  def writeKeyed(df: DataFrame, path: String, keyCol: String,
      nBuckets: Int): Unit = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val (fs, root) = fsFor(df.sparkSession, path)
    if (fs.exists(root)) fs.delete(root, true) // fresh table, fresh log
    df.withColumn("__bucket", bucketCol(keyCol, nBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)
    writeManifest(fs, root, Manifest(0L, -1L, listDataFiles(fs, root)))
  }

  /** The rows of one committed version (layout column dropped). */
  def readVersion(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    val (_, root) = fsFor(spark, path)
    val m = readManifest(spark, root, version)
    require(m.files.nonEmpty, s"version $version of $path lists no files")
    spark.read.option("basePath", path)
      .parquet(m.files.map(f => new Path(root, f).toString): _*)
      .drop("__bucket")
  }

  /** The table's current logical rows (latest version; raw directory read
    * for pre-versioning tables without a log).
    */
  def readKeyed(spark: SparkSession, path: String): DataFrame = {
    val v = currentVersion(spark, path)
    if (v < 0) spark.read.parquet(path).drop("__bucket")
    else readVersion(spark, path, v)
  }

  final case class MergeStats(bucketsTouched: Int, nBuckets: Int,
      rowsUpserted: Long, version: Long)

  /** Upsert `updates` (one row per key — last-writer-wins across calls,
    * caller guarantees in-batch key uniqueness) into the keyed table at
    * `path`, committing a new version. Returns how much of the table the
    * write actually touched and the committed version number.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, nBuckets: Int): MergeStats = {
    val (fs, root) = fsFor(spark, path)
    val parentV = currentVersion(spark, path)
    require(parentV >= 0,
      s"$path has no version log — write it with writeKeyed first")
    val parent = readManifest(spark, root, parentV)
    val withB = updates.withColumn("__bucket", bucketCol(keyCol, nBuckets))
    // one job: touched bucket ids AND the upserted-row count
    val perBucket = withB.groupBy("__bucket")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))) // bounded by nBuckets
    if (perBucket.isEmpty)
      return MergeStats(0, nBuckets, 0L, parentV)
    val touched = perBucket.map(_._1).toSet
    val rowsUpserted = perBucket.map(_._2).sum
    // the current version's files in the touched buckets only — manifest
    // pruning, no directory listing of the untouched ones
    val parentTouchedFiles = parent.files.filter(f => touched(bucketOf(f)))
    val base =
      if (parentTouchedFiles.isEmpty) // all-new buckets: nothing to merge
        withB.filter(lit(false))
      else spark.read.option("basePath", path)
        .parquet(parentTouchedFiles.map(f => new Path(root, f).toString): _*)
    val merged = base
      .join(withB.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(withB.select(base.columns.map(col): _*))
    // APPEND-only write: the files just read stay on disk untouched (old
    // versions keep reading them); failure before the manifest commit
    // below leaves only orphans — no delete-then-rewrite window
    val before = listDataFiles(fs, root, Some(touched)).toSet
    merged.write.mode("append").partitionBy("__bucket").parquet(path)
    val newFiles = listDataFiles(fs, root, Some(touched)).filterNot(before)
    val files = parent.files.filterNot(f => touched(bucketOf(f))) ++ newFiles
    writeManifest(fs, root,
      Manifest(parentV + 1, parentV, files.sorted))
    MergeStats(touched.size, nBuckets, rowsUpserted, parentV + 1)
  }

  /** Drop versions older than the latest `keepVersions` and delete every
    * data file no retained version references (crash orphans included).
    * Time travel back past the horizon is gone after this — the storage
    * reclamation half of the copy-on-write contract.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "must keep >= 1 version")
    val (fs, root) = fsFor(spark, path)
    val latest = currentVersion(spark, path)
    require(latest >= 0, s"$path has no version log")
    val keepFrom = math.max(0L, latest - keepVersions + 1)
    val live = (keepFrom to latest)
      .flatMap(v => readManifest(spark, root, v).files).toSet
    listDataFiles(fs, root).filterNot(live).foreach { f =>
      fs.delete(new Path(root, f), false)
    }
    (0L until keepFrom).foreach { v =>
      fs.delete(new Path(logPath(root), s"v$v.json"), false)
    }
  }
}
