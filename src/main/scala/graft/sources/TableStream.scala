package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}

/** Version-log offset for [[GraftTableSource]]: `version` means "every
  * commit with version <= this has been emitted downstream", and
  * `units` (row-capped streams only) means "plus the first `units`
  * touched BUCKETS of commit version+1" — the sub-commit position a
  * `maxRowsPerTrigger` split parks at mid-version. Serialized to the
  * checkpoint's offset log as the bare number (`units` 0 — the only
  * form version-capped streams ever write, so old checkpoints parse
  * unchanged) or `version:units`; on restart the engine hands back a
  * `SerializedOffset` whose `json` is that same string, so consumers
  * parse via [[GraftVersionOffset.parse]] and never pattern-match on
  * the class.
  */
case class GraftVersionOffset(version: Long, units: Int = 0)
    extends V1Offset {
  override def json: String =
    if (units == 0) version.toString else s"$version:$units"
}

object GraftVersionOffset {
  /** (fully-emitted version, emitted units of the next one). */
  def parse(json: String): (Long, Int) = json.indexOf(':') match {
    case -1 => (json.toLong, 0)
    case i  => (json.substring(0, i).toLong, json.substring(i + 1).toInt)
  }
}

/** STREAMING READS of a versioned [[Merge]] table — the Delta-style
  * streaming source, the half of the lakehouse streaming story the
  * exactly-once [[Merge.streamingUpsert]] sink left open:
  *
  * {{{
  *   spark.readStream.format("graft-table").option("path", p).load()
  * }}}
  *
  * Offsets are COMMIT VERSIONS. Each micro-batch is a change feed over
  * a version range `(start, end]` computed by [[Merge.changesBetween]]
  * — so a batch's scan cost is the buckets those commits touched at the
  * two endpoint versions, planned entirely from the (memoized)
  * manifests. At 100 TB that is the property that makes tailing a table
  * viable at all: a 10-key upsert produces a micro-batch that reads ~10
  * buckets, never the table, with no directory listing anywhere (the
  * manifest IS the listing). Rows carry the data schema plus an
  * `op INT` column (+1 insert / new image, -1 delete / old image) — the
  * same dialect [[graft.pipeline.IncrementalAgg.updateWithRetractions]]
  * and a tombstone-fold into a downstream [[Merge.upsert]] consume, so
  * table-to-table incremental ETL is `readStream -> foreachBatch(fold)`.
  *
  * `.option("readChangeFeed", "true")` switches the emitted dialect to
  * Delta CDF's column contract — `_change_type` in {insert,
  * update_preimage, update_postimage, delete} plus `_commit_version` /
  * `_commit_timestamp` — resolved per COMMIT by
  * [[Merge.changesBetweenCdf]], so consumers written against Delta's
  * streaming `readChangeFeed` port without translation. The opening
  * snapshot arrives all-`insert` stamped with the snapshot version
  * (Delta's rule); rate limits compose unchanged (a key's update
  * pre/post images share a bucket, so even a mid-commit row-capped
  * slice can never split a pair or misclassify it).
  *
  * Start modes (option `startingVersion`):
  *  - absent (default): first batch is the FULL SNAPSHOT of the version
  *    current when the stream FIRST starts (all rows `op = +1`), then
  *    deltas — Delta's default semantics;
  *  - `"latest"`: no snapshot, only commits that land after the stream
  *    first starts;
  *  - `N`: no snapshot, the change feed from version N (inclusive)
  *    onward; `0` is the snapshot of v0 plus every delta since (v0 IS
  *    the first commit, so its "changes" are its full image).
  * Option `startingTimestamp` (exclusive with `startingVersion`;
  * epoch millis or a `"yyyy-mm-dd hh:mm:ss"` literal) starts at the
  * first commit stamped AT OR AFTER the timestamp — at-or-before the
  * first commit means the whole history, beyond the head means
  * tail-only, past the retention horizon raises loudly.
  * "First starts" is literal: the resolved anchor is persisted
  * create-if-absent in the checkpoint's source-metadata directory, so a
  * restarted stream keeps its original anchor (and its rate-limit
  * floor) instead of re-resolving `latest`/the snapshot version against
  * whatever the table has moved to — the same discipline Spark's Kafka
  * source applies to its initial offsets.
  *
  * Rate limiting: `maxVersionsPerTrigger` caps how many commits one
  * micro-batch may cover (the version-log analogue of the file source's
  * `maxFilesPerTrigger`), and `maxRowsPerTrigger` caps the batch's
  * ROWS using the manifests' per-file row counts — a FAT COMMIT is
  * split across triggers bucket by bucket (offsets park mid-commit as
  * `version:units`; at least one bucket always flows, so a bucket
  * larger than the cap still makes progress). Both ride
  * [[SupportsAdmissionControl]] (composed when both are set) so the
  * caps hold under every trigger including [[SupportsTriggerAvailableNow
  * Trigger.AvailableNow]] — a backlog drains across multiple capped
  * batches and then terminates, and a mid-backlog restart resumes from
  * the checkpoint exactly. The opening snapshot batch is emitted whole
  * (use `startingVersion` to skip it when backfilling a 100 TB table);
  * buckets whose files predate row-count stats cost "unknown" and
  * conservatively fill their trigger.
  *
  * Contracts: the emitted schema is pinned when the stream is defined —
  * a mid-stream schema evolution keeps flowing (added columns are simply
  * not visible until the stream restarts, Delta's rule); the versions a
  * stopped stream still has to read must be retained (`vacuum
  * keepVersions` / [[Merge.vacuumRetain]] must outlast the longest
  * expected downtime, or restart raises the retention error rather than
  * silently skipping); `commit(offset)` is deliberately a no-op — the
  * reader does not drive retention.
  *
  * Registered as `graft-table` via META-INF/services.
  */
class GraftTableStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table stream needs .option(\"path\", <table root>)"))

  /** STREAMING SINK — the write half of the streaming doorway:
    *
    * {{{
    *   df.writeStream.format("graft-table")
    *     .option("path", p).option("appId", "my-etl")
    *     .option("checkpointLocation", c).start()
    * }}}
    *
    * Every micro-batch folds into the versioned table as ONE keyed
    * upsert under the table's RECORDED layout (the [[Merge
    * .streamingUpsert]] semantics behind the standard writeStream
    * API): exactly-once via the `(appId, batchId)` commit stamp — a
    * replayed batch is a no-op on every recovery path — and
    * tombstone deletes via `.option("tombstoneCol", c)`. The table
    * must exist ([[Merge.writeKeyed]] first): auto-creating on batch 0
    * would make a replayed batch 0 wipe later commits, so it is
    * refused rather than footgunned. `appId` defaults to
    * `graft-table-sink`; set it explicitly when more than one query
    * writes the same table, or their batch-id watermarks collide.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-table bucketing comes from the table's recorded layout — " +
      "partitionBy is not supported")
    val path = pathOf(parameters)
    require(Merge.currentVersion(sqlContext.sparkSession, path) >= 0,
      s"$path is not a committed graft table — writeKeyed it first " +
      "(auto-create on batch 0 would let a replayed batch 0 wipe " +
      "later commits)")
    new GraftTableSink(path,
      parameters.getOrElse("appId", "graft-table-sink"),
      parameters.get("tombstoneCol"))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-table is self-describing: the schema comes from the " +
      "table's manifest, do not pass one")
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val data = Merge.readKeyed(spark, path).schema
    if (cdfMode(parameters)) {
      // Delta's readChangeFeed dialect: rows labeled with the CDF
      // column contract instead of the slim op INT
      val taken = GraftTableStreamProvider.CdfCols.filter(
        data.fieldNames.contains(_))
      require(taken.isEmpty,
        s"table columns collide with the CDF contract: " +
        taken.mkString(", "))
      require(Merge.tableLayout(spark, path).nonEmpty,
        s"$path records no layout — the CDF dialect classifies " +
        "updates by key")
      (shortName(), data
        .add("_change_type", StringType, nullable = false)
        .add("_commit_version", LongType, nullable = false)
        .add("_commit_timestamp", TimestampType, nullable = true))
    } else {
      val opCol = parameters.getOrElse("opCol", "op")
      require(!data.fieldNames.contains(opCol),
        s"table already has a '$opCol' column — rename the change-type " +
        "column via .option(\"opCol\", ...)")
      (shortName(), data.add(opCol, IntegerType, nullable = false))
    }
  }

  private def cdfMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val opCol = parameters.getOrElse("opCol", "op")
    val resolved = sourceSchema(sqlContext, None, providerName, parameters)._2
    val startAt = parameters.get("startingVersion")
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.toLong
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    val maxRows = parameters.get("maxRowsPerTrigger").map { s =>
      val n = s.toLong
      require(n >= 1, s"maxRowsPerTrigger must be >= 1, got $n")
      n
    }
    // Delta's startingTimestamp: epoch millis or a
    // "yyyy-mm-dd hh:mm:ss[.f...]" literal
    val startTs = parameters.get("startingTimestamp").map { s =>
      try s.toLong
      catch {
        case _: NumberFormatException =>
          java.sql.Timestamp.valueOf(s).getTime
      }
    }
    new GraftTableSource(spark, path, metadataPath, resolved, opCol,
      startAt, maxPerTrigger, maxRows, cdf = cdfMode(parameters),
      startingTimestamp = startTs)
  }
}

object GraftTableStreamProvider {
  /** The CDF dialect's reserved column names (Delta's contract). */
  val CdfCols: Seq[String] =
    Seq("_change_type", "_commit_version", "_commit_timestamp")
}

/** See [[GraftTableStreamProvider.createSink]] for the contract. */
class GraftTableSink(path: String, appId: String,
    tombstoneCol: Option[String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    require(Merge.tableLayoutKeys(spark, path).isDefined,
      s"$path records no bucketing layout")
    // the DataFrame addBatch receives is still streaming-flagged and
    // the upsert runs several jobs over it (bucket counts, the merge
    // itself) — pin the micro-batch's rows once and re-issue them as
    // a plain batch frame (the sink-side twin of the source's
    // asStreaming doorway)
    val (batch, pinned) =
      org.apache.spark.sql.graftshim.StreamShim.pinBatch(data)
    try {
      // routed by the table's recorded layout — single key or grid
      Merge.upsertGrid(spark, path, batch,
        txn = Some((appId, batchId)), tombstoneCol = tombstoneCol)
    } finally pinned.unpersist(blocking = false)
    ()
  }

  override def toString: String = s"GraftTableSink[$path, app=$appId]"
}

/** See [[GraftTableStreamProvider]] for the user-facing contract. */
class GraftTableSource(spark: SparkSession, path: String,
    metadataPath: String, resolvedSchema: StructType, opCol: String,
    startingVersion: Option[String], maxVersionsPerTrigger: Option[Long],
    maxRowsPerTrigger: Option[Long] = None, cdf: Boolean = false,
    startingTimestamp: Option[Long] = None)
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** (offset floor before any batch, version whose full snapshot opens
    * the stream — None for delta-only starts, emitted schema). Resolved
    * once per CHECKPOINT, not once per process: persisted
    * create-if-absent under `metadataPath` so every restart replays the
    * same anchor — `latest` does not re-resolve against a moved table,
    * the rate-limit floor survives, and a post-evolution restart of the
    * SAME query object keeps emitting the shape its sink was wired for
    * (a new `.load()` with a fresh checkpoint picks up the new schema).
    */
  private val (baseOffset: Long, snapshotAt: Option[Long],
      declared: StructType) = {
    val fs = new Path(metadataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val anchorFile = new Path(metadataPath, "anchor")
    def stored(): Option[(Long, Option[Long], StructType)] =
      if (!fs.exists(anchorFile)) None
      else {
        val in = fs.open(anchorFile)
        val body = try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          new String(buf.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
        val Array(head, ddl) = body.split("\n", 2)
        val parts = head.trim.split(",", -1)
        Some((parts(0).toLong,
          if (parts(1).isEmpty) None else Some(parts(1).toLong),
          Merge.schemaFromString(ddl)))
      }
    stored().getOrElse {
      val current = Merge.currentVersion(spark, path)
      require(current >= 0, s"$path is not a committed graft table")
      require(startingVersion.isEmpty || startingTimestamp.isEmpty,
        "set at most one of startingVersion / startingTimestamp")
      val (b, snap) = (startingVersion, startingTimestamp) match {
        case (None, None)           => (current, Some(current))
        case (Some("latest"), _)    => (current, None)
        case (Some(n), _) =>
          val v = n.toLong
          require(v >= 0, s"startingVersion must be >= 0, got $v")
          if (v == 0L) (0L, Some(0L)) else (v - 1, None)
        case (None, Some(ts)) =>
          // every commit whose stamp is AT OR AFTER ts (Delta's
          // startingTimestamp contract, resolved against the version
          // log's strictly-increasing commit times):
          //  - ts at or before the first commit => the whole history
          //    (v0's image + every delta — startingVersion=0 semantics);
          //  - ts beyond the head => tail-only (a commit landing later
          //    with time >= ts flows; nothing is replayed);
          //  - ts past the retention horizon raises versionAsOf's own
          //    loud retention error, never a silent partial replay.
          if (ts > Merge.commitTime(spark, path, current))
            (current, None)
          else {
            val t0 = try Some(Merge.commitTime(spark, path, 0))
              catch { case _: Exception => None } // v0 vacuumed
            if (t0.exists(ts <= _)) (0L, Some(0L))
            else {
              val w = Merge.versionAsOf(spark, path, ts)
              val first =
                if (Merge.commitTime(spark, path, w) == ts) w else w + 1
              (first - 1, None)
            }
          }
      }
      if (!fs.exists(anchorFile.getParent)) fs.mkdirs(anchorFile.getParent)
      try {
        val out = fs.create(anchorFile, false)
        try out.write(
          (s"$b,${snap.map(_.toString).getOrElse("")}\n" +
            Merge.schemaToString(resolvedSchema))
            .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        (b, snap, resolvedSchema)
      } catch {
        // Swallow the failure ONLY when the anchor now exists — we lost
        // the create race to a parallel restart and its anchor wins.
        // Any other IOException (permissions, parent-is-a-file, remote
        // FS fault) must propagate: proceeding would run the source on
        // an UNPERSISTED anchor, and a later restart would re-resolve
        // `latest` against the moved table, skipping or re-emitting
        // commits contrary to the once-per-checkpoint anchor contract.
        case e: java.io.IOException =>
          stored().getOrElse(throw e)
      }
    }
  }

  /** Highest position this source has reserved or emitted — the floor
    * for the next rate-limited reservation. `(version, units)`,
    * lexicographic. Re-seeded by getBatch on restart, so a rebuilt
    * source resumes its cap from the checkpoint.
    */
  private var maxSeen: (Long, Int) = (baseOffset, 0)

  /** Target fixed by prepareForTriggerAvailableNow: AvailableNow drains
    * up to here in capped chunks, then flat-lines and terminates.
    */
  private var availableNowCap: Option[Long] = None

  override def schema: StructType = declared

  private def posOf(o: V2Offset): (Long, Int) =
    GraftVersionOffset.parse(o.json)

  private def maxPos(a: (Long, Int), b: (Long, Int)): (Long, Int) =
    if (a._1 != b._1) { if (a._1 > b._1) a else b }
    else { if (a._2 >= b._2) a else b }

  /** One commit's touched buckets + change-feed row estimates, memoized
    * — the DETERMINISTIC unit list a row-capped trigger splits on
    * (sorted buckets; [[Merge.commitBucketRows]]), identical across
    * restarts because it derives from the immutable manifests.
    */
  private val unitsMemo =
    scala.collection.mutable.Map.empty[Long, Seq[(Long, Option[Long])]]
  private def unitsOf(version: Long): Seq[(Long, Option[Long])] = {
    // bounded: a long-lived stream visits each version a handful of
    // times around its triggers, then never again — drop the memo
    // wholesale past a small cap (recompute is one manifest read)
    if (unitsMemo.size > 256) unitsMemo.clear()
    unitsMemo.getOrElseUpdate(version,
      Merge.commitBucketRows(spark, path, version))
  }

  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      maxVersionsPerTrigger.map(n =>
        ReadLimit.maxFiles(math.min(n, Int.MaxValue).toInt)),
      maxRowsPerTrigger.map(ReadLimit.maxRows)).flatten
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case many   => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowCap = Some(Merge.currentVersion(spark, path))
  }

  /** Admission control: one reservation per trigger, floored at the
    * highest position already reserved/emitted and capped by the read
    * limit — versions ride in ReadMaxFiles, rows in ReadMaxRows
    * (`maxRowsPerTrigger`), both under any AvailableNow target.
    *
    * The ROW cap splits a FAT COMMIT across triggers: a commit's
    * change feed is admitted bucket by bucket (the deterministic sorted
    * unit list from the manifests' per-file row counts), parking the
    * offset mid-commit as `version:units`. A bucket whose files
    * predate row-count stats has unknown cost and conservatively
    * fills its whole trigger. At least one unit is always admitted —
    * a bucket larger than the cap still flows, one bucket per trigger
    * (progress over precision, the file source's maxBytes rule).
    */
  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset =
    synchronized {
      val cur = availableNowCap
        .getOrElse(Merge.currentVersion(spark, path))
      val floor = maxPos(maxSeen,
        Option(start).map(posOf).getOrElse((baseOffset, 0)))
      def capsOf(l: ReadLimit): (Option[Long], Option[Long]) = l match {
        case f: ReadMaxFiles => (Some(f.maxFiles().toLong), None)
        case r: org.apache.spark.sql.connector.read.streaming
            .ReadMaxRows => (None, Some(r.maxRows()))
        case c: org.apache.spark.sql.connector.read.streaming
            .CompositeReadLimit =>
          c.getReadLimits.map(capsOf).foldLeft(
            (None: Option[Long], None: Option[Long])) {
            case ((v1, r1), (v2, r2)) =>
              (Seq(v1, v2).flatten.minOption, Seq(r1, r2).flatten.minOption)
          }
        case _ => (None, None)
      }
      val (verCap, rowCap) = capsOf(limit)
      val target: (Long, Int) =
        if (rowCap.isEmpty) {
          // version-capped / uncapped fast path: no unit enumeration
          // (floor units are always 0 here — only a row cap parks
          // offsets mid-version, and caps are fixed per source)
          (verCap.map(n => math.min(cur, floor._1 + n)).getOrElse(cur),
            0)
        } else {
          var (v, k) = floor
          var rows = rowCap.get
          var vers = verCap.getOrElse(Long.MaxValue)
          var admitted = false
          var full = false
          while (!full && v < cur) {
            if (k == 0) {
              if (vers <= 0) full = true else vers -= 1
            }
            if (!full) {
              val units = unitsOf(v + 1)
              while (!full && k < units.size) {
                val cost = units(k)._2.getOrElse(Long.MaxValue)
                if (!admitted || cost <= rows) {
                  rows = math.max(0L, rows - math.min(cost, rows))
                  k += 1
                  admitted = true
                } else full = true
              }
              if (k == units.size) { v += 1; k = 0 }
            }
          }
          (v, k)
        }
      val pos = maxPos(floor, target)
      maxSeen = maxPos(maxSeen, pos)
      GraftVersionOffset(pos._1, pos._2)
    }

  override def reportLatestOffset(): V2Offset =
    GraftVersionOffset(Merge.currentVersion(spark, path))

  /** Legacy (non-admission) path — same reservation logic. */
  override def getOffset: Option[V1Offset] = {
    val o = latestOffset(null, getDefaultReadLimit)
    val (v, k) = posOf(o)
    Some(GraftVersionOffset(v, k))
  }

  /** Align an arbitrary change-feed frame to the schema declared at
    * stream definition: columns added by a later evolution are dropped,
    * columns the older endpoint lacks surface as nulls — so every batch
    * of a running stream has the one shape its sink was wired for.
    */
  private def aligned(df: DataFrame): DataFrame =
    df.select(declared.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame =
    org.apache.spark.sql.graftshim.StreamShim.asStreaming(
      batchFor(start.map(o => GraftVersionOffset.parse(o.json)),
        GraftVersionOffset.parse(end.json)))

  /** The micro-batch between two positions, NOT yet streaming-flagged —
    * the piece [[getBatch]] wraps (and the seam specs drive directly:
    * a batch-mode collect of the flagged frame trips Spark's
    * streaming-source check).
    */
  private[sources] def batchFor(startPos: Option[(Long, Int)],
      endPos: (Long, Int)): DataFrame = {
    val (endV, endK) = endPos
    val (startV, startK) = startPos.getOrElse((baseOffset, 0))
    synchronized { maxSeen = maxPos(maxSeen, (endV, endK)) }
    val snapshot = if (startPos.isEmpty) snapshotAt.map { v =>
      val snap = Merge.readVersion(spark, path, v)
      if (cdf) {
        // Delta's rule for the opening snapshot under readChangeFeed:
        // every row is an insert stamped with the snapshot's commit
        val ts = Merge.commitTime(spark, path, v)
        snap.withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(v))
          .withColumn("_commit_timestamp",
            (lit(ts) / lit(1000.0)).cast(TimestampType))
      } else snap.withColumn(opCol, lit(1).cast(IntegerType))
    } else None
    def feed(from: Long, to: Long,
        slice: Option[Set[Long]]): DataFrame =
      if (cdf) Merge.changesBetweenCdf(spark, path, from, to, slice)
      else Merge.changesBetween(spark, path, from, to, opCol, slice)
    // up to three pieces, each a bucket-exact change feed (buckets are
    // disjoint — a key's whole history lives in one bucket — so the
    // concatenation of slices over a version equals its full feed):
    //  1. the REMAINDER of a version the start offset parked inside,
    //  2. the fully-covered version range (endpoint diff, as ever),
    //  3. the HEAD SLICE of the version the end offset parks inside.
    val deltas = Seq.newBuilder[DataFrame]
    if (startK > 0) {
      val units = unitsOf(startV + 1).map(_._1)
      val slice =
        if (endV == startV) units.slice(startK, endK)
        else units.drop(startK)
      if (slice.nonEmpty)
        deltas += feed(startV, startV + 1, Some(slice.toSet))
    }
    val fullFrom = if (startK > 0) startV + 1 else startV
    if (endV > fullFrom)
      deltas += feed(fullFrom, endV, None)
    if (endK > 0 && endV >= fullFrom) {
      val slice = unitsOf(endV + 1).map(_._1).take(endK)
      if (slice.nonEmpty)
        deltas += feed(endV, endV + 1, Some(slice.toSet))
    }
    val pieces = snapshot.map(aligned).toSeq ++
      deltas.result().map(aligned)
    if (pieces.isEmpty)
      aligned(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared))
    else pieces.reduceLeft(_ unionByName _)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftTableSource[$path, start=${startingVersion.getOrElse("snapshot")}]"
}
