package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import graft.sources.{GraftTableStreamProvider, Merge, Skipping}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 BATCH CONNECTOR for versioned [[Merge]] tables — the
  * stock-Spark doorway the Scala API and TVF registration left open:
  *
  * {{{
  *   spark.read.format("graft-table").option("path", p).load()
  *   spark.read.format("graft-table").option("path", p)
  *     .option("versionAsOf", "3").load()          // time travel
  *   spark.read.format("graft-table").option("path", p)
  *     .option("tagAsOf", "release-1").load()      // named version
  *   spark.read.format("graft-table").option("path", p)
  *     .option("timestampAsOf", "1723600000000").load()
  * }}}
  *
  * The provider EXTENDS [[GraftTableStreamProvider]], so the one
  * registered name serves both surfaces: `spark.read` resolves the
  * DSv2 [[GraftTable]] below (its capability set is BATCH_READ only),
  * and `spark.readStream` falls back to the v1 streaming source —
  * deliberately, the design Delta Lake ships. A DSv2 table has ONE
  * schema for all surfaces, but the stream's dialect is `data + op`
  * while a batch read is `data` alone; and a DSv2 `MicroBatchStream`
  * must describe each batch as executor-readable partitions, while the
  * change feed is a bucket-diff JOIN ([[Merge.changesBetween]]) that
  * only a driver-planned DataFrame can express without hand-rolled
  * parquet decoding. The v1 `Source` keeps both, zero-copy.
  *
  * The version is pinned when the table is RESOLVED (one `load()` =
  * one snapshot), so every scan of that frame — including re-executions
  * under AQE — reads the same committed manifest however many commits
  * land meanwhile: DSv2 gives the version log's snapshot isolation to
  * plain SQL readers for free.
  *
  * Scans negotiate with Catalyst through the standard v2 mix-ins:
  *
  *   - [[SupportsPushDownFilters]]: accepted filters become
  *     [[Skipping.Bound]]s against the manifest's per-file column
  *     stats, so planning prunes DATA FILES before any I/O — the scan
  *     of `WHERE id = 7` on a compacted table reads one file of one
  *     bucket, at any table size. Every filter is also returned as a
  *     residual (stats pruning is conservative, null semantics stay
  *     Catalyst's), so correctness never depends on the translation.
  *   - [[SupportsPushDownRequiredColumns]]: the projection reaches the
  *     parquet scan (ReadSchema), so a 2-column read of a wide table
  *     decodes 2 columns.
  *
  * Execution rides the public [[V1Scan]] bridge (the JDBC connector's
  * route): the scan hands Spark a `BaseRelation` whose `buildScan`
  * delegates to [[Merge.readVersionWhere]] — deletion vectors, shallow
  * clone foreign refs, per-version schema alignment and the manifest
  * memo all behave exactly as the Scala API, because it IS the Scala
  * API. Cited behavior parity: reference `Utils/load_data.py` exposes
  * tables to its engine by name; this provider is the Spark-native
  * equivalent surface.
  */
class GraftTableProvider extends GraftTableStreamProvider
    with TableProvider {

  override def supportsExternalMetadata(): Boolean = false

  private def resolve(options: util.Map[String, String]): Table = {
    val spark = SparkSession.active
    val opts = new CaseInsensitiveStringMap(options)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-table needs .option(\"path\", <table root>)"))
    if (Option(opts.get("readChangeFeed")).exists(_.toBoolean)) {
      // Delta's batch CDF dialect: option startingVersion is INCLUSIVE
      // of that commit's changes (>= 1; v0 has no "changes" — read the
      // snapshot), endingVersion defaults to the current head
      require(opts.get("versionAsOf") == null &&
          opts.get("timestampAsOf") == null && opts.get("tagAsOf") == null,
        "readChangeFeed takes startingVersion/endingVersion, not the " +
        "snapshot time-travel options")
      val from = Option(opts.get("startingVersion"))
      val explicitEnd = Option(opts.get("endingVersion")).isDefined
      val to = Option(opts.get("endingVersion")).map(_.toLong)
        .getOrElse(Merge.currentVersion(spark, path))
      // a NUMERIC startingVersion below 1 — or beyond an EXPLICIT
      // endingVersion, a shape that can only mean a batch range — fails
      // LOUDLY with the valid range (Delta's behavior). A beyond-HEAD
      // start with no end is the documented STREAM-only tail shape
      // ("begin at a commit that hasn't landed yet", the v1 source's
      // (v-1, None) anchoring): it resolves to the schema-only stream
      // table like "latest"/"0", and a batch load() of THAT still
      // fails with the same loud range message (never the opaque
      // capability error).
      from.map(_.toLowerCase).filterNot(s => s == "latest" || s == "0")
        .foreach { s =>
          val v = s.toLong // non-numeric garbage: loud NumberFormat
          require(v >= 1 && (v <= to || !explicitEnd),
            s"readChangeFeed startingVersion must be in [1, $to] " +
            s"(got $v); omit it, or pass \"latest\"/\"0\", to stream")
        }
      from.map(_.toLowerCase).filter(s => s != "latest" && s.toLong >= 1 &&
          s.toLong <= to) match {
        case Some(f) => new GraftCdfTable(spark, path, f.toLong, to)
        case None =>
          // the stream-only start shapes have no batch meaning —
          // resolve to a schema-only table so `readStream` falls back
          // to the v1 source; a batch `load()` of it fails loudly
          require(!explicitEnd,
            "a batch readChangeFeed needs .option(\"startingVersion\", " +
            s"n in [1, $to]); endingVersion never applies to a stream")
          val beyondHead = from.map(_.toLowerCase)
            .filterNot(s => s == "latest" || s == "0").map(_.toLong)
          new GraftCdfStreamOnlyTable(spark, path,
            batchError = beyondHead.map(v =>
              s"readChangeFeed startingVersion must be in [1, $to] " +
              s"for a batch read (got $v); a STREAM started at $v " +
              "tails the table's next commits"))
      }
    } else GraftTable.resolve(spark, path,
      Option(opts.get("versionAsOf")).map(_.toLong),
      Option(opts.get("timestampAsOf")).map(_.toLong),
      Option(opts.get("tagAsOf")))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolve(properties)
}

object GraftTable {

  /** Resolve a (path, time-travel spec) to a version-pinned table.
    * At most one of the three travel options may be set.
    */
  def resolve(spark: SparkSession, path: String, versionAsOf: Option[Long],
      timestampAsOf: Option[Long], tagAsOf: Option[String]): GraftTable = {
    val travel = Seq(versionAsOf, timestampAsOf, tagAsOf).count(_.isDefined)
    require(travel <= 1,
      "set at most one of versionAsOf / timestampAsOf / tagAsOf")
    val version = versionAsOf
      .orElse(timestampAsOf.map(Merge.versionAsOf(spark, path, _)))
      .orElse(tagAsOf.map(Merge.tagVersionOf(spark, path, _)))
      .getOrElse {
        val v = Merge.currentVersion(spark, path)
        require(v >= 0, s"$path is not a committed graft table")
        v
      }
    // schema from the manifest DDL — resolution must stay O(manifest),
    // never construct a frame over the version's files
    new GraftTable(path, version,
      Merge.versionSchema(spark, path, version).getOrElse(
        Merge.readVersion(spark, path, version).schema),
      writable = travel == 0)
  }

  /** Test seam: (files selected, files total) of the most recent batch
    * scan planning, so specs can pin that pushed filters actually prune
    * the file plan.
    */
  @volatile var lastScanFiles: Option[(Int, Int)] = None

  /** Exact translation of a DSv2-pushed v1 [[Filter]] back to a
    * [[Column]] predicate; None when (any part of) the filter has no
    * exact Column form — an untranslated filter is simply not pushed,
    * never approximated.
    */
  private[v2] def filterToColumn(f: Filter): Option[Column] = f match {
    // a bare `DELETE FROM t` pushes the TRUE literal
    case _: AlwaysTrue            => Some(lit(true))
    case _: AlwaysFalse           => Some(lit(false))
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) if v != null => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs) if vs != null && vs.nonEmpty =>
      Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
    case StringEndsWith(a, s)     => Some(col(a).endsWith(s))
    case StringContains(a, s)     => Some(col(a).contains(s))
    case And(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
    case Not(c) => filterToColumn(c).map(not)
    case _ => None
  }
}

/** One version-pinned [[Merge]] table as a DSv2 [[Table]]. Reads scan
  * the pinned version; writes (refused on a time-traveled resolution,
  * Delta's rule) go to the HEAD through the Merge commit protocol:
  * append = [[Merge.upsert]] under the recorded layout (key-addressed
  * last-writer-wins — the only append a keyed table can honor),
  * overwrite/truncate = [[Merge.replaceAll]] (one versioned commit,
  * history preserved). So `INSERT INTO graft.t`, `INSERT OVERWRITE`,
  * `df.writeTo(...).append()` and `df.write.format("graft-table")`
  * all land as ordinary fenced commits that racing writers serialize
  * against.
  */
class GraftTable(val path: String, val pinnedVersion: Long,
    dataSchema: StructType, val writable: Boolean = true)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDelete {

  override def name(): String = s"graft.`$path`"

  override def schema(): StructType = dataSchema

  override def version(): String = pinnedVersion.toString

  /** The recorded layout as a DSv2 bucket transform — what lets two
    * co-bucketed graft tables join WITHOUT A SHUFFLE (storage-
    * partitioned join; see [[GraftBucketScan]]). Resolved lazily from
    * the PINNED version's manifest — a time-traveled table that
    * predates a relayout must report the bucket count its own files
    * actually sit in, not the current head's; a table with no layout
    * reports none.
    */
  override def partitioning(): Array[Transform] =
    try {
      import org.apache.spark.sql.connector.expressions.Expressions
      Merge.versionLayout(SparkSession.active, path, pinnedVersion)
        .map { case (k, n) =>
          Array[Transform](Expressions.bucket(n, k))
        }
        .orElse(Merge.versionGridLayout(SparkSession.active, path,
          pinnedVersion).map { case (ks, ns) =>
          ks.zip(ns).map { case (k, n) =>
            Expressions.bucket(n, k): Transform
          }.toArray
        })
        .getOrElse(Array.empty)
    } catch { case _: Exception => Array.empty }

  override def capabilities(): util.Set[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION opts into Spark's OWN
    // `MERGE ... WITH SCHEMA EVOLUTION` analysis
    // (ResolveMergeIntoSchemaEvolution): the analyzer derives the
    // TableChanges from the source schema and routes them through the
    // owning catalog's alterTable — i.e. Merge.addColumn /
    // Merge.widenColumn commits, with the key-type guard and stale-
    // bloom invalidation those paths already enforce — then refreshes
    // the target relation before the merge itself plans. Only MERGE
    // consults this capability (Spark 4.1: DataSourceV2Relation
    // .autoSchemaEvolution's sole caller is MergeIntoTable).
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** Surfaced by `DESCRIBE TABLE EXTENDED` / `SHOW TBLPROPERTIES`:
    * the pinned version and the recorded layout, skipping and
    * constraint contracts — the operator's first questions, answered
    * from one manifest read.
    */
  override def properties(): util.Map[String, String] = {
    val base = Map("path" -> path, "version" -> pinnedVersion.toString)
    // observability only — a property lookup must never fail a read
    val extras = try {
      val spark = SparkSession.active
      val layout = Merge.tableLayout(spark, path).map { case (k, n) =>
        Map("key" -> k, "buckets" -> n.toString,
          // the sorted-scan contract: false means a clusterBy/zOrder
          // layout is active and merge joins will sort
          "keySorted" -> Merge.tableKeySorted(spark, path).toString)
      }.getOrElse(Map.empty)
      val cs = Merge.tableStatsCols(spark, path)
      val stats = if (cs.isEmpty) Map.empty[String, String]
        else Map("statsCols" -> cs.mkString(","))
      val cks = Merge.tableConstraints(spark, path)
      val ck = if (cks.isEmpty) Map.empty[String, String]
        else Map("constraints" ->
          cks.map { case (n, e) => s"$n CHECK ($e)" }.mkString("; "))
      layout ++ stats ++ ck
    } catch { case _: Exception => Map.empty[String, String] }
    (base ++ extras).asJava
  }

  /** The table's CHECK constraints (recorded in the manifest, enforced
    * at every commit), reported through the standard DSv2 hook so
    * DESCRIBE and the analyzer see them.
    */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints
        .Constraint] =
    Merge.tableConstraints(SparkSession.active, path).map {
      case (n, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(n).predicateSql(sql).build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, pinnedVersion, dataSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(writable,
      s"cannot write to a time-traveled resolution of $path — load " +
      "the table without versionAsOf/timestampAsOf/tagAsOf to write")
    new GraftWriteBuilder(path,
      Option(info.options.get("replaceWhere")))
  }

  /** `DELETE FROM` — [[Merge.deleteWhere]] behind the standard DSv2
    * hook: bucket-granular copy-on-write, SQL DELETE null semantics,
    * one fenced commit, history preserved; the translated predicate's
    * implied bounds prune the FIND scan against the manifest stats.
    * Only exactly-translatable filters are accepted ([[GraftTable
    * .filterToColumn]]); Spark falls back to an error, never to a
    * silent approximation.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    writable && filters.forall(f => GraftTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(writable,
      s"cannot delete from a time-traveled resolution of $path")
    val spark = SparkSession.active
    val pred = filters.flatMap(GraftTable.filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    // merge-on-read session opt-in: the delete lands as a deletion-
    // vector sidecar (zero data files rewritten) instead of the
    // copy-on-write bucket rewrite — same result, CDC-shaped I/O
    if (GraftDml.mergeOnRead(spark))
      Merge.deleteWhereDV(spark, path, pred,
        bounds = Skipping.impliedBounds(pred))
    else
      Merge.deleteWhere(spark, path, pred,
        bounds = Skipping.impliedBounds(pred))
    ()
  }

  /** `TRUNCATE TABLE` — one commit emptying the table; the version
    * log, layout, constraints and mapping survive, so the truncation
    * itself time-travels like any other commit.
    */
  override def truncateTable(): Boolean = {
    require(writable,
      s"cannot truncate a time-traveled resolution of $path")
    Merge.deleteWhere(SparkSession.active, path, lit(true))
    true
  }
}

/** Append (upsert), truncate-overwrite (replaceAll), or SELECTIVE
  * overwrite (Delta's `replaceWhere` option: rows matching the
  * predicate are replaced by the batch in ONE commit — the batch must
  * itself satisfy the predicate, refused otherwise), executed through
  * the public [[V1Write]] bridge like the read side's [[V1Scan]].
  *
  * {{{
  *   df.write.format("graft-table").option("path", p)
  *     .option("replaceWhere", "region = 'eu'")
  *     .mode("overwrite").save()
  * }}}
  */
class GraftWriteBuilder(path: String,
    replaceWhere: Option[String] = None) extends WriteBuilder
    with SupportsTruncate {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  private def replaceMatching(spark: org.apache.spark.sql.SparkSession,
      data: org.apache.spark.sql.DataFrame, predSql: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val keyCols = Merge.tableLayoutKeys(spark, path).map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"$path records no bucketing layout"))
    val pred = org.apache.spark.sql.GraftColumnBridge.column(
      spark.sessionState.sqlParser.parseExpression(predSql))
    // Delta's contract: every incoming row must satisfy the predicate
    // — otherwise "replace this region" could silently write outside it
    val stray = data.filter(!coalesce(pred, lit(false))).limit(1)
      .collect()
    require(stray.isEmpty,
      s"replaceWhere [$predSql]: the batch contains rows that do not " +
      s"satisfy the predicate (e.g. ${stray.headOption.orNull}) — " +
      "every written row must match what it replaces")
    val DEL = "__graft_rw_del"
    // matched old rows whose key the batch does not re-supply die;
    // batch rows upsert — one tombstone-dialect commit, find scan
    // bounds-pruned by the predicate
    val doomed = Merge.readKeyedWhere(spark, path, pred)
      .join(data.select(keyCols.map(col): _*), keyCols, "left_anti")
    val changes = doomed.withColumn(DEL, lit(true))
      .unionByName(data.withColumn(DEL, lit(false)))
      .localCheckpoint()
    try Merge.upsertGrid(spark, path, changes,
      tombstoneCol = Some(DEL))
    finally org.apache.spark.sql.GraftShim.unpinLocalCheckpoint(changes)
    ()
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation(): InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            overwrite: Boolean): Unit = {
          val spark = data.sparkSession
          (replaceWhere, overwriteAll || overwrite) match {
            case (Some(rw), true) => replaceMatching(spark, data, rw)
            case (Some(_), false) => throw new IllegalArgumentException(
              "replaceWhere needs mode(\"overwrite\") — an append " +
              "cannot replace anything")
            case (None, true)  => Merge.replaceAll(spark, path, data); ()
            case (None, false) =>
              Merge.tableLayoutKeys(spark, path).getOrElse(
                throw new IllegalArgumentException(
                  s"$path records no bucketing layout"))
              // SQL INSERT is the one write where insert-vs-update IS
              // distinguishable (the upsert verb below is both at
              // once), so GENERATED ALWAYS AS IDENTITY enforces its
              // contract here: explicit values are refused — an
              // explicit duplicate of a live id (the identity column
              // is typically the key) would silently overwrite that
              // row. GENERATED BY DEFAULT (allowExplicitInsert=true)
              // admits them; cost: one limit(1) probe on
              // identity-ALWAYS tables only.
              val idn = org.apache.spark.sql.catalyst.util.IdentityColumn
              Merge.versionSchema(spark, path,
                  Merge.currentVersion(spark, path))
                .toSeq.flatMap(_.fields)
                .filter(f =>
                  f.metadata.contains(idn.IDENTITY_INFO_START) &&
                  f.metadata.contains(
                    idn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT) &&
                  !f.metadata.getBoolean(
                    idn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT))
                .foreach { f =>
                  if (data.columns.contains(f.name) &&
                      !data.filter(col(f.name).isNotNull).isEmpty)
                    throw new IllegalArgumentException(
                      s"identity column ${f.name} is GENERATED ALWAYS" +
                      " — INSERT cannot supply explicit values " +
                      "(declare it GENERATED BY DEFAULT AS IDENTITY " +
                      "to allow them)")
                }
              // routed by the table's recorded layout — single-key
              // tables and composite grids both merge by key (r17:
              // grids became writable, so a plain INSERT into a
              // (tenant, id) grid upserts by tuple instead of
              // refusing). The merge-on-read session opt-in covers
              // INSERT too (r17): replaced keys' old images vector,
              // the batch appends, no data file rewritten — the last
              // SQL doorway joins the CDC posture
              val morSchema = Merge.versionSchema(spark, path,
                Merge.currentVersion(spark, path))
              if (GraftDml.mergeOnRead(spark) &&
                  morSchema.exists(GraftDml.morEligible))
                Merge.upsertDVGrid(spark, path, data)
              else
                Merge.upsertGrid(spark, path, data)
              ()
          }
        }
      }
  }
}

class GraftScanBuilder(path: String, version: Long, dataSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = dataSchema
  private var aggResult: Option[(StructType, Seq[Any])] = None
  private var limit: Option[Int] = None

  /** Accept the exactly-translatable filters (they drive manifest-stats
    * file pruning and a pre-filter inside the relation) and return ALL
    * filters as residual: Catalyst re-evaluates everything post-scan,
    * so the pushdown is purely an I/O reduction, never a semantics
    * change — the conservative contract `SupportsPushDownFilters`
    * allows exactly for sources whose pruning is best-effort.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftTable.filterToColumn(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** MANIFEST-ANSWERED AGGREGATES: COUNT(*)/MIN/MAX resolve from the
    * version's recorded per-file stats with ZERO data I/O — at any
    * table size the scan becomes one driver-side manifest read and a
    * one-row result. Pushed only when provably exact: no residual
    * filters, no grouping, every file carries the stat, and for
    * MIN/MAX the column's encoding is lossless (strings are truncated
    * — declined) with no live deletion vectors (a deleted row could
    * be the extreme). COUNT(*) survives DVs since r15: the gross
    * manifest count minus one sidecar-sized job (exact by
    * construction — see [[Merge.versionRowCount]]). Anything short of
    * that declines and the ordinary scan runs.
    */
  private def tryAggregation(agg: Aggregation)
      : Option[(StructType, Seq[Any])] = {
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    val spark = SparkSession.active
    def nameOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    val resolved = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        Merge.versionRowCount(spark, path, version)
          .map(n => (StructField("count(*)", LongType, nullable = false),
            n: Any))
      case m: Min =>
        nameOf(m.column()).flatMap { c =>
          Merge.versionColumnBounds(spark, path, version, c).map { b =>
            (StructField(s"min($c)", dataSchema(c).dataType), b._1.orNull)
          }
        }
      case m: Max =>
        nameOf(m.column()).flatMap { c =>
          Merge.versionColumnBounds(spark, path, version, c).map { b =>
            (StructField(s"max($c)", dataSchema(c).dataType), b._2.orNull)
          }
        }
      // COUNT(col) = Σ per-file (rows - nulls); SUM(col) = Σ per-file
      // exact integral sums (decimal-summed at write). Both decline
      // under live DVs — a deleted row's nullness/value is unknown to
      // the manifest (r16: [[Merge.versionColumnAggStats]]).
      case c: Count if !c.isDistinct =>
        nameOf(c.column()).flatMap { n =>
          Merge.versionColumnAggStats(spark, path, version, n).map {
            case (nonNull, _) =>
              (StructField(s"count($n)", LongType, nullable = false),
                nonNull: Any)
          }
        }
      case s: Sum if !s.isDistinct =>
        nameOf(s.column()).flatMap { n =>
          dataSchema(n).dataType match {
            // Spark's SUM over integral inputs is a (nullable) BIGINT;
            // a total outside Long range declines rather than wrapping
            case ByteType | ShortType | IntegerType | LongType =>
              Merge.versionColumnAggStats(spark, path, version, n)
                .flatMap {
                  case (0L, _) => // SQL: sum over zero non-null rows
                    Some((StructField(s"sum($n)", LongType), null: Any))
                  case (_, Some(total)) =>
                    scala.util.Try(total.longValueExact()).toOption
                      .map(v => (StructField(s"sum($n)", LongType),
                        java.lang.Long.valueOf(v): Any))
                  case _ => None
                }
            // SUM over decimal(p, s) is decimal(min(38, p+10), s):
            // the per-file sums are exact at the column's scale, so
            // the fold is too; a total past the result precision
            // declines (the real scan would null there anyway)
            case dt: org.apache.spark.sql.types.DecimalType =>
              val rt = org.apache.spark.sql.types.DecimalType(
                math.min(38, dt.precision + 10), dt.scale)
              Merge.versionColumnAggStats(spark, path, version, n)
                .flatMap {
                  case (0L, _) =>
                    Some((StructField(s"sum($n)", rt), null: Any))
                  case (_, Some(total)) =>
                    val v = total.setScale(dt.scale)
                    if (v.precision <= rt.precision)
                      Some((StructField(s"sum($n)", rt), v: Any))
                    else None
                  case _ => None
                }
            case _ => None
          }
        }
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) None
    else {
      val rs = resolved.flatten
      // duplicate agg expressions would collide on field name
      val named = rs.zipWithIndex.map { case ((f, v), i) =>
        (f.copy(name = s"${f.name}#$i"), v)
      }
      Some((StructType(named.map(_._1)), named.map(_._2)))
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    tryAggregation(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggResult = tryAggregation(agg)
    aggResult.isDefined
  }

  /** LIMIT pushdown as a FILE-PREFIX prune: with per-file row counts
    * recorded, `LIMIT n` reads the shortest file prefix covering n
    * rows instead of the whole version. Spark still applies the
    * row-exact limit on top (partial pushdown). Live DVs no longer
    * decline: the prefix is sized by NET counts (gross minus the
    * per-file deleted positions [[Merge.readVersionLimited]] computes
    * from the sidecars), so a merge-on-read table's LIMIT still reads
    * a prefix — and still delivers enough LIVE rows.
    */
  override def pushLimit(n: Int): Boolean = {
    val spark = SparkSession.active
    if (pushed.isEmpty &&
        Merge.versionRowCount(spark, path, version).isDefined) {
      limit = Some(n); true
    } else false
  }

  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = aggResult match {
    case Some((schema, values)) =>
      new GraftAggScan(path, version, schema, values)
    case None =>
      // NATIVE bucket-grouped scan (storage-partitioned joins): session
      // opt-in, clean versions only, no pushed limit (the V1 bridge
      // handles those cases; results identical either way, the native
      // path's win is the reported KeyGroupedPartitioning)
      val native =
        if (limit.isEmpty && SparkSession.active.conf
            .get("spark.graft.bucketedScan", "false") == "true") {
          val spark = SparkSession.active
          val bounds = pushed.flatMap(GraftTable.filterToColumn)
            .reduceOption(_ && _)
            .map(Skipping.impliedBounds).getOrElse(Seq.empty)
          Merge.bucketScanUnits(spark, path, version, bounds)
            .map { plan =>
              Merge.versionSchema(spark, path, version) match {
                case Some(full) =>
                  new GraftBucketScan(path, version, full, required,
                    pushed, plan.keyCols, plan.bucketNs, plan.keySorted,
                    plan.units, plan.dvFiles, plan.colMap): Scan
                case None =>
                  new GraftScan(path, version, pushed, required, limit)
              }
            }
        } else None
      native.getOrElse(
        new GraftScan(path, version, pushed, required, limit))
  }
}

/** A completely-pushed aggregate: one row, straight off the manifest. */
class GraftAggScan(path: String, version: Long, aggSchema: StructType,
    values: Seq[Any]) extends V1Scan {

  override def readSchema(): StructType = aggSchema

  override def description(): String =
    s"GraftAggScan path=$path, version=$version, manifest-answered: " +
      aggSchema.fieldNames.mkString(", ")

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override val sqlContext: SQLContext = context
      override def schema: StructType = aggSchema
      override def buildScan(): RDD[Row] =
        context.sparkSession.sparkContext
          .parallelize(Seq(Row(values: _*)), 1)
    }.asInstanceOf[T]
}

/** The negotiated scan: executes through the public [[V1Scan]] bridge. */
class GraftScan(path: String, version: Long, pushed: Array[Filter],
    required: StructType, limit: Option[Int] = None)
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Manifest-derived (bytes, rows) so the optimizer's JOIN planning
    * sees the table's — and, after stats pruning, the scan's — real
    * size: a small graft table broadcasts like any parquet table
    * instead of defaulting to "huge, never broadcast".
    */
  override def estimateStatistics(): Statistics = {
    val spark = SparkSession.active
    val bounds = pushed.flatMap(GraftTable.filterToColumn)
      .reduceOption(_ && _)
      .map(Skipping.impliedBounds).getOrElse(Seq.empty)
    val (bytes, rows) =
      Merge.estimateVersionSize(spark, path, version, bounds)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        bytes.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty)
      override def numRows(): util.OptionalLong =
        rows.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty)
    }
  }

  override def description(): String = {
    val fs = pushed.map(_.toString).mkString("[", ", ", "]")
    s"GraftScan path=$path, version=$version, PushedFilters: $fs, " +
      limit.map(n => s"PushedLimit: $n, ").getOrElse("") +
      s"ReadSchema: ${required.catalogString}"
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftBatchRelation(context, path, version, pushed, required,
      limit).asInstanceOf[T]
}

/** V1 execution of a DSv2-negotiated graft scan. `buildScan` plans the
  * file set from the manifest stats (recording the pruning in
  * [[GraftTable.lastScanFiles]] for specs), then reads exactly the
  * surviving files through [[Merge.readVersionWhere]] — one DataFrame,
  * whose parquet scan gets Catalyst's own pushdown of the rebuilt
  * predicate on top (row-group pruning inside the surviving files).
  */
class GraftBatchRelation(val sqlContext: SQLContext, path: String,
    version: Long, pushed: Array[Filter], required: StructType,
    limit: Option[Int] = None)
    extends BaseRelation with TableScan {

  override def schema: StructType = required

  override def needConversion: Boolean = true

  override def buildScan(): RDD[Row] = {
    val spark = sqlContext.sparkSession
    val pred = pushed.flatMap(GraftTable.filterToColumn)
      .reduceOption(_ && _)
    val bounds = pred.map(Skipping.impliedBounds).getOrElse(Seq.empty)
    if (bounds.nonEmpty) {
      val (sel, total) =
        Merge.planVersionFiles(spark, path, version, bounds)
      GraftTable.lastScanFiles = Some((sel.size, total))
    } else GraftTable.lastScanFiles = None
    val base = (pred, limit) match {
      case (Some(p), _) => Merge.readVersionWhere(spark, path, version, p)
      case (None, Some(n)) =>
        Merge.readVersionLimited(spark, path, version, n)
      case _ => Merge.readVersion(spark, path, version)
    }
    base.select(required.fieldNames.toSeq.map(col): _*).rdd
  }
}

/** BATCH CHANGE-DATA-FEED read (Delta's `readChangeFeed` dialect):
  *
  * {{{
  *   spark.read.format("graft-table").option("path", p)
  *     .option("readChangeFeed", "true")
  *     .option("startingVersion", "1")      // inclusive, like Delta
  *     .option("endingVersion", "3")        // default: current head
  *     .load()
  * }}}
  *
  * Rows are [[Merge.changesBetweenCdf]]'s — the data schema at the
  * range's end plus `_change_type` (insert / update_preimage /
  * update_postimage / delete), `_commit_version`, `_commit_timestamp`
  * — and each commit's feed plans only its touched buckets, so a
  * CDF read costs the CHANGES, never the table.
  */
/** The CDF dialect resolved with a STREAM-ONLY start shape (absent /
  * `latest` / `0` / beyond-head `startingVersion`): schema-only, no
  * batch capability — `readStream` falls back to the v1
  * [[graft.sources.GraftTableSource]] (which owns those start modes),
  * and a batch `load()` fails Spark's capability check by design.
  */
class GraftCdfStreamOnlyTable(spark: SparkSession, path: String,
    batchError: Option[String] = None)
    extends Table with SupportsRead {
  private val cdfSchema: StructType = {
    val data = Merge.versionSchema(spark, path,
      Merge.currentVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"$path records no schema — rewrite with writeKeyed first"))
    data.add("_change_type", org.apache.spark.sql.types.StringType)
      .add("_commit_version", LongType)
      .add("_commit_timestamp", org.apache.spark.sql.types.TimestampType)
  }
  override def name(): String = s"graft.`$path`@changes[stream]"
  override def schema(): StructType = cdfSchema
  // no STREAMING capability either way: `readStream` falls back to the
  // v1 source, which owns every stream start shape. When the start was
  // a NUMERIC beyond-head version we CLAIM batch read solely so a batch
  // load() reaches newScanBuilder and fails with the precise range
  // message instead of Spark's opaque capability error.
  override def capabilities(): util.Set[TableCapability] =
    if (batchError.isEmpty) util.EnumSet.noneOf(classOf[TableCapability])
    else util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    throw new IllegalArgumentException(batchError.getOrElse(
      s"${name()} supports only streaming reads"))
}

class GraftCdfTable(spark: SparkSession, path: String, fromInclusive: Long,
    to: Long) extends Table with SupportsRead {

  private val cdfSchema: StructType = {
    val data = Merge.versionSchema(spark, path, to).getOrElse(
      throw new IllegalArgumentException(
        s"$path v$to records no schema — rewrite with writeKeyed first"))
    data.add("_change_type", org.apache.spark.sql.types.StringType)
      .add("_commit_version", LongType)
      .add("_commit_timestamp", org.apache.spark.sql.types.TimestampType)
  }

  override def name(): String = s"graft.`$path`@changes[$fromInclusive,$to]"

  override def schema(): StructType = cdfSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new V1Scan {
      override def readSchema(): StructType = cdfSchema
      override def description(): String =
        s"GraftCdfScan path=$path, versions=($fromInclusive..$to]"
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new BaseRelation with TableScan {
          override val sqlContext: SQLContext = context
          override def schema: StructType = cdfSchema
          override def buildScan(): RDD[Row] =
            Merge.changesBetweenCdf(context.sparkSession, path,
              fromInclusive - 1, to)
              .select(cdfSchema.fieldNames.toSeq.map(col): _*).rdd
        }.asInstanceOf[T]
    }
  }
}
