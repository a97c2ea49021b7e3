package graft.sources.v2

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Merge

/** DSv2 STORED PROCEDURES — table maintenance from plain SQL, the
  * Iceberg `CALL` surface on the graft catalog:
  *
  * {{{
  *   CALL gcat.system.compact(table => 't', zorder_by => 'a,b')
  *   CALL gcat.system.vacuum(table => 't', keep_versions => 3)
  *   CALL gcat.system.restore(table => 't', version => 2)
  *   CALL gcat.system.create_tag(table => 't', tag => 'release-1')
  *   CALL gcat.system.delete_tag(table => 't', tag => 'release-1')
  *   CALL gcat.system.vacuum(table => 't', dry_run => true)
 *   CALL gcat.system.vacuum_retain(table => 't', retain_ms => 604800000)
 *   CALL gcat.system.relayout(table => 't', buckets => 64)
 *   CALL gcat.system.clone(table => 't', new_table => 't_dev')
  * }}}
  *
  * Each procedure resolves its table BY NAME through the owning
  * catalog (so `CALL` composes with `SELECT` on the same names),
  * delegates to the one Scala implementation of the verb
  * ([[Merge.compactVersion]], [[Merge.vacuum]], [[Merge.restore]],
  * [[Merge.tagVersion]]/[[Merge.deleteTag]], [[Merge.relayout]] — no
  * re-implementation that could drift), and returns a one-row result
  * scan describing what happened. MUTATING procedures are refused on
  * PINNED-catalog members, exactly like DML: members change through
  * `TableCatalog.transact`, which also moves the pins.
  *
  * Spark 4's procedure binding handles named arguments and declared
  * defaults; every parameter is IN-mode.
  */
private[v2] class GraftProcedures(
    catalogName: String, root: String, catalogMode: () => Boolean,
    resolve: String => (String, Option[Long])) {

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** (path, pinned) of a member; mutating verbs refuse pinned members. */
  private def mutablePath(table: String): String = {
    val (path, pinned) = resolve(table)
    require(pinned.isEmpty,
      s"table '$table' is a PINNED member of catalog '$catalogName' — " +
      "maintenance goes through TableCatalog.transact, which also " +
      "moves the pins")
    path
  }

  private abstract class Proc(val name: String, val describe: String,
      params: Seq[ProcedureParameter], result: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def description(): String = describe
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def exec(spark: SparkSession, args: InternalRow): Seq[Any]
    override def call(input: InternalRow): JIterator[Scan] = {
      val out = new GenericInternalRow(
        exec(SparkSession.active, input).toArray)
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(out)
        override def readSchema(): StructType = result
        override def description(): String = s"graft procedure $name"
      }).iterator()
    }
  }

  private val compact = new Proc("compact",
    "Rewrite over-fragmented buckets (optionally Z-ORDER clustering " +
    "them, or resort_key => true for a full key-sorted rewrite that " +
    "restores the sort-free merge-join layout) into one new version " +
    "with identical rows",
    Seq(in("table", StringType),
      inDefault("files_per_bucket", IntegerType, "1"),
      inDefault("zorder_by", StringType, "''"),
      inDefault("resort_key", BooleanType, "false")),
    StructType(Seq(StructField("version", LongType),
      StructField("buckets_rewritten", LongType),
      StructField("files_before", LongType),
      StructField("files_after", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val z = Option(a.getUTF8String(2)).map(_.toString).getOrElse("")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val st = Merge.compactVersion(spark,
        mutablePath(a.getUTF8String(0).toString),
        targetFilesPerBucket = a.getInt(1), zOrderBy = z,
        resortKey = a.getBoolean(3))
      Seq(st.version, st.bucketsRewritten.toLong, st.filesBefore.toLong,
        st.filesAfter.toLong)
    }
  }

  private val vacuum = new Proc("vacuum",
    "Reclaim files only unreachable versions reference (tagged " +
    "versions always survive; never-referenced files wait out the " +
    "orphan grace floor); dry_run => true reports the reclaimable " +
    "set without touching anything",
    Seq(in("table", StringType),
      inDefault("keep_versions", IntegerType, "1"),
      inDefault("grace_ms", LongType, "0"),
      inDefault("dry_run", BooleanType, "false")),
    StructType(Seq(StructField("current_version", LongType),
      StructField("files_reclaimed", LongType),
      StructField("dry_run", BooleanType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val path = mutablePath(a.getUTF8String(0).toString)
      val dry = a.getBoolean(3)
      val reclaimed = Merge.vacuum(spark, path,
        keepVersions = a.getInt(1), graceMs = a.getLong(2), dryRun = dry)
      Seq(Merge.currentVersion(spark, path), reclaimed.size.toLong, dry)
    }
  }

  private val copyInto = new Proc("copy_into",
    "Idempotently load data files from a landing directory into the " +
    "keyed table — exactly once per source file across any number of " +
    "calls (the loaded mark commits atomically with the data)",
    Seq(in("table", StringType), in("source", StringType),
      inDefault("format", StringType, "'parquet'")),
    StructType(Seq(StructField("version", LongType),
      StructField("files_copied", LongType),
      StructField("files_skipped", LongType),
      StructField("rows_copied", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val st = Merge.copyInto(spark,
        mutablePath(a.getUTF8String(0).toString),
        a.getUTF8String(1).toString, a.getUTF8String(2).toString)
      Seq(st.version, st.filesCopied.toLong, st.filesSkipped.toLong,
        st.rowsCopied)
    }
  }

  private val vacuumRetain = new Proc("vacuum_retain",
    "Time-based retention (Delta's shape): keep every version " +
    "committed within retain_ms plus the newest one at or before the " +
    "horizon, so time travel stays answerable for every instant " +
    "inside the window",
    Seq(in("table", StringType), in("retain_ms", LongType),
      inDefault("grace_ms", LongType, "0")),
    StructType(Seq(StructField("current_version", LongType),
      StructField("files_reclaimed", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val path = mutablePath(a.getUTF8String(0).toString)
      val reclaimed = Merge.vacuumRetain(spark, path,
        retainMillis = a.getLong(1), graceMs = a.getLong(2))
      Seq(Merge.currentVersion(spark, path), reclaimed.size.toLong)
    }
  }

  private val restore = new Proc("restore",
    "Commit a NEW head whose content is an earlier version's — " +
    "time travel made durable, history preserved",
    Seq(in("table", StringType), in("version", LongType)),
    StructType(Seq(StructField("restored_version", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] =
      Seq(Merge.restore(spark, mutablePath(a.getUTF8String(0).toString),
        a.getLong(1)))
  }

  private val createTag = new Proc("create_tag",
    "Name a version immutably (version => -1 tags the current head); " +
    "tagged versions survive vacuum until the tag is dropped",
    Seq(in("table", StringType), in("tag", StringType),
      inDefault("version", LongType, "-1")),
    StructType(Seq(StructField("tagged_version", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      // tags are reads of history, not mutations — allowed on pinned
      // members too (they cannot move the member)
      val (path, _) = resolve(a.getUTF8String(0).toString)
      val v = a.getLong(2) match {
        case -1L => Merge.currentVersion(spark, path)
        case n   => n
      }
      Merge.tagVersion(spark, path, a.getUTF8String(1).toString, v)
      Seq(v)
    }
  }

  private val deleteTag = new Proc("delete_tag",
    "Drop a version tag (its version rejoins normal retention)",
    Seq(in("table", StringType), in("tag", StringType)),
    StructType(Seq(StructField("deleted", BooleanType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val (path, _) = resolve(a.getUTF8String(0).toString)
      Merge.deleteTag(spark, path, a.getUTF8String(1).toString)
      Seq(true)
    }
  }

  private val relayout = new Proc("relayout",
    "Rewrite the table under a new bucket count in ONE commit (a " +
    "deliberate full shuffle — the escape hatch for outgrown layouts)",
    Seq(in("table", StringType), in("buckets", IntegerType)),
    StructType(Seq(StructField("version", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] =
      Seq(Merge.relayout(spark, mutablePath(a.getUTF8String(0).toString),
        a.getInt(1)))
  }

  private val clone_ = new Proc("clone",
    "Shallow-clone a table to a NEW name in this directory catalog — " +
    "one manifest write at any table size (version => -1 clones the " +
    "current head); the clone is immediately a queryable member",
    Seq(in("table", StringType), in("new_table", StringType),
      inDefault("version", LongType, "-1")),
    StructType(Seq(StructField("cloned_version", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val srcPath = mutablePath(a.getUTF8String(0).toString)
      val newName = a.getUTF8String(1).toString
      require(newName.nonEmpty && !newName.contains("/"),
        s"new_table must be a plain member name, got '$newName'")
      val dst = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(srcPath).getParent, newName)
      require(!dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(dst), s"member '$newName' already exists")
      val v = a.getLong(2) match {
        case -1L => Merge.currentVersion(spark, srcPath)
        case n   => n
      }
      Merge.cloneTableAt(spark, srcPath, dst.toString, v)
      Seq(v)
    }
  }

  /** PINNED-member maintenance from pure SQL: the catalog-mode twin of
    * [[compact]]. A pinned member may only change through
    * [[graft.sources.TableCatalog.transact]] (a direct Merge commit is
    * indistinguishable from a crashed transaction's orphan and gets
    * rolled back), so this procedure runs the compaction AS a one-op
    * catalog transaction: the member compacts, the catalog commits a
    * new version whose pin points at the compacted image, and every
    * other member's pin rides along unchanged — readers at the old
    * catalog version keep their exact snapshot.
    */
  private val transactCompact = new Proc("transact_compact",
    "Compact (optionally Z-ORDER) a PINNED catalog member inside one " +
    "catalog transaction: the member's pin moves to the compacted " +
    "version atomically with the catalog commit",
    Seq(in("table", StringType),
      inDefault("files_per_bucket", IntegerType, "1"),
      inDefault("zorder_by", StringType, "''")),
    StructType(Seq(StructField("catalog_version", LongType),
      StructField("member_version", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      require(catalogMode(),
        s"catalog '$catalogName' is in DIRECTORY mode — use " +
        s"CALL $catalogName.system.compact(...) there; transact_* " +
        "procedures are for pinned-catalog members")
      val table = a.getUTF8String(0).toString
      val fpb = a.getInt(1)
      val z = Option(a.getUTF8String(2)).map(_.toString).getOrElse("")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val st = graft.sources.TableCatalog.transact(spark, root,
        Seq(graft.sources.TableCatalog.TxnTable(table, (s, p) =>
          Merge.compactVersion(s, p, targetFilesPerBucket = fpb,
            zOrderBy = z).version)),
        opName = "transact_compact")
      Seq(st.version, st.pins(table).version)
    }
  }

  private val analyze = new Proc("analyze",
    "Record (or refresh) per-file column stats for the current " +
    "version as one metadata commit — enables manifest-level " +
    "skipping, Bloom pruning, and manifest-answered aggregates " +
    "(COUNT/MIN/MAX/SUM) without rewriting data. Columns is a " +
    "comma-separated list; bloom:c records a per-file Bloom filter",
    Seq(in("table", StringType), in("columns", StringType)),
    StructType(Seq(StructField("version", LongType),
      StructField("files", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val cols = a.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (v, files) = Merge.analyzeTable(spark,
        mutablePath(a.getUTF8String(0).toString), cols)
      Seq(v, files.toLong)
    }
  }

  private val ndv = new Proc("ndv",
    "Approximate COUNT(DISTINCT column) answered from the manifest's " +
    "per-file ndv: HLL sketches — a driver-side union of the live " +
    "files' ~1 KB blobs, no data file opened at any table size. " +
    "Errors when no answer is available: the ndv:column spec is " +
    "absent or a live file lacks its sketch (heal with CALL " +
    "system.analyze), or live deletion vectors exist (gross sketches " +
    "cannot subtract; purge/compact first)",
    Seq(in("table", StringType), in("column", StringType)),
    StructType(Seq(StructField("ndv", LongType)))) {
    override def exec(spark: SparkSession, a: InternalRow): Seq[Any] = {
      val path = mutablePath(a.getUTF8String(0).toString)
      val column = a.getUTF8String(1).toString
      val est = Merge.versionColumnNdv(spark, path,
        Merge.currentVersion(spark, path), column).getOrElse(
          throw new IllegalArgumentException(
            s"no manifest NDV answer for '$column' — needs an " +
            s"'ndv:$column' stats spec with every live file sketched " +
            "(CALL system.analyze(table, 'ndv:" + column + "')) and " +
            "no live deletion vectors"))
      Seq(est)
    }
  }

  val all: Map[String, UnboundProcedure] =
    Seq(compact, vacuum, vacuumRetain, restore, createTag, deleteTag,
        relayout, clone_, transactCompact, copyInto, analyze, ndv)
      .map(p => p.name -> (p: UnboundProcedure)).toMap
}
