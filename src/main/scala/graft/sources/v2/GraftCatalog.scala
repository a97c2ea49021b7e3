package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import graft.sources.{Merge, TableCatalog => GraftCat}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog => V2TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SESSION-CATALOG integration: name resolution for graft tables from
  * plain SQL —
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.v2.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/catalog")
  *   spark.sql("SELECT * FROM graft.orders WHERE id = 7")
  *   spark.sql("SELECT * FROM graft.orders VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.orders VERSION AS OF 'release-1'")
  *   spark.sql("SELECT * FROM graft.orders TIMESTAMP AS OF '...'")
  * }}}
  *
  * Two layouts under `root`, auto-detected:
  *
  *   - a [[GraftCat]] CATALOG LOG (`_cat_log/` present): table names are
  *     the catalog's members, and — the property that matters — each
  *     name resolves to the member's PINNED version in the newest
  *     catalog state, so one SQL statement joining two members reads a
  *     cross-table-consistent transaction snapshot, never a torn one.
  *     Index members (kind `idx`) are not SQL tables and are hidden.
  *   - a plain DIRECTORY of [[Merge]] tables (no catalog log): each
  *     child directory with a version log is a table at its own newest
  *     version.
  *
  * Every load returns the DSv2 [[GraftTable]], so the full scan stack
  * (manifest-stats file pruning, column pruning, snapshot pinning)
  * applies to SQL exactly as to `spark.read`. Time travel arrives
  * through the standard `loadTable(ident, version/timestamp)` hooks:
  * a numeric version string resolves as a table version, anything else
  * as a [[Merge]] tag; timestamps are Catalyst micros resolved through
  * [[Merge.versionAsOf]].
  *
  * In DIRECTORY mode the full SQL lifecycle works: CREATE TABLE/CTAS
  * (empty v0 under the declared layout), INSERT INTO / INSERT
  * OVERWRITE (fenced Merge commits through the loaded [[GraftTable]]'s
  * SupportsWrite), UPDATE/MERGE/DELETE (the DML rule + SupportsDelete),
  * column and CHECK-constraint ALTERs (metadata-only commits), DROP
  * TABLE, and `CALL <cat>.system.*` maintenance procedures. RENAME
  * TABLE stays refused in every mode — shallow clones hold absolute
  * foreign refs into the table root, so a directory rename would
  * silently corrupt them. In PINNED-CATALOG mode every mutation is
  * refused (loads resolve pinned versions, which are not writable) —
  * exactly the catalog's own contract: members are written only
  * through [[GraftCat.transact]], which also moves the pins.
  */
class GraftCatalog extends V2TableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catalogName

  /** FunctionCatalog: exactly one function, the layout's `bucket`
    * transform — what `V2ScanPartitioningAndOrdering` resolves a
    * table's reported `bucket(n, key)` partitioning against, enabling
    * storage-partitioned joins (see [[GraftBucketFunction]]).
    */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(catalogName, ident.name())

  override def defaultNamespace(): Array[String] = Array.empty

  private def spark: SparkSession = SparkSession.active

  private def isCatalogMode: Boolean = {
    val p = new Path(root, "_cat_log")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** name -> (path, pinned version or None for "newest"). */
  private def members(): Map[String, (String, Option[Long])] =
    if (isCatalogMode) {
      GraftCat.state(spark, root).pins.collect {
        case (name, pin) if pin.kind == "merge" =>
          name -> (pin.path, Some(pin.version))
      }
    } else {
      val p = new Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .filter(d => fs.exists(new Path(d.getPath, "_graft_log")))
        .map(d => d.getPath.getName ->
          (d.getPath.toString, None: Option[Long]))
        .toMap
    }

  private def requireRootNamespace(namespace: Array[String]): Unit =
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireRootNamespace(namespace)
    members().keys.toArray.sorted.map(Identifier.of(Array.empty, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("default"))) &&
      members().contains(ident.name())

  private def pathOf(ident: Identifier): (String, Option[Long]) = {
    requireRootNamespace(ident.namespace())
    members().getOrElse(ident.name(),
      throw new NoSuchTableException(ident))
  }

  override def loadTable(ident: Identifier): Table = {
    val (path, pinned) = pathOf(ident)
    GraftTable.resolve(spark, path, pinned, None, None)
  }

  /** `VERSION AS OF` — numeric strings are table versions, anything
    * else resolves as a [[Merge.tagVersionOf]] tag.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (path, _) = pathOf(ident)
    version.toLongOption match {
      case Some(v) => GraftTable.resolve(spark, path, Some(v), None, None)
      case None    => GraftTable.resolve(spark, path, None, None, Some(version))
    }
  }

  /** `TIMESTAMP AS OF` — Spark hands Catalyst micros. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val (path, _) = pathOf(ident)
    GraftTable.resolve(spark, path, None, Some(timestamp / 1000L), None)
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  // one flat namespace ("default"), so SHOW NAMESPACES / USE work;
  // namespace DDL is refused like table DDL
  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"))

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    requireRootNamespace(namespace)
    if (namespace.isEmpty) listNamespaces() else Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    requireRootNamespace(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    readOnly(s"CREATE NAMESPACE ${namespace.mkString(".")}")

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit =
    readOnly(s"ALTER NAMESPACE ${namespace.mkString(".")}")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    readOnly(s"DROP NAMESPACE ${namespace.mkString(".")}")

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog '$catalogName' is read-only for DDL: $op goes " +
      "through Merge.writeKeyed/renameColumn or TableCatalog.transact, " +
      "whose commit protocols SQL DDL cannot honor atomically (DML " +
      "INSERT INTO / INSERT OVERWRITE work)")

  /** `CREATE TABLE` (and therefore CTAS) in DIRECTORY mode: commits an
    * EMPTY v0 under the declared layout, after which INSERT INTO /
    * DSv2 writes / DML all work on the name. The layout comes from
    * either an Iceberg-style bucket transform or table properties:
    *
    * {{{
    *   CREATE TABLE gcat.t (id BIGINT, name STRING)
    *     PARTITIONED BY (bucket(8, id))
    *   CREATE TABLE gcat.t (id BIGINT, name STRING)
    *     TBLPROPERTIES ('key' = 'id', 'buckets' = '8')
    *   CREATE TABLE gcat.t PARTITIONED BY (bucket(8, id)) AS SELECT ...
    * }}}
    *
    * CTAS on this catalog is the standard NON-ATOMIC DSv2 sequence
    * (create empty, then append): a reader can observe the empty table
    * for the write's duration, and a failed write leaves it — Spark's
    * documented behavior for non-staging catalogs. PINNED-catalog mode
    * refuses: members join through `TableCatalog.create`/`addMember`.
    */
  /** Shared CREATE/CTAS front door: refusals, layout parsing, and the
    * empty-v0 write at `path` — the only difference between the plain
    * and the STAGED create is which directory `path` points at.
    */
  private def createAt(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String], path: String): Unit = {
    if (isCatalogMode)
      readOnly(s"CREATE TABLE $ident (pinned-catalog mode — members " +
        "join through TableCatalog.create/addMember)")
    requireRootNamespace(ident.namespace())
    if (members().contains(ident.name()))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val props = properties.asScala
    def parseBucket(t: Transform): (String, Int) = {
      val refs = t.references().flatMap(_.fieldNames())
      val n = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] =>
          l.value().asInstanceOf[Number].intValue()
      }
      require(refs.length == 1 && n.isDefined,
        s"bucket transform must be bucket(n, col), got $t")
      (refs.head, n.get)
    }
    // one transform = single-key layout; several = the COMPOSITE grid
    // (one bucket(n_i, k_i) per dimension — the storage-partitioned-
    // join shape for multi-column keys)
    val fromTransform: Option[Seq[(String, Int)]] = partitions.toSeq match {
      case Seq() => None
      case ts if ts.forall(_.name == "bucket") =>
        Some(ts.map(parseBucket))
      case other => throw new UnsupportedOperationException(
        "graft tables are bucketed by bucket transforms: PARTITIONED " +
        s"BY (bucket(n, col)[, bucket(m, col2), ...]), got " +
        other.mkString(", "))
    }
    val layout: Seq[(String, Int)] = fromTransform.getOrElse {
      val k = props.getOrElse("key",
        throw new IllegalArgumentException(
          "declare the layout: PARTITIONED BY (bucket(n, col)) or " +
          "TBLPROPERTIES ('key' = 'col'[, 'buckets' = 'n'])"))
      Seq((k, props.get("buckets").map(_.toInt).getOrElse(16)))
    }
    require(layout.map(_._1).distinct.size == layout.size,
      "bucket key columns must be distinct")
    layout.foreach { case (key, _) =>
      require(schema.fieldNames.contains(key),
        s"key column '$key' is not in the schema " +
        s"(${schema.fieldNames.mkString(", ")})")
    }
    val statsCols = props.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // IDENTITY columns derive their high-water mark from the
    // manifest's per-file max stats (no extra commit state to carry),
    // so the identity column ALWAYS records stats from birth
    val idCols = schema.fields.toSeq.filter(_.metadata.contains(
      org.apache.spark.sql.catalyst.util.IdentityColumn
        .IDENTITY_INFO_START)).map(_.name)
    val allStats = (statsCols ++ idCols.filterNot(statsCols.contains))
      .distinct
    val empty = spark.createDataFrame(
      util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    if (layout.size == 1)
      Merge.writeKeyed(empty, path, layout.head._1, layout.head._2,
        statsCols = allStats)
    else
      Merge.writeKeyedCols(empty, path, layout.map(_._1),
        layout.map(_._2), statsCols = allStats)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = new Path(root, ident.name()).toString
    createAt(ident, schema, partitions, properties, path)
    GraftTable.resolve(spark, path, None, None, None)
  }

  /** The Column[] overload is the one CREATE TABLE statements with
    * GENERATED ALWAYS AS columns reach — the default Column[]→schema
    * conversion DROPS generation expressions, so rebuild the schema
    * with each expression riding its field's metadata (the same key
    * Spark's own GeneratedColumn util reads), where the manifest's
    * lossless JSON schema form persists it and [[Merge.upsert]]
    * computes/validates it on every write. The expression is
    * validated HERE by resolving it against the non-generated columns
    * (self- or cross-generated references and unknown names fail the
    * CREATE, not the first INSERT).
    */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val key = org.apache.spark.sql.catalyst.util.GeneratedColumn
      .GENERATION_EXPRESSION_METADATA_KEY
    val idn = org.apache.spark.sql.catalyst.util.IdentityColumn
    val base =
      org.apache.spark.sql.GraftShim.v2ColumnsToStructType(columns)
    val schema = StructType(base.fields.zip(columns).map { case (f, c) =>
      (Option(c.generationExpression()), Option(c.identityColumnSpec()))
        match {
        case (Some(g), _) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString(key, g).build())
        case (None, Some(spec)) =>
          require(f.dataType == org.apache.spark.sql.types.LongType ||
              f.dataType == org.apache.spark.sql.types.IntegerType,
            s"identity column ${f.name} must be BIGINT or INT, " +
            s"got ${f.dataType.simpleString}")
          require(spec.getStep != 0,
            s"identity column ${f.name}: step must be non-zero")
          f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong(idn.IDENTITY_INFO_START, spec.getStart)
              .putLong(idn.IDENTITY_INFO_STEP, spec.getStep)
              .putBoolean(idn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
                spec.isAllowExplicitInsert)
              .build())
        case _ => f
      }
    })
    require(schema.fields.count(
        _.metadata.contains(idn.IDENTITY_INFO_START)) <= 1,
      "at most one identity column per table (the SQL standard's rule)")
    val plain = StructType(schema.fields.filterNot(_.metadata.contains(key)))
    schema.fields.filter(_.metadata.contains(key)).foreach { f =>
      val g = f.metadata.getString(key)
      try spark.createDataFrame(
          util.Collections.emptyList[org.apache.spark.sql.Row](), plain)
        .select(org.apache.spark.sql.functions.expr(g)
          .cast(f.dataType)).schema
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"generated column ${f.name}: expression ($g) must resolve " +
          "against the table's non-generated columns", e)
      }
    }
    createTable(ident, schema, partitions, properties)
  }

  /** ATOMIC CTAS (`CREATE TABLE ... AS SELECT`): the staged table is a
    * REAL graft table under `root/_staging/<uuid>/<name>` — invisible
    * to [[members]] (the staging parent carries no version log), so the
    * SELECT's write runs against it with the full commit protocol while
    * readers of the catalog see nothing. Commit is one directory RENAME
    * into the catalog root (the newly created table has no clones, so
    * the no-rename rule for live tables does not apply); abort deletes
    * the staging directory. Either way the catalog never exposes a
    * half-written table — the non-atomic create-then-append window the
    * plain [[createTable]] route has is closed.
    */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val staging = new Path(new Path(root, "_staging"),
      java.util.UUID.randomUUID().toString)
    val stagedPath = new Path(staging, ident.name()).toString
    createAt(ident, schema, partitions, properties, stagedPath)
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    new GraftStagedTable(
      GraftTable.resolve(spark, stagedPath, None, None, None)
        .asInstanceOf[GraftTable],
      fs, staging, new Path(root, ident.name()),
      exists = () => members().contains(ident.name()), ident)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    readOnly(s"REPLACE TABLE $ident — graft history is append-only: " +
      "DROP TABLE then CTAS, or INSERT OVERWRITE to keep the log")

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    readOnly(s"CREATE OR REPLACE TABLE $ident — graft history is " +
      "append-only: DROP TABLE then CTAS, or INSERT OVERWRITE")

  /** The catalog-capability switches Spark's analyzer checks before it
    * will even parse-plan constraint DDL / column DEFAULT clauses
    * against this catalog. Declaring SUPPORT_COLUMN_DEFAULT_VALUE lets
    * `CREATE TABLE t (c INT DEFAULT 5)` through: Spark records the
    * default in the column's StructField metadata, the manifest stores
    * the metadata-bearing schema in its lossless JSON form
    * ([[Merge.schemaToString]]), the table reports it back through
    * `schema()`, and Spark's own ResolveDefaultColumns then fills
    * omitted columns and `DEFAULT` keywords on every INSERT — the
    * engine never evaluates a default itself. ADD COLUMN with a
    * default stays refused (an exists-default would need read-path
    * backfill semantics on pre-existing rows).
    */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  /** The table-level DDL the table format CAN honor atomically —
    * metadata-only single-table commits:
    *
    * {{{
    *   ALTER TABLE g.t RENAME COLUMN a TO b
    *   ALTER TABLE g.t ADD COLUMN c BIGINT
    *   ALTER TABLE g.t DROP COLUMN c
    *   ALTER TABLE g.t ADD CONSTRAINT ck CHECK (c > 0)
    *   ALTER TABLE g.t DROP CONSTRAINT ck
    * }}}
    *
    * map onto [[Merge.renameColumn]]/[[Merge.addColumn]]/
    * [[Merge.dropColumn]]/[[Merge.addConstraint]]/
    * [[Merge.dropConstraint]] (ADD CONSTRAINT validates the EXISTING
    * rows before committing, then every later write enforces it at
    * commit time — batch-sized cost, the whole-table invariant holds
    * inductively). Directory mode only: a PINNED-catalog member
    * changes shape through [[GraftCat.transact]], like its data.
    * Nested fields, positions, defaults, non-CHECK constraints and
    * every other change kind stay refused.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val (path, pinned) = pathOf(ident)
    if (pinned.isDefined)
      readOnly(s"ALTER TABLE $ident (pinned-catalog member)")
    changes.foreach {
      case c: TableChange.AddConstraint => c.constraint() match {
        case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
          Merge.addConstraint(spark, path, chk.name(), chk.predicateSql())
        case other => readOnly(
          s"ALTER TABLE $ident ADD non-CHECK constraint $other")
      }
      case c: TableChange.DropConstraint =>
        val known = Merge.tableConstraints(spark, path)
          .exists(_._1 == c.name())
        if (known) Merge.dropConstraint(spark, path, c.name())
        else if (!c.ifExists())
          throw new IllegalArgumentException(
            s"no constraint named '${c.name()}' on $ident")
      case c: TableChange.RenameColumn =>
        require(c.fieldNames().length == 1,
          "only top-level columns can be renamed")
        Merge.renameColumn(spark, path, c.fieldNames()(0), c.newName())
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames().length == 1,
          "only top-level columns can be dropped")
        Merge.dropColumn(spark, path, c.fieldNames()(0))
      case c: TableChange.AddColumn =>
        require(c.fieldNames().length == 1,
          "only top-level columns can be added")
        require(c.position() == null && c.defaultValue() == null,
          "column position and default values are not supported")
        Merge.addColumn(spark, path, c.fieldNames()(0), c.dataType())
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames().length == 1,
          "only top-level columns can change type")
        Merge.widenColumn(spark, path, c.fieldNames()(0), c.newDataType())
      case other =>
        readOnly(s"ALTER TABLE $ident ${other.getClass.getSimpleName}")
    }
    invalidateTable(ident)
    loadTable(ident)
  }

  /** `DROP TABLE` in DIRECTORY mode deletes the table root — data,
    * version log, tags; there is no undrop (time travel needs the
    * log). PINNED-catalog members are not droppable here: removing a
    * member is a catalog commit, not a directory delete.
    */
  override def dropTable(ident: Identifier): Boolean = {
    if (isCatalogMode)
      readOnly(s"DROP TABLE $ident (pinned-catalog mode)")
    if (!tableExists(ident)) return false
    val (path, _) = pathOf(ident)
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    readOnly(s"RENAME TABLE $oldIdent")

  // ---- stored procedures: `CALL <cat>.system.<proc>(...)` ----------

  private lazy val procedures =
    new GraftProcedures(name(), root, () => isCatalogMode,
      t => pathOf(Identifier.of(Array.empty, t)))

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace: " +
      s"CALL ${name()}.system.${ident.name()}(...)")
    procedures.all.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name()}' — available: " +
        procedures.all.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      procedures.all.keys.toSeq.sorted
        .map(Identifier.of(Array("system"), _)).toArray
    else Array.empty
}

/** The CTAS staging handle: a real [[GraftTable]] rooted in the hidden
  * staging directory, published (one rename) or discarded (one delete)
  * when Spark's atomic CTAS exec reports the SELECT's outcome. The
  * commit re-checks the name — a racing CREATE that landed first wins
  * and this staging attempt cleans itself up and fails loudly.
  */
private[v2] class GraftStagedTable(staged: GraftTable,
    fs: org.apache.hadoop.fs.FileSystem, stagingDir: Path,
    finalPath: Path, exists: () => Boolean, ident: Identifier)
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = staged.name()
  override def schema(): StructType = staged.schema()
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    staged.capabilities()
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    staged.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    if (exists()) {
      fs.delete(stagingDir, true)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    val src = new Path(stagingDir, finalPath.getName)
    if (!fs.rename(src, finalPath)) {
      fs.delete(stagingDir, true)
      throw new IllegalStateException(
        s"CTAS publish rename $src -> $finalPath failed — the staged " +
        "data was discarded, the catalog is unchanged")
    }
    fs.delete(stagingDir, true)
  }

  override def abortStagedChanges(): Unit = {
    fs.delete(stagingDir, true)
    ()
  }
}
