package graft.sources.v2

import org.apache.spark.sql.{Column, DataFrame, GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit, when}

import graft.sources.Merge

/** SQL `UPDATE`, `MERGE INTO`, and the `DELETE FROM` shapes the DSv2
  * hooks don't carry (plainly-translatable deletes stay on
  * [[org.apache.spark.sql.connector.catalog.SupportsDelete]];
  * INSERT/OVERWRITE ride SupportsWrite):
  *
  * {{{
  *   spark.sql("UPDATE gcat.t SET name = 'x', score = score + 1 WHERE id < 7")
  *   spark.sql("""
  *     MERGE INTO gcat.t USING updates u ON t.id = u.id
  *     WHEN MATCHED AND u.op = 'del' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET name = u.name, score = u.score
  *     WHEN NOT MATCHED THEN INSERT (id, name, score) VALUES (u.id, u.name, u.score)
  *     WHEN NOT MATCHED BY SOURCE THEN DELETE
  *   """)
  * }}}
  *
  * Doorway: an injected analyzer RESOLUTION rule ([[GraftDmlRule]],
  * registered by [[graft.GraftExtensions]]) converts the resolved
  * [[UpdateTable]]/[[MergeIntoTable]] statement into a runnable command
  * — the integration pattern Delta Lake ships (DeltaAnalysis →
  * Update/MergeIntoCommand), chosen over DSv2
  * `SupportsRowLevelOperations` deliberately: Spark's group-based
  * rewrite replaces whole SCANNED GROUPS through a raw executor-side
  * `BatchWrite`, which would bypass the Merge commit protocol (staged
  * bucketed files, manifest stats, fenced retries) and rewrite the
  * whole table per statement, while the command below folds the
  * statement into ONE bucket-granular [[Merge.upsert]] commit that
  * only touches the buckets the changed keys hash into.
  *
  * Both commands build their row sets as DataFrames OVER THE RESOLVED
  * PLANS the statement already carries (via [[GraftShim.ofRows]]), so
  * the statement's own condition/assignment expressions bind by
  * attribute id — no name-based re-resolution — and Catalyst pushes
  * the WHERE/ON predicates into the DSv2 scan where the manifest
  * stats prune data files before any I/O.
  *
  * Semantics (Delta/ANSI):
  *   - snapshot-read, head-write: rows are read from the version the
  *     statement's table name RESOLVED to, the commit lands on the
  *     current head (last-writer-wins, like every Merge upsert).
  *   - UPDATE of the bucketing key column is refused — the key is the
  *     row's identity; "changing" it is DELETE + INSERT, which MERGE
  *     expresses directly.
  *   - a MERGE that modifies the same target key twice (two source
  *     rows matching one target row, or an INSERT colliding with an
  *     updated key under a non-key ON condition) fails loudly with the
  *     offending key, like Delta's multiple-source-rows-matched error.
  *   - WHEN clauses apply FIRST-MATCH-WINS in statement order; rows
  *     where no clause applies are left untouched (and cost nothing:
  *     they never enter the change set, so their buckets are not
  *     rewritten unless a changed key shares them).
  *   - `WITH SCHEMA EVOLUTION` rides Spark's own analysis
  *     (ResolveMergeIntoSchemaEvolution, opted into by the table's
  *     AUTOMATIC_SCHEMA_EVOLUTION capability): the analyzer derives
  *     the schema changes from the source, applies them through the
  *     catalog's alterTable ([[Merge.addColumn]]/[[Merge.widenColumn]]
  *     commits — key-type guard and bloom invalidation included),
  *     refreshes the target relation, and only then does this rule
  *     convert the evolved statement. Evolution commits land BEFORE
  *     the merge commit (two commits total, like ALTER + MERGE run by
  *     hand) — readers between them see the evolved schema with the
  *     old rows null-aligned, never a torn merge.
  */
object GraftDmlRule extends Rule[LogicalPlan] {

  private[v2] def graftTarget(plan: LogicalPlan): Option[GraftTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        r.table.asInstanceOf[GraftTable]
    }

  private def concrete(as: Seq[MergeAction]): Boolean = as.forall {
    case _: UpdateAction | _: DeleteAction | _: InsertAction => true
    case _ => false
  }

  /** Is the whole condition expressible as DSv2-pushable v1 filters
    * the [[GraftTable.canDeleteWhere]] hook will accept? Then Spark's
    * own `DELETE FROM` route handles it; anything beyond (subqueries,
    * arbitrary expressions like `%`) is OURS to run, or the statement
    * fails outright. The check is a conservative STRUCTURAL mirror of
    * the hook's filter set — drift in either direction is safe: a
    * false "pushable" keeps Spark's own refusal, a false "not
    * pushable" merely routes through our command.
    */
  private def deletableViaHook(cond: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def attrLit(a: Expression, b: Expression): Boolean =
      (a.isInstanceOf[AttributeReference] && b.isInstanceOf[Literal]) ||
        (b.isInstanceOf[AttributeReference] && a.isInstanceOf[Literal])
    def pushable(e: Expression): Boolean = e match {
      case EqualTo(a, b)            => attrLit(a, b)
      case EqualNullSafe(a, b)      => attrLit(a, b)
      case GreaterThan(a, b)        => attrLit(a, b)
      case GreaterThanOrEqual(a, b) => attrLit(a, b)
      case LessThan(a, b)           => attrLit(a, b)
      case LessThanOrEqual(a, b)    => attrLit(a, b)
      case In(_: AttributeReference, vs) => vs.forall(_.isInstanceOf[Literal])
      case InSet(_: AttributeReference, _) => true
      case IsNull(_: AttributeReference) => true
      case IsNotNull(_: AttributeReference) => true
      case StartsWith(_: AttributeReference, _: Literal) => true
      case EndsWith(_: AttributeReference, _: Literal) => true
      case Contains(_: AttributeReference, _: Literal) => true
      case And(l, r) => pushable(l) && pushable(r)
      case Or(l, r)  => pushable(l) && pushable(r)
      case Not(c)    => pushable(c)
      case _: Literal => true // TRUE / FALSE conditions
      case _ => false
    }
    pushable(cond)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(table, assignments, condition)
          if u.resolved && graftTarget(table).isDefined =>
        GraftUpdateCommand(table, graftTarget(table).get, assignments,
          condition)
      case m: MergeIntoTable if m.resolved &&
          // WITH SCHEMA EVOLUTION: while changes are still pending,
          // leave the statement to Spark's own
          // ResolveMergeIntoSchemaEvolution (it alterTables the target
          // through the catalog — Merge.addColumn/widenColumn commits —
          // and refreshes the relation); the evolved merge comes back
          // through this rule on the next fixed-point pass
          !m.needSchemaEvolution &&
          concrete(m.matchedActions ++ m.notMatchedActions ++
            m.notMatchedBySourceActions) &&
          graftTarget(m.targetTable).isDefined =>
        GraftMergeCommand(m, graftTarget(m.targetTable).get)
      // DELETE stays on the standard SupportsDelete route when every
      // conjunct translates (one less custom path); the statements
      // that route REFUSES — subqueries, arbitrary expressions —
      // become a command over Merge.deleteWhere, which evaluates any
      // predicate (find scan still bounds-pruned where possible)
      case d @ org.apache.spark.sql.catalyst.plans.logical
          .DeleteFromTable(table, condition)
          if d.resolved && graftTarget(table).isDefined &&
            !deletableViaHook(condition) =>
        GraftDeleteCommand(table, graftTarget(table).get, condition)
    }
}

/** `DELETE FROM t WHERE <anything>` — the conditions the DSv2
  * SupportsDelete hook cannot carry (subqueries, non-translatable
  * expressions): the doomed rows are found by evaluating the FULL
  * predicate over the statement's resolved relation, then their keys
  * tombstone in ONE bucket-granular [[Merge.upsert]] commit.
  */
case class GraftDeleteCommand(table: LogicalPlan, graft: GraftTable,
    condition: Expression) extends LeafRunnableCommand
    with org.apache.spark.sql.catalyst.plans.logical.SupportsSubquery {

  override def run(spark: SparkSession): Seq[Row] = {
    GraftDml.keyColsOf(spark, graft) // writable + layout checks
    // evaluate the predicate over the statement's own resolved
    // relation (subqueries keep their embedded plans — exactly what
    // deleteWhere's re-resolved frame could not bind), collect the
    // DOOMED rows once, and tombstone their keys in one commit: SQL
    // DELETE 3VL for free (null-condition rows are not matched, so
    // they survive)
    val target = GraftShim.ofRows(spark, table)
    val doomed = target.filter(GraftShim.column(condition))
      .localCheckpoint() // one evaluation, several commit-protocol reads
    try {
      val changes = doomed.withColumn("__graft_del", lit(true))
      // merge-on-read: a key-addressed delete is pure DV positions —
      // no data file rewritten, no file appended (r17 tombstones)
      if (GraftDml.mergeOnRead(spark) &&
          GraftDml.morEligible(graft.schema()))
        Merge.upsertDVGrid(spark, graft.path, changes,
          tombstoneCol = Some("__graft_del"))
      else
        Merge.upsertGrid(spark, graft.path, changes,
          tombstoneCol = Some("__graft_del"))
    } finally GraftShim.unpinLocalCheckpoint(doomed)
    Seq.empty
  }
}

private[v2] object GraftDml {

  /** Session opt-in (`spark.graft.dml.mergeOnRead = true`): route SQL
    * UPDATE / MERGE (all three branches, DELETE included) / DELETE
    * through the MERGE-ON-READ write path — old images deletion-
    * vectored, change sets appended, NO data file rewritten
    * ([[Merge.upsertDV]] with tombstones / [[Merge.deleteWhereDV]]) —
    * instead of copy-on-write bucket rewrites. The CDC-steady-state
    * posture: per-statement cost ∝ the change set, with compaction's
    * targeted purge folding on a maintenance schedule. Statements
    * outside the merge-on-read surface (identity/generated columns)
    * FALL BACK to copy-on-write — same result, different write
    * amplification — never an error.
    */
  def mergeOnRead(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.dml.mergeOnRead").contains("true")

  /** upsertDV's narrower surface: identity minting and generated-
    * column recomputation belong to the copy-on-write upsert.
    */
  def morEligible(schema: org.apache.spark.sql.types.StructType)
      : Boolean = {
    val idn = org.apache.spark.sql.catalyst.util.IdentityColumn
    schema.fields.forall(f =>
      !f.metadata.contains(idn.IDENTITY_INFO_START) &&
        !f.metadata.contains(org.apache.spark.sql.catalyst.util
          .GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY))
  }

  /** Assignment keys by target-attribute id; nested-field assignment
    * (`SET s.a = 1`) is refused — graft schema evolution and column
    * semantics are top-level.
    */
  def assignmentMap(as: Seq[Assignment]): Map[ExprId, Expression] =
    as.map { a =>
      a.key match {
        case ar: AttributeReference => ar.exprId -> a.value
        case other => throw new UnsupportedOperationException(
          s"only top-level column assignment is supported, got: $other")
      }
    }.toMap

  /** The assigned value as a Column, cast to the column's declared type
    * when it differs (store-assignment; non-rewritable DML skips
    * Spark's own assignment alignment, so the cast is ours to add).
    */
  def valueFor(a: Attribute, v: Expression): Column = {
    val c = GraftShim.column(v)
    if (v.dataType.catalogString == a.dataType.catalogString) c
    else c.cast(a.dataType)
  }

  /** The target's key columns — ONE for writeKeyed tables, the full
    * tuple for writeKeyedCols grids; the commands route both through
    * the layout-reading upsert verbs ([[Merge.upsertGrid]] /
    * [[Merge.upsertDVGrid]]), so the bucket counts never re-state.
    */
  def keyColsOf(spark: SparkSession, graft: GraftTable): Seq[String] = {
    require(graft.writable,
      s"cannot write to a time-traveled or pinned-catalog resolution " +
      s"of ${graft.path} — DML goes to the table head (directory-mode " +
      "catalog or spark.read without time travel)")
    Merge.tableLayoutKeys(spark, graft.path).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"${graft.path} records no bucketing layout — " +
        "write it with writeKeyed/writeKeyedCols first"))
  }
}

/** `UPDATE t SET ... [WHERE ...]` — one bucket-granular copy-on-write
  * [[Merge.upsert]] commit of exactly the matched rows' new images.
  */
case class GraftUpdateCommand(table: LogicalPlan, graft: GraftTable,
    assignments: Seq[Assignment], condition: Option[Expression])
    extends LeafRunnableCommand
    with org.apache.spark.sql.catalyst.plans.logical.SupportsSubquery {

  override def run(spark: SparkSession): Seq[Row] = {
    val keyCols = GraftDml.keyColsOf(spark, graft)
    val byId = GraftDml.assignmentMap(assignments)
    val attrs = table.output
    attrs.filter(a => keyCols.contains(a.name)).foreach { k =>
      require(!byId.contains(k.exprId),
        s"UPDATE of the key column '${k.name}' is refused — the key " +
        "is the row's identity; express a key change as MERGE's " +
        "DELETE + INSERT")
    }
    val target = GraftShim.ofRows(spark, table)
    val matched = condition
      .map(c => target.filter(GraftShim.column(c))).getOrElse(target)
    val updated = matched.select(attrs.map { a =>
      byId.get(a.exprId)
        .map(GraftDml.valueFor(a, _))
        .getOrElse(GraftShim.column(a))
        .as(a.name)
    }: _*)
      // MATERIALIZE the change set once (Delta's materializeSource
      // move): the commit protocol evaluates its input several times
      // (bucket counts, the anti-join, the staged write), and each
      // evaluation would otherwise re-run the full find scan
      .localCheckpoint()
    try {
      // UPDATE's change set is exactly upsertDV's shape: new images of
      // existing rows, table schema, no tombstones — merge-on-read
      // lands it without rewriting a file when the session opts in
      if (GraftDml.mergeOnRead(spark) &&
          GraftDml.morEligible(graft.schema()))
        Merge.upsertDVGrid(spark, graft.path, updated)
      else Merge.upsertGrid(spark, graft.path, updated)
    } finally GraftShim.unpinLocalCheckpoint(updated)
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON ... WHEN ...` — the full three-branch
  * statement folded into ONE commit: matched updates/deletes,
  * not-matched inserts, and not-matched-by-source updates/deletes
  * land together through [[Merge.upsert]]'s tombstone dialect
  * (updates+inserts as images, deletes as tombstoned keys), so a
  * reader sees the whole MERGE or none of it.
  */
case class GraftMergeCommand(m: MergeIntoTable, graft: GraftTable)
    extends LeafRunnableCommand
    with org.apache.spark.sql.catalyst.plans.logical.SupportsSubquery {

  private val DEL = "__graft_merge_del"
  private val KCH = "__graft_key_changed"

  /** First-match-wins fold of one branch's WHEN clauses, expressed as
    * COLUMNS over the single joined frame (see run): the branch's
    * applicability predicate (action conditions are 3VL — null means
    * not applicable), every target column's change image, the
    * tombstone flag set by the winning clause's kind, and a
    * key-identity flag — true when an UPDATE image carries a key
    * different from the row's own (only a star expansion can express
    * that; it is checked and refused at runtime). Rows no clause
    * claims are dropped by the caller — the statement's explicit
    * no-ops.
    */
  private case class BranchCols(applies: Column, images: Seq[Column],
      del: Column, keyChanged: Column)

  private def branchCols(actions: Seq[MergeAction],
      attrs: Seq[Attribute], keyAttrs: Seq[Attribute],
      insertBranch: Boolean): BranchCols = {
    val applies = {
      val raw = actions.map(_.condition
        .map(c => coalesce(GraftShim.column(c), lit(false)))
        .getOrElse(lit(true)))
      raw.zipWithIndex.map { case (p, i) =>
        raw.take(i).foldLeft(p)((acc, prev) => acc && !prev)
      }
    }
    def image(action: MergeAction, a: Attribute): Column = action match {
      case UpdateAction(_, as, _) =>
        GraftDml.assignmentMap(as).get(a.exprId)
          .map(GraftDml.valueFor(a, _)).getOrElse(GraftShim.column(a))
      case _: DeleteAction => GraftShim.column(a)
      case InsertAction(_, as) =>
        GraftDml.assignmentMap(as).get(a.exprId)
          .map(GraftDml.valueFor(a, _))
          .getOrElse(lit(null).cast(a.dataType))
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }
    def fold(values: Seq[Column], fallback: Column): Column =
      applies.zip(values).tail
        .foldLeft(when(applies.head, values.head)) {
          case (acc, (p, v)) => acc.when(p, v)
        }.otherwise(fallback)
    val unaliased = attrs.map { a =>
      fold(actions.map(image(_, a)),
        if (insertBranch) lit(null).cast(a.dataType)
        else GraftShim.column(a))
    }
    val delFlag = fold(
      actions.map(a => lit(a.isInstanceOf[DeleteAction])), lit(false))
    val keyChanged =
      if (insertBranch) lit(false)
      else keyAttrs.map(ka =>
        !(unaliased(attrs.indexOf(ka)) <=> GraftShim.column(ka)))
        .reduceLeft(_ || _)
    BranchCols(applies.reduceLeft(_ || _), unaliased, delFlag, keyChanged)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    // WITH SCHEMA EVOLUTION arrives here AFTER the analyzer applied the
    // schema changes (see GraftDmlRule's needSchemaEvolution guard) —
    // the target attributes already carry the evolved shape, so the
    // command itself is evolution-agnostic
    val keyCols = GraftDml.keyColsOf(spark, graft)
    val tAttrs = m.targetTable.output
    val keyAttrs = keyCols.map(kc =>
      tAttrs.find(_.name == kc).getOrElse(
        throw new IllegalStateException(
          s"target resolution lost the key column '$kc'")))
    // an EXPLICIT `UPDATE SET key = ...` is refused statically; a star
    // expansion (`UPDATE SET *`) assigns the key by construction and is
    // allowed, guarded at runtime — the assigned key must equal the
    // row's own (always true when ON is key-equality)
    (m.matchedActions ++ m.notMatchedBySourceActions).foreach {
      case UpdateAction(_, as, fromStar) if !fromStar =>
        keyAttrs.foreach(ka =>
          require(!GraftDml.assignmentMap(as).contains(ka.exprId),
            s"MERGE UPDATE of the key column '${ka.name}' is refused " +
            "— express a key change as DELETE + INSERT"))
      case _ => ()
    }
    m.notMatchedActions.foreach {
      case InsertAction(_, as) =>
        keyAttrs.foreach(ka =>
          require(GraftDml.assignmentMap(as).contains(ka.exprId),
            s"MERGE INSERT must assign the key column '${ka.name}'"))
      case other => throw new UnsupportedOperationException(
        s"unsupported NOT MATCHED action: $other")
    }

    val target = GraftShim.ofRows(spark, m.targetTable)
    val source = GraftShim.ofRows(spark, m.sourceTable)
    val cond = GraftShim.column(m.mergeCondition)

    // ONE join instead of three (inner + two antis): the joined frame
    // partitions into matched (both sides present), not-matched
    // (source-only) and not-matched-by-source (target-only) rows, told
    // apart by null-safe presence markers — so the target is scanned
    // and joined ONCE however many branches the statement has (the
    // Delta single-pass writeAllChanges shape; a union of per-branch
    // joins would re-evaluate the target scan per branch, since Spark
    // does not share common subtrees across union arms). The join
    // type keeps only the row classes some branch consumes.
    val hasM = m.matchedActions.nonEmpty
    val hasI = m.notMatchedActions.nonEmpty
    val hasN = m.notMatchedBySourceActions.nonEmpty
    if (!hasM && !hasI && !hasN) return Seq.empty
    val TP = "__graft_t_present"
    val SP = "__graft_s_present"
    val joinType =
      if (hasI && hasN) "full_outer"
      else if (hasI) "right_outer"
      else if (hasN) "left_outer"
      else "inner"
    val joined = target.withColumn(TP, lit(true))
      .join(source.withColumn(SP, lit(true)), cond, joinType)
    val tPresent = coalesce(col(TP), lit(false))
    val sPresent = coalesce(col(SP), lit(false))
    val parts: Seq[(Column, BranchCols)] = Seq(
      (hasM, tPresent && sPresent, m.matchedActions, false),
      (hasI, !tPresent, m.notMatchedActions, true),
      (hasN, !sPresent, m.notMatchedBySourceActions, false))
      .collect { case (true, pc, acts, ins) =>
        (pc, branchCols(acts, tAttrs, keyAttrs, insertBranch = ins))
      }
    val applies = parts.map { case (pc, b) => pc && b.applies }
      .reduceLeft(_ || _)
    // branch conditions are mutually exclusive and rows are filtered
    // to `applies`, so the when-chain needs no otherwise
    def foldParts(sel: BranchCols => Column): Column =
      parts.tail.foldLeft(
        when(parts.head._1 && parts.head._2.applies,
          sel(parts.head._2))) {
        case (acc, (pc, b)) => acc.when(pc && b.applies, sel(b))
      }

    // MATERIALIZE the change set once (Delta's materializeSource
    // move). A lazy persist is NOT enough: the guards' limit(1) only
    // computes a partition or two, so the cardinality check and the
    // commit protocol (which evaluates its input several times) would
    // each re-run the join-heavy change plan against the full table.
    val changes = joined.filter(applies).select(
      tAttrs.zipWithIndex.map { case (a, i) =>
        foldParts(_.images(i)).as(a.name)
      } :+ foldParts(_.del).as(DEL) :+ foldParts(_.keyChanged).as(KCH): _*)
      .localCheckpoint()
    try {
      val kch = changes.filter(col(KCH)).limit(1).collect()
      require(kch.isEmpty,
        s"MERGE UPDATE SET * changed a key column " +
        s"(${keyCols.mkString(", ")}) for target key " +
        s"${kch.headOption.map(_.get(0)).orNull} — the key " +
        "is the row's identity; express a key change as DELETE + INSERT")
      val dup = changes.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"MERGE modifies target key ${dup.headOption.map(_.get(0)).orNull} " +
        "more than once (multiple source rows matched one target row, " +
        "or an INSERT collides with an updated key) — deduplicate the " +
        "source or tighten the ON condition")
      // the full three-branch statement is upsertDV's shape since
      // tombstones landed there (r17): updates + inserts append,
      // deletes are DV positions with no appended image — so the
      // merge-on-read session opt-in lands ANY concrete MERGE with
      // every pre-existing data file byte-untouched
      if (GraftDml.mergeOnRead(spark) &&
          GraftDml.morEligible(graft.schema()))
        Merge.upsertDVGrid(spark, graft.path, changes.drop(KCH),
          tombstoneCol = Some(DEL))
      else
        Merge.upsertGrid(spark, graft.path, changes.drop(KCH),
          tombstoneCol = Some(DEL))
    } finally GraftShim.unpinLocalCheckpoint(changes)
    Seq.empty
  }
}
