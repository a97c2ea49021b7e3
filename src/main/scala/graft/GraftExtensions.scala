package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MultiContains

/** Oracle-cost-aware conjunct ordering (SURVEY §4 "cost-class filter
  * reordering", Semantic-OLAP Exection_Agent.py:54-60,105-113, recast as a
  * Catalyst rule).
  *
  * Catalyst reorders and pushes predicates structurally but treats every
  * conjunct as equally cheap; a Scala-UDF oracle judge on the left of a
  * codegen'd keyword predicate would run for every row even though `And`
  * short-circuits. This rule stable-sorts the conjuncts of every Filter by
  * cost class — plain comparisons (0) < regex/collection scans (1) <
  * Scala UDFs, i.e. semantic-oracle calls (2) — so whole-stage codegen's
  * left-to-right evaluation gives the reference's cheap-first cascade for
  * free, including for user-composed `df.filter(expensive && cheap)` the
  * engine's own cascade builder never sees.
  *
  * Runs in the user-provided optimizer batch (after predicate pushdown has
  * settled). Filters with any nondeterministic conjunct are left untouched
  * (reordering those would change semantics).
  */
object OracleCostReorder extends Rule[LogicalPlan] with PredicateHelper {

  private def cost(e: Expression): Int =
    if (e.exists(_.isInstanceOf[ScalaUDF])) 2
    else if (e.exists {
      case _: RLike | _: Like | _: RegExpExtract | _: In | _: InSet |
           _: Contains | _: StartsWith | _: EndsWith | _: MultiContains => true
      case _ => false
    }) 1
    else 0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.length < 2 || conjuncts.exists(!_.deterministic)) f
      else {
        val sorted = conjuncts.sortBy(cost) // stable: ties keep plan order
        if (sorted == conjuncts) f else Filter(sorted.reduceLeft(And), child)
      }
  }
}

/** Edit-distance pruning: for every `levenshtein(a, b) <= k` (or `< k`)
  * conjunct in a Filter, prepend the guard
  * `abs(length(a) - length(b)) <= k` — the length gap is a LOWER BOUND on
  * edit distance, so the guard can only remove rows the DP would reject
  * anyway, and `And` short-circuits the O(|a|·|b|) kernel off for them.
  * On a fuzzy-match scan at 100 TB the cheap codegen'd guard prunes the
  * overwhelming majority of rows (everything whose length is not even
  * close) before any quadratic work happens.
  *
  * Idempotent by construction: the guard is only added when no
  * semantically-equal conjunct is already present, so the optimizer's
  * fixpoint loop converges after one rewrite. Nondeterministic
  * thresholds are left untouched (the guard would double-evaluate them).
  */
object LevenshteinPrune extends Rule[LogicalPlan] with PredicateHelper {

  /** (left, right, threshold, strict) when the conjunct is a
    * levenshtein-below-threshold comparison in either orientation.
    */
  private def levBound(e: Expression):
      Option[(Expression, Expression, Expression, Boolean)] = e match {
    case LessThanOrEqual(l: Levenshtein, k) => Some((l.left, l.right, k, false))
    case LessThan(l: Levenshtein, k)        => Some((l.left, l.right, k, true))
    case GreaterThanOrEqual(k, l: Levenshtein) => Some((l.left, l.right, k, false))
    case GreaterThan(k, l: Levenshtein)        => Some((l.left, l.right, k, true))
    case _ => None
  }

  /** `length(e)`, pre-folded for literal operands: ConstantFolding would
    * fold it anyway on the next optimizer pass, and the guard must come
    * out ALREADY in its folded form or the fixpoint loop's semantic-
    * duplicate check misses it and stacks a second guard.
    */
  private def lenOf(e: Expression): Expression = {
    val l = Length(e)
    if (e.foldable) Literal.create(l.eval(), l.dataType) else l
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap(levBound).collect {
        case (a, b, k, strict) if a.deterministic && b.deterministic &&
            k.deterministic =>
          val gap = Abs(Subtract(lenOf(a), lenOf(b)))
          if (strict) LessThan(gap, k): Expression
          else LessThanOrEqual(gap, k): Expression
      }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduceLeft(And), child)
  }
}

/** Session extension entry point:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Injects [[LevenshteinPrune]] and [[OracleCostReorder]] and registers
  * the engine's pure-column kernels for SQL use, so a `spark.sql`-only
  * session reaches the pipeline surface without touching the Scala API:
  *
  *   - `multi_contains(text, array('k1','k2'), 'all'|'any'|'none')` —
  *     codegen'd multi-keyword predicate
  *   - `vector_dot(a, b)` — the native ANN dot-product kernel
  *   - `graft_token_count(text)` / `graft_subword_count(text)`
  *   - `graft_quality_score(text)` — the composite quality signal
  *   - `graft_lang_id(text)` — marker-based language guess
  *   - `graft_fingerprint(text)` — normalized-content hash
  *   - `graft_hash_bucket(key, 'salt')` — the deterministic md5 split
  *     bucket in [0,100) (sampling/train-test splits)
  *   - `graft_word_shingles(text, n)` — word n-gram shingles (dedup/
  *     decontamination's unit of comparison)
  *
  * Each builder delegates to the SAME Column-level implementation the
  * DataFrame API uses (via the [[org.apache.spark.sql.GraftColumnBridge]]
  * accessibility shim), so SQL and Scala results can never drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def stringLits(e: Expression, what: String): Seq[String] = e match {
    case CreateArray(items, _) => items.map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be an array of string literals, got $other")
    }
    case Literal(data, _) if data != null =>
      e.dataType match {
        case t: org.apache.spark.sql.types.ArrayType if t.elementType == StringType =>
          data.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toArray[UTF8String](StringType).map(_.toString).toSeq
        case _ => throw new IllegalArgumentException(
          s"$what must be an array of string literals")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be an array of string literals, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // prune FIRST, then cost-reorder (the guard is a cost-0 comparison,
    // so the reorder keeps it left of the quadratic kernel)
    ext.injectOptimizerRule(_ => LevenshteinPrune)
    ext.injectOptimizerRule(_ => OracleCostReorder)
    // SQL UPDATE / MERGE INTO on graft tables (Delta's analysis-rule
    // doorway): resolved statements become one-commit Merge upserts
    ext.injectResolutionRule(_ => graft.sources.v2.GraftDmlRule)
    // SPJ ordering repair: restores partition-local Sorts over a graft
    // bucket scan whose join-time gcd reduction broke its key-sorted
    // claim — which lets equal-count joins KEEP the sort-free zipper
    // when allowCompatibleTransforms is on (the scan checks this rule
    // is installed before claiming). A columnar rule so it runs after
    // EnsureRequirements in both AQE and non-AQE preparations.
    ext.injectColumnar(_ =>
      new org.apache.spark.sql.execution.ColumnarRule {
        override def preColumnarTransitions
            : org.apache.spark.sql.catalyst.rules.Rule[
              org.apache.spark.sql.execution.SparkPlan] =
          graft.sources.v2.GraftSpjSortRestore
      })
    ext.injectFunction((
      new FunctionIdentifier("multi_contains"),
      new ExpressionInfo(classOf[MultiContains].getName, "multi_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "usage: multi_contains(text, array(keywords...), 'all'|'any'|'none')")
        val mode = children(2) match {
          case Literal(s: UTF8String, StringType) => s.toString.toLowerCase
          case other => throw new IllegalArgumentException(
            s"mode must be a string literal, got $other")
        }
        val (any, negate) = mode match {
          case "all" => (false, false)
          case "any" => (true, false)
          case "none" => (true, true)
          case m => throw new IllegalArgumentException(
            s"mode must be 'all', 'any' or 'none', got '$m'")
        }
        MultiContains(children.head, stringLits(children(1), "keywords"),
          matchAny = any, negate = negate)
      }))

    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    def registerColumnFn(name: String, arity: Int,
        build: Seq[Expression] => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (children: Seq[Expression]) => {
          require(children.size == arity,
            s"$name takes $arity argument(s), got ${children.size}")
          expression(build(children))
        }))
    def strLit(e: Expression, what: String): String = e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(n: Int, org.apache.spark.sql.types.IntegerType) => n
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

    // the native codegen dot-product kernel (ANN hot path) — direct
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[graft.functions.VectorDot].getName,
        "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: vector_dot(a, b)")
        graft.functions.VectorDot(children.head, children(1))
      }))
    // text-analysis kernels: same Column code the DataFrame surface runs
    registerColumnFn("graft_token_count", 1,
      c => graft.pipeline.TextAnalysis.tokenCount(column(c.head)))
    registerColumnFn("graft_chunk_tokens", 3,
      c => graft.pipeline.TextAnalysis.chunkTokens(column(c.head),
        intLit(c(1), "window"), intLit(c(2), "stride")))
    registerColumnFn("graft_chunk_spans", 3,
      c => graft.pipeline.TextAnalysis.chunkTokensWithSpans(
        column(c.head), intLit(c(1), "window"), intLit(c(2), "stride")))
    registerColumnFn("graft_subword_count", 1,
      c => graft.pipeline.TextAnalysis.subwordCount(column(c.head)))
    registerColumnFn("graft_quality_score", 1,
      c => graft.pipeline.TextAnalysis.qualityScore(column(c.head)))
    registerColumnFn("graft_lang_id", 1,
      c => graft.pipeline.TextAnalysis.langId(column(c.head)))
    registerColumnFn("graft_fingerprint", 1,
      c => graft.pipeline.TextAnalysis.fingerprint(column(c.head)))
    registerColumnFn("graft_hash_bucket", 2,
      c => graft.pipeline.Sampling.hashBucket(column(c.head),
        strLit(c(1), "salt")))
    registerColumnFn("graft_word_shingles", 2,
      c => graft.pipeline.Shingles.wordShingles(column(c.head),
        intLit(c(1), "n")))
    registerColumnFn("graft_url_domain", 1,
      c => graft.pipeline.TextAnalysis.urlDomain(column(c.head)))

    // TABLE-VALUED functions: the lakehouse from a pure-SQL session.
    // The builder returns the SAME analyzed plan the Scala API builds
    // (manifest-pruned file set, version resolution, CDF bucket
    // pruning) — FROM graft_table('/p') is readKeyed, not a re-
    // implementation. Literal-only args: these resolve at analysis
    // time, before any row exists to evaluate an expression against.
    def longLit(e: Expression, what: String): Long = e match {
      case Literal(n: Int, org.apache.spark.sql.types.IntegerType) =>
        n.toLong
      case Literal(n: Long, org.apache.spark.sql.types.LongType) => n
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    def registerTableFn(name: String, usage: String,
        build: Seq[Expression] => org.apache.spark.sql.DataFrame)
        : Unit =
      ext.injectTableFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (children: Seq[Expression]) =>
          try build(children).queryExecution.logical
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(s"$usage — ${e.getMessage}")
          }))
    registerTableFn("graft_table", "usage: graft_table('path')", c => {
      require(c.size == 1, "takes 1 argument")
      graft.sources.Merge.readKeyed(
        org.apache.spark.sql.SparkSession.active, strLit(c.head, "path"))
    })
    registerTableFn("graft_table_version",
      "usage: graft_table_version('path', v)", c => {
        require(c.size == 2, "takes 2 arguments")
        graft.sources.Merge.readVersion(
          org.apache.spark.sql.SparkSession.active,
          strLit(c.head, "path"), longLit(c(1), "version"))
      })
    registerTableFn("graft_table_asof",
      "usage: graft_table_asof('path', epochMillis)", c => {
        require(c.size == 2, "takes 2 arguments")
        graft.sources.Merge.readAsOf(
          org.apache.spark.sql.SparkSession.active,
          strLit(c.head, "path"), longLit(c(1), "epochMillis"))
      })
    registerTableFn("graft_table_where",
      "usage: graft_table_where('path', 'sql predicate')", c => {
        require(c.size == 2, "takes 2 arguments")
        val s = org.apache.spark.sql.SparkSession.active
        // parse the predicate with the session's own SQL parser, then
        // run it through the SAME bounds-extraction read the Scala API
        // uses — a SQL session gets manifest-stats pruning, not just
        // parquet-footer pushdown
        val pred = column(s.sessionState.sqlParser
          .parseExpression(strLit(c(1), "predicate")))
        graft.sources.Merge.readKeyedWhere(s, strLit(c.head, "path"), pred)
      })
    registerTableFn("graft_table_tag",
      "usage: graft_table_tag('path', 'tag')", c => {
        require(c.size == 2, "takes 2 arguments")
        graft.sources.Merge.readTag(
          org.apache.spark.sql.SparkSession.active,
          strLit(c.head, "path"), strLit(c(1), "tag"))
      })
    registerTableFn("graft_tags", "usage: graft_tags('path')", c => {
      require(c.size == 1, "takes 1 argument")
      graft.sources.Merge.tags(
        org.apache.spark.sql.SparkSession.active, strLit(c.head, "path"))
    })
    registerTableFn("graft_history", "usage: graft_history('path')", c => {
      require(c.size == 1, "takes 1 argument")
      graft.sources.Merge.history(
        org.apache.spark.sql.SparkSession.active, strLit(c.head, "path"))
    })
    registerTableFn("graft_files", "usage: graft_files('path')", c => {
      require(c.size == 1, "takes 1 argument")
      graft.sources.Merge.filesInfo(
        org.apache.spark.sql.SparkSession.active, strLit(c.head, "path"))
    })
    registerTableFn("graft_changes",
      "usage: graft_changes('path', fromV, toV)", c => {
        require(c.size == 3, "takes 3 arguments")
        graft.sources.Merge.changesBetween(
          org.apache.spark.sql.SparkSession.active,
          strLit(c.head, "path"), longLit(c(1), "fromVersion"),
          longLit(c(2), "toVersion"))
      })
    // Delta's `table_changes(...)` dialect from pure SQL: per-commit
    // resolution with _change_type in {insert, update_preimage,
    // update_postimage, delete}, _commit_version, _commit_timestamp —
    // consumers written against Delta CDF port without translation
    registerTableFn("graft_table_changes",
      "usage: graft_table_changes('path', fromV, toV)", c => {
        require(c.size == 3, "takes 3 arguments")
        graft.sources.Merge.changesBetweenCdf(
          org.apache.spark.sql.SparkSession.active,
          strLit(c.head, "path"), longLit(c(1), "fromVersion"),
          longLit(c(2), "toVersion"))
      })
    // COPY INTO observability: the source files every retained commit
    // already loaded (the idempotence set a sweep subtracts)
    registerTableFn("graft_ingested",
      "usage: graft_ingested('path')", c => {
        require(c.size == 1, "takes 1 argument")
        val s = org.apache.spark.sql.SparkSession.active
        import s.implicits._
        graft.sources.Merge.ingestedFiles(s,
          strLit(c.head, "path")).toSeq.sorted.toDF("source_file")
      })
    // multi-table catalog reads: every graft_catalog_table() call in one
    // statement that names the same catalog resolves its OWN latest
    // state — for a guaranteed single snapshot across members, pin the
    // catalog version explicitly with graft_catalog_table_at
    registerTableFn("graft_catalog_table",
      "usage: graft_catalog_table('catRoot', 'table')", c => {
        require(c.size == 2, "takes 2 arguments")
        graft.sources.TableCatalog.readTable(
          org.apache.spark.sql.SparkSession.active,
          strLit(c.head, "catRoot"), strLit(c(1), "table"))
      })
    registerTableFn("graft_catalog_table_at",
      "usage: graft_catalog_table_at('catRoot', 'table', catVersion)", c => {
        require(c.size == 3, "takes 3 arguments")
        val s = org.apache.spark.sql.SparkSession.active
        val root = strLit(c.head, "catRoot")
        graft.sources.TableCatalog.readTable(s, root, strLit(c(1), "table"),
          Some(graft.sources.TableCatalog.stateAt(s, root,
            longLit(c(2), "catVersion"))))
      })
    registerTableFn("graft_catalog_history",
      "usage: graft_catalog_history('catRoot')", c => {
        require(c.size == 1, "takes 1 argument")
        graft.sources.TableCatalog.history(
          org.apache.spark.sql.SparkSession.active, strLit(c.head, "catRoot"))
      })
    // ANN from pure SQL: probe a persisted IVF-PQ index with the
    // queries in a view/table (or a parquet path) — the partition-
    // pruned probe the Scala API runs, so a SQL session gets top-k
    // similarity search without touching the pipeline API:
    //   SELECT * FROM graft_ann_topk('/idx', 'queries_view',
    //                                'qid', 'embedding', 10, 2)
    // Near-duplicate discovery from pure SQL: MinHash-LSH candidate
    // pairs over a view/table (or parquet path) — banded bucketing,
    // never all-pairs, exactly the Scala kernel. threshold_pct is an
    // integer percent (TVF arguments are literals):
    //   SELECT * FROM graft_dedup_pairs('docs_view', 'doc_id', 'text', 80)
    registerTableFn("graft_dedup_pairs",
      "usage: graft_dedup_pairs('viewOrPath', 'idCol', 'textCol', " +
      "thresholdPct)", c => {
        require(c.size == 4, "takes 4 arguments")
        val s = org.apache.spark.sql.SparkSession.active
        val src = strLit(c.head, "source")
        val df = try s.table(src)
          catch { case _: Exception => s.read.parquet(src) }
        val pct = intLit(c(3), "thresholdPct")
        require(pct > 0 && pct <= 100,
          s"thresholdPct must be in (0, 100], got $pct")
        graft.pipeline.Dedup.minhashCandidates(df,
          strLit(c(1), "idCol"),
          org.apache.spark.sql.functions.col(strLit(c(2), "textCol")),
          threshold = pct / 100.0)
      })
    // Model-based quality scoring from pure SQL: load a TRAINED
    // quality classifier (QualityModel.save's one-file weight table)
    // and append its P(keep) score — the source columns ride through:
    //   SELECT * FROM graft_model_score('/models/q', 'docs_view', 'text')
    registerTableFn("graft_model_score",
      "usage: graft_model_score('modelPath', 'viewOrPath', 'textCol')",
      c => {
        require(c.size == 3, "takes 3 arguments")
        val s = org.apache.spark.sql.SparkSession.active
        val m = graft.pipeline.QualityModel.load(s,
          strLit(c.head, "modelPath"))
        val src = strLit(c(1), "source")
        val df = try s.table(src)
          catch { case _: Exception => s.read.parquet(src) }
        df.withColumn("quality_score",
          graft.pipeline.QualityModel.scoreCol(m,
            org.apache.spark.sql.functions.col(strLit(c(2), "textCol"))))
      })
    // the per-domain cap from pure SQL:
    //   SELECT * FROM graft_cap_per_group('docs', 'domain', 'q', 'id', 5)
    registerTableFn("graft_cap_per_group",
      "usage: graft_cap_per_group('viewOrPath', 'groupCol', " +
      "'scoreCol', 'idCol', n)",
      c => {
        require(c.size == 5, "takes 5 arguments")
        val s = org.apache.spark.sql.SparkSession.active
        val src = strLit(c.head, "source")
        val df = try s.table(src)
          catch { case _: Exception => s.read.parquet(src) }
        graft.pipeline.Sampling.capPerGroup(df,
          strLit(c(1), "groupCol"),
          org.apache.spark.sql.functions.col(strLit(c(2), "scoreCol")),
          strLit(c(3), "idCol"), intLit(c(4), "n"))
      })
    registerTableFn("graft_ann_topk",
      "usage: graft_ann_topk('indexPath', 'queriesViewOrPath', " +
      "'qidCol', 'vecCol', k, nProbe [, 'allowedViewOrPath'])", c => {
        require(c.size == 6 || c.size == 7, "takes 6 or 7 arguments")
        val s = org.apache.spark.sql.SparkSession.active
        def frame(src: String) =
          try s.table(src)
          catch { case _: Exception => s.read.parquet(src) }
        // optional 7th arg: FILTERED search — a view/table/path whose
        // FIRST column is the allowed neighbor-id set (selective
        // filters want a higher nProbe; see IvfIndex.topK)
        graft.pipeline.Similarity.IvfPq.topKPersisted(s,
          strLit(c.head, "indexPath"), frame(strLit(c(1), "queries")),
          strLit(c(2), "qidCol"), strLit(c(3), "vecCol"),
          intLit(c(4), "k"), intLit(c(5), "nProbe"),
          allowed = c.drop(6).headOption
            .map(a => frame(strLit(a, "allowed"))))
      })
  }
}
