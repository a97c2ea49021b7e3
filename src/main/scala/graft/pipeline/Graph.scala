package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._

/** Bounded-iteration graph analytics on edge lists — PageRank as the
  * representative "propagate along edges until done" workload (entity
  * importance over citation/link/interaction graphs in a data pipeline).
  *
  * Batch formulation: ranks are (node, double) rows; each round shuffles
  * contributions by destination (one equi-join rank⋈edges + one hash
  * aggregate — the same two-shuffle round as the connected-components
  * operator in Dedup). Iteration count is FIXED by the caller: bounded
  * work, deterministic result, no driver-side convergence polling in the
  * hot path. Out-degrees ride IN the node/rank table (computed once in the
  * same aggregate that discovers the node set), so the per-round join is
  * edges⋈ranks directly — no separate degree-annotated edge copy to build
  * or store.
  *
  * LINEAGE: each round's plan otherwise contains every prior round's, so
  * at the 20-50 iterations real graphs need, optimizer time and plan size
  * blow up and a lost executor recomputes the whole chain. `checkpointEvery`
  * truncates the chain every k rounds (the `Dedup.duplicateClusters`
  * pattern): `localCheckpoint` by default — fast, dies with an executor —
  * or a reliable `checkpointDir` that survives one.
  *
  * Numeric note: ranks are IEEE doubles and additions reorder across
  * engines/partitionings, so cross-engine compares must round (the gate
  * rounds to 3 decimals — ~1e-13 accumulated reorder error vs 5e-4
  * rounding granularity). The non-normalized variant: rank =
  * (1-d) + d * Σ in-contributions. Dangling-node mass (nodes with no
  * out-edges lose their rank each round in the classic simplification) is
  * redistributed uniformly when `redistributeDangling` is set:
  * rank = (1-d) + d * (Σ in-contributions + danglingMass / N).
  */
object Graph {

  /** PageRank over directed edges (srcCol -> dstCol), `iters` rounds.
    * Returns (node, rank). Self-loops and duplicate edges count as given;
    * dedupe upstream if unwanted.
    *
    * @param redistributeDangling spread the rank mass sitting on
    *   sink nodes uniformly over all nodes each round (one bounded
    *   aggregate producing a driver scalar). Implies per-round rank
    *   materialization — the scalar forces a full evaluation each round
    *   anyway, so materializing makes every round execute exactly once.
    * @param checkpointEvery truncate rank lineage every k rounds in the
    *   pure-contribution path (0 = never — fine for small iters, wrong
    *   at depth)
    * @param checkpointDir reliable checkpoint directory; None uses
    *   `localCheckpoint` (faster, not executor-loss-safe)
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      redistributeDangling: Boolean = false,
      checkpointEvery: Int = 0,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach { dir =>
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
    }
    // round-invariant inputs: when iterating deep (checkpointEvery on),
    // materialize them ONCE instead of re-deriving the scan+join subtree
    // every round — localCheckpoint spills to executor disk, so this is
    // "cache the edge list for the iteration", not a driver collect.
    val iterating = checkpointEvery > 0 || redistributeDangling
    def pin(df: DataFrame): DataFrame =
      if (iterating) {
        if (checkpointDir.isDefined) df.checkpoint(true)
        else df.localCheckpoint(true)
      } else df
    // the edge list is pinned PRE-PARTITIONED AND PRE-SORTED BY src
    // (localCheckpoint's LogicalRDD preserves both) so every round's
    // contribution merge join reads co-located, already-ordered edges:
    // no re-shuffle AND no re-sort of the (much larger) edge side, ever
    // — only the node-sized rank table moves per round. Sort-once,
    // merge-every-round is the shape that survives a 100× scale-up.
    // When the caller's edges already arrive hash-partitioned by src
    // (e.g. `repartition(col(src))` placed BEFORE an upstream distinct,
    // whose clustering the src partitioning satisfies), the extra
    // exchange is skipped — detected from the planned input, not trusted
    // from a flag.
    val eRaw = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    def alreadyBySrc: Boolean =
      eRaw.queryExecution.executedPlan.outputPartitioning match {
        case h: HashPartitioning => h.expressions.nonEmpty &&
          h.expressions.forall {
            case a: Attribute => a.name == "src"
            case _ => false
          }
        case _ => false
      }
    val e = pin(if (iterating) {
      val placed = if (alreadyBySrc) eRaw else eRaw.repartition(col("src"))
      placed.sortWithinPartitions("src")
    } else eRaw)
    // the node table — node set, out-degree (duplicate edges count, as
    // documented), and has-out-edge flag — from ONE aggregate over the
    // pinned edges: src rows contribute 1 to the degree, dst rows 0.
    // Pinned node-sorted for the same reason as the edges. The per-round
    // dangling mass is then a FILTER + global agg over the
    // already-materialized ranks — no join in the scalar's path.
    val nodesF = pin(
      e.select(col("src").as("node"), lit(1L).as("f"))
        .union(e.select(col("dst").as("node"), lit(0L).as("f")))
        .groupBy("node")
        .agg(sum("f").as("__deg"), (sum(col("f")) > 0).as("__has_out"))
        .sortWithinPartitions("node"))
    // one setup job yields BOTH the node count and the initial dangling
    // mass (every rank starts at 1.0, so round 1's dangling mass is just
    // the dangling-node count — no separate first-round scalar job)
    val (nNodes, dangling0) =
      if (redistributeDangling) {
        val r = nodesF.agg(count(lit(1)).as("n"),
          coalesce(sum(when(!col("__has_out"), 1.0).otherwise(0.0)), lit(0.0))
            .as("d")).head()
        (r.getLong(0).toDouble, r.getDouble(1))
      } else (0.0, 0.0)
    // INVARIANT: every materialized rank table stays hash(node)-
    // partitioned and node-sorted (checkpoint preserves both, and both
    // survive the round's alias node→src), so each round's two merge
    // joins are exchange-free AND sort-free on every pre-pinned side —
    // the only per-round exchange is the map-side-combined contribution
    // aggregation, and the only per-round sort is its node-sized output.
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    // LAZY pin: the checkpoint computes (and caches) when the FIRST
    // action touches it — redistribute mode makes that action the next
    // round's dangling-mass scalar, so each round is exactly ONE job
    // that both materializes the round's ranks and returns the scalar
    // the round after needs (the eager form ran a separate tiny agg job
    // per round — pure scheduling overhead at 10-50 iterations).
    def materializeLazy(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(false)
      else df.localCheckpoint(false)
    // redistribute mode materializes the rank table EVERY round: the
    // dangling scalar forces a full evaluation per round anyway (GraphX
    // pays the same — its per-iteration graph is materialized). The
    // scalar is a driver double folded into the next round as a
    // codegen-stable literal, keeping each round's plan a join + one
    // aggregate with no broadcast exchange to build.
    var ranks = nodesF.withColumn("rank", lit(1.0))
    var dmassNext = dangling0
    // once round i's table is MATERIALIZED, round i-1's checkpoint
    // blocks are dead (only the newest table feeds the next round) —
    // release them then instead of pinning every round's node table
    // until GC. The LAST round's frame is lazy (the caller's terminal
    // action materializes it), so its input — the previous round's
    // table — must stay pinned; it and the round-invariant e/nodesF
    // pins are the only blocks that outlive the loop.
    var prevPinned: DataFrame = null
    def supersede(now: DataFrame): Unit = {
      if (prevPinned != null)
        org.apache.spark.sql.GraftShim.unpinLocalCheckpoint(prevPinned)
      prevPinned = now
    }
    for (i <- 1 to iters) {
      ranks =
        if (redistributeDangling) {
          val next = materializeLazy(redistributeRound(e, nodesF, ranks,
            damping, dmassNext / nNodes))
          // the ONE action of round i: materializes `next` and hands
          // round i+1 its scalar. The last round skips it — the
          // caller's own terminal action materializes a one-round-deep
          // plan over pinned inputs.
          if (i < iters) {
            dmassNext = next.filter(!col("__has_out"))
              .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
            supersede(next)
          }
          next
        } else {
          val next = plainRound(e, nodesF, ranks, damping)
          if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
            val m = materialize(next)
            supersede(m)
            m
          } else next
        }
    }
    ranks.select("node", "rank")
  }

  /** In-contribution per node: each edge row sends rank(src)/deg(src) to
    * its dst. Degrees ride in the rank table, so this is the round's only
    * edge-sized work: one join on the src-partitioned pinned edges + one
    * partial-aggregated shuffle of node-sized output. Dangling nodes have
    * deg 0 but never appear as src, so no division by zero arises.
    */
  private def contributions(e: DataFrame, ranks: DataFrame): DataFrame =
    e.join(ranks.select(col("node").as("src"), col("__deg"), col("rank")),
        "src")
      .select(col("dst").as("node"), (col("rank") / col("__deg")).as("c"))
      .groupBy("node").agg(sum("c").as("contrib"))

  private[pipeline] def plainRound(e: DataFrame, nodesF: DataFrame,
      ranks: DataFrame, damping: Double): DataFrame =
    nodesF.join(contributions(e, ranks), Seq("node"), "left")
      .select(col("node"), col("__deg"), col("__has_out"),
        (lit(1.0 - damping) +
          lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))

  /** One redistribute-mode round over MATERIALIZED inputs. The dangling
    * mass arrives pre-collected (`dmassPerNode` = danglingMass / N — a
    * tiny driver scalar over the materialized previous ranks) as a
    * codegen-stable scalar, so every round generates byte-identical code
    * (Janino cache hit from round 2 on) and the round's plan is exactly
    * one node-sized shuffle (the contribution aggregation) — no
    * broadcast exchange, no cross join — pinned in GraphSpec.
    */
  private[pipeline] def redistributeRound(e: DataFrame, nodesF: DataFrame,
      ranks: DataFrame, damping: Double, dmassPerNode: Double): DataFrame =
    nodesF.join(contributions(e, ranks), Seq("node"), "left")
      .select(col("node"), col("__deg"), col("__has_out"),
        (lit(1.0 - damping) + lit(damping) *
          (coalesce(col("contrib"), lit(0.0)) +
            graft.functions.StableScalar.column(dmassPerNode))).as("rank"))
}
