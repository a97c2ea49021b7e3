package graft.pipeline

import org.apache.spark.sql.DataFrame
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
  * hot path. Out-degrees are computed once and reused every round.
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
    // The raw edge list is pinned FIRST so nodes/degrees/eDeg below all
    // read the materialized edges rather than re-running the caller's
    // upstream plan once each.
    def pin(df: DataFrame): DataFrame =
      if (checkpointEvery > 0 || redistributeDangling) {
        if (checkpointDir.isDefined) df.checkpoint(true)
        else df.localCheckpoint(true)
      } else df
    val e = pin(edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")))
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // reused every round: edges annotated with the source's out-degree
    val eDeg = pin(e.join(outDeg, "src"))
    // redistribute mode: the node table carries a has-out-edge flag, so
    // the per-round dangling mass is a FILTER + global agg over the
    // already-materialized ranks — no join in the scalar's path
    val nodesF =
      if (redistributeDangling)
        pin(nodes
          .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(col("node"), col("deg").isNotNull.as("__has_out")))
      else nodes
    val nNodes = if (redistributeDangling) nodesF.count().toDouble else 0.0
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    // redistribute mode materializes the rank table EVERY round: the
    // dangling scalar forces a full evaluation per round anyway (GraphX
    // pays the same — its per-iteration graph is materialized), so
    // materializing makes each round execute exactly once instead of
    // re-deriving the chain for the scalar AND again for the next join.
    var ranks = nodesF.withColumn("rank", lit(1.0))
    if (redistributeDangling) ranks = materialize(ranks)
    for (i <- 1 to iters) {
      ranks =
        if (redistributeDangling)
          materialize(redistributeRound(eDeg, nodesF, ranks, damping, nNodes))
        else {
          val next = plainRound(eDeg, nodesF, ranks, damping)
          if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
            materialize(next)
          else next
        }
    }
    if (redistributeDangling) ranks.drop("__has_out") else ranks
  }

  private def contributions(eDeg: DataFrame, ranks: DataFrame): DataFrame =
    eDeg
      .join(ranks.select(col("node").as("src"), col("rank")), "src")
      .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
      .groupBy("node").agg(sum("c").as("contrib"))

  private[pipeline] def plainRound(eDeg: DataFrame, nodes: DataFrame,
      ranks: DataFrame, damping: Double): DataFrame =
    nodes.join(contributions(eDeg, ranks), Seq("node"), "left")
      .select(col("node"),
        (lit(1.0 - damping) +
          lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))

  /** One redistribute-mode round over MATERIALIZED inputs. The dangling
    * mass rides in the same job as the round (a broadcast scalar whose
    * subtree is a filter+agg over the already-materialized previous
    * ranks — no chain re-execution, no second driver action), and both
    * joins reuse the hash partitioning localCheckpoint preserved, so the
    * round's ONLY shuffle is the contribution aggregation — pinned in
    * GraphSpec.
    */
  private[pipeline] def redistributeRound(eDeg: DataFrame, nodesF: DataFrame,
      ranks: DataFrame, damping: Double, nNodes: Double): DataFrame = {
    val dmass = ranks.filter(!col("__has_out"))
      .agg(coalesce(sum("rank"), lit(0.0)).as("__dmass"))
    nodesF.join(contributions(eDeg, ranks), Seq("node"), "left")
      .crossJoin(broadcast(dmass))
      .select(col("node"), col("__has_out"),
        (lit(1.0 - damping) + lit(damping) *
          (coalesce(col("contrib"), lit(0.0)) +
            col("__dmass") / nNodes)).as("rank"))
  }
}
