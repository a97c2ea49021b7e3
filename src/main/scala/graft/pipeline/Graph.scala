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
  * Numeric note: ranks are IEEE doubles and additions reorder across
  * engines/partitionings, so cross-engine compares must round (the gate
  * rounds to 3 decimals — ~1e-13 accumulated reorder error vs 5e-4
  * rounding granularity). The simple non-normalized variant: rank =
  * (1-d) + d * Σ in-contributions; dangling-node mass is not
  * redistributed (documented classic simplification).
  */
object Graph {

  /** PageRank over directed edges (srcCol -> dstCol), `iters` rounds.
    * Returns (node, rank). Self-loops and duplicate edges count as given;
    * dedupe upstream if unwanted.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // reused every round: edges annotated with the source's out-degree
    val eDeg = e.join(outDeg, "src")
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
    }
    ranks
  }
}
