package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — corpus
  * clustering as a first-class operator (semantic sharding, domain
  * discovery, cluster-balanced sampling for training mixes).
  *
  * Different animal from `Similarity.Ivf`'s quantizer training: that one
  * fits centroids on a BOUNDED driver-side sample (good enough for cell
  * assignment), while this is the full-corpus iteration whose per-point
  * assignments are themselves the product.
  *
  * Shape per iteration — the 100 TB-safe one:
  *   - ASSIGN is a pure map: the k×dim centroid matrix rides into the
  *     plan as literals (k×dim doubles — tiny next to the data), distance
  *     + argmin evaluate inside whole-stage codegen, zero shuffle;
  *   - UPDATE is one partial-aggregated `groupBy(cluster, dim)` over the
  *     posexploded vectors: map-side combine collapses each partition to
  *     ≤ k×dim rows, so the shuffle is O(partitions × k × dim) — never
  *     O(rows) — and the driver collect is bounded by k×dim.
  *
  * Determinism: initial centroids are the vectors of `initIds` (or the k
  * smallest ids), every distance folds in index order, and argmin breaks
  * ties toward the smaller cluster id — the same rules an engine-
  * independent oracle can replay. Distances compare in double precision;
  * assignment flips would need two centroids equidistant to ~1e-13
  * relative, far tighter than any real cluster margin.
  *
  * An emptied cluster keeps its previous centroid (it may re-acquire
  * points later); callers who want k live clusters re-seed and re-run.
  */
object Clustering {

  /** Squared Euclidean distance between a vector column and a literal
    * centroid, folded in index order (argmin-equivalent to the true
    * distance — sqrt is monotone and never computed).
    */
  private def distSq(v: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(v, typedlit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** The argmin-by-(distance, clusterId) assignment expression: a struct
    * array ordered by Spark's natural struct comparison, so `array_min`
    * picks the nearest centroid and ties resolve to the smaller id.
    */
  private def assignExpr(v: Column,
      centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      struct(distSq(v, c).as("d"), lit(cid).as("c"))
    }: _*)).getField("c")

  /** Run `iters` assignment passes of Lloyd's algorithm (centroids update
    * between passes, so `iters = 1` is pure nearest-centroid assignment
    * under the initial seeds). Returns one row per input row:
    * (`idCol`, cluster) with cluster in [0, k).
    *
    * `initIds`: ids whose vectors seed the centroids, in cluster-id
    * order. Defaults to the k smallest ids — deterministic on any
    * engine. Vectors must share one length; float vectors widen to
    * double exactly.
    */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, initIds: Seq[Long] = Seq.empty): DataFrame = {
    val centroids = kmeansCentroids(df, vecCol, idCol, k, iters, initIds)
    df.select(col(idCol),
        assignExpr(transform(col(vecCol), _.cast("double")), centroids)
          .as("cluster"))
  }

  /** The FINAL centroids of [[kmeans]]'s iteration — for callers that
    * need the assignment as a reusable pure expression rather than a
    * one-shot frame: re-deriving `assignExpr(vec, centroids)` is a
    * zero-shuffle codegen map, so a consumer that needs (row columns +
    * cluster) several times can recompute it from the scan instead of
    * joining the corpus back to a materialized (id, cluster) frame —
    * the join costs a corpus-wide shuffle PER consumer (SemDeDup paid
    * it three times). Same seeds, same fold order, same tie rule as
    * [[kmeans]]: the assignments are bit-identical by construction.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int,
      initIds: Seq[Long] = Seq.empty): Seq[(Int, Seq[Double])] = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    val v = transform(col(vecCol), _.cast("double"))
    val base = df.select(col(idCol), v.as("__v"))
    val seeds =
      if (initIds.nonEmpty) initIds
      else df.select(col(idCol).cast("long")).orderBy(col(idCol))
        .limit(k).collect().map(_.getLong(0)).toSeq
    require(seeds.size == k, s"need $k init ids, got ${seeds.size}")
    val seedRows = base
      .filter(col(idCol).cast("long").isin(seeds: _*))
      .select(col(idCol).cast("long"), col("__v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    seeds.foreach(id => require(seedRows.contains(id),
      s"init id $id not found in $idCol"))
    var centroids: Seq[(Int, Seq[Double])] =
      seeds.zipWithIndex.map { case (id, i) => i -> seedRows(id) }
    for (_ <- 1 until iters) {
      // UPDATE: per-dimension means; partial agg bounds the shuffle at
      // partitions × k × dim and the collect at k × dim
      val means = base
        .withColumn("__cluster", assignExpr(col("__v"), centroids))
        .select(col("__cluster"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy("__cluster", "__p").agg(avg("__x").as("__m"))
        .collect()
        .groupBy(_.getInt(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq).toMap
      centroids = centroids.map { case (cid, old) =>
        cid -> means.getOrElse(cid, old) // emptied cluster keeps its seat
      }
    }
    centroids
  }

  /** The nearest-centroid assignment for a (cast-to-double) vector
    * column under fixed centroids — [[kmeansCentroids]]'s companion.
    */
  def assignTo(vecCol: Column,
      centroids: Seq[(Int, Seq[Double])]): Column =
    assignExpr(transform(vecCol, _.cast("double")), centroids)
}
