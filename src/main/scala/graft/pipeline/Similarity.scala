package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, both expression-only (codegen'd vector math via
  * `zip_with`/`aggregate`, no UDFs):
  *
  *   - [[bruteForceTopK]]: the exact baseline — broadcast the (small) query
  *     set against the corpus, score every pair, per-query top-k via a
  *     bounded window. Corpus-side work is a single scan; right answer at
  *     any corpus size when |queries| is modest.
  *   - [[SignLsh]]: the scale path — random-hyperplane sign buckets
  *     (deterministically seeded). Probing only the query's bucket turns
  *     top-k into a bucket-local problem; recall is tunable by `planes`
  *     (fewer planes = bigger buckets = higher recall, more compute).
  *
  * An IVF variant would replace the hash planes with k-means centroids;
  * sign-LSH is chosen here because it needs no training pass and its
  * bucketing is a pure per-row expression (no iterative driver loop).
  */
object Similarity {

  /** Dot product of two float-array columns (double accumulation,
    * deterministic left-to-right order).
    */
  def dot(a: Column, b: Column): Column =
    // cast each element to double BEFORE multiplying: double-precision
    // products + left-to-right double accumulation is reproducible across
    // engines (float*float would round twice, engine-dependently)
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Exact top-k nearest neighbors by cosine for each query vector.
    *
    * @param corpus  (idCol, vecCol) corpus table — arbitrarily large
    * @param queries (qidCol, vecCol) query table — small, broadcast
    * @return (query_id, neighbor_id, cosine, rank<=k), excluding self-pairs
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      col(vecCol).as("__qvec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cvec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__cvec"), col("__qvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane sign LSH. Plane coefficients are generated from a
    * seeded RNG at plan time (literal arrays, broadcast inside the
    * expression) — deterministic across runs and engines.
    */
  object SignLsh {
    def planes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
      val rng = new scala.util.Random(seed)
      Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
    }

    /** Bucket id: one sign bit per plane packed into a long. The plane
      * matrix is captured in the kernel closure (broadcast with the task),
      * keeping the Catalyst tree to one call — an expression formulation
      * (nPlanes nested aggregate/zip_with lambdas) costs seconds of query
      * compile for zero runtime benefit.
      */
    def bucketCol(vec: Column, dim: Int, nPlanes: Int,
        seed: Long = 42L): Column = {
      val ps = planes(dim, nPlanes, seed).map(_.toArray).toArray
      val kernel = udf { v: Seq[Float] =>
        if (v == null) null
        else {
          var bucket = 0L
          var i = 0
          while (i < ps.length) {
            val p = ps(i)
            var d = 0.0
            var j = 0
            val n = math.min(p.length, v.length)
            while (j < n) { d += v(j).toDouble * p(j); j += 1 }
            if (d > 0.0) bucket |= (1L << i)
            i += 1
          }
          java.lang.Long.valueOf(bucket)
        }
      }
      kernel(vec)
    }

    def withBucket(df: DataFrame, vecCol: String, dim: Int, nPlanes: Int,
        seed: Long = 42L): DataFrame =
      df.withColumn("bucket", bucketCol(col(vecCol), dim, nPlanes, seed))

    /** Approximate top-k: score only within the query's bucket. */
    def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
        qidCol: String, vecCol: String, dim: Int, k: Int,
        nPlanes: Int = 8): DataFrame = {
      val c = withBucket(corpus, vecCol, dim, nPlanes)
        .select(col("bucket"), col(idCol).as("neighbor_id"),
          col(vecCol).as("__cvec"))
      val q = broadcast(withBucket(queries, vecCol, dim, nPlanes)
        .select(col("bucket"), col(qidCol).as("query_id"),
          col(vecCol).as("__qvec")))
      val scored = c.join(q, Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("__cvec"), col("__qvec")).as("cosine"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
  }
}
