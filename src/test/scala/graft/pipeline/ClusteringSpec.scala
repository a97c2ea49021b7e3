package graft.pipeline

import graft.SparkSpec

/** Lloyd's k-means: hand-computed fixpoints, tie and empty-cluster
  * rules, partition invariance.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def df(pts: Seq[(Long, Seq[Double])]) =
    pts.toDF("id", "v").selectExpr("id",
      "transform(v, x -> cast(x as float)) as v") // float input, like
      // a real embedding column — must widen exactly

  test("two separated groups converge in one update (hand-computed)") {
    // group A around x=0, group B around x=10; seeds 0 (at 1.0) and
    // 1 (at 9.0). First assignment splits at x=5; update moves centroids
    // to the group means; second assignment is identical (fixpoint).
    val pts = Seq(
      0L -> Seq(1.0), 2L -> Seq(0.0), 3L -> Seq(2.0),
      1L -> Seq(9.0), 4L -> Seq(10.0), 5L -> Seq(11.0))
    val out = Clustering.kmeans(df(pts), "v", "id", k = 2, iters = 2,
      initIds = Seq(0L, 1L))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(0L -> 0, 2L -> 0, 3L -> 0, 1L -> 1, 4L -> 1, 5L -> 1))
  }

  test("iters = 1 is pure nearest-seed assignment; ties to lower id") {
    // point at 5.0 is equidistant to seeds 1.0 and 9.0 -> cluster 0
    val pts = Seq(0L -> Seq(1.0), 1L -> Seq(9.0), 2L -> Seq(5.0))
    val out = Clustering.kmeans(df(pts), "v", "id", k = 2, iters = 1,
      initIds = Seq(0L, 1L))
      .as[(Long, Int)].collect().toMap
    assert(out(2L) == 0, "exact tie must resolve to the smaller cluster id")
  }

  test("default init takes the k smallest ids in order") {
    val pts = Seq(7L -> Seq(0.0), 3L -> Seq(10.0), 9L -> Seq(10.1))
    val out = Clustering.kmeans(df(pts), "v", "id", k = 2, iters = 1)
      .as[(Long, Int)].collect().toMap
    // seeds: ids 3 (cluster 0, at 10.0) and 7 (cluster 1, at 0.0)
    assert(out == Map(3L -> 0, 9L -> 0, 7L -> 1))
  }

  test("an emptied cluster keeps its centroid and can re-acquire") {
    // seed 1 at 100.0 captures nothing after the first update (every
    // point is near 0); its centroid must stay at 100.0, not NaN out
    val pts = Seq(0L -> Seq(0.0), 1L -> Seq(100.0), 2L -> Seq(1.0),
      3L -> Seq(2.0))
    val moved = Clustering.kmeans(
      df(pts.filterNot(_._1 == 1L) :+ (1L -> Seq(100.0))), "v", "id",
      k = 2, iters = 3, initIds = Seq(0L, 1L))
      .as[(Long, Int)].collect().toMap
    assert(moved(1L) == 1 && moved(0L) == 0)
  }

  test("assignments are partition-invariant") {
    val pts = (0L until 60L).map(i =>
      i -> Seq((i % 3) * 10.0 + (i % 5) * 0.1, (i % 3) * -5.0))
    val a = Clustering.kmeans(df(pts), "v", "id", 3, 3, Seq(0L, 1L, 2L))
      .as[(Long, Int)].collect().toMap
    val b = Clustering.kmeans(df(pts).repartition(7), "v", "id", 3, 3,
      Seq(0L, 1L, 2L)).as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("assignment is a pure map: no shuffle in the assign pass") {
    val pts = (0L until 40L).map(i => i -> Seq(i.toDouble, -i.toDouble))
    val plan = Clustering.kmeans(df(pts), "v", "id", 2, 1, Seq(0L, 1L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"iters=1 assignment must not shuffle:\n$plan")
  }

  test("kmeansCentroids + assignTo reproduce kmeans bit-for-bit") {
    // the SemDeDup consumer re-derives the assignment as a pure
    // expression over the final centroids instead of joining back to
    // kmeans' frame — that is only sound if the expression assignment
    // IS the kmeans assignment, ties included
    val pts = (0L until 90L).map(i =>
      i -> Seq((i % 4) * 7.0 + (i % 3) * 0.01, (i % 4) * -2.0))
    val viaKmeans = Clustering.kmeans(df(pts), "v", "id", 4, 3,
      Seq(0L, 1L, 2L, 3L)).as[(Long, Int)].collect().toMap
    val cents = Clustering.kmeansCentroids(df(pts), "v", "id", 4, 3,
      Seq(0L, 1L, 2L, 3L))
    val viaExpr = df(pts)
      .select($"id", Clustering.assignTo($"v", cents).as("cluster"))
      .as[(Long, Int)].collect().toMap
    assert(viaKmeans == viaExpr)
  }
}
