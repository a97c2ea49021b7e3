package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (point-in-interval) join — match each left row's time to the
  * right intervals containing it (inclusive ends). The other
  * missing-from-Spark temporal join beside [[AsOfJoin]]: the naive
  * `ON t >= start AND t <= end` form cannot hash-partition (Spark plans a
  * broadcast nested loop or cartesian), so this BUCKETIZES time instead:
  * intervals explode to every fixed-width bucket they overlap, points
  * carry their single bucket, and the join is a plain equi-join on
  * (bucket [, key]) with a residual containment filter. A (point,
  * interval) pair meets in exactly one bucket — the point's — so no
  * dedup pass is needed. Shuffle cost is the equi-join; interval
  * explosion is bounded by interval length / bucketWidth, so pick a
  * width near the typical interval length.
  */
object RangeJoin {

  /** @param key optional equi-key column present on BOTH sides (joined
    *             alongside the bucket, merged in the output)
    */
  def pointInInterval(left: DataFrame, tCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, key: Option[String] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer `div`, not `/`: long / long is a double divide in Spark SQL
    // and loses exactness above 2^53
    val lb = left.withColumn("__rj_b",
      expr(s"`$tCol` div $bucketWidth"))
    val rb = right.withColumn("__rj_b",
      explode(sequence(expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth"))))
    lb.join(rb, Seq("__rj_b") ++ key.toSeq)
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__rj_b")
  }
}
