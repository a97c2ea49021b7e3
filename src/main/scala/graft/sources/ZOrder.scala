package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column clustering for data skipping.
  *
  * `writeClustered` (Tables.scala) gives tight per-file ranges on ONE key
  * prefix — a filter on the second key alone skips nothing. Interleaving
  * the bits of k keys into one Morton value and range-partitioning on THAT
  * makes every file a small hyper-rectangle in all k dimensions, so
  * selective predicates on ANY clustered column (or any subset) skip most
  * files/row groups from parquet min/max stats alone. This is the standard
  * multi-dimensional layout trick (Morton 1966; what lakehouse OPTIMIZE
  * ZORDER does) — at 100 TB it turns "filter on the non-leading dimension
  * reads everything" into "reads a thin slab".
  *
  * Columns are scaled to [0, 2^bits) against their global min/max (one
  * tiny aggregate); k * bits must fit a signed long. Scaling is linear —
  * heavily skewed columns cluster less evenly (rank/quantile scaling is
  * the refinement) — which is a layout-quality concern, never a
  * correctness one: the data is only reordered, never changed.
  */
object ZOrder {

  /** Morton interleave of pre-scaled non-negative longs (each < 2^bits):
    * bit b of column i lands at position b*k + i.
    */
  def interleave(scaled: Seq[Column], bits: Int): Column = {
    val k = scaled.length
    require(k >= 1, "z-order needs >= 1 column")
    require(k * bits <= 62, s"$k cols x $bits bits exceeds a signed long")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i))
      }
    }
  }

  /** Scale a numeric column into [0, 2^bits) against [mn, mx] (double
    * scaling — exactness is irrelevant for layout, overflow is not).
    */
  private[sources] def scale(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = math.max(mx - mn, java.lang.Double.MIN_VALUE)
    val top = (1L << bits) - 1
    least(greatest(
      (((c.cast("double") - mn) / span) * top).cast("long"), lit(0L)),
      lit(top))
  }

  /** Write `df` z-ordered on `keys` (numeric/timestamp-castable columns):
    * one min/max aggregate, Morton column, range partition + in-file sort
    * on it. Every output file then carries tight min/max stats on ALL
    * keys simultaneously.
    */
  def writeZOrdered(df: DataFrame, path: String, keys: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    require(keys.nonEmpty, "z-order needs >= 1 key column")
    val aggs = keys.flatMap(k => Seq(
      min(col(k).cast("double")).as(s"mn_$k"),
      max(col(k).cast("double")).as(s"mx_$k")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val scaled = keys.zipWithIndex.map { case (k, i) =>
      scale(col(k), row.getDouble(2 * i), row.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__z", interleave(scaled, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
