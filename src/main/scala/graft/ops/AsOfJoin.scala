package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to each left row the LATEST right row with
  * `right.time <= left.time` for the same key (the time-series/SCD
  * enrichment join Spark's relational layer lacks; cf. DuckDB/kdb ASOF).
  *
  * Formulation: tag both sides, UNION, one window pass per key ordered by
  * (time, side) carrying the right payload forward with
  * `last(ignoreNulls)`. ONE shuffle on the key, zero range inequality
  * joins — the naive `l JOIN r ON key AND r.t <= l.t` + max() form
  * explodes quadratically per key, and an inequality join can't
  * hash-partition; this shape scales to arbitrarily long histories
  * because each row is touched once. Right rows tie-break BEFORE left
  * rows at equal timestamps, so `<=` is inclusive.
  *
  * Skew note: a single hot key serializes into one task's sort — salt
  * upstream only if one key dominates (same posture as
  * [[graft.ops.Skew.saltedAgg]]).
  */
object AsOfJoin {

  /** @param rightCols right-side payload columns to attach (each emitted
    *                   as `asof_<name>`, null when no right row precedes)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "asOf needs at least one right payload column")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
    val r = right.select(
      col(key),
      col(rightTime).as("__asof_t"),
      lit(0).as("__asof_side"),
      struct(rightCols.map(col): _*).as("__asof_rv"))
    // align schemas: right side carries null left payload
    val rAligned = leftCols.filterNot(_ == key)
      .foldLeft(r)((df, c) => df.withColumn(c,
        lit(null).cast(left.schema(c).dataType)))
      .select((leftCols.map(col) ++
        Seq(col("__asof_t"), col("__asof_side"), col("__asof_rv"))): _*)
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("__asof_t"), col("__asof_side"), col("__asof_rv"))): _*)
      .unionByName(rAligned)
    // the payload struct is the final sort key: when the right side holds
    // duplicate (key, time) rows, the carried value is deterministically
    // the greatest payload rather than whichever duplicate the shuffle
    // happened to order last
    val w = Window.partitionBy(key)
      .orderBy(col("__asof_t"), col("__asof_side"), col("__asof_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof_carry",
      last(col("__asof_rv"), ignoreNulls = true).over(w))
    carried.filter(col("__asof_side") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c =>
        col(s"__asof_carry.$c").as(s"asof_$c"))): _*)
  }
}
