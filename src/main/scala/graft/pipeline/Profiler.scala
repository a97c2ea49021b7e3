package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler: the "what is in this table" primitive run
  * before any pipeline touches a new 100 TB drop. All metrics for all
  * requested columns ride in ONE aggregate job (a single scan, map-side
  * partials), then melt to (column, metric, value) rows. Exact counts —
  * the approx variants (approx_count_distinct) are the documented swap at
  * scales where exact distinct is itself a shuffle problem.
  */
object Profiler {

  /** Numeric profile: count / nulls / distinct / min / max / sum (exact
    * decimal, emitted as double). One row per (column, metric).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs >= 1 column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"__cnt_$c"),
        sum(col(c).isNull.cast("long")).cast("double").as(s"__null_$c"),
        countDistinct(col(c)).cast("double").as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast("decimal(28,2)")).cast("double").as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.flatMap { c =>
      Seq("cnt" -> "count", "null" -> "nulls", "dist" -> "distinct",
        "min" -> "min", "max" -> "max", "sum" -> "sum").map {
        case (tag, metric) =>
          struct(lit(c).as("column"), lit(metric).as("metric"),
            col(s"__${tag}_$c").as("value"))
      }
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.metric"), col("r.value"))
  }

  /** Equi-width histogram of a numeric column: `nBins` buckets over the
    * data's [min, max], rows (bin, lo, hi, cnt). The top edge closes into
    * the last bin. Bin arithmetic is the same two IEEE ops in any engine
    * (one subtraction, one division by the same width), so bucket
    * assignment is bit-identical — the gate leans on that.
    * One pass for min/max (broadcast scalars), one aggregate for counts.
    * Degenerate single-valued columns (min == max, width 0 — where the
    * division would be 0/0 = NaN and engines diverge on floor(NaN)) get
    * one explicit bin [mn, mn] holding the full count.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "need >= 1 bin")
    val mm = df.agg(min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx"))
    df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .crossJoin(broadcast(mm))
      .withColumn("w", (col("mx") - col("mn")) / nBins)
      .withColumn("bin", when(col("w") === 0.0, lit(0)).otherwise(least(
        floor((col("v") - col("mn")) / col("w")).cast("int"), lit(nBins - 1))))
      .groupBy("bin", "mn", "w")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (col("mn") + col("bin") * col("w")).as("lo"),
        (col("mn") + (col("bin") + 1) * col("w")).as("hi"),
        col("cnt"))
  }

  /** String profile: count / nulls / distinct / total length. */
  def profileString(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs >= 1 column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"__cnt_$c"),
        sum(col(c).isNull.cast("long")).cast("double").as(s"__null_$c"),
        countDistinct(col(c)).cast("double").as(s"__dist_$c"),
        sum(length(col(c)).cast("long")).cast("double").as(s"__len_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.flatMap { c =>
      Seq("cnt" -> "count", "null" -> "nulls", "dist" -> "distinct",
        "len" -> "total_length").map { case (tag, metric) =>
        struct(lit(c).as("column"), lit(metric).as("metric"),
          col(s"__${tag}_$c").as("value"))
      }
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.metric"), col("r.value"))
  }
}
