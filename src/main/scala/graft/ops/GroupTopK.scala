package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group top-k with MAP-SIDE pruning — the grouped analogue of
  * Spark's global `TakeOrderedAndProject`.
  *
  * The naive form (`row_number` over a group window, filter ≤ k) sorts
  * EVERY group's every row: at 100 TB that is a full shuffle and sort of
  * the table to keep a handful of rows per group. This operator cuts the
  * shuffle to ≤ partitions × groups × k rows:
  *
  *   1. each input partition keeps, per group it sees, only its own
  *      top-k rows (a bounded ordered buffer — no sort of the partition,
  *      O(rows · log k) upkeep);
  *   2. the exact `row_number` window then runs over the survivors —
  *      correct because a row outside its partition's local top-k can
  *      never be in the global top-k (the k rows ahead of it locally are
  *      ahead of it globally too).
  *
  * The local comparator uses the SAME total order as the final window
  * (order column, then tie columns ascending) — a divergence there could
  * evict a row the window would keep, so the tie columns should make the
  * order total (a unique id); the gate and spec pin equality against the
  * plain-window form.
  *
  * Supported order/tie column types: integral, floating, decimal,
  * string, date, timestamp (the orderable scalar types).
  */
object GroupTopK {

  /** Comparable key for one column value under its Spark type. */
  private def keyOf(dt: DataType, v: Any): Comparable[Any] = (v match {
    case null => null // nulls LAST under either direction, like NULLS LAST
    case _ => dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())
      case _: FloatType | _: DoubleType =>
        java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue())
      case _: DecimalType => v.asInstanceOf[java.math.BigDecimal]
      case _: StringType  => v.asInstanceOf[String]
      case _: DateType    => java.lang.Long.valueOf(
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay)
      case _: TimestampType => java.lang.Long.valueOf {
        val t = v.asInstanceOf[java.sql.Timestamp]
        // floorDiv: plain `/` truncates toward zero, so a PRE-EPOCH
        // fractional second (-0.5 s) would map to +500000 micros and
        // order AFTER the epoch
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      }
      case TimestampNTZType => java.lang.Long.valueOf {
        val l = v.asInstanceOf[java.time.LocalDateTime]
        l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          l.getNano / 1000L
      }
      case other => throw new IllegalArgumentException(
        s"unsupported order/tie type ${other.simpleString}")
    }
  }).asInstanceOf[Comparable[Any]]

  /** Top `k` rows per group by `orderCol` (descending unless `asc`),
    * ties broken by `tieCols` ascending; emits the input columns plus a
    * 1-based `rank`. `tieCols` should complete a total order (unique
    * key) — that is what makes the result deterministic AND the local
    * pruning exact.
    *
    * WIDE TABLES: the local prune buffers whole rows (bounded by
    * groups-per-partition × k ROWS, but scaling with row width). When
    * the table has a unique id column, pass `idCol = Some(id)`: the
    * prune then runs on a PROJECTED (group, order, tie, id) view — the
    * buffer holds a few scalars per row regardless of payload width —
    * and the surviving ids (≤ partitions × groups × k, a bounded set)
    * re-select the full rows via a broadcast semi-join: one extra scan
    * of the input, never a shuffle of it. The id also completes the
    * total order (appended to the tie columns), so this mode is
    * deterministic by construction.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      k: Int, asc: Boolean = false,
      tieCols: Seq[String] = Seq.empty,
      idCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs >= 1 group column")
    require(k >= 1, "k must be >= 1")
    idCol match {
      case Some(id) =>
        // id completes the total order; dedupe in case the caller already
        // listed it among the tie columns
        val ties = (tieCols :+ id).distinct.filterNot(_ == orderCol)
        val narrowCols = (groupCols :+ orderCol) ++ ties
        val narrow = df.select(narrowCols.distinct.map(col): _*)
        val survivorIds = localPrune(narrow, groupCols, orderCol, k, asc,
          ties).select(id).distinct()
        val survivors = df.join(broadcast(survivorIds), Seq(id), "left_semi")
        rankAndCut(survivors, groupCols, orderCol, k, asc, ties)
      case None =>
        val pruned = localPrune(df, groupCols, orderCol, k, asc, tieCols)
        rankAndCut(pruned, groupCols, orderCol, k, asc, tieCols)
    }
  }

  /** The exact `row_number` window over (already-pruned) survivors —
    * the same total order the local prune used.
    */
  private def rankAndCut(df: DataFrame, groupCols: Seq[String],
      orderCol: String, k: Int, asc: Boolean,
      tieCols: Seq[String]): DataFrame = {
    val dir = if (asc) col(orderCol).asc_nulls_last
              else col(orderCol).desc_nulls_last
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(dir +: tieCols.map(col(_).asc): _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-partition, per-group bounded top-k prune (step 1 of the
    * operator's contract) — exact under the same total order
    * [[rankAndCut]] ranks by. Package-visible so specs can pin the
    * projected-buffer width in wide-table mode.
    */
  private[ops] def localPrune(df: DataFrame, groupCols: Seq[String],
      orderCol: String, k: Int, asc: Boolean,
      tieCols: Seq[String]): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val oIdx = schema.fieldIndex(orderCol)
    val tIdx = tieCols.map(schema.fieldIndex)
    val oType = schema(oIdx).dataType
    val tTypes = tIdx.map(schema(_).dataType)

    // total order: orderCol (direction-aware, nulls last), then tieCols
    // ascending — identical to the window's ORDER BY below
    val cmp: Ordering[Row] = new Ordering[Row] {
      private def cmpKey(a: Comparable[Any], b: Any, nullsLastSign: Int,
          sign: Int): Int =
        if (a == null && b == null) 0
        else if (a == null) nullsLastSign
        else if (b == null) -nullsLastSign
        else sign * a.compareTo(b)
      def compare(x: Row, y: Row): Int = {
        val o = cmpKey(keyOf(oType, x.get(oIdx)), keyOf(oType, y.get(oIdx)),
          1, if (asc) 1 else -1)
        if (o != 0) return o
        var i = 0
        while (i < tIdx.length) {
          val t = cmpKey(keyOf(tTypes(i), x.get(tIdx(i))),
            keyOf(tTypes(i), y.get(tIdx(i))), 1, 1)
          if (t != 0) return t
          i += 1
        }
        0
      }
    }

    df.mapPartitions { rows =>
      // group key -> ordered buffer of its local best ≤ k rows
      val best = scala.collection.mutable.HashMap
        .empty[Seq[Any], java.util.TreeSet[Row]]
      // TreeSet needs distinct elements under the comparator; chain a
      // row-identity tiebreak so equal-keyed rows both survive (they are
      // interchangeable under the total order the caller declared)
      val ids = new java.util.IdentityHashMap[Row, Integer]
      var nextId = 0
      val fullCmp = new java.util.Comparator[Row] {
        def compare(a: Row, b: Row): Int = {
          val c = cmp.compare(a, b)
          if (c != 0) c else Integer.compare(ids.get(a), ids.get(b))
        }
      }
      rows.foreach { r =>
        val key = gIdx.map(r.get)
        val buf = best.getOrElseUpdate(key, new java.util.TreeSet[Row](fullCmp))
        ids.put(r, nextId); nextId += 1
        buf.add(r)
        if (buf.size > k) {
          val evicted = buf.pollLast()
          ids.remove(evicted)
        }
      }
      best.valuesIterator.flatMap(b =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(b.iterator)
          .asScala)
    }(Encoders.row(schema))
  }
}
