package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data view between two versions of a keyed
  * table: which keys were added, removed, or changed. The regression
  * check every pipeline rewrite wants ("same output as yesterday's
  * build, except…") and the input to incremental downstream refresh.
  *
  * One full-outer join on the key; value comparison is column-wise and
  * NULL-SAFE (a null compares equal to null, different from any value) —
  * no serialization/hash of rows, so column order and physical layout
  * are irrelevant, and the classification is expressible in plain SQL
  * (IS DISTINCT FROM), which the gate exploits. Unchanged rows drop out
  * before anything shuffles onward: the output is proportional to the
  * churn, not the table.
  */
object TableDiff {

  /** Diff `newer` against `older` on `key`: rows (key columns…,
    * change ∈ added|removed|changed). Both sides must carry the same
    * columns. Unchanged keys are omitted.
    */
  def diff(older: DataFrame, newer: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs >= 1 key column")
    // valueCols derives from `older`; without this check a column present
    // only in `newer` would be silently ignored and its changes missed —
    // schema drift must fail fast, not classify as unchanged
    require(older.columns.sorted.sameElements(newer.columns.sorted),
      s"diff requires identical column sets; older has " +
      s"[${older.columns.sorted.mkString(",")}], newer has " +
      s"[${newer.columns.sorted.mkString(",")}]")
    val valueCols = older.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "diff needs >= 1 non-key column")
    val o = older.select(older.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__o_$c")): _*)
      .withColumn("__in_o", lit(true))
    val n = newer.select(newer.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__n_$c")): _*)
      .withColumn("__in_n", lit(true))
    val joined = o.join(n, keys, "full_outer")
    val anyChanged = valueCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    joined.select(keys.map(col) :+
      when(col("__in_o").isNull, lit("added"))
        .when(col("__in_n").isNull, lit("removed"))
        .when(anyChanged, lit("changed"))
        .otherwise(lit(null)).as("change"): _*)
      .filter(col("change").isNotNull)
  }

  /** [[diff]] across a SCHEMA-EVOLVED version boundary: columns present on
    * only one side are aligned as all-null on the other (exactly how
    * `Merge.readVersion` fills pre-evolution files), then the null-safe
    * comparison runs as usual. So a row whose only difference is a
    * non-null value in an added column classifies as `changed`, and a row
    * untouched by the evolution (null on both sides) stays unchanged —
    * the explicit opt-in that [[diff]]'s fail-fast schema check guards.
    * Both sides must still share the key columns and agree on the types
    * of the columns they share.
    */
  def diffEvolved(older: DataFrame, newer: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.forall(k => older.columns.contains(k) &&
      newer.columns.contains(k)),
      s"both sides must carry every key column (${keys.mkString(", ")})")
    val allCols = (older.columns ++
      newer.columns.filterNot(older.columns.contains)).toSeq
    def align(df: DataFrame): DataFrame = {
      val other = if (df eq older) newer else older
      df.select(allCols.map(c =>
        (if (df.columns.contains(c)) col(c)
         else lit(null).cast(other.schema(c).dataType)).as(c)): _*)
    }
    diff(align(older), align(newer), keys)
  }

  /** CDC delta rows between two snapshots: +1 rows to APPLY (added keys
    * plus the NEW image of changed keys) and -1 rows to RETRACT (removed
    * keys plus the OLD image of changed keys) — the multiset difference
    * `newer - older` in both directions, directly consumable by
    * `IncrementalAgg.updateWithRetractions` (incremental view
    * maintenance) or any downstream CDC sink. Same single full-outer
    * join as [[diff]]; unchanged keys emit nothing, so the output is
    * proportional to the churn. Column order matches `older` with
    * `opCol` appended.
    */
  def changeDeltas(older: DataFrame, newer: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "changeDeltas needs >= 1 key column")
    require(older.columns.sorted.sameElements(newer.columns.sorted),
      s"changeDeltas requires identical column sets; older has " +
      s"[${older.columns.sorted.mkString(",")}], newer has " +
      s"[${newer.columns.sorted.mkString(",")}]")
    val allCols = older.columns.toSeq
    val valueCols = allCols.filterNot(keys.contains)
    require(valueCols.nonEmpty, "changeDeltas needs >= 1 non-key column")
    val o = older.select(allCols.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__o_$c")): _*)
      .withColumn("__in_o", lit(true))
    val n = newer.select(allCols.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__n_$c")): _*)
      .withColumn("__in_n", lit(true))
    val joined = o.join(n, keys, "full_outer")
    val anyChanged = valueCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    val added = col("__in_o").isNull
    val removed = col("__in_n").isNull
    def image(prefix: String, op: Int) = struct(
      allCols.map(c =>
        (if (keys.contains(c)) col(c) else col(s"__${prefix}_$c")).as(c)) :+
        lit(op).as(opCol): _*)
    val emit = array(
      when(removed || (!added && anyChanged), image("o", -1)),
      when(added || (!removed && anyChanged), image("n", 1)))
    joined
      .select(explode(filter(emit, x => x.isNotNull)).as("__r"))
      .select((allCols :+ opCol).map(c => col(s"__r.$c")): _*)
  }
}
