package graft.sources


import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4 / 100 TB posture).
  *
  * Two tables bucketed on the same keys with the same bucket count are
  * join-ready: Spark's SortMergeJoin elides BOTH Exchange nodes (and, with
  * the sort spec, both Sorts), so a fact-to-fact join at 100 TB moves zero
  * bytes over the network. This is the standing answer to repeated big
  * joins that broadcast can't serve (neither side small).
  */
object Tables {

  /** Write `df` as a bucketed (and in-bucket sorted) managed parquet table.
    * Bucket count should be sized so one bucket of the LARGER table fits
    * an executor's memory comfortably at the target scale.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketed table needs >= 1 key column")
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two identically-bucketed tables on their bucket keys: shuffle-free
    * by construction (assert with `.explain` — no Exchange on either side).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)

  /** Range-clustered parquet layout for data skipping (the Z-order-lite
    * every parquet lake gets for free): `repartitionByRange` makes each
    * output file own a disjoint key range, `sortWithinPartitions` makes
    * every row group's min/max stats tight — so a pushed-down point or
    * range predicate on the cluster keys skips whole files and row groups
    * at scan time. At 100 TB this is the difference between touching one
    * file and touching all of them for a selective key lookup; re-cluster
    * periodically on the hottest filter columns.
    */
  def writeClustered(df: DataFrame, path: String, keys: Seq[String],
      files: Int): Unit = {
    require(keys.nonEmpty, "clustered layout needs >= 1 key column")
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite `src` into `dst` with file count
    * sized by total bytes / `targetBytes` — the table-maintenance pass
    * that keeps a 100 TB lake's scan task count (and namenode/listing
    * load) proportional to data volume instead of to the accumulated
    * micro-batch/upsert write history. Pure rewrite: rows unchanged.
    */
  def compact(spark: SparkSession, src: String, dst: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(src)).getLength
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(src).repartition(files)
      .write.mode("overwrite").parquet(dst)
    files
  }
}
