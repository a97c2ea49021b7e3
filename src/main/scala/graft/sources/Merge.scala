package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) for plain-parquet tables — the lakehouse
  * primitive (UPDATE existing keys + INSERT new ones in one atomic-ish
  * write) that raw `spark.write.parquet` lacks.
  *
  * Layout contract: the table is written `partitionBy(__bucket)` where
  * `__bucket = pmod(xxhash64(key), nBuckets)`. An upsert then:
  *
  *   1. buckets the updates the same way and collects the DISTINCT bucket
  *      ids they land in (bounded by nBuckets — a driver-safe collect);
  *   2. reads ONLY those bucket directories (partition pruning — the scan
  *      cost is proportional to touched data, not table size);
  *   3. anti-joins away the replaced keys, unions the updates;
  *   4. rewrites ONLY the touched bucket directories via dynamic partition
  *      overwrite — untouched buckets are never read and never written.
  *
  * At 100 TB with, say, 4096 buckets, upserting 0.1% of keys touches a few
  * buckets and leaves the rest of the table's files byte-identical (a
  * MergeSpec assertion). Production table formats add a transaction log on
  * top; the I/O shape — rewrite touched partitions only — is this one.
  */
object Merge {

  private def bucketCol(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong))

  /** Write `df` hash-bucketed by `keyCol` into `path` (the upsert-able
    * layout). Bucket count sizes the rewrite granularity: more buckets =
    * finer copy-on-write, more directories.
    */
  def writeKeyed(df: DataFrame, path: String, keyCol: String,
      nBuckets: Int): Unit = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    df.withColumn("__bucket", bucketCol(keyCol, nBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)
  }

  /** The table's logical rows (layout column dropped). */
  def readKeyed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")

  final case class MergeStats(bucketsTouched: Int, nBuckets: Int,
      rowsUpserted: Long)

  /** Upsert `updates` (one row per key — last-writer-wins across calls,
    * caller guarantees in-batch key uniqueness) into the keyed table at
    * `path`. Returns how much of the table the write actually touched.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, nBuckets: Int): MergeStats = {
    val withB = updates.withColumn("__bucket", bucketCol(keyCol, nBuckets))
    val touched = withB.select("__bucket").distinct()
      .collect().map(_.getLong(0)) // bounded by nBuckets
    if (touched.isEmpty) return MergeStats(0, nBuckets, 0L)
    val base = spark.read.parquet(path)
      .filter(col("__bucket").isin(touched.map(Long.box): _*))
    val merged = base
      .join(withB.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(withB.select(base.columns.map(col): _*))
      // truncate lineage: Spark (correctly) refuses to overwrite a path
      // that is also a read source of the same plan. The touched-bucket
      // slice is bounded by construction, so materializing it locally is
      // the cheap half of the copy-on-write; production systems stage to
      // new files + swap a log pointer instead.
      .localCheckpoint(true)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("__bucket").parquet(path)
    finally spark.conf
      .set("spark.sql.sources.partitionOverwriteMode", prevMode)
    MergeStats(touched.length, nBuckets, updates.count())
  }
}
