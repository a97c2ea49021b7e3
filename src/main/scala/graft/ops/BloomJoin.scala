package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: the classic shuffle-volume cut for a
  * selective join at scale. Build a Bloom filter over the small side's
  * keys (driver-bounded: the filter's size is set by expectedItems/fpp,
  * never by the large side), broadcast it, and drop large-side rows that
  * cannot match BEFORE they reach the exchange; the exact join afterwards
  * removes the false positives, so results are identical to the plain
  * join by construction.
  *
  * At 100 TB with a 0.1%-selective key set, the bloom turns "shuffle the
  * whole fact table" into "shuffle ~0.1% + fpp of it" — the same idea as
  * Spark's AQE runtime row-level filtering, here as an explicit,
  * plannable operator (and available when AQE's own heuristics decline).
  */
object BloomJoin {

  /** Exact LEFT SEMI join of `large` against `small`, bloom-pruned before
    * the shuffle. `expectedItems` sizes the filter to the small side's
    * distinct-key count (over-sizing costs bits, never correctness).
    */
  def prunedSemiJoin(large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    // an empty build side would crash the sketch aggregate — and means an
    // empty result; emit it through the same join shape so the plan (and
    // any pin on it) stays identical
    if (small.isEmpty)
      return large.filter(lit(false))
        .join(small.select(col(smallKey).as(largeKey)).distinct(),
          Seq(largeKey), "left_semi")
    // build over xxhash64(key): the sketch stores longs via putLong, the
    // probe side uses Spark's native BloomFilterMightContain (codegen'd,
    // mightContainLong) — same build/probe pairing as AQE's injected
    // runtime row-level filter, no UDF serialization boundary in the hot
    // filter path
    val bf = small.select(xxhash64(col(smallKey)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    large.filter(col(largeKey).isNotNull &&
        org.apache.spark.sql.GraftShim.bloomMightContain(
          bytes, xxhash64(col(largeKey))))
      .join(small.select(col(smallKey).as(largeKey)).distinct(),
        Seq(largeKey), "left_semi")
  }
}
