package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED MinHash-LSH dedup index — near-duplicate detection for
  * CONTINUOUS INGESTION. The one-shot [[Dedup.minhashDedup]] rescans the
  * whole corpus per batch; at 100 TB that is a full-corpus job to admit
  * a 0.01% delta. This index persists the corpus's LSH band keys (and a
  * signature side table) once; each new batch then costs:
  *
  *   - ONE scan of the bands table, probed by a BROADCAST of the batch's
  *     band keys (a broadcast hash join — the big side never shuffles),
  *   - ONE scan of the signatures table for the verify step, again
  *     against broadcast candidate ids,
  *   - [[append]]: survivors' band/sig rows written as NEW files —
  *     existing index files are immutable (the [[Similarity.IvfPq]]
  *     append posture).
  *
  * Layout under `path`:
  *   bands/  (band INT, key LONG, id LONG)   — parquet, the probe table
  *   sigs/   (id LONG, sig ARRAY<LONG>)       — parquet, the verify table
  *   _meta.json                               — frozen parameters
  *
  * Parameters (shingleN, k, bands, threshold) are FROZEN at [[build]]:
  * a probe or append under different parameters would silently miss
  * duplicates (band keys from different shingle sizes never collide),
  * so both fail fast on a mismatch. Reference semantics: same estimate
  * threshold contract as [[Dedup.minhashCandidates]] — the estimate-set
  * vs exact-set agreement argument of `q_dedup_minhash` carries over.
  *
  * Single-appender contract (like IvfPq.append): concurrent appends can
  * both admit one member of a cross-batch duplicate pair. Serialize
  * appends, or dedup across recent batches downstream.
  */
object DedupIndex {

  final case class Meta(shingleN: Int, k: Int, bands: Int,
      threshold: Double)

  private def metaPath(path: String) = new Path(path, "_meta.json")

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = (s"""{"shingleN":${m.shingleN},"k":${m.k},""" +
      s""""bands":${m.bands},"threshold":${m.threshold}}""").getBytes("UTF-8")
    val out = fs.create(p, true)
    try out.write(body) finally out.close()
  }

  def readMeta(spark: SparkSession, path: String): Meta = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$path is not a dedup index (no _meta.json)")
    val in = fs.open(p)
    val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(body)
    def num(f: String): Double = j \ f match {
      case JInt(n) => n.toDouble; case JLong(n) => n.toDouble
      case JDouble(d) => d
      case _ => throw new IllegalArgumentException(s"bad _meta.json: $f")
    }
    Meta(num("shingleN").toInt, num("k").toInt, num("bands").toInt,
      num("threshold"))
  }

  /** (band, key, id) + (id, sig) rows for a frame, under `m`'s params.
    * Signature-less rows (null/too-short text) contribute nothing — they
    * can never be near-duplicates under the shingle contract.
    */
  private def bandRows(df: DataFrame, idCol: String, text: Column,
      m: Meta): (DataFrame, DataFrame) = {
    val sigs = Dedup.signatures(df, idCol, text, m.shingleN, m.k)
    val bands = sigs.select(col("id"),
        posexplode(Dedup.bandKeys(col("sig"), m.bands, m.k / m.bands))
          .as(Seq("band", "key")))
      .select(col("band").cast("int").as("band"), col("key"), col("id"))
    (bands, sigs)
  }

  /** Build the index over `df` (the corpus) at `path`, replacing any
    * existing index there.
    */
  def build(df: DataFrame, idCol: String, text: Column, path: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): Unit = {
    require(k % bands == 0, "bands must divide k")
    val m = Meta(shingleN, k, bands, threshold)
    val (b, s) = bandRows(df, idCol, text, m)
    b.write.mode("overwrite").parquet(s"$path/bands")
    s.write.mode("overwrite").parquet(s"$path/sigs")
    writeMeta(df.sparkSession, path, m)
  }

  /** Batch ids dominated by an INDEXED document (estimated Jaccard >=
    * the index's frozen threshold), with the best estimate per id.
    * Plan shape: bands scan + broadcast probe, sigs scan + broadcast
    * candidates — the corpus-sized tables are read once and never
    * shuffled (pinned in DedupIndexSpec).
    */
  def dominatedBy(spark: SparkSession, path: String, newDf: DataFrame,
      idCol: String, text: Column): DataFrame = {
    val m = readMeta(spark, path)
    val (nb, ns) = bandRows(newDf, idCol, text, m)
    val indexBands = spark.read.parquet(s"$path/bands")
    val indexSigs = spark.read.parquet(s"$path/sigs")
    // candidate (corpus id, new id) pairs: any shared band key;
    // tombstoned corpus ids ([[remove]]) no longer suppress anything
    val cand0 = indexBands
      .join(broadcast(nb.select(col("band"), col("key"),
        col("id").as("new_id"))), Seq("band", "key"))
      .select(col("id").as("corpus_id"), col("new_id"))
      .distinct()
    val cand = tombstones(spark, path) match {
      case Some(d) => cand0.join(
        broadcast(d.withColumnRenamed("id", "__del_id")),
        cand0("corpus_id") === col("__del_id"), "left_anti")
      case None => cand0
    }
    // verify on true signatures; both small sides broadcast
    cand.join(indexSigs, cand("corpus_id") === indexSigs("id"))
      .select(col("corpus_id"), col("new_id"),
        col("sig").as("corpus_sig"))
      .join(broadcast(ns.select(col("id").as("new_id"),
        col("sig").as("new_sig"))), Seq("new_id"))
      .select(col("new_id"),
        Dedup.estJaccard(col("corpus_sig"), col("new_sig")).as("est"))
      .filter(col("est") >= m.threshold)
      .groupBy("new_id").agg(max("est").as("est"))
      .select(col("new_id").as(idCol), col("est"))
  }

  /** Dedup `newDf` against the index AND within itself (smaller id wins,
    * [[Dedup.minhashDedup]] semantics), returning the surviving rows.
    * The batch-internal pass uses the index's frozen parameters so one
    * threshold governs both halves.
    */
  def dedupAgainst(spark: SparkSession, path: String, newDf: DataFrame,
      idCol: String, text: Column): DataFrame = {
    val m = readMeta(spark, path)
    val inBatch = Dedup.minhashCandidates(newDf, idCol, text,
      m.shingleN, m.k, m.bands, m.threshold)
      .select(col("id_b").as(idCol)).distinct()
    val vsCorpus = dominatedBy(spark, path, newDf, idCol, text)
      .select(col(idCol))
    newDf.join(inBatch.unionByName(vsCorpus).distinct(),
      Seq(idCol), "left_anti")
  }

  /** Append `survivors` (rows already admitted by [[dedupAgainst]]) to
    * the index: their band/sig rows land as new parquet files, existing
    * files untouched. Later probes see them with zero reader changes.
    */
  def append(spark: SparkSession, path: String, survivors: DataFrame,
      idCol: String, text: Column): Unit = {
    val m = readMeta(spark, path)
    val (b, s) = bandRows(survivors, idCol, text, m)
    b.write.mode("append").parquet(s"$path/bands")
    s.write.mode("append").parquet(s"$path/sigs")
  }

  /** Tombstone corpus ids OUT of the index (the compliance-delete path:
    * a document removed from the corpus must stop suppressing its
    * near-duplicates): one small append to `deletes/`, no index file
    * rewritten. Probes anti-join the tombstones out of the candidate
    * set, so a copy of a removed document is admissible again
    * immediately; [[compact]] later drops the rows physically. Mirrors
    * [[Similarity.IvfPq.remove]].
    */
  def remove(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit = {
    readMeta(spark, path) // fail fast on a non-index path
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("append").parquet(s"$path/deletes")
  }

  private def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val p = new Path(s"$path/deletes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).distinct())
    else None
  }

  /** Maintenance rewrite: fold accumulated per-batch append files (and
    * drop tombstoned rows) into `targetFiles` coarse files per table,
    * then clear `deletes/`. Probe results are identical before and
    * after. Single-maintainer contract: the swap (write-new, delete-old,
    * rename) is not atomic for a concurrent reader — run it like
    * vacuum, not beside live probes.
    */
  def compact(spark: SparkSession, path: String,
      targetFiles: Int = 16): Unit = {
    readMeta(spark, path)
    val del = tombstones(spark, path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq("bands", "sigs").foreach { sub =>
      val cur = spark.read.parquet(s"$path/$sub")
      val kept = del match {
        case Some(d) => cur.join(
          broadcast(d.withColumnRenamed("id", "__del_id")),
          cur("id") === col("__del_id"), "left_anti")
        case None => cur
      }
      val tmp = s"$path/${sub}_compacting"
      kept.repartition(targetFiles).write.mode("overwrite").parquet(tmp)
      fs.delete(new Path(s"$path/$sub"), true)
      fs.rename(new Path(tmp), new Path(s"$path/$sub"))
    }
    fs.delete(new Path(s"$path/deletes"), true)
    ()
  }

  /** STREAMING admission: every micro-batch is deduped against the
    * index (and itself), survivors are handed to `sink`, then appended
    * to the index — so batch N+1's probe sees everything batch N
    * admitted. The index IS the stream's state, which is what makes a
    * restart safe: a replayed batch re-probes against the grown index
    * and its already-admitted rows drop as self-duplicates.
    *
    * Ordering contract: survivors are MATERIALIZED (localCheckpoint)
    * before anything else — the probe plan reads the index, so an
    * append before evaluation would make every survivor a duplicate of
    * itself — then `sink` runs BEFORE `append`. With an idempotent sink
    * (e.g. [[graft.sources.Merge.upsert]] with a txn stamp keyed on the
    * batch id) the pair is exactly-once under crash-replay: a crash
    * after sink, before append, replays into a txn no-op sink and a
    * fresh append; a crash after append replays into an empty survivor
    * set and touches nothing. A non-idempotent sink degrades to
    * at-least-once.
    */
  def streamingAdmit(stream: DataFrame, indexPath: String, idCol: String,
      textCol: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    streamingAdmitBatches(stream, indexPath, idCol, textCol)(
      (surv, _) => sink(surv))

  /** [[streamingAdmit]] variant handing the sink the micro-batch id —
    * the hook an exactly-once sink needs for its txn stamp (e.g.
    * `Merge.upsert(..., txn = Some((appId, batchId)))`): after a
    * checkpoint loss the replayed batch's survivors are empty (self
    * duplicates) AND the stamp no-ops, so the sink table's history is
    * untouched on every replay path.
    */
  def streamingAdmitBatches(stream: DataFrame, indexPath: String,
      idCol: String, textCol: String)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] = {
    require(stream.isStreaming, "streamingAdmit needs a streaming frame")
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val survivors = dedupAgainst(batch.sparkSession, indexPath,
          batch, idCol, col(textCol)).localCheckpoint(true)
        sink(survivors, batchId)
        append(batch.sparkSession, indexPath, survivors, idCol,
          col(textCol))
        ()
    }
  }
}
