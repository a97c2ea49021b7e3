package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** The `private[sql]` doorway the NATIVE bucket-grouped DSv2 scan
  * ([[graft.sources.v2]] storage-partitioned joins) needs: Spark's OWN
  * parquet reader function — `FileFormat.buildReaderWithPartitionValues`
  * — so the graft scan reads parquet with exactly the engine's codecs,
  * type promotion (widened columns over narrower files) and row-group
  * filter pushdown, instead of re-implementing a reader. Built once on
  * the driver; the returned closure is the same serializable function
  * `FileSourceScanExec` ships to executors (it broadcasts its Hadoop
  * conf internally). Accessibility-only, like [[StreamShim]]: no
  * behavior lives here.
  */
object ParquetReadShim {

  /** One reusable `PartitionedFile => Iterator[InternalRow]` for data
    * files with no partition-directory columns in their read schema
    * (`OPTION_RETURNING_BATCH = false`: rows, the DSv2 row-reader
    * contract — downstream operators copy what they buffer).
    */
  def buildReader(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter])
      : PartitionedFile => Iterator[InternalRow] = {
    val cs = spark.asInstanceOf[ClassicSession]
    val conf: Configuration =
      cs.sessionState.newHadoopConfWithOptions(Map.empty)
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs, dataSchema, new StructType(), requiredSchema, filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"), conf)
  }

  /** The COLUMNAR variant — Some only when the vectorized parquet
    * reader can batch this schema (`supportBatch`: atomic types,
    * within the wholestage field limits). With
    * `OPTION_RETURNING_BATCH = true` the returned iterator's elements
    * ARE `ColumnarBatch`es erased to `InternalRow` (the same contract
    * `FileSourceScanExec` consumes with a cast) — this is what keeps
    * the native bucket scan's throughput at parity with Spark's own
    * columnar parquet scans.
    */
  def buildColumnarReader(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter])
      : Option[PartitionedFile =>
        Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]] = {
    val cs = spark.asInstanceOf[ClassicSession]
    val fmt = new ParquetFileFormat()
    if (!fmt.supportBatch(cs, requiredSchema)) return None
    val conf: Configuration =
      cs.sessionState.newHadoopConfWithOptions(Map.empty)
    val f = fmt.buildReaderWithPartitionValues(
      cs, dataSchema, new StructType(), requiredSchema, filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "true"), conf)
    Some(pf => f(pf).asInstanceOf[
      Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]])
  }

  /** [[buildReader]] with Spark's parquet ROW-INDEX column appended as
    * the LAST field of every produced row: the reader recognizes the
    * reserved temporary column name and fills each row's index within
    * its file — correct under row-group skipping from pushed filters
    * (ParquetRowIndexUtil initializes the generator from the row
    * groups actually read). This is the same mechanism
    * `_metadata.row_index` rides in FileSourceScanExec, and what lets
    * a deletion-vector skip mask subtract exact (file, pos) rows
    * inside the graft native bucket scan.
    */
  def buildReaderWithRowIndex(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter])
      : PartitionedFile => Iterator[InternalRow] =
    buildReader(spark, dataSchema,
      StructType(requiredSchema.fields :+
        org.apache.spark.sql.types.StructField(
          // the RESERVED name ParquetRowIndexUtil detects (the public
          // ROW_INDEX_FIELD carries the post-copy `_metadata` name and
          // would read as an ordinary — missing — data column). MUST be
          // nullable: the column is absent from the file, and the
          // readers only null-fill ABSENT columns that are optional
          // (checkColumn throws on a required missing column) — the
          // row-index generator then overwrites the null fill.
          org.apache.spark.sql.execution.datasources.parquet
            .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
          org.apache.spark.sql.types.LongType, nullable = true)),
      filters)

  /** The COLUMNAR variant of [[buildReaderWithRowIndex]]: batches whose
    * LAST column is the parquet row index (exact under row-group
    * skipping — the vectorized reader's own row-index generator fills
    * it per batch). Some only when the vectorized reader batches the
    * appended schema. This is what lets a deletion-vector skip mask
    * stay VECTORIZED: the consumer filters each batch by position
    * instead of falling back to row-at-a-time reads.
    */
  def buildColumnarReaderWithRowIndex(spark: SparkSession,
      dataSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter])
      : Option[PartitionedFile =>
        Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]] =
    buildColumnarReader(spark, dataSchema,
      StructType(requiredSchema.fields :+
        org.apache.spark.sql.types.StructField(
          ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
          org.apache.spark.sql.types.LongType, nullable = true)),
      filters)

  def partitionedFile(path: String, length: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      0L, length, Array.empty, 0L, length)

  /** A BYTE-RANGE slice of one parquet file — the standard split
    * contract: the reader processes exactly the row groups whose
    * midpoint falls in `[start, start + len)`, and the row-index
    * generator still derives FILE-GLOBAL indexes from the footer's
    * block offsets (how `_metadata.row_index` stays correct under
    * FileSourceScanExec's own splitting). This is what lets a
    * deletion-vector reader skip fully-dead row groups: slice around
    * them and their bytes are never decoded.
    */
  def partitionedFileSlice(path: String, start: Long, len: Long,
      fileLen: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      start, len, Array.empty, 0L, fileLen)
}
