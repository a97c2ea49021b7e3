package graft.sources

import org.apache.spark.sql.types.StructType

/** Deletion-vector BITMAP sidecar codec — the v2 on-disk format for
  * [[Merge.deleteWhereDV]]'s skip sets.
  *
  * v1 sidecars are parquet `(file STRING, pos BIGINT)` — one ROW per
  * deleted row, so a billion-row compliance delete writes (and every
  * count adjustment re-reads) a billion sidecar rows. v2 writes one row
  * per TOUCHED DATA FILE: `(file STRING, n BIGINT, dv BINARY)` where
  * `dv` is the file's sorted deleted positions delta-varint encoded
  * (the same idea as Delta's per-file RoaringBitmapArray DVs, in a
  * dependency-free encoding). Sidecar row count becomes O(files), the
  * exact per-file counts ride the `n` column (COUNT(*)/LIMIT/MIN-MAX
  * adjustments never touch a position), and the native scan decodes a
  * blob straight into its sorted `long[]` skip set.
  *
  * Every reader goes through [[SupersetSchema]] — parquet null-fills
  * absent optional columns, so v1 rows read with `dv` null and v2 rows
  * with `pos` null. Mixed manifests (old v1 commits + new v2 commits)
  * therefore need no format tagging anywhere.
  *
  * Encoding: 1 header byte (format version, 0x01), then unsigned
  * LEB128 varints — the first position absolute, each subsequent value
  * the GAP to its predecessor (gaps >= 1: positions are unique per
  * file). Clustered deletes (the common case: a contiguous id range, a
  * bad ingest batch) encode at ~1 byte per deleted row.
  */
object DvCodec {

  /** The read schema EVERY sidecar consumer uses, whatever mix of
    * formats the manifest references: v1 rows carry (file, pos) with
    * n/dv null; v2 rows carry (file, n, dv) with pos null.
    */
  val SupersetSchema: StructType =
    StructType.fromDDL("file STRING, pos BIGINT, n BIGINT, dv BINARY")

  private val FormatV1: Byte = 0x01

  /** Encode ascending unique positions. Empty input encodes to the
    * bare header (decodes back to empty).
    */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 + sorted.length)
    out.write(FormatV1.toInt)
    var prev = -1L
    var i = 0
    while (i < sorted.length) {
      val p = sorted(i)
      require(p > prev,
        s"positions must be ascending and unique: $p after $prev")
      writeVarLong(out, if (i == 0) p else p - prev)
      prev = p
      i += 1
    }
    out.toByteArray
  }

  def decode(blob: Array[Byte]): Array[Long] = {
    require(blob.length >= 1 && blob(0) == FormatV1,
      s"unknown DV blob format ${if (blob.isEmpty) "<empty>" else blob(0)}")
    val b = new scala.collection.mutable.ArrayBuilder.ofLong()
    var off = 1
    var acc = 0L
    var first = true
    while (off < blob.length) {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val byte = blob(off)
        off += 1
        v |= (byte & 0x7fL) << shift
        shift += 7
        more = (byte & 0x80) != 0
      }
      acc = if (first) v else acc + v
      first = false
      b.addOne(acc)
    }
    b.result()
  }

  private def writeVarLong(out: java.io.ByteArrayOutputStream,
      value: Long): Unit = {
    require(value >= 0L, s"varint requires non-negative value: $value")
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }
}
