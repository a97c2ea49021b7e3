package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact bin-packs to the size target and preserves every row") {
    val dir = Files.createTempDirectory("graft_compact_spec").toFile
    dir.deleteOnExit()
    val src = dir.getAbsolutePath + "/src"
    val dst = dir.getAbsolutePath + "/dst"
    // 40 partitions of a small table -> 40 tiny files
    (0L until 10000L).map(i => (i, s"payload_$i")).toDF("id", "v")
      .repartition(40).write.parquet(src)
    val srcFiles = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(srcFiles == 40)
    val totalBytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = totalBytes / 3
    val planned = Tables.compact(spark, src, dst, targetBytes = target)
    val dstFiles = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dstFiles == planned && planned <= 5,
      s"expected few compacted files, got $dstFiles (planned $planned)")
    // pure rewrite: identical row multiset
    val a = spark.read.parquet(src).orderBy("id").collect()
    val b = spark.read.parquet(dst).orderBy("id").collect()
    assert(a.sameElements(b))
  }
}
