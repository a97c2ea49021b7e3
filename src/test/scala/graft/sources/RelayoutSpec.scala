package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-count evolution: one full-rewrite commit, automatic routing
  * through the new layout, history untouched.
  */
class RelayoutSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_relayout_$tag").toFile
    d.deleteOnExit()
    new File(d, "tbl").getAbsolutePath
  }

  private def baseDf =
    (0L until 200L).map(i => (i, s"name_$i", i * 10.0))
      .toDF("id", "name", "score")

  test("relayout rewrites under the new hash; consumers re-route") {
    val path = freshDir("grow")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4,
      statsCols = Seq("id"))
    Merge.upsert(spark, path,
      Seq((7L, "upd", 777.0)).toDF("id", "name", "score"),
      "id", nBuckets = 4)
    val v = Merge.relayout(spark, path, newBuckets = 32)
    assert(v == 2L)
    assert(Merge.tableLayout(spark, path).contains(("id", 32)))
    // content identical, new layout live
    val cur = Merge.readKeyed(spark, path)
    assert(cur.count() == 200)
    assert(cur.filter($"id" === 7L).head().getAs[String]("name") == "upd")
    // point lookup routes by the NEW bucket count
    assert(Merge.lookupKey(spark, path, 7L).count() == 1)
    // an upsert with the new count touches one bucket of 32
    val st = Merge.upsert(spark, path,
      Seq((9L, "post", 9.0)).toDF("id", "name", "score"),
      "id", nBuckets = 32)
    assert(st.nBuckets == 32 && st.bucketsTouched == 1)
    // the old count now fails fast — the layout contract
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((1L, "x", 1.0)).toDF("id", "name", "score"),
        "id", nBuckets = 4)
    }
    assert(e.getMessage.contains("bucketed"))
    // history reads its own layout's files
    assert(Merge.readVersion(spark, path, 0L).count() == 200)
    assert(Merge.readVersion(spark, path, 1L)
      .filter($"id" === 7L).head().getAs[String]("name") == "upd")
  }

  test("relayout folds live deletion vectors; no-op at the same count") {
    val path = freshDir("dv")
    Merge.writeKeyed(baseDf, path, "id", nBuckets = 4)
    Merge.deleteWhereDV(spark, path, $"id" < 20)
    val pre = Merge.readKeyed(spark, path).orderBy("id").collect()
    Merge.relayout(spark, path, newBuckets = 16)
    assert(Merge.readKeyed(spark, path).orderBy("id").collect()
      .sameElements(pre))
    Merge.vacuum(spark, path, keepVersions = 1)
    assert(Merge.readKeyed(spark, path).count() == 180)
    // same count: no commit
    val v = Merge.currentVersion(spark, path)
    assert(Merge.relayout(spark, path, newBuckets = 16) == v)
    assert(Merge.currentVersion(spark, path) == v)
  }
}
