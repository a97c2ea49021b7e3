package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted LSH index: continuous-ingestion dedup must admit the
  * same rows a one-shot dedup over the union would, while only ever
  * scanning (not shuffling) the corpus-sized tables.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_dedup_idx").toString + "/idx"

  // long distinctive texts: J(a,b) far below any 0.7 threshold unless
  // texts are equal
  private def doc(i: Long): (Long, String) =
    (i, (0 until 12).map(j => s"w${i}_$j").mkString(" "))

  private val corpus = (0L until 40L).map(doc).toDF("doc_id", "text")

  test("probe drops copies of indexed docs, keeps fresh docs") {
    val path = freshDir()
    DedupIndex.build(corpus, "doc_id", col("text"), path)
    val batch = Seq(
      (100L, corpus.filter($"doc_id" === 3L).select("text").as[String].head()),
      doc(101L), doc(102L)).toDF("doc_id", "text")
    val out = DedupIndex.dedupAgainst(spark, path, batch, "doc_id",
      col("text")).select("doc_id").as[Long].collect().toSet
    assert(out == Set(101L, 102L), s"copy of doc 3 must drop, got $out")
  }

  test("batch-internal duplicates: smaller id survives") {
    val path = freshDir()
    DedupIndex.build(corpus, "doc_id", col("text"), path)
    val t = "a fresh batch text with enough tokens to shingle properly here"
    val batch = Seq((200L, t), (201L, t), doc(202L)).toDF("doc_id", "text")
    val out = DedupIndex.dedupAgainst(spark, path, batch, "doc_id",
      col("text")).select("doc_id").as[Long].collect().toSet
    assert(out == Set(200L, 202L), s"got $out")
  }

  test("append grows the index: a copy of an appended doc is caught") {
    val path = freshDir()
    DedupIndex.build(corpus, "doc_id", col("text"), path)
    val fresh = Seq(doc(300L)).toDF("doc_id", "text")
    val admitted = DedupIndex.dedupAgainst(spark, path, fresh, "doc_id",
      col("text"))
    assert(admitted.count() == 1)
    DedupIndex.append(spark, path, admitted, "doc_id", col("text"))
    // next batch: a copy of 300 (now indexed) and one genuinely new doc
    val batch2 = Seq((400L, doc(300L)._2), doc(401L)).toDF("doc_id", "text")
    val out = DedupIndex.dedupAgainst(spark, path, batch2, "doc_id",
      col("text")).select("doc_id").as[Long].collect().toSet
    assert(out == Set(401L), s"copy of appended doc must drop, got $out")
  }

  test("probing a non-index path fails fast") {
    val e = intercept[IllegalArgumentException] {
      DedupIndex.dominatedBy(spark, freshDir(), corpus, "doc_id",
        col("text"))
    }
    assert(e.getMessage.contains("_meta.json"))
  }

  test("probe plan: corpus tables broadcast-joined, never sort-merged") {
    val path = freshDir()
    DedupIndex.build(corpus, "doc_id", col("text"), path)
    val probe = DedupIndex.dominatedBy(spark, path,
      Seq(doc(500L)).toDF("doc_id", "text"), "doc_id", col("text"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized side must not shuffle:\n$plan")
  }
}
