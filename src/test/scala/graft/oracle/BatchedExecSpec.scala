package graft.oracle

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Deterministic oracle forced onto the batched path, counting batch
  * calls to prove batching actually happens. Top-level so the closure
  * serializes without capturing the test suite.
  */
class CountingOracle extends DeterministicOracle with BatchedOracle {
  override def compileJudge(c: String) = None
  override def compileExtract(d: String) = None
  override def judgeBatch(texts: Seq[String], condition: String) = {
    CountingOracle.batches.incrementAndGet()
    CountingOracle.maxBatch.updateAndGet(m => math.max(m, texts.length))
    CountingOracle.texts.addAndGet(texts.length)
    super.judgeBatch(texts, condition)
  }
  override def duelBatch(pairs: Seq[(String, String)], query: String) = {
    CountingOracle.duelBatches.incrementAndGet()
    CountingOracle.duels.addAndGet(pairs.length)
    super.duelBatch(pairs, query)
  }
}
object CountingOracle {
  val batches = new AtomicInteger(0)
  val maxBatch = new AtomicInteger(0)
  val texts = new AtomicInteger(0)
  val duelBatches = new AtomicInteger(0)
  val duels = new AtomicInteger(0)
}

class BatchedExecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 200).map(i =>
    (i.toLong, if (i % 3 == 0) s"spark doc $i" else s"other doc $i"))
    .toDF("id", "txt").repartition(2)

  test("batched sem_filter matches compiled path and batches requests") {
    CountingOracle.batches.set(0); CountingOracle.maxBatch.set(0)
    val oracle = new CountingOracle
    val batched = BatchedExec.semFilter(docs, col("txt"), "spark", oracle,
      batchSize = 32).select("id").as[Long].collect().sorted.toSeq
    val compiled = graft.ops.SemFilter(docs,
      graft.plan.LogicalOp.SemFilter(Seq("txt"), "spark"),
      DeterministicOracle.default).select("id").as[Long].collect().sorted.toSeq
    assert(batched == compiled)
    assert(batched.size == 66)
    // 200 rows / batch 32 across 2 partitions: 7-8 calls, never 200
    assert(CountingOracle.batches.get() <= 8)
    assert(CountingOracle.maxBatch.get() == 32)
  }

  test("batched sem_map appends nullable extraction column") {
    val oracle = new CountingOracle
    val got = BatchedExec.semMap(docs, "num", col("txt"), "(\\d+)", oracle)
      .select("id", "num").as[(Long, Option[String])].collect().toMap
    assert(got(7L).contains("7"))
    assert(got.size == 200)
  }

  test("SemFilter routes a non-compilable BatchedOracle through batches") {
    CountingOracle.batches.set(0); CountingOracle.maxBatch.set(0)
    val oracle = new CountingOracle
    val got = graft.ops.SemFilter(docs,
      graft.plan.LogicalOp.SemFilter(Seq("txt"), "spark"), oracle)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got.size == 66)
    // operator-level routing: the 200 judgments arrived in <= 8 batches
    assert(CountingOracle.batches.get() > 0 &&
      CountingOracle.batches.get() <= 8)
  }

  test("staged cascade feeds only cheap-filter survivors to the oracle") {
    CountingOracle.batches.set(0); CountingOracle.texts.set(0)
    val oracle = new CountingOracle
    val plan: Seq[graft.plan.LogicalOp] = Seq(
      graft.plan.LogicalOp.KeywordFilter(Seq("txt"), Seq("spark"), "and", "contains"),
      graft.plan.LogicalOp.SemFilter(Seq("txt"), "doc"))
    val got = graft.exec.Cascade.filter(docs,
      plan.zipWithIndex.map(_.swap), None, oracle)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got.size == 66) // every "spark doc N" row also contains "doc"
    // the reference's undecided-row staging (Exection_Agent.py:380-394):
    // only the 66 keyword-filter survivors reach the oracle, not all 200
    assert(CountingOracle.texts.get() == 66)
  }

  test("duel mode batches pairs for a batched oracle, same ranking") {
    CountingOracle.duelBatches.set(0); CountingOracle.duels.set(0)
    val oracle = new CountingOracle
    val op = graft.plan.LogicalOp.SemTopK(Seq("txt"), "spark", 3)
    val batched = graft.ops.SemTopK.duelTopK(docs, op, oracle, "id")
      .select("id").as[Long].collect().toSeq
    val direct = graft.ops.SemTopK.duelTopK(docs, op,
      DeterministicOracle.default, "id")
      .select("id").as[Long].collect().toSeq
    assert(batched == direct)
    val pairs = CountingOracle.duels.get()
    assert(pairs > 0 && CountingOracle.duelBatches.get() <= pairs / 32 + 8)
  }

  test("batch kernel arity mismatch fails loudly") {
    val bad = intercept[org.apache.spark.SparkException] {
      BatchedExec.withBatchedColumn(docs, "x",
        org.apache.spark.sql.types.StringType, col("txt"), 16)(
        ts => ts.take(1).map(identity)).count()
    }
    assert(bad.getMessage.contains("oracle batch") ||
      bad.getCause != null)
  }
}
