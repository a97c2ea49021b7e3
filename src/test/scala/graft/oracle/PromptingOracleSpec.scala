package graft.oracle

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

/** Scripted LLM stand-in: answers derive from the prompt text, so each
  * judgment contract (prompt shape -> parse) is exercised end to end
  * without a network. Top-level for closure serialization.
  */
class ScriptedOracle extends PromptingOracle {
  override def complete(prompt: String): String = {
    val p = prompt.toLowerCase
    if (p.startsWith("does the following text satisfy")) {
      // judge: yes iff the text line mentions spark
      if (p.linesIterator.exists(l => l.startsWith("text:") && l.contains("spark")))
        "Yes" else "No"
    } else if (p.startsWith("derive the value")) {
      // extract: first digits of the text, NA otherwise
      "\\d+".r.findFirstIn(p.linesIterator.find(_.startsWith("text:")).getOrElse(""))
        .getOrElse("NA")
    } else if (p.startsWith("assign the text")) {
      if (p.linesIterator.exists(l => l.startsWith("text:") && l.contains("stream")))
        "streaming" else "NA"
    } else if (p.startsWith("summarize the following")) {
      "  a compact summary  "
    } else if (p.startsWith("which text is more relevant")) {
      // duel: A wins iff text A mentions spark
      if (p.linesIterator.exists(l => l.startsWith("text a:") && l.contains("spark")))
        "A" else "B"
    } else if (p.startsWith("rate the relevance")) {
      if (p.contains("spark")) "0.9" else "not-a-number"
    } else sys.error(s"unexpected prompt: $prompt")
  }
  override def completeBatch(prompts: Seq[String]): Seq[String] = {
    ScriptedOracle.batchCalls.incrementAndGet()
    prompts.map(complete)
  }
}
object ScriptedOracle { val batchCalls = new AtomicInteger(0) }

class PromptingOracleSpec extends SparkSpec {
  import spark.implicits._
  private val o = new ScriptedOracle

  test("judge/extract/classify/score/duel parse completions correctly") {
    assert(o.judge("all about spark", "big data"))
    assert(!o.judge("flink things", "big data"))
    assert(o.extract("doc 42 here", "number").contains("42"))
    assert(o.extract("no digits", "number").isEmpty)
    val vocab = Seq(TagRule("x", "streaming"), TagRule("y", "batch"))
    assert(o.classify("stream processing", vocab).contains("streaming"))
    assert(o.classify("other", vocab).isEmpty)
    // classify result must be a known tag, else None
    assert(o.classify("stream", Seq(TagRule("z", "zzz"))).isEmpty)
    assert(o.summarize(Seq("a", "b"), "f") == "a compact summary")
    assert(o.score("spark talk", "q") == 0.9)
    assert(o.score("other", "q") == 0.0) // unparsable -> 0
    assert(o.duel("spark a", "b", "q"))
    assert(!o.duel("a", "spark b", "q"))
  }

  test("transient failures retry with backoff and then succeed") {
    val attempts = new AtomicInteger(0)
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new PromptingOracle {
      override def complete(prompt: String): String = {
        if (attempts.incrementAndGet() <= 2)
          throw new RuntimeException("transient 503")
        "Yes"
      }
      override protected def sleep(ms: Long): Unit = slept += ms
    }
    assert(flaky.judge("text", "cond"))
    assert(attempts.get() == 3)
    assert(slept.toSeq == Seq(50L, 100L)) // exponential backoff
    assert(flaky.failedCompletions.sum() == 0)
  }

  test("give-up after maxAttempts: the ROW takes its conservative " +
      "default and is counted, the caller never sees the throw") {
    val attempts = new AtomicInteger(0)
    val dead = new PromptingOracle {
      override def complete(prompt: String): String = {
        attempts.incrementAndGet(); throw new RuntimeException("down")
      }
      override protected def sleep(ms: Long): Unit = ()
    }
    assert(!dead.judge("text", "cond"))
    assert(attempts.get() == 3)
    assert(dead.extract("text", "d").isEmpty)
    assert(dead.score("text", "q") == 0.0)
    assert(dead.summarize(Seq("a"), "d") == "")
    assert(dead.failedCompletions.sum() == 4)
  }

  test("non-transient failures do not retry") {
    val attempts = new AtomicInteger(0)
    val fatal = new PromptingOracle {
      override def complete(prompt: String): String = {
        attempts.incrementAndGet()
        throw new IllegalStateException("bad API key")
      }
      override protected def isTransient(e: Throwable): Boolean =
        !e.isInstanceOf[IllegalStateException]
      override protected def sleep(ms: Long): Unit = ()
    }
    assert(!fatal.judge("text", "cond"))
    assert(attempts.get() == 1) // no retry on a non-transient failure
    assert(fatal.failedCompletions.sum() == 1)
  }

  test("partial-batch: a failed batch RPC degrades to per-row calls; " +
      "only the poisoned rows take defaults") {
    val poisoned = new PromptingOracle {
      override def complete(prompt: String): String =
        if (prompt.contains("poison")) throw new RuntimeException("boom")
        else if (prompt.linesIterator.exists(l =>
          l.startsWith("Text:") && l.contains("spark"))) "Yes" else "No"
      override def completeBatch(prompts: Seq[String]): Seq[String] =
        throw new RuntimeException("batch endpoint down")
      override protected def sleep(ms: Long): Unit = ()
    }
    val got = poisoned.judgeBatch(
      Seq("spark doc", "poison doc", "flink doc"), "cond")
    assert(got == Seq(true, false, false))
    assert(poisoned.failedCompletions.sum() == 1) // exactly the poisoned row
  }

  test("a wrong-cardinality batched response degrades to per-row calls " +
      "with no lost answers") {
    val truncating = new PromptingOracle {
      override def complete(prompt: String): String =
        if (prompt.linesIterator.exists(l =>
          l.startsWith("Text:") && l.contains("spark"))) "Yes" else "No"
      override def completeBatch(prompts: Seq[String]): Seq[String] =
        prompts.take(1).map(complete) // malformed: drops rows
      override protected def sleep(ms: Long): Unit = ()
    }
    assert(truncating.judgeBatch(Seq("spark a", "b", "spark c"), "cond") ==
      Seq(true, false, true))
    assert(truncating.failedCompletions.sum() == 0)
  }

  test("operators route a PromptingOracle through batched completions") {
    ScriptedOracle.batchCalls.set(0)
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i % 4 == 0) s"spark doc $i" else s"flink doc $i"))
      .toDF("id", "txt").repartition(2)
    val kept = graft.ops.SemFilter(docs,
      graft.plan.LogicalOp.SemFilter(Seq("txt"), "about spark"), o)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == (4 to 100 by 4).map(_.toLong))
    // 100 rows reached the oracle in a handful of batch RPCs, not 100
    val calls = ScriptedOracle.batchCalls.get()
    assert(calls > 0 && calls <= 4, s"batch calls: $calls")
  }
}
