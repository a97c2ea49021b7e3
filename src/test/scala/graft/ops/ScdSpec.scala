package graft.ops

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    (1L, 10L, "a", 100L), (1L, 20L, "b", 101L), (1L, 30L, "c", 102L),
    (2L, 15L, "x", 103L)).toDF("k", "ts", "attr", "id")

  test("intervals chain per key: valid_to = next change, one current") {
    val out = Scd.buildType2(log, "k", "ts", "id")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .toSeq
    assert(out == Seq(
      (1L, 10L, Some(20L), false),
      (1L, 20L, Some(30L), false),
      (1L, 30L, None, true),
      (2L, 15L, None, true)))
  }

  test("equal timestamps order by the tiebreak") {
    val dup = Seq((1L, 10L, "a", 1L), (1L, 10L, "b", 2L))
      .toDF("k", "ts", "attr", "id")
    val out = Scd.buildType2(dup, "k", "ts", "id")
      .orderBy("id").collect()
    assert(Option(out(0).get(4)).contains(10L) && !out(0).getBoolean(5))
    assert(out(1).isNullAt(4) && out(1).getBoolean(5))
  }

  test("dedupeConsecutive drops no-op re-deliveries, null-safely") {
    val redeliver = Seq(
      (1L, 10L, Some("a"), 1L), (1L, 20L, Some("a"), 2L), // no-op
      (1L, 30L, Option.empty[String], 3L),
      (1L, 40L, Option.empty[String], 4L),                // null == null no-op
      (1L, 50L, Some("a"), 5L))                           // real change back
      .toDF("k", "ts", "attr", "id")
    val kept = Scd.dedupeConsecutive(redeliver, "k", "ts", "id", Seq("attr"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L))
  }
}
