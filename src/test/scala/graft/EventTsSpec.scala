package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The schema-aware ts adapter — the round-7 regression (Spark 4.1.2
  * reading events.ts as TIMESTAMP_NTZ instead of legacy long nanos) must
  * never again depend on which physical dtype the testdata ships with.
  * One suite per supported dtype, plus the literal/pushdown contract.
  */
class EventTsSpec extends SparkSpec {

  private val nanos = 1704844800L * 1000000000L + 123456000L // 2024-01-10 + 123456 us
  private val micros = nanos / 1000

  private def longDf = {
    import spark.implicits._
    Seq((1L, nanos), (2L, nanos + 1000)).toDF("id", "ts")
  }

  private def ntzDf =
    longDf.withColumn("ts",
      to_timestamp_ntz(from_unixtime(col("ts") / 1e9,
        "yyyy-MM-dd HH:mm:ss"))) // second precision is enough to test dtype
      .withColumn("ts", col("ts") + make_dt_interval(lit(0), lit(0), lit(0),
        lit(0.123456))) // restore the sub-second part exactly

  private def tzDf = ntzDf.withColumn("ts", col("ts").cast(TimestampType))

  test("micros: identical epoch-micros across all three ts dtypes") {
    val fromLong = longDf.select(EventTs.micros(longDf).as("m"))
      .collect().map(_.getLong(0)).toSeq
    val fromNtz = ntzDf.select(EventTs.micros(ntzDf).as("m"))
      .collect().map(_.getLong(0)).toSeq
    val fromTz = tzDf.select(EventTs.micros(tzDf).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(fromLong == Seq(micros, micros + 1))
    assert(fromNtz == Seq(micros, micros)) // +1000 ns is sub-micro: floors
    assert(fromTz == fromNtz)
  }

  test("time: native TimestampType on every input dtype") {
    Seq(longDf, ntzDf, tzDf).foreach { df =>
      val out = df.select(EventTs.time(df).as("t"))
      assert(out.schema("t").dataType == TimestampType)
    }
    // and the instant is preserved (UTC session tz)
    val t = longDf.select(EventTs.time(longDf).cast("string").as("t"))
      .first().getString(0)
    assert(t == "2024-01-10 00:00:00.123456", t)
  }

  test("atNanos: literal dtype matches the raw column (comparable + exact)") {
    Seq(longDf, ntzDf, tzDf).foreach { df =>
      val n = df.filter(col("ts") >= EventTs.atNanos(df, nanos)).count()
      assert(n == 2, s"both rows at/after the cut for ${df.schema("ts").dataType}")
      val m = df.filter(col("ts") > EventTs.atNanos(df, nanos + 500000000L))
        .count()
      assert(m == 0, s"none past cut+0.5s for ${df.schema("ts").dataType}")
    }
  }

  test("atNanos bound on a parquet TIMESTAMP_NTZ column pushes to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eventts").toString
    ntzDf.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.schema("ts").dataType == TimestampNTZType) // env assumption
    val plan = df.filter(col("ts") >= EventTs.atNanos(df, nanos))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts,"),
      s"NTZ range bound must reach the parquet scan:\n$plan")
  }
}
