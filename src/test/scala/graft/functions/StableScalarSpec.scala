package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.WholeStageCodegenExec

class StableScalarSpec extends SparkSpec {
  import spark.implicits._

  test("evaluates to its value, non-null, in a real plan") {
    val r = spark.range(3).toDF("i")
      .select(($"i" + StableScalar.column(2.5)).as("v"))
      .collect().map(_.getDouble(0)).sorted
    assert(r.toSeq == Seq(2.5, 3.5, 4.5))
  }

  test("interpreted eval matches codegen") {
    assert(StableScalar(7.25).eval(null) == 7.25)
  }

  test("generated source is byte-identical across different values") {
    // the whole point: an iterative operator feeding a fresh driver
    // scalar into each round must not recompile the stage every round.
    // lit(x) embeds the constant in the source; StableScalar routes it
    // through the reference array, so two plans differing only in the
    // value generate the same Java text.
    def src(v: Double): String = {
      val plan = spark.range(10).toDF("i")
        .select(($"i" * 2 + StableScalar.column(v)).as("v"))
        .queryExecution.executedPlan
      val wsc = plan.collectFirst { case w: WholeStageCodegenExec => w }
      assert(wsc.nonEmpty, s"no WholeStageCodegen in:\n$plan")
      wsc.get.doCodeGen()._2.body
    }
    assert(src(1.0) == src(123.456))
    // and the control: the same two values through lit() DO differ,
    // proving the assertion above is not vacuous
    def srcLit(v: Double): String = {
      import org.apache.spark.sql.functions.lit
      val plan = spark.range(10).toDF("i")
        .select(($"i" * 2 + lit(v)).as("v"))
        .queryExecution.executedPlan
      plan.collectFirst { case w: WholeStageCodegenExec => w }
        .get.doCodeGen()._2.body
    }
    assert(srcLit(1.0) != srcLit(123.456))
  }
}
