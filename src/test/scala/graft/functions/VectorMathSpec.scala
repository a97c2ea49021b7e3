package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native dot kernel must be BIT-IDENTICAL to the declarative
  * aggregate(zip_with) fold it replaced, in both eval and codegen, for
  * float and double arrays, including the null/length edge semantics.
  */
class VectorMathSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("float arrays: native == declarative bit-for-bit") {
    val rows = (0 until 200).map { i =>
      (Seq.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6) / 7.0f),
        Seq.tabulate(64)(j => ((i * 17 + j * 5) % 11 - 5) / 3.0f))
    }
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorMath.dotNative(col("a"), col("b")).as("native"),
      declarative(col("a"), col("b")).as("decl"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, d) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(d),
        s"bit mismatch: $n vs $d")
    }
  }

  test("double arrays work; result is order-dependent left-to-right") {
    // values chosen so a different summation order changes the result:
    // bit equality with the declarative fold proves index order
    val df = Seq((Seq(1e16, 1.0, -1e16), Seq(1.0, 1.0, 1.0)))
      .toDF("a", "b")
    val (n, d) = df.select(
      VectorMath.dotNative(col("a"), col("b")),
      declarative(col("a"), col("b"))).as[(Double, Double)].head()
    assert(n == d && n == 0.0, "left-to-right: (1e16 + 1) - 1e16 == 0.0")
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (null: Seq[java.lang.Double], Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)))
      .toDF("a", "b")
    val got = df.select(VectorMath.dotNative(col("a"), col("b")))
      .collect().map(_.isNullAt(0))
    assert(got.forall(identity), "all three edge cases must be null")
  }

  test("mixed element types are an analysis error, not a runtime crash") {
    val df = Seq((Seq(1.0f), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorMath.dotNative(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("vector_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("the kernel runs inside whole-stage codegen") {
    val df = (0 until 50)
      .map(i => (Seq.tabulate(8)(_ * 1.0f), Seq.tabulate(8)(_ * 2.0f)))
      .toDF("a", "b")
    // repartition first: a pure local relation folds to LocalTableScan
    // before any codegen stage exists; execute so AQE finalizes
    val q = df.repartition(2)
      .select(VectorMath.dotNative(col("a"), col("b")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" operator prefix is the WholeStageCodegen marker in the
    // AQE-finalized rendering
    assert(plan.contains("WholeStageCodegen") ||
      plan.linesIterator.exists(l => l.trim.matches("""\+- \*\(\d+\) Project.*vectordot.*""")),
      s"not codegen'd:\n$plan")
  }
}
