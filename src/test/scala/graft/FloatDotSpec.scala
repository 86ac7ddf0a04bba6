package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Native codegen'd float_dot expression: value parity with the
  * built-in zip_with/aggregate formulation, null/length edge cases, and
  * SQL-registry resolution. */
class FloatDotSpec extends SparkSpec {
  import spark.implicits._

  private def builtinDot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  test("float_dot matches the built-in formulation") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f)))
      .toDF("a", "b")
    val rows = df.select(
      call_function("float_dot", $"a", $"b").as("fd"),
      builtinDot("a", "b").as("bi")).as[(Double, Double)].collect()
    rows.foreach { case (fd, bi) => assert(fd == bi) }
    assert(rows(0)._1 == 32.0)
    assert(rows(1)._1 == -2.0)
  }

  test("float_dot null array -> null; mismatched lengths use the overlap") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 1.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 1.0f, 9.0f)), Some(Array(3.0f, 4.0f))))
      .toDF("a", "b")
    val out = df.select(call_function("float_dot", $"a", $"b").as("d"))
      .as[Option[Double]].collect()
    assert(out(0).isEmpty)
    assert(out(1).contains(7.0))
  }

  test("float_dot resolves from SQL text after registration") {
    GraftFunctions.register(spark)
    Seq((Array(2.0f), Array(3.0f))).toDF("a", "b").createOrReplaceTempView("fd_t")
    val v = spark.sql("SELECT float_dot(a, b) AS d FROM fd_t").as[Double].head()
    assert(v == 6.0)
  }
}
