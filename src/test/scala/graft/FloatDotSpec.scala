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

  test("jl_project matches the explode + decimal-sum formulation bit-exactly") {
    // the q218 arithmetic contract: per j, sum CAST(±e AS DECIMAL(18,6))
    // exactly, cast the decimal sum to double — the old column chain and
    // the native expression must agree on every bit (same signs from
    // h64("i|j") % 2, same HALF_UP term rounding, same final cast)
    val df = Seq(
      (1L, Array(0.1234567f, -2.5f, 3.25f, 0.0f)),
      (2L, Array(1.0e-7f, 7.5f, -0.0000005f, 42.125f)),
      (3L, Array(-1.5f, -1.5f, -1.5f, -1.5f)))
      .toDF("id", "emb")
    val k = 3
    val native = df.select($"id",
      graft.ops.Similarity.jlProject($"emb", k).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val legacy = df
      .select($"id", posexplode($"emb").as(Seq("i", "e")))
      .withColumn("e", $"e".cast("double"))
      .withColumn("j", explode(expr(s"sequence(0, ${k - 1})")))
      .withColumn("se", when(
        pmod(graft.ops.TextOps.h64(
          concat($"i".cast("string"), lit("|"), $"j".cast("string"))),
          lit(2L)) === 0, $"e").otherwise(-$"e"))
      .groupBy($"id", $"j")
      .agg(sum($"se".cast("decimal(18,6)")).cast("double").as("p"))
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(native.keySet == legacy.keySet)
    native.foreach { case (id, p) =>
      assert(p.size == k)
      assert(p == legacy(id), s"id=$id: $p vs ${legacy(id)}")
    }
  }

  test("jl_project skips null elements like SQL sum") {
    val df = Seq((1L, Seq[Option[Double]](Some(1.5), None, Some(-2.25))))
      .toDF("id", "emb")
    val p = df.select(graft.ops.Similarity.jlProject($"emb", 2).as("p"))
      .as[Seq[Double]].head()
    assert(p.size == 2)
    // with the null skipped, every |component| is |±1.5 ± 2.25| ∈ {0.75, 3.75}
    p.foreach(v => assert(math.abs(v) == 0.75 || math.abs(v) == 3.75, p))
  }
}
