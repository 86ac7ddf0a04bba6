package graft

import graft.ops.Sketch
import graft.streaming.StreamHll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL: prefix-exact parity with the batch sketch, constant
  * register state, and the batch-mode path. */
class StreamHllSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // "big" crosses into the raw-estimator regime (600 distinct ≫ 2.5m),
  // "small" stays in linear counting (7 distinct)
  private val batch1 = (0 until 400).map(i => ("big", s"v$i")) ++
    Seq(("small", "a"), ("small", "b"), ("small", "c"))
  private val batch2 = (200 until 600).map(i => ("big", s"v$i")) ++
    Seq(("small", "d"), ("small", "e"), ("small", "f"), ("small", "g"),
      ("small", "a"))

  private def batchEst(rows: Seq[(String, String)]): Map[String, Double] =
    Sketch.hllEstimate(
        Sketch.hllRegisters(rows.toDF("key", "v"), $"key", $"v"))
      .as[(String, Double)].collect().toMap

  test("streamed estimates equal the batch sketch of each stream prefix") {
    val in = MemoryStream[(String, String)]
    val q = StreamHll.distinctPerKey(
        StreamHll.pairs(in.toDS().toDF("key", "v"), col("key"), col("v")))
      .toDF("key", "est_distinct")
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("hll_out").as[(String, Double)].collect().toSeq
    val afterPrefix = batchEst(batch1)
    val afterAll = batchEst(batch1 ++ batch2)
    assert(emitted.contains(("big", afterPrefix("big"))))
    assert(emitted.contains(("small", afterPrefix("small"))))
    assert(emitted.contains(("big", afterAll("big"))))
    assert(emitted.contains(("small", afterAll("small"))))
    // regime sanity: raw estimator near 600, linear counting near 7
    assert(math.abs(afterAll("big") - 600.0) / 600.0 < 0.6)
    assert(math.abs(afterAll("small") - 7.0) / 7.0 < 0.3)
  }

  test("the same operator runs on a static Dataset (batch mode)") {
    val all = (batch1 ++ batch2).toDF("key", "v")
    val static = StreamHll.distinctPerKey(
        StreamHll.pairs(all, col("key"), col("v")))
      .collect().toMap
    assert(static == batchEst(batch1 ++ batch2))
  }
}
