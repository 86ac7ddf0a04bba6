package graft

import graft.ops.Sketch
import graft.streaming.StreamKmv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KMV sketch: prefix-exact parity with the batch sketch and
  * bounded state. */
class StreamKmvSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val k = 16
  // two keys: "big" with 80 distinct values (> k), "small" with 5 (< k)
  private val batch1 = (0 until 50).map(i => ("big", s"v$i")) ++
    Seq(("small", "a"), ("small", "b"))
  private val batch2 = (30 until 80).map(i => ("big", s"v$i")) ++ // overlap 30..49
    Seq(("small", "c"), ("small", "d"), ("small", "e"), ("small", "a"))

  private def batchEst(rows: Seq[(String, String)]): Map[String, Double] =
    Sketch.kmvDistinct(rows.toDF("key", "v"), $"key", $"v", k)
      .as[(String, Double)].collect().toMap

  test("streamed estimates equal the batch sketch of each stream prefix") {
    val in = MemoryStream[(String, String)]
    val q = StreamKmv.distinctPerKey(
        StreamKmv.pairs(in.toDS().toDF("key", "v"), col("key"), col("v")), k)
      .toDF("key", "est_distinct")
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("kmv_out")
      .as[(String, Double)].collect().toSeq
    val afterPrefix = batchEst(batch1)
    val afterAll = batchEst(batch1 ++ batch2)
    // each micro-batch emitted exactly the batch sketch of the prefix
    assert(emitted.contains(("big", afterPrefix("big"))))
    assert(emitted.contains(("small", afterPrefix("small"))))
    assert(emitted.contains(("big", afterAll("big"))))
    assert(emitted.contains(("small", afterAll("small"))))
    // exact below k
    assert(afterAll("small") == 5.0)
  }

  test("the same operator runs on a static Dataset (batch mode)") {
    val all = (batch1 ++ batch2).toDF("key", "v")
    val static = StreamKmv.distinctPerKey(
        StreamKmv.pairs(all, col("key"), col("v")), k)
      .collect().toMap
    assert(static == batchEst(batch1 ++ batch2))
  }
}
