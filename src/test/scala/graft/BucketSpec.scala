package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Physical-design proofs: bucketed co-partitioned joins (the var⋈var
  * grid-join strategy from ARCHITECTURE.md) and the multimodal
  * frame-sample/resize planning ops. */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-partitioned join runs without a shuffle exchange") {
    val g = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(($"l_suppkey" % 20).cast("int").as("y"),
        ($"l_partkey" % 20).cast("int").as("x"),
        $"l_quantity".as("v"))
      .groupBy($"y", $"x").agg(sum($"v").as("v"))
    spark.sql("DROP TABLE IF EXISTS grid_a")
    spark.sql("DROP TABLE IF EXISTS grid_b")
    g.write.bucketBy(8, "y", "x").sortBy("y", "x").saveAsTable("grid_a")
    g.withColumn("v", $"v" * 2).write
      .bucketBy(8, "y", "x").sortBy("y", "x").saveAsTable("grid_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("grid_a")
        .join(spark.table("grid_b"), Seq("y", "x"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed sides: sort-merge join, no hash repartitioning
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == g.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS grid_a")
      spark.sql("DROP TABLE IF EXISTS grid_b")
    }
  }

  test("multimodal frame sampling and resize planning") {
    val df = Seq((1L, "video", "x" * 250), (2L, "image", "y" * 40))
      .toDF("id", "kind", "txt")
      .withColumn("payload", $"txt".cast("binary"))
    val feats = Multimodal.extractFeatures(df, "id", "kind", "payload")
    // every 2nd frame: item 1 has 3 frames -> 0,2; item 2 has 1 -> 0
    val frames = Multimodal.sampleFrames(feats, everyN = 2)
      .groupBy($"id").count().orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(frames == Seq((1L, 2L), (2L, 1L)))
    // resize respects the bounding box and never upscales
    val sized = Multimodal.resizePlan(feats, maxW = 64, maxH = 64)
      .select($"id", $"width", $"height", $"out_w", $"out_h")
      .collect()
    sized.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(ow <= 64 || ow <= w)
      assert(ow <= w && oh <= h)
      assert(ow >= 1 && oh >= 1)
    }
  }
}
