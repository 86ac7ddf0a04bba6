package graft

import graft.ops.{Sampling, Shard, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counting-sort rank, serpentine sharding, and epoch-mix replication. */
class ShardSpec extends SparkSpec {
  import spark.implicits._

  // sizes with heavy ties (the histogram buckets) and a unique id tiebreak
  private lazy val items = spark.range(0, 1000).toDF("id")
    .select($"id", (($"id" * 37) % 50).as("size"))

  test("histogramRank equals the whole-frame row_number at any partitioning") {
    val expect = items
      .withColumn("rnk", row_number().over(
        Window.orderBy($"size".desc, $"id".asc)))
      .select($"id", $"rnk").as[(Long, Int)].collect().toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Shard.histogramRank(items.repartition(parts), $"size",
          bucketAsc = false, Seq($"id".asc), "rnk")
        .select($"id", $"rnk").as[(Long, Long)].collect().toMap
      assert(got.size == expect.size)
      expect.foreach { case (id, r) =>
        assert(got(id) == r.toLong, s"id=$id parts=$parts") }
    }
  }

  test("serpentineShard deals each pass of S ranks one-per-shard") {
    val ranked = spark.range(1, 101).toDF("rnk")
      .withColumn("shard", Shard.serpentineShard($"rnk", 8))
      .withColumn("pass", (($"rnk" - 1) / 8).cast("long"))
    val perPass = ranked.groupBy($"pass")
      .agg(countDistinct($"shard").as("d"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    perPass.foreach { case (p, d, n) => assert(d == n, s"pass $p") }
    // direction flips: pass 0 puts rank 1 on shard 0, pass 1 puts rank 9 on shard 7
    val m = ranked.select($"rnk", $"shard").as[(Long, Long)].collect().toMap
    assert(m(1L) == 0L && m(8L) == 7L && m(9L) == 7L && m(16L) == 0L)
  }

  test("serpentine totals balance within one item size") {
    val sized = items.withColumn("rnk", row_number().over(
        Window.orderBy($"size".desc, $"id".asc)))
      .withColumn("shard", Shard.serpentineShard($"rnk", 8))
    val totals = sized.groupBy($"shard").agg(sum($"size").as("t"))
      .as[(Long, Long)].collect().map(_._2)
    assert(totals.max - totals.min <= 49, s"spread ${totals.max - totals.min}")
  }

  test("epochReps: whole part exact, fractional part hash-thinned") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("key", concat(lit("k"), $"id"))
    // integer epochs replicate exactly
    val exact = df.withColumn("r", Sampling.epochReps(lit(3.0), $"key"))
      .agg(min($"r"), max($"r")).as[(Long, Long)].collect().head
    assert(exact == ((3L, 3L)))
    // fractional epochs: floor everywhere, +1 on ~frac of rows
    val frac = df.withColumn("r", Sampling.epochReps(lit(1.25), $"key"))
      .agg(sum($"r")).as[Long].collect().head
    assert(frac >= 2000 * 1.25 * 0.9 && frac <= 2000 * 1.25 * 1.1,
      s"got $frac expected ~2500")
    // epochs < 1 downsample: reps in {0, 1}
    val down = df.withColumn("r", Sampling.epochReps(lit(0.5), $"key"))
      .agg(min($"r"), max($"r"), sum($"r")).as[(Long, Long, Long)]
      .collect().head
    assert(down._1 == 0L && down._2 == 1L)
    assert(down._3 >= 2000 * 0.4 && down._3 <= 2000 * 0.6)
  }

  test("writeShards lays out shard=K dirs and an accurate manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = items.select($"id".as("doc_id"), $"size")
    graft.io.Sink.writeShards(docs, "doc_id", "size", dir, 4)
    val dirs = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    // manifest totals must match the written data exactly (underscore
    // prefix hides the sidecar from Spark listings — read it directly)
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_manifest.json"))
    val manifest =
      """\{"shard": (\d+), "n_docs": (\d+), "sum_size": (\d+)\}""".r
        .findAllMatchIn(text)
        .map(m => (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong))
        .toSeq.sortBy(_._1)
    val actual = back.groupBy($"shard")
      .agg(count(lit(1)).as("n"), sum($"size").as("s"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(manifest == actual)
    assert(manifest.map(_._3).sum ==
      items.agg(sum($"size")).as[Long].collect().head)
    // the shard=K layout must give partition-PRUNED reads: a trainer
    // rank pulling its shard reads 1/N of the files, not a filter scan
    val plan = back.filter($"shard" === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
  }

  test("epochReps is partitioning-invariant (hash-keyed, not rand)") {
    val mk = (parts: Int) => spark.range(0, 500).toDF("id")
      .repartition(parts)
      .withColumn("r", Sampling.epochReps(lit(1.5), concat(lit("k"), $"id")))
      .select($"id", $"r").as[(Long, Long)].collect().toMap
    assert(mk(1) == mk(13))
  }
}
