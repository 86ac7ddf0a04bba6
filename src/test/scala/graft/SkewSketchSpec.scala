package graft

import graft.ops.{Exact, Sketch, Skew}
import org.apache.spark.sql.functions._

/** Salted-rewrite equivalence and KMV sketch properties. */
class SkewSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: one key owns 90% of the rows.
  private lazy val skewed = spark.range(0, 2000).toDF("id")
    .select($"id",
      when($"id" % 10 < 9, lit("hot")).otherwise(concat(lit("cold"), $"id" % 7))
        .as("key"),
      ($"id" % 97).cast("double").as("v"))

  test("saltedStats is bit-identical to the plain groupBy at any bucket count") {
    val plain = skewed.groupBy($"key")
      .agg(count(lit(1)).as("n_rows"), Exact.dsum($"v").as("sum_value"))
      .orderBy($"key")
      .as[(String, Long, Double)].collect().toSeq
    for (b <- Seq(1, 4, 32)) {
      val salted = Skew.saltedStats(skewed, $"key", $"v", $"id".cast("string"), b)
        .orderBy($"key")
        .as[(String, Long, Double)].collect().toSeq
      assert(salted == plain, s"buckets=$b")
    }
  }

  test("replicateSmallJoin equals the plain join") {
    val dim = Seq(("hot", 1.5), ("cold0", 2.0), ("cold3", 3.0)).toDF("key", "w")
    val plain = skewed.join(dim, Seq("key"))
      .select($"key", $"id", $"w")
      .orderBy($"key", $"id").collect().toSeq
    val salted = Skew.replicateSmallJoin(skewed, dim, Seq("key"),
        $"id".cast("string"), buckets = 6)
      .select($"key", $"id", $"w")
      .orderBy($"key", $"id").collect().toSeq
    assert(salted == plain)
  }

  private lazy val vals = spark.range(0, 5000).toDF("id")
    .select(
      when($"id" < 4000, lit("big")).otherwise(lit("small")).as("key"),
      // "big" has 1000 distinct values (each ×4), "small" exactly 20
      when($"id" < 4000, ($"id" % 1000)).otherwise($"id" % 20)
        .cast("string").as("v"))

  test("kmvDistinct is exact below k and within ~3/sqrt(k) above it") {
    val est = Sketch.kmvDistinct(vals, $"key", $"v", 64)
      .as[(String, Double)].collect().toMap
    assert(est("small") == 20.0) // < k distinct -> exact count
    val rel = math.abs(est("big") - 1000.0) / 1000.0
    assert(rel < 3.0 / math.sqrt(64), s"relative error $rel")
  }

  test("kmvDistinct is invariant to the input partitioning") {
    val a = Sketch.kmvDistinct(vals.repartition(3), $"key", $"v", 64)
      .orderBy($"key").as[(String, Double)].collect().toSeq
    val b = Sketch.kmvDistinct(vals.repartition(29), $"key", $"v", 64)
      .orderBy($"key").as[(String, Double)].collect().toSeq
    assert(a == b)
  }

  test("count-min never underestimates and is exact without collisions") {
    import graft.ops.Sketch
    val words = (Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma")).toDF("word")
    val cms = Sketch.cmsBuild(words, $"word", d = 4, w = 1024)
    // counter table is bounded by d·w regardless of input size
    assert(cms.count() <= 4L * 1024L)
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("word")
    val est = Sketch.cmsEstimate(cms, probes, $"word", d = 4, w = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L, "absent" -> 0L)
    // CMS guarantee: est >= truth always; with 3 words in 1024 slots no
    // row collides, so these are exact (deterministic hashes: stable)
    truth.foreach { case (w, n) => assert(est(w) >= n) }
    assert(est == truth)
  }

  test("bloom semiJoin equals the plain semi join and the prefilter prunes") {
    val big = spark.range(0, 5000).toDF("k")
      .select($"k", ($"k" % 13).cast("double").as("v"))
    val small = spark.range(0, 5000).toDF("s")
      .filter($"s" % 100 === 0) // 50 of 5000 keys match
    val exact = big.join(small.select($"s".as("k")), Seq("k"), "left_semi")
      .orderBy($"k").as[(Long, Double)].collect().toSeq
    val bloomed = graft.ops.Bloom.semiJoin(big, small, "k", "s",
        expectedItems = 1000L)
      .orderBy($"k").as[(Long, Double)].collect().toSeq
    assert(bloomed == exact)
    // the prefilter keeps every match and drops most non-matches
    val pre = graft.ops.Bloom.prefilter(big, small, "k", "s", 1000L).count()
    assert(pre >= exact.size && pre < 5000L / 2, s"prefiltered to $pre")
  }
}
