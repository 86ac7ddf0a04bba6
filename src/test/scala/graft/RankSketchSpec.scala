package graft

import graft.ops.Sketch
import org.apache.spark.sql.functions._

/** The rank-error quantile sketch's three contracts (r15 verdict #3):
  * the PROVEN ε·n rank bound holds against exact ranks on a
  * heavy-tailed distribution (where q207's equi-width bound is
  * vacuous), the sketch is partition-invariant (logical shards, not
  * physical partitions), and merge-by-union of disjoint shard splits
  * reproduces the monolithic sketch's estimates exactly. */
class RankSketchSpec extends SparkSpec {
  import spark.implicits._

  // Heavy-tailed: 1000 values spanning 7 decades — one outlier decade
  // stretches an equi-width histogram's range (its bucket-width error
  // bound becomes ~millions) while rank error must stay ≤ n/k.
  private lazy val heavy = spark.range(0, 1000).toDF("id")
    .select($"id",
      when($"id" % 5 === 0, lit("a")).otherwise(lit("b")).as("key"),
      (pow(lit(10.0), ($"id" % 7).cast("double")).cast("long") +
        $"id" % 13).as("x"))

  private val K = 16
  private val Shards = 8
  private val Qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def estimates(sk: org.apache.spark.sql.DataFrame) =
    Sketch.rankQuantiles(sk, K, Qs)
      .select($"key", $"q", $"t_rank", $"n", $"est", $"err_bound")
      .orderBy($"key", $"q")
      .as[(String, Double, Long, Long, Long, Long)].collect().toSeq

  test("rank error of every estimate is within the emitted bound, and the bound is <= n/k + shards") {
    val sk = Sketch.rankSketch(heavy, $"key", $"x", $"id", Shards, K)
    val est = estimates(sk)
    assert(est.size == 2 * Qs.size)
    val data = heavy.select($"key", $"x").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
    for ((key, q, t, n, e, bound) <- est) {
      val xs = data(key)
      assert(n == xs.length, s"$key sketch-derived n")
      assert(bound <= n / K + Shards, s"$key bound vs eps*n")
      // est's true rank sits in [t, t + bound]:
      //  - at least t elements are <= est (est covers the target rank)
      //  - fewer than t + bound elements are < est (it overshoots by
      //    at most the summed per-shard gaps)
      val le = xs.count(_ <= e)
      val lt = xs.count(_ < e)
      assert(le >= t, s"$key q=$q: count(<=est)=$le < t=$t")
      assert(lt + 1 - t <= bound,
        s"$key q=$q: rank overshoot ${lt + 1 - t} > bound $bound")
      // and est is never below the exact nearest-rank quantile
      assert(e >= xs(t.toInt - 1), s"$key q=$q: est below exact")
    }
  }

  test("sketch rows and estimates are invariant to physical partitioning") {
    val sk1 = Sketch.rankSketch(heavy, $"key", $"x", $"id", Shards, K)
    val sk2 = Sketch.rankSketch(heavy.repartition(7), $"key", $"x", $"id",
      Shards, K)
    val rows1 = sk1.orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val rows2 = sk2.orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows1 == rows2)
    assert(estimates(sk1) == estimates(sk2))
  }

  test("merge by union of disjoint shard splits equals the monolithic sketch") {
    val shardOf = graft.ops.TextOps.h64($"id".cast("string")) % Shards
    val even = heavy.filter(shardOf % 2 === 0)
    val odd = heavy.filter(shardOf % 2 === 1)
    val merged = Sketch.rankSketch(even, $"key", $"x", $"id", Shards, K)
      .unionByName(Sketch.rankSketch(odd, $"key", $"x", $"id", Shards, K))
    val whole = Sketch.rankSketch(heavy, $"key", $"x", $"id", Shards, K)
    assert(estimates(merged) == estimates(whole))
    val m = merged.orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val w = whole.orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(m == w)
  }

  test("a shard smaller than k degrades to exact (every row kept)") {
    val tiny = spark.range(0, 5).toDF("id")
      .select($"id", lit("t").as("key"), ($"id" * 100).as("x"))
    val sk = Sketch.rankSketch(tiny, $"key", $"x", $"id", 1, K)
    assert(sk.count() == 5)
    val est = Sketch.rankQuantiles(sk, K, Seq(0.5)).select($"est", $"err_bound")
      .as[(Long, Long)].head()
    assert(est == ((200L, 0L))) // exact median, zero bound
  }

  // ---- weighted variant (r16 verdict #3) ----

  test("rankSketchWeighted with unit weights IS rankSketch, row for row") {
    val unit = Sketch.rankSketch(heavy, $"key", $"x", $"id", Shards, K)
      .orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val wtd = Sketch.rankSketchWeighted(heavy, $"key", $"x", lit(1L),
        $"id", Shards, K)
      .orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(wtd == unit)
  }

  test("weighted rank bound holds against exact weighted ranks (heavy-tailed weights)") {
    // heavy-tailed WEIGHTS on top of heavy-tailed values: a few rows
    // carry ~1000x the mass of the rest — the case where splitting a
    // heavy row would break the bound accounting (it is kept once,
    // charged its full weight)
    val wdf = heavy.withColumn("w",
      when($"id" % 97 === 0, lit(1000L)).otherwise($"id" % 7 + 1))
    val sk = Sketch.rankSketchWeighted(wdf, $"key", $"x", $"w", $"id",
      Shards, K)
    val est = estimates(sk)
    assert(est.size == 2 * Qs.size)
    val data = wdf.select($"key", $"x", $"w")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(r => (r._2, r._3)).sortBy(_._1) }
    for ((key, q, t, n, e, bound) <- est) {
      val rows = data(key)
      val totW = rows.map(_._2).sum
      assert(n == totW, s"$key sketch-derived n is the total mass")
      // F(est) = mass up to and including est covers the target;
      // G(est) = mass strictly below est undershoots t + bound —
      // the weighted reading of the unit sketch's [t, t+bound] bracket
      val fle = rows.filter(_._1 <= e).map(_._2).sum
      val glt = rows.filter(_._1 < e).map(_._2).sum
      assert(fle >= t, s"$key q=$q: F(est)=$fle < t=$t")
      assert(glt + 1 - t <= bound,
        s"$key q=$q: mass overshoot ${glt + 1 - t} > bound $bound")
      // est is never below the exact weighted nearest-rank quantile
      // (smallest value whose cumulative mass reaches t)
      var cum = 0L
      val exact = rows.find { r => cum += r._2; cum >= t }.get._1
      assert(e >= exact, s"$key q=$q: est below exact weighted quantile")
    }
  }

  test("weighted sketch is partition-invariant and merges by union") {
    val wdf = heavy.withColumn("w", $"id" % 11 + 1)
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketch.rankSketchWeighted(df, $"key", $"x", $"w", $"id", Shards, K)
    val rows1 = sk(wdf).orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val rows2 = sk(wdf.repartition(7)).orderBy($"key", $"shard", $"r")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows1 == rows2)
    val shardOf = graft.ops.TextOps.h64($"id".cast("string")) % Shards
    val merged = sk(wdf.filter(shardOf % 2 === 0))
      .unionByName(sk(wdf.filter(shardOf % 2 === 1)))
    assert(estimates(merged) == estimates(sk(wdf)))
  }
}
