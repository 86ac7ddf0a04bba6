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

  test("hashSplit is exhaustive, deterministic, and join-consistent") {
    import graft.ops.Sampling
    val ids = (0L until 500L).toDF("id")
    val split = ids.withColumn("s",
      Sampling.hashSplit($"id".cast("string"), den = 10, train = 8, valSlots = 1))
    val counts = split.groupBy($"s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 500L)
    assert(counts("train") > counts("val")) // 8:1:1 slots
    // join-consistency: a second table keyed on the same id gets the
    // identical assignment row for row
    val again = ids.withColumn("s2",
      Sampling.hashSplit($"id".cast("string"), den = 10, train = 8, valSlots = 1))
    assert(split.join(again, Seq("id")).filter($"s" =!= $"s2").count() == 0)
  }

  test("zscore: mean 0 / unit spread per group, constant group yields null") {
    import graft.ops.Normalize
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    val out = Normalize.zscore(df, Seq("g"), $"x")
      .orderBy($"g", $"x").collect()
      .map(r => (r.getString(0), r.getDouble(1), Option(r.get(3)).map(_ => r.getDouble(3))))
    // group a: mean 2, population sd sqrt(2/3); z of 1.0 = -1/sqrt(2/3)
    val sd = math.sqrt(2.0 / 3.0)
    assert(out(0) == (("a", 1.0, Some((1.0 - 2.0) / sd))))
    assert(out(1)._3 == Some(0.0))
    // constant group b: variance 0 -> null z, not Infinity
    assert(out(3)._3.isEmpty && out(4)._3.isEmpty)
  }

  test("zscore keeps rows whose group key is NULL (null-safe join-back)") {
    import graft.ops.Normalize
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (None, 5.0), (None, 7.0)).toDF("g", "x")
    val out = Normalize.zscore(df, Seq("g"), $"x")
    // a plain = join-back would silently drop the NULL-key group
    assert(out.count() == 4)
    val nullz = out.filter($"g".isNull).orderBy($"x")
      .select($"z").as[Double].collect().toSeq
    // NULL group: mean 6, population variance 1 → z = ∓1
    assert(nullz == Seq(-1.0, 1.0))
  }

  test("quantileBins: nearest-rank edges, boundary rows fall in the lower bin") {
    import graft.ops.Normalize
    val df = (1 to 8).map(i => ("g", i.toDouble, i.toLong))
      .toDF("g", "x", "id")
    val bins = Normalize.quantileBins(df, Seq("g"), $"x", $"id",
        Seq(0.25, 0.5, 0.75))
      .orderBy($"x").select($"bin").as[Int].collect().toSeq
    // n=8: thresholds at ranks 2, 4, 6 → values 2, 4, 6; x <= t stays low
    assert(bins == Seq(1, 1, 2, 2, 3, 3, 4, 4))
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

  test("cmsEstimate preserves probe multiplicity and tolerates j/c/cnt probe columns") {
    import graft.ops.Sketch
    val words = Seq.fill(5)("alpha").toDF("word")
    val cms = Sketch.cmsBuild(words, $"word", d = 4, w = 1024)
    // duplicate probe rows + a column named like the counter table's
    val probes = Seq(("alpha", 1L), ("alpha", 2L), ("absent", 3L))
      .toDF("word", "cnt")
    val est = Sketch.cmsEstimate(cms, probes, $"word", d = 4, w = 1024)
      .orderBy($"cnt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.toSeq == Seq(("alpha", 1L, 5L), ("alpha", 2L, 5L),
      ("absent", 3L, 0L)))
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

  test("weightedHashSample: deterministic, k-capped, weight-dominant row always wins") {
    import graft.ops.Sampling
    val base = spark.range(0, 100).toDF("id")
      .select($"id".cast("string").as("id"), lit(1.0).as("w"))
    // one row with overwhelming weight: ln(u)/w ≈ 0 beats every
    // unit-weight key (u < 1 almost surely ⇒ skey strictly negative)
    val docs = base.union(Seq(("whale", 1.0e12)).toDF("id", "w"))
    val top = Sampling.weightedHashSample(docs, $"id", $"w", k = 10)
    val rows = top.as[(String, Double, Double)].collect()
    assert(rows.length == 10)
    assert(rows.exists(_._1 == "whale"), "heavy row missing from sample")
    // rerun- and partitioning-stable (the whole point of hash keying)
    val again = Sampling.weightedHashSample(
      docs.repartition(7), $"id", $"w", k = 10)
      .as[(String, Double, Double)].collect()
    assert(rows.toSet == again.toSet)
    // equal weights degrade to the pure-hash reservoir order
    val eq = Sampling.weightedHashSample(base, $"id", $"w", k = 5)
      .select($"id").as[String].collect().toSet
    val byHash = base
      .orderBy(graft.ops.TextOps.h64($"id").desc, $"id".asc).limit(5)
      .select($"id").as[String].collect().toSet
    assert(eq == byHash)
  }

  test("hll: accuracy in both regimes, partition invariance, max-merge law") {
    val est = Sketch.hllEstimate(Sketch.hllRegisters(vals, $"key", $"v"))
      .as[(String, Double)].collect().toMap
    // raw harmonic-mean regime (1000 distinct ≫ 2.5m): within 4× the
    // 1.04/√64 theoretical RSE — a fixed-hash instance, not an average
    assert(math.abs(est("big") - 1000.0) / 1000.0 < 4 * 1.04 / 8,
      s"big ${est("big")}")
    // linear-counting regime (20 distinct < 2.5m)
    assert(math.abs(est("small") - 20.0) / 20.0 < 0.25, s"small ${est("small")}")

    val a = Sketch.hllEstimate(Sketch.hllRegisters(
        vals.repartition(3), $"key", $"v"))
      .orderBy($"key").as[(String, Double)].collect().toSeq
    val b = Sketch.hllEstimate(Sketch.hllRegisters(
        vals.repartition(29), $"key", $"v"))
      .orderBy($"key").as[(String, Double)].collect().toSeq
    assert(a == b)

    // merge law: MAX-merging per-key registers IS the union's sketch
    val regs = Sketch.hllRegisters(vals, $"key", $"v")
    val merged = regs.groupBy($"b").agg(max($"mreg").as("mreg"))
      .select(lit("u").as("key"), $"b", $"mreg")
    val direct = Sketch.hllRegisters(
      vals.select(lit("u").as("key"), $"v"), $"key", $"v")
    val me = Sketch.hllEstimate(merged).as[(String, Double)].collect().head._2
    val de = Sketch.hllEstimate(direct).as[(String, Double)].collect().head._2
    assert(me == de)
  }
}
