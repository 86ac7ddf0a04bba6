package graft

import graft.ops.{ClimateOps, Eos, Exact, Interp, Multimodal, TextOps, TimeResample}
import graft.ops.TimeResample.{ClosedRight, Fixed, Monthly}
import org.apache.spark.sql.functions._

/** Operator unit specs over tiny analytic fixtures (SURVEY.md §5: the
  * reference has near-zero tests; each operator here is golden-tested
  * against hand-computed values). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("Interp.interpolateToGrid matches np.interp semantics incl. clamps") {
    val samples = Seq(("a", 0.0, 10.0), ("a", 10.0, 30.0), ("a", 20.0, 10.0))
      .toDF("g", "coord", "v")
    val targets = Seq(("a", -5.0), ("a", 0.0), ("a", 5.0), ("a", 15.0), ("a", 25.0))
      .toDF("g", "coord")
    val out = Interp.interpolateToGrid(samples, targets, Seq("g"), "coord", "v")
      .orderBy("coord").select("interp").as[Double].collect()
    // below range clamps to first, exact hit returns sample, linear between,
    // above range clamps to last (calculations.py:847-851 pointwise_interp)
    assert(out.toSeq == Seq(10.0, 10.0, 20.0, 20.0, 10.0))
  }

  test("TimeResample closed-right boundary ownership and mid label") {
    val df = Seq(
      ("2024-01-01 06:00:00", 1.0),  // exactly on a 6h boundary -> earlier bucket
      ("2024-01-01 05:00:00", 3.0),
      ("2024-01-01 06:00:01", 5.0))
      .toDF("t", "v").withColumn("t", $"t".cast("timestamp"))
    val out = TimeResample.resample(df, $"t", Seq(), $"v",
        Fixed(21600), ClosedRight, Seq("mean", "count"))
      .select(date_format($"label", "yyyy-MM-dd HH:mm:ss").as("l"), $"mean", $"count")
      .orderBy($"l").as[(String, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01 03:00:00", 2.0, 2L),   // 05:00 and 06:00 in [00:00,06:00]
      ("2024-01-01 09:00:00", 5.0, 1L)))  // 06:00:01 in (06:00,12:00]
  }

  test("TimeResample monthly label shift is +15 days (reference offset table)") {
    val df = Seq(("2024-03-10 12:00:00", 4.0)).toDF("t", "v")
      .withColumn("t", $"t".cast("timestamp"))
    val out = TimeResample.resample(df, $"t", Seq(), $"v", Monthly, ClosedRight)
      .select(date_format($"label", "yyyy-MM-dd").as("l")).as[String].collect()
    assert(out.toSeq == Seq("2024-03-16"))
  }

  test("Exact.dsum rounds decimal midpoints half away from zero") {
    // 0.0078125 = 2^-7 is exactly representable and sits exactly halfway
    // between 0.007812 and 0.007813: a genuine double->DECIMAL(18,6) tie.
    // DuckDB rounds the same way, which is the invariant dsum relies on.
    val got = Seq(0.0078125, -0.0078125).toDF("x")
      .groupBy($"x").agg(Exact.dsum($"x").as("s"))
      .as[(Double, Double)].collect().toMap
    assert(got(0.0078125) == 0.007813)
    assert(got(-0.0078125) == -0.007813)
  }

  test("Exact.dsumBounded is bit-identical to dsum within its magnitude bound") {
    // same scale-6 HALF_UP rounding — precision is headroom, not rounding —
    // so midpoint ties, negatives, and accumulated sums all agree exactly
    val xs = Seq(0.0078125, -0.0078125, 99.999999, -99.5, 0.1234565,
      13.37, 0.0, 42.424242)
    val df = xs.toDF("x")
    val (wide, narrow) = df
      .agg(Exact.dsum($"x").as("w"), Exact.dsumBounded($"x").as("n"))
      .as[(Double, Double)].head()
    assert(wide == narrow)
    val pairs = df.groupBy($"x")
      .agg(Exact.dsum($"x").as("w"), Exact.dsumBounded($"x").as("n"))
      .as[(Double, Double, Double)].collect()
    pairs.foreach { case (_, w, n) => assert(w == n) }
  }

  test("Eos.rho reproduces the JMFWG06 check value") {
    val rho = Seq((25.0, 35.0, 2000.0)).toDF("th", "s", "p")
      .select(Eos.rho($"th", $"s", $"p").as("rho")).as[Double].head()
    assert(math.abs(rho - 1031.65056056576) < 1e-8)
  }

  test("ClimateOps.weightedMean skips nulls like skipna=True") {
    val df = Seq((Some(2.0), 1.0), (None, 100.0), (Some(4.0), 3.0))
      .toDF("v", "w")
    val m = df.agg(ClimateOps.weightedMean($"v", $"w").as("m")).as[Double].head()
    assert(math.abs(m - (2.0 * 1 + 4.0 * 3) / 4.0) < 1e-12)
  }

  test("areacella fractions tile the sphere (q92 column x 20 longitudes = 1)") {
    import graft.queries.{Registry => R}
    val frac = R.runMap("q92_areacella")(spark, "/root/testdata/sf0.001")
      .agg(sum($"area_frac")).as[Double].head()
    // per-cell rounding at 1e-10 can accumulate to ~1e-8 over 20 cells;
    // 1e-7 still catches any real geometry error (>= 5e-10 per cell)
    assert(math.abs(frac * 20.0 - 1.0) < 1e-7, s"total fraction ${frac * 20}")
  }

  test("ClimateOps.olsTrend recovers an exact line and drops degenerate groups") {
    val df = Seq(
      // cell A: v = 2t + 1 exactly -> slope 2, intercept 1
      ("A", 2000, 4001.0), ("A", 2001, 4003.0), ("A", 2002, 4005.0),
      // cell B: a single time value -> denominator 0, must be dropped
      ("B", 2000, 1.0), ("B", 2000, 3.0)).toDF("cell", "t", "v")
    val r = ClimateOps.olsTrend(df, Seq($"cell"), $"t", $"v")
      .as[(String, Double, Double)].collect().toSeq
    assert(r == Seq(("A", 2.0, 1.0)))
  }

  test("TextOps shingles + minhash are deterministic and order-free") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val sh = docs.withColumn("ts", TextOps.tokens($"text"))
      .select($"doc_id", explode(TextOps.shingles("ts", 2)).as("s"))
    val mh = TextOps.minhash(sh, $"doc_id", $"s", k = 4)
    val sigs = mh.groupBy($"doc").agg(sum($"h").as("sig"))
      .orderBy($"doc").select($"sig").as[Long].collect()
    assert(sigs(0) == sigs(1)) // identical docs -> identical signatures
    assert(sigs(0) != sigs(2))
    // short doc: fewer tokens than shingle width -> no shingles, no rows
    val short = Seq((9L, "only")).toDF("doc_id", "text")
      .withColumn("ts", TextOps.tokens($"text"))
      .select($"doc_id", explode(TextOps.shingles("ts", 2)).as("s"))
    assert(short.count() == 0)
  }

  test("TextOps.simhash: identical docs agree, disjoint docs differ") {
    val rows = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
      .select($"doc_id".as("doc"), explode(TextOps.tokens($"text")).as("token"))
    val fp = TextOps.simhash(rows, $"doc", $"token")
      .orderBy($"doc").select($"simhash").as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
  }

  test("Multimodal batched stub decode preserves ids and is deterministic") {
    val df = Seq((1L, "image", "payload-bytes-one"), (2L, "audio", "pb2"))
      .toDF("id", "kind", "txt")
      .withColumn("payload", $"txt".cast("binary"))
    val feats = Multimodal.extractFeatures(df, "id", "kind", "payload")
    val rows = feats.orderBy("id")
      .select($"id", $"kind", $"nBytes", $"width", $"height", $"nFrames")
      .as[(Long, String, Int, Int, Int, Int)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L))
    assert(rows(0)._3 == "payload-bytes-one".length)
    assert(rows(1)._3 == 3)
    assert(rows.forall(r => r._4 >= 1 && r._4 <= 640 && r._5 >= 1 && r._5 <= 480))
    // deterministic across runs
    val again = Multimodal.extractFeatures(df, "id", "kind", "payload")
      .orderBy("id").select($"width").as[Int].collect().toSeq
    assert(again == rows.map(_._4))
  }

  test("typed WeightedMeanAgg matches the Column weightedMean bit-for-bit") {
    val rows = (1 to 1000).map(i => (i * 0.37, 1.0 / (1 + (i % 7))))
    val typed = rows.toDS().select(graft.ops.WeightedMeanAgg.toColumn).head()
    val untyped = rows.toDF("v", "w")
      .agg(ClimateOps.weightedMean($"v", $"w")).as[Double].head()
    assert(typed == untyped)
    // empty input -> NaN, mirroring 0/0
    assert(Seq.empty[(Double, Double)].toDS()
      .select(graft.ops.WeightedMeanAgg.toColumn).head().isNaN)
  }

  test("registered reference calculations execute from catalog strings") {
    val df = Seq((271.0, 0.0), (280.0, 0.5)).toDF("v", "sic")
    val out = df.select(
        graft.dsl.Calc.compile("maskSeaIce(var[0],var[1])",
          Seq($"v", $"sic")).as("masked"),
        graft.dsl.Calc.compile("tos_degC(var[0])", Seq($"v")).as("degc"))
      .as[(Option[Double], Double)].collect().toSeq
    assert(out == Seq((None, 271.0 - 273.15), (Some(280.0), 280.0 - 273.15)))
  }

  test("h64 is non-negative and stable") {
    val h = Seq("abc").toDF("s").select(TextOps.h64($"s")).as[Long].head()
    assert(h == 648541476951500027L) // 0x900150983cd24f: first 15 hex of md5("abc")
  }

  test("native Md5Prefix60 is bit-identical to the portable conv(substr(md5)) chain") {
    val rnd = new scala.util.Random(7)
    val strs = Seq("", "a", "abc", "é中😀") ++
      Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(50)).mkString)
    val df = strs.toDF("s")
    val got = df.select(TextOps.h64($"s"), TextOps.h64b($"s"))
      .as[(Long, Long)].collect().toSeq
    val want = df.select(
        expr("CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 15), 16, 10) AS BIGINT)"),
        expr("CAST(conv(substring(md5(CAST(s AS BINARY)), 16, 15), 16, 10) AS BIGINT)"))
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("Ewma.ema folds in (t, tie) order, seeded with the first value") {
    import graft.ops.Ewma
    val df = Seq(
      (1L, 10L, 1L, 4.0), (1L, 20L, 2L, 8.0), (1L, 20L, 3L, 0.0),
      (2L, 5L, 1L, 1.0))
      .toDF("k", "t", "id", "v")
    val out = Ewma.ema(df, $"k", $"t", $"id", $"v", alpha = 0.5)
      .orderBy($"key", $"t", $"tie")
      .select($"ema").as[Double].collect().toSeq
    // key 1: 4.0; 0.5*8+0.5*4 = 6.0; 0.5*0+0.5*6 = 3.0 (tie on t=20
    // broken by id). key 2: seeds at 1.0
    assert(out == Seq(4.0, 6.0, 3.0, 1.0))
  }

  test("Ewma.ema streams a skewed long series, exact fold on hot and cold keys") {
    import graft.ops.Ewma
    // one hot key with 200k rows next to a 3-row key: the secondary-sort
    // fold must reproduce the sequential IEEE chain on both, and the key
    // boundary inside a shared partition must reset the state
    val n = 200000
    val df = spark.range(n).selectExpr("CAST(1 AS LONG) AS k", "id AS t",
        "id AS tie", "CAST(id % 97 AS DOUBLE) AS v")
      .union(spark.range(3).selectExpr("CAST(2 AS LONG) AS k", "id AS t",
        "id AS tie", "CAST(id AS DOUBLE) AS v"))
    val out = Ewma.ema(df, $"k", $"t", $"tie", $"v", alpha = 0.25)
    // driver-side replay of the hot key's chain, bit-compared at the tail
    var s = 0.0
    for (i <- 0 until n) {
      val v = (i % 97).toDouble
      s = if (i == 0) v else 0.25 * v + 0.75 * s
    }
    val gotLast = out.filter($"key" === 1L).orderBy($"t".desc)
      .select($"ema").as[Double].head()
    assert(java.lang.Double.doubleToLongBits(gotLast) ==
      java.lang.Double.doubleToLongBits(s))
    val cold = out.filter($"key" === 2L).orderBy($"t")
      .select($"ema").as[Double].collect().toSeq
    assert(cold == Seq(0.0, 0.25, 0.6875))
  }

  test("RangeJoin.pointInInterval matches the naive BETWEEN join incl. negatives") {
    import graft.ops.RangeJoin
    val pts = Seq((-9L, "p1"), (-8L, "p2"), (0L, "p3"), (7L, "p4"),
      (16L, "p5"), (33L, "p6")).toDF("v", "pid")
    val ivs = Seq((1, -10L, -8L), (2, -8L, 20L), (3, 15L, 16L), (4, 40L, 50L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, w = 8)
      .select($"iid", $"pid").as[(Int, String)].collect().toSet
    val want = pts.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
      .select($"iid", $"pid").as[(Int, String)].collect().toSet
    assert(got == want)
    assert(got.contains((1, "p1")) && got.contains((3, "p5")))
    assert(!got.exists(_._1 == 4)) // empty interval bucket joins nothing
  }

  test("RangeJoin buckets are exact beyond 2^53 (long floor division, no doubles)") {
    import graft.ops.RangeJoin
    // at |key| ~ 2^61 a double division collapses adjacent buckets;
    // the long floor division must keep them distinct on both signs
    val big = 1L << 61
    val pts = Seq((big + 9L, "p1"), (big - 9L, "p2"), (-big + 7L, "p3"),
      (big + 20L, "p4")).toDF("v", "pid")
    val ivs = Seq((1, big + 8L, big + 16L), (2, -big, -big + 8L),
      (3, big - 16L, big - 8L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, w = 8)
      .select($"iid", $"pid").as[(Int, String)].collect().toSet
    val want = pts.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
      .select($"iid", $"pid").as[(Int, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("RangeJoin.bucketOf equals BigInt floor division across the Long range") {
    import graft.ops.RangeJoin
    val rnd = new scala.util.Random(42)
    val edge = Seq(Long.MaxValue, Long.MinValue + 8, 0L, -1L, 1L,
      (1L << 53) + 1, -(1L << 53) - 1, (1L << 62) + 7, -(1L << 62) - 7)
    val vals = edge ++ Seq.fill(500)(rnd.nextLong())
    for (w <- Seq(1L, 7L, 16L, 86400L)) {
      val got = vals.toDF("v")
        .select(RangeJoin.bucketOf($"v", w)).as[Long].collect().toSeq
      // floor(v / w) in unbounded integers: drop v to the largest
      // multiple of w at or below it, then divide exactly
      val want = vals.map { v =>
        val b = BigInt(v)
        ((b - (((b % w) + w) % w)) / w).toLong
      }
      assert(got == want, s"w=$w")
    }
  }

  test("RangeJoin.intervalOverlap emits each overlapping pair exactly once") {
    import graft.ops.RangeJoin
    // a and b overlap across MANY shared buckets (w = 2) — the
    // canonical-bucket rule must still emit the pair once
    val a = Seq((1, 0L, 20L), (2, 30L, 31L)).toDF("aid", "lo", "hi")
    val b = Seq((10, 5L, 25L), (11, 21L, 29L)).toDF("bid", "lo2", "hi2")
    val got = RangeJoin.intervalOverlap(a, b, w = 2)
      .select($"aid", $"bid").as[(Int, Int)].collect().toSeq
    assert(got.sorted == Seq((1, 10))) // exactly once; (1,11)/(2,*) disjoint
  }

  test("midpointBoundsBy computes every axis in one keyed pass, bit-equal " +
      "to the per-axis global-window variant") {
    import graft.ops.WindowOps
    val axes = Seq(-60.0, 0.0, 60.0, 88.0).map(("lat", _)) ++
      Seq(5.0, 15.0, 40.0).map(("zlev", _)) ++
      Seq(100.0).map(("scalar", _)) // single-cell axis: both ends null
    val df = axes.toDF("axis_id", "coord")
    val oneShot = WindowOps.midpointBoundsBy(df, Seq($"axis_id"), "coord")
      .orderBy("axis_id", "coord").collect().toSeq
    val perAxis = Seq("lat", "scalar", "zlev").flatMap { a =>
      WindowOps.midpointBounds(df.filter($"axis_id" === a), "coord")
        .select(lit(a).as("axis_id"), $"coord", $"bnd_lo", $"bnd_hi")
        .orderBy("coord").collect().toSeq
    }
    assert(oneShot == perAxis)
    // the keyed window must partition on axis_id, not sort globally
    val plan = WindowOps.midpointBoundsBy(df, Seq($"axis_id"), "coord")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") && plan.contains("axis_id"), plan)
  }
}
