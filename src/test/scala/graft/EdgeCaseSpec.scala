package graft

import graft.ops.{Sessionize, Sketch, Skew}
import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** Degenerate inputs through the round-2 operators: empty frames,
  * single rows, all-one-key — the shapes that surface off-by-ones in
  * merge loops and state machines. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val noTrades = Seq.empty[(String, Long, Double)].toDF("sym", "t", "px")
  private val noQuotes = Seq.empty[(String, Long, Double)].toDF("qsym", "qt", "bid")
  private val oneTrade = Seq(("a", 10L, 1.0)).toDF("sym", "t", "px")
  private val oneQuote = Seq(("a", 5L, 0.5)).toDF("qsym", "qt", "bid")

  test("decimal-critical ops are invariant to the input partitioning") {
    import graft.ops.{Exact, Normalize}
    // mixed-magnitude values (within the documented DECIMAL(18,6)
    // envelope — x² must fit too) that would expose order-dependent
    // double summation if any path regressed to raw double sums
    val base = (1 to 2000).map(i => ("g" + (i % 3), 1.0 / i + 100.0 * (i % 7)))
    def run(parts: Int): Seq[(String, Double, Double)] = {
      val df = base.toDF("g", "x").repartition(parts)
      val sums = df.groupBy($"g").agg(Exact.dsum($"x").as("s"))
      val zs = Normalize.zscore(df, Seq("g"), $"x")
        .groupBy($"g").agg(Exact.dsum($"z").as("zsum"))
      sums.join(zs, "g").orderBy($"g")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    }
    val a = run(3)
    val b = run(17)
    // bit-exact equality, not tolerance — the determinism contract
    assert(a.zip(b).forall { case ((g1, s1, z1), (g2, s2, z2)) =>
      g1 == g2 &&
        java.lang.Double.doubleToLongBits(s1) == java.lang.Double.doubleToLongBits(s2) &&
        java.lang.Double.doubleToLongBits(z1) == java.lang.Double.doubleToLongBits(z2)
    }, s"$a vs $b")
  }

  test("Ewma.ema is invariant to the input partitioning (secondary-sort fold)") {
    import graft.ops.Ewma
    val base = (1 to 4000).map(i => ((i % 7).toLong, i.toLong, i.toLong, 1.0 / i))
    def run(parts: Int): Seq[Double] = {
      val df = base.toDF("k", "t", "tie", "v").repartition(parts)
      Ewma.ema(df, $"k", $"t", $"tie", $"v", alpha = 0.125)
        .orderBy($"key", $"t").select($"ema").as[Double].collect().toSeq
    }
    val a = run(2).map(java.lang.Double.doubleToLongBits)
    val b = run(23).map(java.lang.Double.doubleToLongBits)
    assert(a == b)
  }

  test("round-5 ops reject invalid shapes and survive degenerate input") {
    import graft.ops.{Normalize, RangeJoin, Sampling, Similarity, TextOps}
    // parameter validation fails fast, not mid-job
    val v = Seq((0L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "emb")
    intercept[IllegalArgumentException] {
      Similarity.pqCodebook(v, m = 2, dim = 3) // 3 % 2 != 0
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        Seq((1L, "p")).toDF("v", "pid"),
        Seq((1, 0L, 5L)).toDF("iid", "lo", "hi"), w = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(lit("x"), den = 10, train = 9, valSlots = 1)
    }
    // every document too short for a shingle → empty output, no crash
    val shortDocs = Seq((1L, "too short"), (2L, "also tiny"))
      .toDF("doc_id", "text")
    assert(TextOps.dupSpans(shortDocs, $"doc_id", $"text", w = 5).count() == 0)
    // empty corpus sketch → every probe estimates zero
    val emptyCms = graft.ops.Sketch.cmsBuild(
      Seq.empty[String].toDF("word"), $"word", d = 2, w = 64)
    val probed = graft.ops.Sketch.cmsEstimate(emptyCms,
        Seq("x").toDF("word"), $"word", d = 2, w = 64)
      .select($"est").as[Long].collect()
    assert(probed.toSeq == Seq(0L))
    // zscore of an empty frame is empty, not an error
    assert(Normalize.zscore(
      Seq.empty[(String, Double)].toDF("g", "x"), Seq("g"), $"x").count() == 0)
  }

  test("retrieval family survives empty and degenerate input") {
    import graft.ops.{Retrieval, Sampling}
    // empty corpus: index frames are empty, scoring yields no rows
    val noTok = Seq.empty[(Long, String)].toDF("doc", "token")
    val (p0, d0, s0) = Retrieval.bm25Index(noTok)
    val qt = Seq((0L, "x")).toDF("qid", "token")
    assert(Retrieval.bm25Scores(p0, d0, s0, qt).count() == 0)
    // query term absent from the corpus: the dfreq inner join drops it
    val tok = Seq((1L, "a"), (1L, "b")).toDF("doc", "token")
    val (p1, d1, s1) = Retrieval.bm25Index(tok)
    val unknown = Seq((0L, "zzz")).toDF("qid", "token")
    assert(Retrieval.bm25Scores(p1, d1, s1, unknown).count() == 0)
    // empty query set: no pairs, not a crash
    val noQ = Seq.empty[(Long, String)].toDF("qid", "token")
    assert(Retrieval.bm25Scores(p1, d1, s1, noQ).count() == 0)
    // rrfFuse over a single ranking is that ranking's reciprocal ranks
    val one = Seq((0L, 5L, 1)).toDF("qid", "doc", "rank")
    val fused = Retrieval.rrfFuse(Seq(one))
      .as[(Long, Long, Double)].collect()
    assert(fused.length == 1 &&
      math.abs(fused(0)._3 - math.rint(1.0 / 61 * 1e9) / 1e9) < 1e-12)
    // empty selection input: no bins, no budget, no rows, no crash
    val noDocs = Seq.empty[(Long, Long, Double)]
      .toDF("doc", "n_tokens", "quality")
    assert(Sampling.tokenBudgetSelect(noDocs, 1, 2).count() == 0)
    // hardNegatives with empty positives is plain top-k
    val sc = Seq((0L, 1L, 2.0), (0L, 2L, 1.0)).toDF("qid", "doc", "score")
    val noPos = Seq.empty[(Long, Long)].toDF("qid", "doc")
    assert(Retrieval.hardNegatives(sc, noPos, 1)
      .as[(Long, Long, Double, Int)].collect().toSeq == Seq((0L, 1L, 2.0, 1)))
  }

  test("incremental LSH and stream signature survive empty input") {
    import graft.ops.Retrieval
    import graft.streaming.StreamIncDedup
    val noBands = Seq.empty[(Long, Int, Long, Boolean)]
      .toDF("doc", "band", "sig", "is_new")
    assert(Retrieval.incrementalLshCandidates(noBands).count() == 0)
    // all-old bands: the new side is empty, so no candidates
    val oldOnly = Seq((1L, 0, 7L, false), (2L, 0, 7L, false))
      .toDF("doc", "band", "sig", "is_new")
    assert(Retrieval.incrementalLshCandidates(oldOnly).count() == 0)
    assert(StreamIncDedup.signature("").isEmpty)
    assert(StreamIncDedup.signature("one two").isEmpty)
    assert(StreamIncDedup.signature("a b c").length == 8)
  }

  test("as-of join with empty sides") {
    assert(AsOf.backwardJoin(noTrades, oneQuote,
      Seq("sym"), Seq("qsym"), "t", "qt").count() == 0)
    val nullExt = AsOf.backwardJoin(oneTrade, noQuotes,
        Seq("sym"), Seq("qsym"), "t", "qt")
      .select($"sym", $"bid").as[(String, Option[Double])].collect().toSeq
    assert(nullExt == Seq(("a", None)))
    val single = AsOf.nearestJoin(oneTrade, oneQuote,
        Seq("sym"), Seq("qsym"), "t", "qt")
      .select($"bid").as[Double].collect().toSeq
    assert(single == Seq(0.5))
  }

  test("sessionize on empty and single-event input") {
    val empty = Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "event_id", "ts", "value")
    assert(Sessionize.sessions(empty, $"user_id", $"ts", $"event_id",
      $"value", 1800L).count() == 0)
    val one = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.5))
      .toDF("user_id", "event_id", "ts", "value")
    val row = Sessionize.sessions(one, $"user_id", $"ts", $"event_id",
        $"value", 1800L)
      .select($"user_id", $"session_id", $"n_events", $"session_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(row == Seq((1L, 1L, 1L, 2.5)))
  }

  test("bloom semi join with an empty small side and a non-integral key") {
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String)].toDF("s", "w")
    // empty build side -> empty result, no div-by-zero in sizing
    assert(graft.ops.Bloom.semiJoin(big, none, "k", "s").count() == 0)
    // string keys would silently hash-mismatch: rejected up front
    intercept[IllegalArgumentException] {
      graft.ops.Bloom.prefilter(big, big, "v", "v")
    }
  }

  test("exact quantiles on single-element and empty groups") {
    import graft.ops.WindowOps
    val one = Seq(("g", 7.0, 1L)).toDF("g", "v", "id")
    val q = WindowOps.exactQuantiles(one, Seq($"g"), $"v", $"id",
        Seq(0.25, 0.5, 0.75))
      .as[(String, Double, Double)].collect().toSeq
    // every quantile of a 1-element group is that element
    assert(q == Seq(("g", 0.25, 7.0), ("g", 0.5, 7.0), ("g", 0.75, 7.0)))
    val empty = Seq.empty[(String, Double, Long)].toDF("g", "v", "id")
    assert(WindowOps.exactQuantiles(empty, Seq($"g"), $"v", $"id",
      Seq(0.5)).count() == 0)
  }

  test("kmv and salted stats on empty and one-key input") {
    val empty = Seq.empty[(String, String)].toDF("key", "v")
    assert(Sketch.kmvDistinct(empty, $"key", $"v", 8).count() == 0)
    val one = Seq(("k", "x"), ("k", "x"), ("k", "y")).toDF("key", "v")
    val est = Sketch.kmvDistinct(one, $"key", $"v", 8)
      .as[(String, Double)].collect().toMap
    assert(est == Map("k" -> 2.0)) // below k: exact
    val stats = Skew.saltedStats(one, $"key", lit(1.0), $"v", 4)
      .as[(String, Long, Double)].collect().toSeq
    assert(stats == Seq(("k", 3L, 3.0)))
  }
}
