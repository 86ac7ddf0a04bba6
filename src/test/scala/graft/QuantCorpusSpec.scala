package graft

import graft.ops.{Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Int8 quantization + quantized ANN, line-level dedup, and corpus
  * mixing weights — the round-4 training-data-pipeline additions. */
class QuantCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def vecFrame = Seq(
    (0L, Array(1.0f, -2.0f, 0.5f, 4.0f)),
    (1L, Array(-1.0f, 2.0f, -0.5f, -4.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f, 0.4f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("quantizeInt8: codes bounded, extreme element hits ±127, zero vector nulls") {
    val q = Similarity.quantizeInt8(vecFrame, $"vec_id", $"embedding")
      .select($"id", $"scale", $"q8")
      .collect().map(r => r.getLong(0) -> r).toMap
    val q0 = q(0L).getSeq[Int](2)
    assert(q0.max == 127 && q0.forall(c => c >= -127 && c <= 127))
    // x = 1.0 with maxabs 4.0 → scale 31.75 → floor(31.75 + 0.5) = 32
    assert(q0.head == 32)
    val q1 = q(1L).getSeq[Int](2)
    assert(q1.min == -127)
    assert(q(3L).isNullAt(1) && q(3L).isNullAt(2))
  }

  test("quantizeInt8 reconstruction error is small relative to the norm") {
    val q = Similarity.quantizeInt8(vecFrame, $"vec_id", $"embedding")
      .filter($"maxabs" > 0)
      .select($"id", Similarity.dequantError("emb", "q8", "scale").as("err"),
        Similarity.sqNormExact("emb").as("n2"))
      .collect()
    assert(q.nonEmpty)
    // per-element error <= (1/(2·scale))², so err/norm² stays tiny
    q.foreach(r => assert(r.getDouble(1) <= r.getDouble(2) * 1e-3 + 1e-9))
  }

  test("dotInt equals a driver-side integer dot product") {
    val df = Seq((Array(1, -2, 3), Array(4, 5, -6))).toDF("a", "b")
    val got = df.select(Similarity.dotInt("a", "b")).as[Long].head()
    assert(got == (1 * 4 + -2 * 5 + 3 * -6).toLong)
  }

  test("lloydCentroids: one round = exact assignment + component means; empty cluster carries forward") {
    // 2-D points in two tight groups around (1,0) and (0,1), plus a
    // seed at (-1,-1) that captures nothing — it must survive verbatim
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(1.1f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f)), (5L, Array(0.05f, 1.1f))
    ).toDF("vec_id", "embedding")
    val all = Similarity.withNorms(pts, $"vec_id", $"embedding")
    val seeds = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), (2L, Array(-1.0, -1.0)))
      .toDF("cid", "cemb")
      .withColumn("cnorm2", Similarity.sqNormExact("cemb"))
    val out = Similarity.lloydCentroids(all, seeds, iters = 1)
      .select($"cid", $"cemb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // expected means via the same exact-decimal avg the op uses
    def m(vals: Seq[Float]) = {
      val dec = vals.map(v => BigDecimal(v.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      (dec.sum.toDouble / vals.size)
    }
    assert(out(0L) == Seq(m(Seq(1.0f, 0.9f, 1.1f)), m(Seq(0.0f, 0.1f, 0.05f))))
    assert(out(1L) == Seq(m(Seq(0.0f, 0.1f, 0.05f)), m(Seq(1.0f, 0.9f, 1.1f))))
    assert(out(2L) == Seq(-1.0, -1.0)) // carry-forward, no members
  }

  test("lloydCentroids iterations are stable on separated clusters") {
    // once assignments stop changing, centroids are a fixpoint: one
    // more round must not move them (exact arithmetic => bit equality)
    val pts = Seq(
      (0L, Array(2.0f, 0.0f)), (1L, Array(2.2f, 0.1f)),
      (2L, Array(0.0f, 3.0f)), (3L, Array(0.1f, 2.8f))
    ).toDF("vec_id", "embedding")
    val all = Similarity.withNorms(pts, $"vec_id", $"embedding")
    // one seed per (cosine-)cluster, so round-1 assignments are final
    val seeds = all.filter($"id" === 0 || $"id" === 2)
      .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select($"cid", $"cemb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val once = flat(Similarity.lloydCentroids(all, seeds, iters = 1))
    val twice = flat(Similarity.lloydCentroids(all, seeds, iters = 2))
    assert(once == twice)
  }

  test("quantizedTopK: shortlist re-rank matches bruteForceTopK on the shortlist-covered top") {
    // m = corpus size ⇒ the quantized path degenerates to exact brute force
    val base = spark.range(0, 30).select($"id".cast("long").as("vec_id"),
      expr("transform(sequence(0, 7), j -> CAST(CAST(hash(id * 8 + j) % 1000 AS DOUBLE) / 100.0D AS FLOAT))")
        .as("embedding"))
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val qz = Similarity.quantizeInt8(base, $"vec_id", $"embedding")
      .filter($"maxabs" > 0).select($"id", $"q8")
    val all = v.join(qz, Seq("id"))
    val queries = all.filter($"id" < 3)
    val got = Similarity.quantizedTopK(all, queries, m = 30, k = 4)
      .select($"id1", $"id2", $"rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(v, v.filter($"id" < 3), k = 4)
      .select($"id1", $"id2", $"rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("quantizedIvfTopK with every cell probed matches the flat quantized search") {
    val base = spark.range(0, 30).select($"id".cast("long").as("vec_id"),
      expr("transform(sequence(0, 7), j -> CAST(CAST(hash(id * 8 + j) % 1000 AS DOUBLE) / 100.0D AS FLOAT))")
        .as("embedding"))
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val qz = Similarity.quantizeInt8(base, $"vec_id", $"embedding")
      .filter($"maxabs" > 0).select($"id", $"q8")
    val all = v.join(qz, Seq("id"))
    val cents = v.filter($"id" < 4)
      .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
    // inverted-list layout: int8 codes carry their cell id from index time
    val codes = qz
      .join(Similarity.ivfAssign(v, cents).select($"id", $"cid"), Seq("id"))
    // nprobe = n_cells ⇒ the cell filter admits every candidate and the
    // composed index degenerates to the flat int8 sweep
    val got = Similarity.quantizedIvfTopK(codes, all, cents,
        all.filter($"id" < 3), nprobe = 4, m = 30, k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.quantizedTopK(all, all.filter($"id" < 3), m = 30, k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("lineDedupe drops corpus-repeated lines and reassembles in order") {
    val lines = Seq(
      (1L, 0, "shared header"), (1L, 1, "alpha"), (1L, 2, "beta"),
      (2L, 0, "shared header"), (2L, 1, "gamma"),
      (3L, 0, "shared header") // only boilerplate → doc vanishes
    ).toDF("doc_id", "line_no", "line")
    val out = TextOps.lineDedupe(lines, maxDocFreq = 2, sep = "\n")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 2L, "alpha\nbeta"), (2L, 1L, "gamma")))
  }

  test("lineDedupe keeps within-doc repeats that never cross documents") {
    val lines = Seq(
      (1L, 0, "solo"), (1L, 1, "solo"), (2L, 0, "other")
    ).toDF("doc_id", "line_no", "line")
    val out = TextOps.lineDedupe(lines, maxDocFreq = 2, sep = " ")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc-frequency of "solo" is 1 (one distinct doc), so both copies stay
    assert(out.toSeq == Seq((1L, 2L, "solo solo"), (2L, 1L, "other")))
  }

  test("pqCodebook re-keys seed ids to 0..k-1 and splits subspaces") {
    // non-contiguous seed ids 5 and 9 → cids 0 and 1 by id order
    val seeds = Seq(
      (5L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
      (9L, Array(5.0f, 5.0f, -10.0f, -10.0f)))
      .toDF("id", "emb")
    val cb = Similarity.pqCodebook(seeds, m = 2, dim = 4)
      .select($"cb").as[Seq[Seq[Seq[Double]]]].head()
    assert(cb.length == 2)                 // m subspaces
    assert(cb.forall(_.length == 2))       // k centroids each
    assert(cb(0)(0) == Seq(0.0, 0.0))      // seed 5's first subvector = cid 0
    assert(cb(1)(1) == Seq(-10.0, -10.0))  // seed 9's second subvector = cid 1
  }

  test("pqEncode assigns each subvector to its nearest centroid, ties to lower cid") {
    val seeds = Seq(
      (5L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
      (9L, Array(5.0f, 5.0f, -10.0f, -10.0f)))
      .toDF("id", "emb")
    val cb = Similarity.pqCodebook(seeds, m = 2, dim = 4)
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f, 9.0f, 9.0f)),    // near c0 in both subspaces
      (1L, Array(4.0f, 4.0f, -9.0f, -9.0f)),  // near c1 in both
      (2L, Array(2.5f, 2.5f, 0.0f, 0.0f)))    // s0 equidistant → lower cid
      .toDF("id", "emb")
    val codes = Similarity.pqEncode(vecs, cb, m = 2, dim = 4)
      .orderBy($"id").select($"codes").as[Seq[Int]].collect()
    assert(codes(0) == Seq(0, 0))
    assert(codes(1) == Seq(1, 1))
    assert(codes(2).head == 0) // exact tie on s0 breaks to cid 0
  }

  test("pqTopK: full-corpus shortlist re-rank matches bruteForceTopK") {
    // mShort = corpus size ⇒ the ADC sweep cannot drop the true top-k,
    // and the exact re-rank makes the result identical to brute force
    val base = spark.range(0, 30).select($"id".cast("long").as("vec_id"),
      expr("transform(sequence(0, 7), j -> CAST(CAST(hash(id * 8 + j) % 1000 AS DOUBLE) / 100.0D AS FLOAT))")
        .as("embedding"))
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val cb = Similarity.pqCodebook(v.filter($"id" < 4), m = 4, dim = 8)
    val codes = Similarity.pqEncode(v, cb, m = 4, dim = 8).select($"id", $"codes")
    val got = Similarity.pqTopK(codes, v, cb, v.filter($"id" < 3),
        m = 4, dim = 8, mShort = 30, k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(v, v.filter($"id" < 3), k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("pqIvfTopK with every cell probed matches the flat PQ search") {
    val base = spark.range(0, 30).select($"id".cast("long").as("vec_id"),
      expr("transform(sequence(0, 7), j -> CAST(CAST(hash(id * 8 + j) % 1000 AS DOUBLE) / 100.0D AS FLOAT))")
        .as("embedding"))
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val cb = Similarity.pqCodebook(v.filter($"id" < 4), m = 4, dim = 8)
    val cents = v.filter($"id" < 4)
      .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
    // the inverted-list layout: cell ids attach to codes at index time
    val codes = Similarity.pqEncode(v, cb, m = 4, dim = 8)
      .select($"id", $"codes")
      .join(Similarity.ivfAssign(v, cents).select($"id", $"cid"), Seq("id"))
    // nprobe = n_cells ⇒ the cell filter admits every candidate and the
    // composed index degenerates to the flat ADC sweep
    val got = Similarity.pqIvfTopK(codes, v, cb, cents, v.filter($"id" < 3),
        nprobe = 4, m = 4, dim = 8, mShort = 10, k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.pqTopK(codes, v, cb, v.filter($"id" < 3),
        m = 4, dim = 8, mShort = 10, k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("pqIvfResidualTopK with every cell probed and full shortlist matches brute force") {
    val base = spark.range(0, 30).select($"id".cast("long").as("vec_id"),
      expr("transform(sequence(0, 7), j -> CAST(CAST(hash(id * 8 + j) % 1000 AS DOUBLE) / 100.0D AS FLOAT))")
        .as("embedding"))
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val cents = v.filter($"id" < 4)
      .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
    val resid = Similarity.pqResiduals(v, cents)
    val seeds = resid.filter($"id" >= 4 && $"id" < 8)
      .select($"id", $"remb".as("emb"))
    val cb = Similarity.pqCodebook(seeds, m = 4, dim = 8)
    val codes = Similarity.pqEncode(
        resid.select($"id", $"cid", $"remb".as("emb")), cb, m = 4, dim = 8)
      .select($"id", $"cid", $"codes")
    // nprobe = n_cells and mShort = corpus ⇒ the exact re-rank sees every
    // candidate and the composed index equals the exact brute force
    val got = Similarity.pqIvfResidualTopK(codes, v, cb, cents,
        v.filter($"id" < 3), nprobe = 4, m = 4, dim = 8, mShort = 30, k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(v, v.filter($"id" < 3), k = 4)
      .select($"id1", $"id2", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("semanticDedup drops the higher id of each within-cell near-pair") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.98f, 0.12f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val cents = v.filter($"id".isin(0L, 2L))
      .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
    val out = Similarity.semanticDedup(v, cents, tau = 0.95)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // cells: {0,1,3} around c0, {2,4} around c2; ids 1,3,4 have a
    // ≥0.95 twin with a lower id in their cell, 0 and 2 survive
    assert(out.toSeq == Seq((0L, 0L, false), (1L, 0L, true),
      (2L, 2L, false), (3L, 0L, true), (4L, 2L, true)))
  }

  test("semanticDedup cell cap: no-op below the cap, only ever drops pairs above it") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.98f, 0.12f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val v = Similarity.withNorms(base, $"vec_id", $"embedding")
    val cents = v.filter($"id".isin(0L, 2L))
      .select($"id".as("cid"), $"emb".as("cemb"), $"norm2".as("cnorm2"))
    def dropsAt(maxCell: Int): Set[Long] =
      Similarity.semanticDedup(v, cents, tau = 0.95, maxCell = maxCell)
        .filter($"dropped").select($"id").as[Long].collect().toSet
    // every cell under the cap ⇒ bit-identical to the uncapped plan
    assert(dropsAt(256) == Set(1L, 3L, 4L))
    // cap of 1 sub-blocks every cell: cross-sub pairs are skipped, so
    // the drop set can only shrink — never grow, never lose rows
    val capped = Similarity.semanticDedup(v, cents, tau = 0.95, maxCell = 1)
    assert(capped.count() == 5)
    assert(dropsAt(1).subsetOf(Set(1L, 3L, 4L)))
  }

  test("ANN ladder holds its recall floor on the sf0.001 fixture") {
    // q121 freezes cross-engine PARITY (its oracle recomputes the same
    // ladder, so a coordinated Scala+SQL parameter change hash-matches
    // while quality silently degrades). This pins the ABSOLUTE quality:
    // per-method mean recall@3 on the deterministic fixture, floors set
    // just under the measured values (int8 0.9667, pq 0.9000, residual
    // 0.8333) and above what a halved nprobe yields (0.9333 / 0.9000 /
    // 0.8000) — degrading nprobe, mShort, centroid seeding, or codebook
    // math fails this even though the oracle still agrees.
    import graft.queries.{Registry => R}
    val means = R.runMap("q121_ann_recall")(spark, "/root/testdata/sf0.001")
      .groupBy($"method").agg(avg($"recall").as("mean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val floors = Map("ivf_int8" -> 0.95, "ivf_pq" -> 0.88,
      "ivf_pq_residual" -> 0.82)
    assert(means.keySet == floors.keySet, s"methods: ${means.keySet}")
    floors.foreach { case (m, floor) =>
      assert(means(m) >= floor, f"$m recall ${means(m)}%.4f below floor $floor")
    }
  }

  test("smoothedMixWeights boosts rare sources (α=0.5) and probs sum to 1") {
    val df = (Seq.fill(9)("big") ++ Seq.fill(1)("small")).toDF("b")
    val out = TextOps.smoothedMixWeights(df, Seq($"b"))
      .orderBy($"b").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(4)))
    // shares 0.9/0.1 → sqrt-smoothed probs 0.75/0.25: the rare source
    // samples at 2.5× its raw share, order preserved
    assert(out.map(_._1).toSeq == Seq("big", "small"))
    assert(math.abs(out(0)._3 - 0.75) < 1e-5 && math.abs(out(1)._3 - 0.25) < 1e-5)
    assert(out(1)._3 > out(1)._2 && out(0)._3 < out(0)._2)
    // z is the decimal-rounded sum (scale 6), so Σprob ≈ 1 at that scale
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-5)
  }

  test("mixWeights: uniform buckets rate 1.0, oversized bucket downsampled") {
    val df = (Seq.fill(6)("big") ++ Seq.fill(2)("small")).toDF("b")
    val out = TextOps.mixWeights(df, Seq($"b"))
      .orderBy($"b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // total 8, 2 buckets, uniform target 4: big 6 → rate 4/6, small 2 → capped at 1
    assert(out.toSeq == Seq(("big", 6L, 0.75, 4.0 / 6.0), ("small", 2L, 0.25, 1.0)))
  }

  test("multiProbeTopK covers at least the single-bucket candidates and never loses recall") {
    graft.plans.GraftFunctions.register(spark)
    val all = Similarity.withNorms(
      Tables(spark, "/root/testdata/sf0.001", "embeddings"),
      $"vec_id", $"embedding")
    val planes = Similarity.hyperplanes(spark, b = 6, d = 64)
    val buckets = Similarity.lshBuckets(all, planes).localCheckpoint()
    val queries = all.filter($"id" < 5)
    // single-bucket candidate set per query
    val single = buckets.as("q").join(buckets.as("c"),
        $"q.bucket" === $"c.bucket" && $"q.id" =!= $"c.id")
      .filter($"q.id" < 5)
      .select($"q.id".as("qid"), $"c.id".as("nid"))
      .as[(Long, Long)].collect().toSet
    // multi-probe candidates = its own bucket ∪ Hamming-1 flips
    val flips = col("bucket") +:
      (0 until 6).map(j => col("bucket").bitwiseXOR(lit(1L << j)))
    val multi = buckets.filter($"id" < 5)
      .select($"id".as("qid"), explode(array(flips: _*)).as("probe"))
      .join(buckets.select($"id".as("nid"), $"bucket".as("probe")), Seq("probe"))
      .filter($"nid" =!= $"qid").select($"qid", $"nid")
      .as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi), (single -- multi).take(5))
    assert(multi.size > single.size) // probing actually widened the net
    // and the top-k re-rank hits at least as many exact-top-3 neighbors
    val exact = Similarity.bruteForceTopK(all, queries, 3)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val mp = Similarity.multiProbeTopK(all, buckets, queries, b = 6, k = 3)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val singleHits = (single intersect exact).size
    val multiHits = (mp intersect exact).size
    assert(multiHits >= singleHits)
  }
}
