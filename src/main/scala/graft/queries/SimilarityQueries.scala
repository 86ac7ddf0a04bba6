package graft.queries

import graft.Tables
import graft.ops.{Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity batch over `embeddings` (64-dim float vectors):
  * cosine near-duplicate pairs, brute-force top-k ANN baseline, and the
  * LSH-bucketed scale path. Dot products are decimal-exact sums of
  * double products so both engines agree bit-wise; ranking uses a total
  * order (cosine desc, id asc).
  */
object SimilarityQueries extends QueryGroup {

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftFunctions.register(s)
    Similarity.withNorms(Tables(s, dir, "embeddings"), $"vec_id", $"embedding")
  }

  private val compSql = """
    comp AS (
      SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS e
      FROM embeddings)"""

  private val cosSql =
    "CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / " +
      "(sqrt(CAST(SUM(CAST(a2 AS DECIMAL(18,6))) AS DOUBLE)) * " +
      "sqrt(CAST(SUM(CAST(b2 AS DECIMAL(18,6))) AS DOUBLE)))"

  /** Embedding-cosine near-duplicate pairs within a label block. */
  private val q50 = Q(
    "q50_embed_cosine_dedup",
    (s, dir) => {
      import s.implicits._
      val blocks = Tables(s, dir, "embeddings")
        .select($"vec_id".as("id"), $"label".as("block"))
      Similarity.blockedCosinePairs(vecs(s, dir), blocks, prefilterAbove = Some(0.4))
        .filter($"cosine" >= 0.4)
        .orderBy($"id1", $"id2")
    },
    Some(s"""
      WITH $compSql,
      c AS (SELECT comp.*, e2.label AS block
            FROM comp JOIN embeddings e2 ON comp.id = e2.vec_id),
      parts AS (
        SELECT a.id AS id1, b.id AS id2, a.e * b.e AS p,
               a.e * a.e AS a2, b.e * b.e AS b2
        FROM c a JOIN c b
          ON a.block = b.block AND a.i = b.i AND a.id < b.id),
      cos AS (SELECT id1, id2, $cosSql AS cosine
              FROM parts GROUP BY id1, id2)
      SELECT id1, id2, cosine FROM cos
      WHERE cosine >= 0.4e0 ORDER BY id1, id2"""))

  /** Brute-force cosine top-k (k=5) for a small query set — the exact
    * ANN baseline. */
  private val q51 = Q(
    "q51_ann_topk",
    (s, dir) => {
      import s.implicits._
      val all = vecs(s, dir)
      Similarity.bruteForceTopK(all, all.filter($"id" < 10), k = 5)
        .select($"id1", $"id2", $"cosine", $"rank")
        .orderBy($"id1", $"rank")
    },
    Some(s"""
      WITH $compSql,
      parts AS (
        SELECT q.id AS id1, c.id AS id2, q.e * c.e AS p,
               q.e * q.e AS a2, c.e * c.e AS b2
        FROM comp q JOIN comp c ON q.i = c.i AND q.id <> c.id
        WHERE q.id < 10),
      cos AS (SELECT id1, id2, $cosSql AS cosine
              FROM parts GROUP BY id1, id2),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY id1
                    ORDER BY cosine DESC, id2) AS INT) AS rank
        FROM cos)
      SELECT id1, id2, cosine, rank FROM ranked
      WHERE rank <= 5 ORDER BY id1, rank"""))

  /** LSH-bucketed ANN: 6 deterministic pseudo-random hyperplanes give a
    * 64-bucket code; report each vector's bucket and the bucket
    * occupancy — the candidate-generation stage of the scale path. */
  private val q52 = Q(
    "q52_ann_lsh_buckets",
    (s, dir) => {
      import s.implicits._
      val planes = Similarity.hyperplanes(s, b = 6, d = 64)
      val buckets = Similarity.lshBuckets(vecs(s, dir), planes)
      // Occupancy via groupBy + broadcast join back, NOT a window
      // partitioned by bucket: with b planes there are only 2^b distinct
      // partition keys, so the window form caps parallelism at 2^b tasks
      // and each holds a whole bucket in one frame. The groupBy keeps
      // partial aggregation map-side and the ≤2^b-row count broadcasts.
      val occupancy = buckets.groupBy($"bucket")
        .agg(count(lit(1)).as("bucket_size"))
      buckets.join(broadcast(occupancy), "bucket")
        .select($"id", $"bucket", $"bucket_size")
        .orderBy($"id")
    },
    Some(s"""
      WITH $compSql,
      planes AS (
        SELECT p, i,
          CAST(${TextOps.h64Sql("(CAST(p AS VARCHAR) || '-' || CAST(i AS VARCHAR))")}
               % 2001 - 1000 AS DOUBLE) AS w
        FROM (SELECT unnest(generate_series(0, 5)) AS p) ps,
             (SELECT unnest(generate_series(0, 63)) AS i) ds),
      dots AS (
        SELECT c.id, pl.p,
          CAST(SUM(CAST(c.e * pl.w AS DECIMAL(18,6))) AS DOUBLE) AS dot
        FROM comp c JOIN planes pl ON c.i = pl.i
        GROUP BY c.id, pl.p),
      buckets AS (
        SELECT id, CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << p)
                            ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY id)
      SELECT id, bucket,
        CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size
      FROM buckets ORDER BY id"""))

  /** Multimodal column plumbing: media as opaque binary payloads with
    * typed metadata; the "decode" is the deterministic stub (the real
    * codec is environment-provided — see graft.ops.Multimodal for the
    * batched mapPartitions path). */
  private val q53 = Q(
    "q53_multimodal_meta",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("payload", $"text".cast("binary"))
        .select($"doc_id",
          octet_length($"payload").as("n_bytes"),
          (TextOps.h64($"source") % 640).as("width"),
          (TextOps.h64($"source") % 480).as("height"),
          (expr("octet_length(payload) div 100") + 1).as("n_frames"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        ${TextOps.h64Sql("source")} % 640 AS width,
        ${TextOps.h64Sql("source")} % 480 AS height,
        octet_length(encode(text)) // 100 + 1 AS n_frames
      FROM documents ORDER BY doc_id"""))

  def queries: Seq[Q] = Seq(q50, q51, q52, q53)
}
