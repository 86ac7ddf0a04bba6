package graft.queries

import graft.Tables
import graft.ops.{Pca, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-store dimensionality reduction: distributed PCA (one-pass
  * covariance + fixed-iteration power method), projections onto the
  * learned components, top-2 components via deflation, and the
  * reduced-space ANN recall audit — the variance-auditing /
  * pre-indexing reduction arm of an embedding pipeline. Everything
  * data-order-dependent is an exact fine-quantized sum, so components
  * and scores are bit-identical across engines.
  */
object PcaQueries extends QueryGroup {

  /** (id, emb: Array[Double]) vector rows. */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, dir, "embeddings")
      .select($"vec_id".as("id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
  }

  private val compSql = """
    comp AS MATERIALIZED (
      SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS e
      FROM embeddings)"""

  private val Iters = 4

  /** Top principal component of the centered embedding corpus: per-dim
    * component value + the eigenvalue estimate from the final power
    * iterate. The corpus is touched once (means + second moments);
    * the iteration runs on the d²-row covariance frame. */
  private val q155 = Q(
    "q155_pca_component",
    (s, dir) => {
      import s.implicits._
      Pca.powerComponent(Pca.covariance(vecs(s, dir)), Iters)
        .orderBy($"i")
    },
    Some(s"""
      WITH $compSql,
      ${Pca.covSql},
      ${Pca.powerSql(Iters)}
      SELECT j AS i, v, (SELECT lambda FROM lam$Iters) AS lambda
      FROM v$Iters ORDER BY i"""))

  /** 1-D PCA projection: every vector's score along the learned
    * component (x − μ)·v — the reduced representation plus the exact
    * train-then-apply composition (the component is learned and applied
    * in one lineage, no driver round-trip). */
  private val q156 = Q(
    "q156_pca_project",
    (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      val c = Pca.compOf(v)
      Pca.project(c, Pca.means(c), Pca.powerComponent(Pca.covariance(v), Iters))
        .orderBy($"id")
    },
    Some(s"""
      WITH $compSql,
      ${Pca.covSql},
      ${Pca.powerSql(Iters)},
      proj AS (
        SELECT comp.id,
          ${graft.ops.Exact.sqlSumFine(s"(comp.e - mu.mu) * v$Iters.v")}
            AS score
        FROM comp JOIN mu ON comp.i = mu.i
                  JOIN v$Iters ON comp.i = v$Iters.j
        GROUP BY comp.id)
      SELECT id, score FROM proj ORDER BY id"""))

  /** Top TWO principal components via Hotelling deflation: pc1 from the
    * power method, then cov′ = cov − λ₁v₁v₁ᵀ (a map-side update on the
    * d²-row frame) and a second power run for pc2 — the general top-k
    * recipe, shown at k=2. Output: (pc, i, v, lambda). */
  private val q157 = Q(
    "q157_pca_two_components",
    (s, dir) => {
      import s.implicits._
      // one Gramian job feeds both power runs and the deflation
      val cov = Pca.covariance(vecs(s, dir)).localCheckpoint()
      val pc1 = Pca.powerComponent(cov, Iters)
      val pc2 = Pca.powerComponent(Pca.deflate(cov, pc1), Iters)
      pc1.withColumn("pc", lit(1)).unionAll(pc2.withColumn("pc", lit(2)))
        .select($"pc", $"i", $"v", $"lambda")
        .orderBy($"pc", $"i")
    },
    Some(s"""
      WITH $compSql,
      ${Pca.covSql},
      ${Pca.powerSql(Iters)},
      ${Pca.deflateSql(Iters, "cov", "cov2")},
      ${Pca.powerSql(Iters, "cov2", "b")}
      SELECT 1 AS pc, j AS i, v, (SELECT lambda FROM lam$Iters) AS lambda
      FROM v$Iters
      UNION ALL
      SELECT 2 AS pc, j AS i, v, (SELECT lambda FROM blam$Iters) AS lambda
      FROM bv$Iters
      ORDER BY pc, i"""))

  /** Reduced-dimension ANN + recall audit: vectors are projected onto
    * the top-2 PCA components, candidate top-3 neighbors are found by
    * squared euclidean distance IN THE 2-D SPACE (the cheap sweep a
    * reduced index would run), and each query's reduced-space top-3 is
    * scored for recall against the exact full-space cosine top-3 —
    * closing the loop between the reduction family (q155–q157) and the
    * ANN audit family (q121). The reduced sweep reads two doubles per
    * vector instead of d floats; the audit quantifies what that 32×
    * read cut costs in recall. */
  private val q160 = Q(
    "q160_pca_reduced_ann",
    (s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val v = vecs(s, dir)
      val cov = Pca.covariance(v).localCheckpoint()
      val pc1 = Pca.powerComponent(cov, Iters)
      val pc2 = Pca.powerComponent(Pca.deflate(cov, pc1), Iters)
      val c = Pca.compOf(v)
      val mu = Pca.means(c)
      val red = Pca.project(c, mu, pc1).withColumnRenamed("score", "z1")
        .join(Pca.project(c, mu, pc2).withColumnRenamed("score", "z2"),
          Seq("id"))
        .localCheckpoint()
      val rq = red.filter($"id" < 10)
        .select($"id".as("id1"), $"z1".as("qz1"), $"z2".as("qz2"))
      val pairs = broadcast(rq).join(red.as("c"), $"id1" =!= $"c.id")
        .select($"id1", $"c.id".as("id2"),
          (($"qz1" - $"z1") * ($"qz1" - $"z1") +
           ($"qz2" - $"z2") * ($"qz2" - $"z2")).as("d2"))
      val red3 = graft.ops.Relational.topKPerGroup(pairs, Seq($"id1"),
        Seq($"d2".asc, $"id2".asc), 3).select($"id1", $"id2")
      val all = Similarity.withNorms(
        Tables(s, dir, "embeddings"), $"vec_id", $"embedding")
      val exact = Similarity.bruteForceTopK(all, all.filter($"id" < 10), 3)
        .select($"id1", $"id2").withColumn("__hit", lit(1))
      red3.join(exact, Seq("id1", "id2"), "left")
        .groupBy($"id1")
        .agg((sum(coalesce($"__hit", lit(0))).cast("double") / lit(3.0))
          .as("recall"))
        .orderBy($"id1")
    },
    Some(s"""
      WITH $compSql,
      ${Pca.covSql},
      ${Pca.powerSql(Iters)},
      ${Pca.deflateSql(Iters, "cov", "cov2")},
      ${Pca.powerSql(Iters, "cov2", "b")},
      p1 AS MATERIALIZED (
        SELECT comp.id,
          ${graft.ops.Exact.sqlSumFine(s"(comp.e - mu.mu) * v$Iters.v")}
            AS z1
        FROM comp JOIN mu ON comp.i = mu.i
                  JOIN v$Iters ON comp.i = v$Iters.j
        GROUP BY comp.id),
      p2 AS MATERIALIZED (
        SELECT comp.id,
          ${graft.ops.Exact.sqlSumFine(s"(comp.e - mu.mu) * bv$Iters.v")}
            AS z2
        FROM comp JOIN mu ON comp.i = mu.i
                  JOIN bv$Iters ON comp.i = bv$Iters.j
        GROUP BY comp.id),
      red AS MATERIALIZED (
        SELECT p1.id, p1.z1, p2.z2 FROM p1 JOIN p2 ON p1.id = p2.id),
      pairs AS (
        SELECT q.id AS id1, c.id AS id2,
          (q.z1 - c.z1) * (q.z1 - c.z1) +
          (q.z2 - c.z2) * (q.z2 - c.z2) AS d2
        FROM red q JOIN red c ON q.id <> c.id
        WHERE q.id < 10),
      red3 AS (
        SELECT id1, id2 FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id1
                      ORDER BY d2, id2) AS rk
          FROM pairs) WHERE rk <= 3),
      e_parts AS (
        SELECT q.id AS id1, c.id AS id2, q.e * c.e AS p,
               q.e * q.e AS a2, c.e * c.e AS b2
        FROM comp q JOIN comp c ON q.i = c.i AND q.id <> c.id
        WHERE q.id < 10),
      e_cos AS (
        SELECT id1, id2,
          CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) /
            (sqrt(CAST(SUM(CAST(a2 AS DECIMAL(18,6))) AS DOUBLE)) *
             sqrt(CAST(SUM(CAST(b2 AS DECIMAL(18,6))) AS DOUBLE))) AS cosine
        FROM e_parts GROUP BY id1, id2),
      exact3 AS (
        SELECT id1, id2 FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id1
                      ORDER BY cosine DESC, id2) AS rk
          FROM e_cos) WHERE rk <= 3)
      SELECT r.id1, CAST(SUM(CASE WHEN e.id2 IS NOT NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / 3.0e0 AS recall
      FROM red3 r LEFT JOIN exact3 e ON r.id1 = e.id1 AND r.id2 = e.id2
      GROUP BY r.id1 ORDER BY r.id1"""))

  def queries: Seq[Q] = Seq(q155, q156, q157, q160)
}
