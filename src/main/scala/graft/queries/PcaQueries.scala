package graft.queries

import graft.Tables
import graft.ops.Pca
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-store dimensionality reduction: distributed PCA (one-pass
  * covariance + fixed-iteration power method) and the 1-D projection of
  * the corpus onto the learned component — the variance-auditing /
  * pre-indexing reduction step of an embedding pipeline. Everything
  * data-order-dependent is an exact scale-18 decimal sum, so the
  * component and scores are bit-identical across engines.
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

  def queries: Seq[Q] = Seq(q155, q156, q157)
}
