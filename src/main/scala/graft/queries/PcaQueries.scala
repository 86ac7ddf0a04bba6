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

  private def comp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, dir, "embeddings")
      .select($"vec_id".as("id"), posexplode($"embedding").as(Seq("i", "e")))
      .withColumn("e", $"e".cast("double"))
  }

  private val compSql = """
    comp AS (
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
      Pca.powerComponent(Pca.covariance(comp(s, dir)), Iters)
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
      val c = comp(s, dir)
      val cov = Pca.covariance(c)
      Pca.project(c, Pca.means(c), Pca.powerComponent(cov, Iters))
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

  def queries: Seq[Q] = Seq(q155, q156)
}
