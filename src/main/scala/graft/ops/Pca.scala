package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed principal-component analysis over an embedding corpus:
  * one-pass covariance accumulation plus a fixed-iteration power method
  * — the dimensionality-reduction half of an embedding store (PCA
  * projection before indexing, variance auditing, whitening), built the
  * way a 100 TB deployment has to build it: the DATA is touched once
  * (to accumulate d² second moments and d means, all map-side-combined
  * groupBys), and every later step runs on d- or d²-sized frames, where
  * d is the embedding width, not the corpus.
  *
  * Determinism contract: every data-order-dependent reduction (second
  * moments, mat-vec products, squared norms, projections) is an exact
  * decimal sum at scale 18 ([[Exact.dsumFine]] — covariance-sized
  * values would lose all precision at the default scale 6); the IEEE
  * divisions/sqrts that follow are single deterministic chains over
  * identical inputs, so the component, eigenvalue, and scores are
  * bit-identical across engines and reruns. The power iteration runs a
  * FIXED iteration count (the caller's convergence budget, mirrored by
  * the unrolled oracle) rather than a data-dependent stopping rule.
  *
  * Scale shape: the d²-row covariance frame is KB-sized for any real
  * embedding width (64²..4096²) and broadcasts; each iteration is a
  * broadcast join + d-group aggregation, localCheckpointed so the loop
  * does not double the plan (the Lloyd/BPE contract). The corpus-side
  * cost is the pair explode: d rows in, d² out per vector, all combined
  * map-side — no shuffle ever carries more than d² rows.
  */
object Pca {

  /** Per-dimension means of (id, i, e) component rows: (i, mu). */
  def means(comp: DataFrame): DataFrame =
    comp.groupBy(col("i")).agg(Exact.davgFine(col("e")).as("mu"))

  /** Covariance matrix (i, j, cov) from raw second moments:
    * cov_ij = Σ e_i·e_j / n − mu_i·mu_j — no centering pass over the
    * data, the mean correction is applied on the d²-sized moment frame. */
  def covariance(comp: DataFrame): DataFrame = {
    val m2 = comp.as("a").join(comp.as("b"), col("a.id") === col("b.id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(Exact.dsumFine(col("a.e") * col("b.e")).as("s"),
        count(lit(1)).as("cnt"))
    val mu = means(comp)
    m2.join(broadcast(mu.select(col("i"), col("mu").as("mu_i"))), Seq("i"))
      .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mu_j"))),
        Seq("j"))
      .select(col("i"), col("j"),
        (col("s") / col("cnt") - col("mu_i") * col("mu_j")).as("cov"))
  }

  /** Top principal component by `iters` power-method rounds from the
    * deterministic uniform start v0 = 1/√d: returns (i, v, lambda)
    * with v the unit component and lambda the last iterate's ‖Σv‖ —
    * the standard eigenvalue estimate at convergence. */
  def powerComponent(cov: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    val dims = cov.select(col("i").as("j")).distinct()
    val dcnt = dims.agg(count(lit(1)).as("d"))
    var v = dims.crossJoin(broadcast(dcnt))
      .select(col("j"), (lit(1.0) / sqrt(col("d"))).as("v"))
    var lam: DataFrame = null
    for (_ <- 1 to iters) {
      val u = cov.join(broadcast(v), Seq("j"))
        .groupBy(col("i"))
        .agg(Exact.dsumFine(col("cov") * col("v")).as("u"))
      lam = u.agg(sqrt(Exact.dsumFine(col("u") * col("u"))).as("lambda"))
      v = u.crossJoin(broadcast(lam))
        .select(col("i").as("j"), (col("u") / col("lambda")).as("v"))
        .localCheckpoint()
    }
    v.crossJoin(broadcast(lam))
      .select(col("j").as("i"), col("v"), col("lambda"))
  }

  /** Projection of every vector onto the component: score_id =
    * Σ_i (e_i − mu_i)·v_i — the 1-D PCA embedding. The mean and
    * component frames are d rows and broadcast; one corpus pass. */
  def project(comp: DataFrame, mu: DataFrame, component: DataFrame): DataFrame =
    comp.join(broadcast(mu), Seq("i"))
      .join(broadcast(component.select(col("i"), col("v"))), Seq("i"))
      .groupBy(col("id"))
      .agg(Exact.dsumFine((col("e") - col("mu")) * col("v")).as("score"))

  // ---------------------------------------------------------------
  // Oracle SQL twins (DuckDB). Callers provide a `comp` CTE with
  // (id, i, e) and splice these after it.
  // ---------------------------------------------------------------

  /** CTEs mu(i,mu), cov(i,j,cov) mirroring [[covariance]]. */
  def covSql: String = s"""
      mu AS (SELECT i, ${Exact.sqlAvgFine("e")} AS mu FROM comp GROUP BY i),
      m2 AS (
        SELECT a.i AS i, b.i AS j, ${Exact.sqlSumFine("a.e * b.e")} AS s,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM comp a JOIN comp b ON a.id = b.id
        GROUP BY a.i, b.i),
      cov AS (
        SELECT m2.i, m2.j, m2.s / m2.cnt - mi.mu * mj.mu AS cov
        FROM m2 JOIN mu mi ON m2.i = mi.i
                JOIN mu mj ON m2.j = mj.i)"""

  /** CTE chain v0..v$iters + lam mirroring [[powerComponent]]; the
    * final frames are v$iters(j, v) and lam$iters(lambda). */
  def powerSql(iters: Int): String = {
    val v0 = """
      dims AS (SELECT DISTINCT i AS j FROM cov),
      dcnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM dims),
      v0 AS (SELECT j, 1.0e0 / sqrt(d) AS v FROM dims, dcnt)"""
    val steps = (1 to iters).map { k =>
      s"""
      u$k AS (
        SELECT cov.i, ${Exact.sqlSumFine(s"cov.cov * v${k - 1}.v")} AS u
        FROM cov JOIN v${k - 1} ON cov.j = v${k - 1}.j
        GROUP BY cov.i),
      lam$k AS (SELECT sqrt(${Exact.sqlSumFine("u * u")}) AS lambda FROM u$k),
      v$k AS (SELECT i AS j, u / lambda AS v FROM u$k, lam$k)"""
    }
    v0 + steps.mkString(",", ",", "")
  }
}
