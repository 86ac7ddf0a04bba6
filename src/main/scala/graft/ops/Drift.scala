package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring: the Population Stability Index
  * between a frozen REFERENCE slice and a CURRENT slice, per group —
  * the standard production check that yesterday's model/filters still
  * see the data they were tuned on (PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted; Siddiqi, "Credit Risk Scorecards" 2006).
  *
  * Bin edges come from the reference's exact nearest-rank quantiles
  * (the q119 machinery — deterministic, engine-identical) and are
  * FROZEN: both slices histogram over the reference's edges, which is
  * what makes the comparison a drift measure rather than two unrelated
  * quantile sketches.
  *
  * Scale shape: one window pass over the reference per group for the
  * edges (group-keyed, never a whole-frame sort), the edge table is
  * groups-sized and broadcasts back, both histograms are
  * map-side-combined groupBys, and the PSI fold runs on the
  * groups×bins-sized frame. Nothing data-sized crosses a shuffle
  * except the two histogram reductions.
  *
  * Determinism: each bin's PSI term (p_c − p_r)·ln(p_c/p_r) ends in a
  * transcendental, so the term is rounded to 6 decimals (the engine's
  * transcendental convention) and the per-group sum of rounded terms
  * is decimal-exact. Probabilities are floored at `eps` so a bin empty
  * on one side contributes a large-but-finite term, never ±∞. */
object Drift {

  /** Kolmogorov asymptotic tail Q(λ) = 2Σ(−1)^{j−1}e^{−2j²λ²},
    * truncated at j = 10, as a FIXED left-to-right chain of exp terms
    * over a column named `lam2` — never a commutative float sum, so
    * Spark, DuckDB, and the streaming twin agree bit-wise. Shared by
    * q192's batch screen and [[graft.streaming.StreamDriftScreen]]. */
  val kolmogorovQSql: String =
    (2 to 10).foldLeft("exp(-2.0e0 * 1.0e0 * lam2)") { (acc, j) =>
      val sign = if (j % 2 == 0) "-" else "+"
      s"$acc $sign exp(-2.0e0 * ${j * j}.0e0 * lam2)"
    }

  /** The frozen bin-edge table: per group, the sorted exact
    * nearest-rank quantiles of the reference as an array column
    * `__th`. Groups-sized; broadcasts into every consumer (the batch
    * histograms here, the stateless streaming assign in
    * [[graft.streaming.StreamDrift]]). */
  def referenceEdges(ref: DataFrame, keys: Seq[String], x: Column,
      tieBreak: Column, qs: Seq[Double]): DataFrame =
    WindowOps.exactQuantiles(ref, keys.map(col), x, tieBreak, qs)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("qvalue").cast("double"))).as("__th"))

  /** Frozen-edge bin assignment: adds `bin` = 1 + #edges below x.
    * Pure map-side against the broadcast edge table — works on static
    * and streaming frames alike. */
  def assignBins(df: DataFrame, edges: DataFrame, keys: Seq[String],
      x: Column): DataFrame =
    df.join(broadcast(edges), keys)
      .withColumn("__x", x.cast("double"))
      .withColumn("bin", expr(
        "1 + aggregate(__th, 0, (a, t) -> a + IF(__x > t, 1, 0))"))
      .drop("__th", "__x")

  def psi(ref: DataFrame, cur: DataFrame, keys: Seq[String], x: Column,
      tieBreak: Column, qs: Seq[Double], eps: Double): DataFrame = {
    val kcols = keys.map(col)
    val edges = referenceEdges(ref, keys, x, tieBreak, qs)
    def hist(df: DataFrame, cnt: String): DataFrame =
      assignBins(df, edges, keys, x)
        .groupBy(kcols :+ col("bin"): _*)
        .agg(count(lit(1)).as(cnt))
    val hr = hist(ref, "cr")
    val hc = hist(cur, "cc")
    val joined = hr.join(hc, keys :+ "bin", "full_outer")
      .select(kcols ++ Seq(col("bin"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc")): _*)
    val tot = joined.groupBy(kcols: _*)
      .agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"))
    // a side with ZERO rows for a group (a source the pipeline dropped
    // entirely — reachable once upstream gates can zero a source) has
    // every bin probability floored at eps, the same floor an empty
    // BIN gets: PSI saturates near ln(1/eps) and the gate fails loudly
    // instead of dividing by zero (ANSI mode) or going NaN
    joined.join(broadcast(tot), keys)
      .withColumn("__pr",
        greatest(when(col("nr") === 0L, lit(0.0)).otherwise(
          col("cr").cast("double") / col("nr").cast("double")), lit(eps)))
      .withColumn("__pc",
        greatest(when(col("nc") === 0L, lit(0.0)).otherwise(
          col("cc").cast("double") / col("nc").cast("double")), lit(eps)))
      .withColumn("__term",
        round((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")), 6))
      .groupBy(kcols: _*)
      .agg(Exact.dsum(col("__term")).as("psi"),
        max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"))
  }

  /** Leave-one-out KS drift screen with Benjamini–Hochberg FDR control
    * over a binned histogram frame (`key`, bin, c) — the q192 fold,
    * factored so the batch screen and the streaming twin
    * ([[graft.streaming.StreamDriftScreen]]) run the IDENTICAL
    * arithmetic: each key's binned distribution KS-tests against the
    * rest of the corpus (integer-exact sup |n_src·i − n_rest·j|), the
    * p-value is the fixed-chain [[kolmogorovQSql]] with the
    * small-sample λ correction, and the m simultaneous tests (m
    * derived from the frame, never a literal) pass through the BH
    * step-up. `bin` may be a raw value (q192 uses n_chars itself — the
    * exact ECDF) or a frozen-edge bin index (the streaming path);
    * the fold only needs bins ordered and shared across keys.
    * Output: (key, d_stat, p_value, p_rank, drift_rejected). */
  def ksScreenFold(hist: DataFrame, key: String, alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gx = hist.groupBy(col("bin")).agg(sum(col("c")).as("g"))
    val spine = hist.select(col(key)).distinct().crossJoin(gx)
    // renamed join-back: spine derives from hist, so both join sides
    // share attribute ids when hist is not a fresh scan (e.g. a
    // streaming memory-sink table) and dataset aliases stay ambiguous;
    // re-aliasing the right side's columns mints fresh ids
    val hh = hist.select(col(key).as("__k"), col("bin").as("__bin"),
      col("c").as("__c"))
    val full = spine.join(hh,
        col(key) === col("__k") && col("bin") === col("__bin"), "left")
      .select(col(key), col("bin"), col("g"),
        coalesce(col("__c"), lit(0L)).as("c"))
    val wCum = Window.partitionBy(col(key)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full
      .withColumn("j", sum(col("c")).over(wCum))
      .withColumn("i", sum(col("g") - col("c")).over(wCum))
    val ns = full.groupBy(col(key))
      .agg(sum(col("c")).as("n_src"), sum(col("g") - col("c")).as("n_rest"))
      .select(col(key).as("__nk"), col("n_src"), col("n_rest"))
    val ks = cum.join(broadcast(ns), col(key) === col("__nk")).drop("__nk")
      .groupBy(col(key))
      .agg(max(abs(col("n_src") * col("i") - col("n_rest") * col("j")))
          .as("dnum"),
        max(col("n_src")).as("n_src"), max(col("n_rest")).as("n_rest"))
      .withColumn("d_stat",
        col("dnum").cast("double") / (col("n_src") * col("n_rest")).cast("double"))
      .withColumn("ne",
        (col("n_src") * col("n_rest")).cast("double") /
          (col("n_src") + col("n_rest")).cast("double"))
      .withColumn("lam2",
        expr("pow((sqrt(ne) + 0.12e0 + 0.11e0 / sqrt(ne)) * d_stat, 2)"))
      .withColumn("p_value",
        round(least(lit(1.0), expr(s"2.0e0 * ($kolmogorovQSql)")), 6))
    val wRank = Window.orderBy(col("p_value").asc, col(key).asc)
    val wAll = Window.partitionBy(lit(1))
    ks.withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll).cast("double"))
      .withColumn("ok",
        when(col("p_value") <= col("rk").cast("double") * alpha / col("m"),
          col("rk")))
      .withColumn("maxr", max(col("ok")).over(wAll))
      .select(col(key), round(col("d_stat"), 6).as("d_stat"), col("p_value"),
        col("rk").as("p_rank"),
        (col("maxr").isNotNull && col("rk") <= col("maxr"))
          .as("drift_rejected"))
  }

  /** Oracle twin of the PSI fold given CTEs hr(keys, bin, cr) and
    * hc(keys, bin, cc) — the histogram construction mirrors q119's
    * exact-quantile pattern and stays at the call site. */
  def psiSql(keyCols: String, eps: Double): String = s"""
      jt AS (
        SELECT COALESCE(hr.$keyCols, hc.$keyCols) AS $keyCols,
               COALESCE(hr.bin, hc.bin) AS bin,
               COALESCE(hr.cr, 0) AS cr, COALESCE(hc.cc, 0) AS cc
        FROM hr FULL OUTER JOIN hc
          ON hr.$keyCols = hc.$keyCols AND hr.bin = hc.bin),
      tot AS (
        SELECT $keyCols, CAST(SUM(cr) AS BIGINT) AS nr,
               CAST(SUM(cc) AS BIGINT) AS nc
        FROM jt GROUP BY $keyCols),
      terms AS (
        SELECT jt.$keyCols,
          round((GREATEST(CASE WHEN nc = 0 THEN CAST(0 AS DOUBLE)
                   ELSE CAST(cc AS DOUBLE) / nc END, $eps) -
                 GREATEST(CASE WHEN nr = 0 THEN CAST(0 AS DOUBLE)
                   ELSE CAST(cr AS DOUBLE) / nr END, $eps)) *
            ln(GREATEST(CASE WHEN nc = 0 THEN CAST(0 AS DOUBLE)
                 ELSE CAST(cc AS DOUBLE) / nc END, $eps) /
               GREATEST(CASE WHEN nr = 0 THEN CAST(0 AS DOUBLE)
                 ELSE CAST(cr AS DOUBLE) / nr END, $eps)), 6) AS term,
          nr, nc
        FROM jt JOIN tot ON jt.$keyCols = tot.$keyCols)
      """
}
