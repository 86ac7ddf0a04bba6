package graft.queries

import graft.Tables
import graft.ops.{TimeEnc, WindowOps}
import graft.ops.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General-analytics batch rounding out the relational surface:
  * gap-based sessionization, full cube grouping, and the deterministic
  * exact median.
  */
object AnalyticsQueries extends QueryGroup {

  /** Gap-based sessionization: a new session starts after a >30 min gap;
    * session id is the running count of session starts per user — the
    * lag + cumulative-flag formulation (deterministic total order via
    * (ts, event_id)). */
  private val q65 = Q(
    "q65_sessionize",
    (s, dir) => {
      import s.implicits._
      graft.ops.Sessionize
        .sessions(Tables(s, dir, "events"),
          $"user_id", $"ts", $"event_id", $"value", gapSeconds = 1800L)
        .select($"user_id", $"session_id", $"n_events",
          date_format($"t0", "yyyy-MM-dd HH:mm:ss").as("t0"),
          date_format($"t1", "yyyy-MM-dd HH:mm:ss").as("t1"),
          $"session_value")
        .orderBy($"user_id", $"session_id")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, event_id, ts, value,
          LAG(epoch_us(ts)) OVER w AS prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us > 1800 * 1000000
                       THEN 1 ELSE 0 END AS new_session
        FROM ev),
      sess AS (
        SELECT *, CAST(SUM(new_session) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS t0,
        strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS t1,
        ${sqlSum("value")} AS session_value
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** Full cube over two dimensions — the complete grouping-set lattice
    * (q06 covers rollup; the reference's basin+global replication is the
    * degenerate case). */
  private val q66 = Q(
    "q66_cube",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .cube($"c_mktsegment", $"o_orderstatus")
        .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n"))
        .select(coalesce($"c_mktsegment", lit("ALL")).as("segment"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"revenue", $"n")
        .orderBy($"segment", $"status")
    },
    Some(s"""
      SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
        COALESCE(o_orderstatus, 'ALL') AS status,
        ${sqlSum("o_totalprice")} AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY CUBE (c_mktsegment, o_orderstatus)
      ORDER BY segment, status"""))

  /** Exact per-group median via rank + middle-element average —
    * deterministic across engines, unlike interpolating percentile
    * built-ins (WindowOps.exactMedian). */
  private val q67 = Q(
    "q67_exact_median",
    (s, dir) => {
      import s.implicits._
      WindowOps.exactMedian(
          Tables(s, dir, "lineitem"),
          Seq($"l_returnflag", $"l_linestatus"),
          $"l_extendedprice", $"l_orderkey" * 10 + $"l_linenumber")
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      WITH r AS (
        SELECT l_returnflag, l_linestatus, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
            ORDER BY l_extendedprice, l_orderkey * 10 + l_linenumber) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
        FROM lineitem)
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
          AS median
      FROM r
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Ordered funnel: users reaching signup -> view-after-signup ->
    * purchase-after-view, each stage the earliest qualifying event at or
    * after the previous stage's time. Composed as three filtered
    * min-aggregations chained by equi-joins on user — each stage's
    * frame is |users| rows, so the joins stay broadcast-size even when
    * the event log is the 100 TB side (one scan per stage, no window
    * over the full log). Timestamps compare at microseconds on both
    * engines (Tables truncates the nanos parquet; the oracle casts
    * TIMESTAMP_NS to DuckDB's microsecond TIMESTAMP). */
  private val q85 = Q(
    "q85_funnel",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"user_id", $"event_type", $"ts")
      val s1 = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = ev.filter($"event_type" === "view")
        .join(s1, Seq("user_id")).filter($"ts" >= $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val s3 = ev.filter($"event_type" === "purchase")
        .join(s2, Seq("user_id")).filter($"ts" >= $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      def stageCount(df: org.apache.spark.sql.DataFrame, label: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(label).as("stage"), $"n_users")
      stageCount(s1, "1_signup")
        .unionByName(stageCount(s2, "2_view"))
        .unionByName(stageCount(s3, "3_purchase"))
        .orderBy($"stage")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
             WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e JOIN s1 USING (user_id)
             WHERE e.event_type = 'view' AND e.ts >= t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts >= t2 GROUP BY e.user_id)
      SELECT '1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
      UNION ALL
      SELECT '2_view', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
      ORDER BY stage"""))

  /** Cohort retention: users bucketed by first-active day (integer
    * epoch-day key — no calendar arithmetic to disagree on), and for
    * each (cohort, day offset) the count of cohort users active that
    * day. The distinct (user, day) activity set is the only big
    * shuffle; the per-user cohort frame joins back on user. */
  private val q86 = Q(
    "q86_cohort_retention",
    (s, dir) => {
      import s.implicits._
      val act = Tables(s, dir, "events")
        .select($"user_id",
          datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
            .cast("int").as("dk"))
        .distinct()
      val cohort = act.groupBy($"user_id").agg(min($"dk").as("cohort_day"))
      act.join(cohort, Seq("user_id"))
        .groupBy($"cohort_day", ($"dk" - $"cohort_day").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_day", $"day_offset")
    },
    Some("""
      WITH act AS (
        SELECT DISTINCT user_id,
          CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS dk
        FROM events),
      cohort AS (SELECT user_id, MIN(dk) AS cohort_day FROM act GROUP BY user_id)
      SELECT cohort_day, dk - cohort_day AS day_offset,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM act JOIN cohort USING (user_id)
      GROUP BY cohort_day, day_offset
      ORDER BY cohort_day, day_offset"""))

  /** Semi-structured column extraction: pull a typed field out of the
    * JSON `props` string per event and aggregate it — the JSON-column
    * surface (the reference keeps JSON in config only; an event
    * pipeline has it in the data). Extraction is per-row map-side
    * (inside codegen); integer sums stay exact. Cast parity needs care:
    * the string→int casts disagree on non-integral text (ANSI Spark
    * truncates '3.7' to 3 and throws on 'abc'; DuckDB TRY_CAST rounds
    * to 4), so BOTH sides gate the cast behind the same integral-format
    * regexp — the accept set is then identical by construction, not by
    * the fixture happening to hold only integral values. */
  private val q87 = Q(
    "q87_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type",
          when(trim(get_json_object($"props", "$.k")).rlike("^[+-]?[0-9]+$"),
            trim(get_json_object($"props", "$.k")).cast("int")).as("k"))
        .groupBy($"event_type")
        .agg(count($"k").as("n"), sum($"k").as("k_sum"),
          min($"k").as("k_min"), max($"k").as("k_max"))
        .orderBy($"event_type")
    },
    Some("""
      WITH p AS (
        SELECT event_type,
          CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')),
                                   '^[+-]?[0-9]+$')
               THEN CAST(trim(json_extract_string(props, '$.k')) AS INT)
          END AS k
        FROM events)
      SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n,
        CAST(SUM(k) AS BIGINT) AS k_sum, MIN(k) AS k_min, MAX(k) AS k_max
      FROM p GROUP BY event_type ORDER BY event_type"""))

  /** Exact quantile ladder (p25/p50/p75) per group by the nearest-rank
    * rule — real data elements under a total order, engine-identical
    * (WindowOps.exactQuantiles; q67 covers the averaged exact median). */
  private val q89 = Q(
    "q89_quantile_ladder",
    (s, dir) => {
      import s.implicits._
      WindowOps.exactQuantiles(
          Tables(s, dir, "lineitem"),
          Seq($"l_returnflag"), $"l_extendedprice",
          $"l_orderkey" * 10 + $"l_linenumber",
          Seq(0.25, 0.5, 0.75))
        .orderBy($"l_returnflag", $"q")
    },
    Some("""
      WITH r AS (
        SELECT l_returnflag, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey * 10 + l_linenumber) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      qs AS (SELECT unnest([0.25e0, 0.5e0, 0.75e0]) AS q)
      SELECT l_returnflag, q, l_extendedprice AS qvalue
      FROM r, qs WHERE rn = GREATEST(1, CEIL(q * n))
      ORDER BY l_returnflag, q"""))

  /** Pivot: per-user event-type counts spread into columns (explicit
    * value list so the output schema is static and engine-identical;
    * absent combinations are 0, matching the CASE-sum oracle). */
  private val q90 = Q(
    "q90_pivot_counts",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Bucketized range join (ops/RangeJoin): every lineitem shipped in
    * the 30 days from a sampled order's date, per-interval counts and
    * exact quantity sums. The interval predicate becomes an equi-join
    * on a day-grid bucket (plan-audited: no nested loop), with the
    * exact BETWEEN as a residual filter — the scale path for
    * time-window attribution joins the reference's relational layer
    * never needed but a 100 TB event store does. */
  private val q114 = Q(
    "q114_range_join",
    (s, dir) => {
      import s.implicits._
      val iv = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 200 === 0)
        .select($"o_orderkey".as("iid"),
          datediff($"o_orderdate", to_date(lit("1990-01-01")))
            .cast("long").as("lo"))
        .withColumn("hi", $"lo" + 30)
      val pts = Tables(s, dir, "lineitem")
        .select($"l_quantity",
          datediff($"l_shipdate", to_date(lit("1990-01-01")))
            .cast("long").as("v"))
      graft.ops.RangeJoin.pointInInterval(pts, iv, w = 16)
        .groupBy($"iid")
        .agg(count(lit(1)).as("n_shipped"),
          graft.ops.Exact.dsum($"l_quantity").as("qty_sum"))
        .orderBy($"iid")
    },
    Some(s"""
      WITH iv AS (
        SELECT o_orderkey AS iid,
          datediff('day', DATE '1990-01-01', o_orderdate) AS lo
        FROM orders WHERE o_orderkey % 200 = 0)
      SELECT iid, CAST(COUNT(*) AS BIGINT) AS n_shipped,
        ${graft.ops.Exact.sqlSum("l_quantity")} AS qty_sum
      FROM iv JOIN lineitem
        ON datediff('day', DATE '1990-01-01', l_shipdate)
           BETWEEN iv.lo AND iv.lo + 30
      GROUP BY iid ORDER BY iid"""))

  /** Per-user EWMA of event values (ops/Ewma): the sequential-fold
    * smoother verified against a DuckDB recursive CTE walking the same
    * (ts, event_id) order — both engines execute the identical IEEE
    * chain, so the doubles match bit-for-bit with no decimal detour.
    * α = 0.125 (dyadic). Restricted to user_id < 300 to keep the
    * oracle's recursion cheap; the operator itself is one keyed
    * shuffle at any scale. */
  private val q116 = Q(
    "q116_ewma",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").filter($"user_id" < 300)
        .select($"user_id", TimeEnc.usOf($"ts").as("tus"),
          $"event_id", $"value")
      graft.ops.Ewma.ema(ev, $"user_id", $"tus", $"event_id", $"value",
          alpha = 0.125)
        .select($"key".as("user_id"), $"tie".as("event_id"),
          $"v".as("value"), $"ema")
        .orderBy($"user_id", $"t", $"event_id")
    },
    Some("""
      WITH RECURSIVE e AS (
        SELECT user_id, event_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id < 300),
      r AS (
        SELECT user_id, event_id, value, value AS ema, rn
        FROM e WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.event_id, e.value,
          0.125e0 * e.value + 0.875e0 * r.ema, e.rn
        FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
      SELECT user_id, event_id, value, ema
      FROM r ORDER BY user_id, rn"""))

  /** Distribution-drift monitor (ops/Drift): PSI of the `value`
    * distribution per event type, first half of the month (reference)
    * vs second half (current). Bin edges are the reference's exact
    * nearest-rank quartiles, frozen and applied to both windows; each
    * bin's term is 6-decimal rounded (transcendental convention) and
    * the sum is decimal-exact. The production check that a scoring
    * model still sees the data it was tuned on. */
  private val q159 = Q(
    "q159_psi_drift",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      graft.ops.Drift.psi(
          ev.filter($"ts" < cut), ev.filter($"ts" >= cut),
          Seq("event_type"), $"value", $"event_id",
          Seq(0.25, 0.5, 0.75), eps = 1.0e-4)
        .select($"event_type", $"psi", $"n_ref", $"n_cur")
        .orderBy($"event_type")
    },
    Some(s"""
      WITH refw AS (
        SELECT event_type, value, event_id FROM events
        WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
      curw AS (
        SELECT event_type, value, event_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
      r AS (
        SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM refw),
      th AS (
        SELECT event_type,
          MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.25e0 * n) AS BIGINT))
                THEN CAST(value AS DOUBLE) END) AS t1,
          MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.5e0 * n) AS BIGINT))
                THEN CAST(value AS DOUBLE) END) AS t2,
          MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.75e0 * n) AS BIGINT))
                THEN CAST(value AS DOUBLE) END) AS t3
        FROM r GROUP BY event_type),
      hr AS (
        SELECT w.event_type, 1 + (CASE WHEN value > t1 THEN 1 ELSE 0 END)
            + (CASE WHEN value > t2 THEN 1 ELSE 0 END)
            + (CASE WHEN value > t3 THEN 1 ELSE 0 END) AS bin,
          CAST(COUNT(*) AS BIGINT) AS cr
        FROM refw w JOIN th ON w.event_type = th.event_type
        GROUP BY 1, 2),
      hc AS (
        SELECT w.event_type, 1 + (CASE WHEN value > t1 THEN 1 ELSE 0 END)
            + (CASE WHEN value > t2 THEN 1 ELSE 0 END)
            + (CASE WHEN value > t3 THEN 1 ELSE 0 END) AS bin,
          CAST(COUNT(*) AS BIGINT) AS cc
        FROM curw w JOIN th ON w.event_type = th.event_type
        GROUP BY 1, 2),
      ${graft.ops.Drift.psiSql("event_type", 1.0e-4)}
      SELECT event_type, ${sqlSum("term")} AS psi,
        MAX(nr) AS n_ref, MAX(nc) AS n_cur
      FROM terms GROUP BY event_type ORDER BY event_type"""))

  /** Frequent session paths (sequential-pattern mining, the contiguous
    * length-3 cut of PrefixSpan): sessionize (q65's gap rule, via the
    * shared Sessionize.withSessionIds stage), rebuild each session's
    * chronologically-ordered event-type sequence, and count the
    * SESSION SUPPORT of every contiguous type trigram (a session
    * counts once however often it repeats the path). Top 20 by
    * (support desc, path asc) — a total order, so the cut is
    * deterministic; the top-k is TakeOrderedAndProject, no global
    * sort. One user_id shuffle (sessionize + sequence rebuild share
    * it) and one path-keyed count. */
  private val q179 = Q(
    "q179_session_paths",
    (s, dir) => {
      import s.implicits._
      val ev = graft.ops.Sessionize.withSessionIds(
        Tables(s, dir, "events"),
        $"user_id", $"ts", $"event_id", gapSeconds = 1800L)
      val seqs = ev.groupBy($"user_id", $"session_id")
        .agg(array_sort(
          collect_list(struct($"ts", $"event_id", $"event_type"))).as("evs"))
        .select($"user_id", $"session_id",
          expr("transform(evs, x -> x.event_type)").as("types"))
      seqs.select($"user_id", $"session_id",
          explode(graft.ops.TextOps.shingles("types", 3)).as("path"))
        .distinct()
        .groupBy($"path").agg(count(lit(1)).as("support"))
        .orderBy($"support".desc, $"path".asc)
        .limit(20)
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, ts, event_type,
          LAG(epoch_us(ts)) OVER w AS prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us > 1800 * 1000000
                       THEN 1 ELSE 0 END AS new_session
        FROM ev),
      sess AS (
        SELECT *, CAST(SUM(new_session) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
        FROM flagged),
      seqs AS (
        SELECT user_id, session_id,
          list(event_type ORDER BY ts, event_id) AS types
        FROM sess GROUP BY user_id, session_id),
      tri AS (
        SELECT DISTINCT user_id, session_id,
          array_to_string(types[i:i+2], ' ') AS path
        FROM seqs, LATERAL (
          SELECT unnest(generate_series(1, len(types) - 2)) AS i) s
        WHERE len(types) >= 3)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS support
      FROM tri GROUP BY path
      ORDER BY support DESC, path LIMIT 20"""))

  /** Kolmogorov–Smirnov two-sample drift — the NONPARAMETRIC sibling
    * of q159's PSI (same windows, same per-event_type grain): PSI
    * needs binning choices; KS compares the full empirical CDFs,
    * D = sup|F_ref − F_cur|. The supremum is attained at an observed
    * value, so D = max over pooled distinct values of
    * |n_cur·i − n_ref·j| / (n_ref·n_cur) with i, j the cumulative
    * counts — an INTEGER maximum (the float never picks the argmax).
    * One full-outer merge of the two windows' value histograms, one
    * cumulative window, one groupBy. d_crit is the α = 0.05 large-
    * sample threshold 1.358·√((n₁+n₂)/(n₁n₂)). */
  private val q184 = Q(
    "q184_ks_drift",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val rc = ev.filter($"ts" < cut).groupBy($"event_type", $"value")
        .agg(count(lit(1)).as("cr"))
      val cc = ev.filter($"ts" >= cut).groupBy($"event_type", $"value")
        .agg(count(lit(1)).as("cc"))
      val pooled = rc.join(cc, Seq("event_type", "value"), "full")
        .select($"event_type", $"value",
          coalesce($"cr", lit(0L)).as("cr"),
          coalesce($"cc", lit(0L)).as("cc"))
      val wCum = Window.partitionBy($"event_type").orderBy($"value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = pooled
        .withColumn("i", sum($"cr").over(wCum))
        .withColumn("j", sum($"cc").over(wCum))
      val ns = pooled.groupBy($"event_type")
        .agg(sum($"cr").as("n_ref"), sum($"cc").as("n_cur"))
      cum.join(broadcast(ns), Seq("event_type"))
        .groupBy($"event_type")
        .agg(max(abs($"n_cur" * $"i" - $"n_ref" * $"j")).as("dnum"),
          max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"))
        .select($"event_type", $"n_ref", $"n_cur",
          round($"dnum".cast("double") /
            ($"n_ref" * $"n_cur").cast("double"), 6).as("d_stat"),
          round(lit(1.358) * sqrt(($"n_ref" + $"n_cur").cast("double") /
            ($"n_ref" * $"n_cur").cast("double")), 6).as("d_crit"))
        .withColumn("drifted", $"d_stat" > $"d_crit")
        .orderBy($"event_type")
    },
    Some("""
      WITH rc AS (
        SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS cr
        FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY event_type, value),
      cc AS (
        SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS cc
        FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY event_type, value),
      pooled AS (
        SELECT COALESCE(rc.event_type, cc.event_type) AS event_type,
          COALESCE(rc.value, cc.value) AS value,
          COALESCE(cr, 0) AS cr, COALESCE(cc.cc, 0) AS cc
        FROM rc FULL OUTER JOIN cc
          ON rc.event_type = cc.event_type AND rc.value = cc.value),
      cum AS (
        SELECT event_type, value, cr, cc,
          SUM(cr) OVER w AS i, SUM(cc) OVER w AS j
        FROM pooled
        WINDOW w AS (PARTITION BY event_type ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      ns AS (
        SELECT event_type, CAST(SUM(cr) AS BIGINT) AS n_ref,
          CAST(SUM(cc) AS BIGINT) AS n_cur
        FROM pooled GROUP BY event_type),
      dm AS (
        SELECT c.event_type, ns.n_ref, ns.n_cur,
          CAST(MAX(ABS(ns.n_cur * c.i - ns.n_ref * c.j)) AS BIGINT) AS dnum
        FROM cum c JOIN ns ON c.event_type = ns.event_type
        GROUP BY c.event_type, ns.n_ref, ns.n_cur)
      SELECT event_type, n_ref, n_cur,
        round(CAST(dnum AS DOUBLE) / CAST(n_ref * n_cur AS DOUBLE), 6)
          AS d_stat,
        round(1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) /
          CAST(n_ref * n_cur AS DOUBLE)), 6) AS d_crit,
        round(CAST(dnum AS DOUBLE) / CAST(n_ref * n_cur AS DOUBLE), 6) >
          round(1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) /
            CAST(n_ref * n_cur AS DOUBLE)), 6) AS drifted
      FROM dm ORDER BY event_type"""))

  /** Two-sided CUSUM changepoint alarm (Page '54; ops/Cusum) — the
    * SEQUENTIAL drift detector beside the distributional ones (q159
    * PSI, q184 KS compare whole windows after the fact; CUSUM raises
    * the alarm AT the row where cumulative evidence of a mean shift
    * crosses h). Reference mean per event type comes from the first
    * half-month (exact decimal mean, 6-rounded, broadcast); the
    * current window folds through the secondary-sort machinery shared
    * with EWMA — O(1) state per key, spill-bounded, deterministic as a
    * fixed IEEE chain in the (ts, event_id) total order that the
    * recursive-CTE oracle walks identically. */
  private val q191 = Q(
    "q191_cusum_changepoint",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val ref = ev.filter($"ts" < cut).groupBy($"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sx"),
          dsum($"value" * $"value").as("sxx"))
        .select($"event_type", round($"sx" / $"n", 6).as("mu"),
          round(sqrt(($"n" * $"sxx" - $"sx" * $"sx") /
            ($"n" * $"n").cast("double")), 6).as("sigma"))
      // probe window: the first 800 post-cutoff rows per type — the
      // oracle's recursive CTE pays one iteration per fold STEP, so
      // its depth (not the engine's) bounds the demonstrated window
      val wOrd = Window.partitionBy($"key").orderBy($"t", $"tie")
      val curW = ev.filter($"ts" >= cut)
        .select($"event_type".as("key"), TimeEnc.usOf($"ts").as("t"),
          $"event_id".as("tie"), $"value".as("v"))
        .withColumn("__rn", row_number().over(wOrd))
        .filter($"__rn" <= 800).drop("__rn")
        .join(broadcast(ref.select($"event_type".as("key"), $"mu",
          $"sigma")), Seq("key"))
      graft.ops.Cusum.cusum(curW, k = 0.5, h = 5.0)
        .select($"key".as("event_type"), $"tie".as("event_id"),
          $"v".as("value"), $"s_hi", $"s_lo", $"alarm")
        .orderBy($"event_type", $"t", $"event_id")
    },
    Some(s"""
      WITH RECURSIVE ref AS (
        SELECT event_type,
          round(${sqlSum("value")} / COUNT(*), 6) AS mu,
          round(sqrt((CAST(COUNT(*) AS DOUBLE) * ${sqlSum("value * value")}
            - ${sqlSum("value")} * ${sqlSum("value")}) /
            CAST(COUNT(*) * COUNT(*) AS DOUBLE)), 6) AS sigma
        FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY event_type),
      e AS (
        SELECT ev.event_type, ev.event_id, ev.value,
          (ev.value - ref.mu) / ref.sigma AS z,
          ROW_NUMBER() OVER (PARTITION BY ev.event_type
            ORDER BY ev.ts, ev.event_id) AS rn
        FROM events ev JOIN ref ON ev.event_type = ref.event_type
        WHERE ev.ts >= TIMESTAMP '2024-01-16 00:00:00'
        QUALIFY rn <= 800),
      r AS (
        SELECT event_type, event_id, value,
          GREATEST(0.0e0, z - 0.5e0) AS s_hi,
          GREATEST(0.0e0, -z - 0.5e0) AS s_lo, rn
        FROM e WHERE rn = 1
        UNION ALL
        SELECT e.event_type, e.event_id, e.value,
          GREATEST(0.0e0, r.s_hi + (e.z - 0.5e0)),
          GREATEST(0.0e0, r.s_lo + (-e.z - 0.5e0)), e.rn
        FROM e JOIN r ON e.event_type = r.event_type AND e.rn = r.rn + 1)
      SELECT event_type, event_id, value, s_hi, s_lo,
        (s_hi > 5.0e0 OR s_lo > 5.0e0) AS alarm
      FROM r ORDER BY event_type, rn"""))

  /** Source-level drift screen with FDR control: each source's n_chars
    * distribution is KS-tested against the REST of the corpus (the
    * q184 integer-exact sup|ΔECDF| machinery, leave-one-out), the
    * asymptotic p-value comes from the Kolmogorov Q function
    * (Q(λ) = 2Σ(−1)^{j−1}e^{−2j²λ²}, truncated at j = 10, with the
    * standard small-sample λ correction (√nₑ+0.12+0.11/√nₑ)·D), and
    * the m simultaneous tests (m = the source count, derived from the
    * data, never a literal) pass through Benjamini–Hochberg
    * step-up — the piece naive per-test thresholds miss: screening
    * thousands of slices at α each guarantees false alarms; BH bounds
    * the EXPECTED FALSE-DISCOVERY FRACTION instead. The Q sum is a
    * fixed left-to-right chain of exp terms (no commutative float
    * sum), and the BH step-up is integer rank arithmetic over the
    * (p, source) total order. */
  private val q192 = Q(
    "q192_fdr_drift_screen",
    (s, dir) => {
      import s.implicits._
      // the screen fold (leave-one-out ECDF sup, fixed-chain Q p-value,
      // BH step-up with m derived from the data) is the SHARED
      // Drift.ksScreenFold — the streaming twin StreamDriftScreen runs
      // the identical arithmetic over frozen-edge bins; here bin = the
      // raw n_chars value, i.e. the exact ECDF
      val hist = Tables(s, dir, "documents")
        .groupBy($"source", $"n_chars".as("bin"))
        .agg(count(lit(1)).as("c"))
      graft.ops.Drift.ksScreenFold(hist, "source", alpha = 0.05)
        .orderBy($"source")
    },
    Some {
      val qExpr = (2 to 10).foldLeft("exp(-2.0e0 * 1.0e0 * lam2)") {
        (acc, j) =>
          val sign = if (j % 2 == 0) "-" else "+"
          s"$acc $sign exp(-2.0e0 * ${j * j}.0e0 * lam2)"
      }
      s"""
      WITH cnt AS (
        SELECT source, n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars),
      gx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS g FROM cnt GROUP BY x),
      spine AS (
        SELECT s.source, gx.x, gx.g
        FROM (SELECT DISTINCT source FROM cnt) s CROSS JOIN gx),
      fullt AS (
        SELECT sp.source, sp.x, sp.g, COALESCE(cnt.c, 0) AS c
        FROM spine sp LEFT JOIN cnt
          ON sp.source = cnt.source AND sp.x = cnt.x),
      cum AS (
        SELECT source, x, g, c,
          SUM(c) OVER w AS j, SUM(g - c) OVER w AS i
        FROM fullt
        WINDOW w AS (PARTITION BY source ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      ns AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_src,
          CAST(SUM(g - c) AS BIGINT) AS n_rest
        FROM fullt GROUP BY source),
      ks AS (
        SELECT c.source, ns.n_src, ns.n_rest,
          CAST(MAX(ABS(ns.n_src * c.i - ns.n_rest * c.j)) AS BIGINT)
            AS dnum
        FROM cum c JOIN ns ON c.source = ns.source
        GROUP BY c.source, ns.n_src, ns.n_rest),
      stat AS (
        SELECT source,
          CAST(dnum AS DOUBLE) / CAST(n_src * n_rest AS DOUBLE) AS d_stat,
          CAST(n_src * n_rest AS DOUBLE) /
            CAST(n_src + n_rest AS DOUBLE) AS ne
        FROM ks),
      pv AS (
        SELECT source, d_stat,
          round(LEAST(1.0e0, 2.0e0 * ($qExpr)), 6) AS p_value
        FROM (SELECT source, d_stat,
                pow((sqrt(ne) + 0.12e0 + 0.11e0 / sqrt(ne)) * d_stat, 2)
                  AS lam2
              FROM stat)),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value, source)
          AS BIGINT) AS rk
        FROM pv),
      flagged AS (
        SELECT *, CASE WHEN p_value <= CAST(rk AS DOUBLE) * 0.05 /
                         CAST(COUNT(*) OVER () AS DOUBLE)
                       THEN rk END AS ok
        FROM ranked),
      thr AS (SELECT MAX(ok) AS maxr FROM flagged)
      SELECT source, round(d_stat, 6) AS d_stat, p_value,
        rk AS p_rank,
        (maxr IS NOT NULL AND rk <= maxr) AS drift_rejected
      FROM flagged CROSS JOIN thr ORDER BY source"""
    })

  def queries: Seq[Q] =
    Seq(q65, q66, q67, q85, q86, q87, q89, q90, q114, q116, q159, q179,
      q184, q191, q192)
}
