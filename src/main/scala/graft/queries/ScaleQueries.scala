package graft.queries

import graft.Tables
import graft.ops.{Exact, Sketch, Skew, TextOps}
import org.apache.spark.sql.functions._

/** Scale-path batch: the rewrites that keep hot keys and distinct
  * counting tractable at 100 TB — salted two-phase aggregation and the
  * KMV distinct sketch — each verified bit-exact against the oracle
  * (the salted plan against the plain one, the sketch against its own
  * deterministic estimator).
  */
object ScaleQueries extends QueryGroup {

  /** Per-source corpus stats via salted two-phase aggregation: the hot
    * 'source' keys (a handful of crawls own most of a real corpus) are
    * spread over 8 reducers in phase 1; phase 2 merges 8 rows per key.
    * Decimal sums are associative, so the result is bit-identical to
    * the oracle's plain GROUP BY — the point of the query. */
  private val q73 = Q(
    "q73_salted_agg",
    (s, dir) => {
      import s.implicits._
      Skew.saltedStats(Tables(s, dir, "documents"),
          $"source", $"n_chars", $"doc_id".cast("string"), buckets = 8)
        .orderBy($"key")
    },
    Some(s"""
      SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
        ${Exact.sqlSum("n_chars")} AS sum_value
      FROM documents GROUP BY source ORDER BY key"""))

  /** Distinct tokens per source by KMV bottom-64 sketch: k hashes per
    * group answer the distinct count within ~1/√k, deterministically —
    * the DuckDB oracle runs the identical estimator and matches
    * bit-for-bit, which no RNG- or HLL-register-based sketch allows. */
  private val q74 = Q(
    "q74_kmv_distinct",
    (s, dir) => {
      import s.implicits._
      val tok = Tables(s, dir, "documents")
        .select($"source", explode(TextOps.tokens($"text")).as("token"))
      Sketch.kmvDistinct(tok, $"source", $"token", k = 64)
        .orderBy($"key")
    },
    Some {
      val from = """(SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents) tok"""
      s"""SELECT * FROM (${Sketch.kmvSql(from, "source", "token", 64)}) q
        ORDER BY key"""
    })

  def queries: Seq[Q] = Seq(q73, q74)
}
