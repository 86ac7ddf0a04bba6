package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The native pq_encode expression must choose bit-identical codes to
  * the SQL higher-order-function formulation (which the DuckDB oracles
  * express) — the margin, the decimal rounding and the lower-cid
  * tie-break all have to line up, over the adversarial cases: exact-hit
  * vectors (a seed encoding itself, distance 0), ties, near-margin
  * pairs, and both element types (float store, double residuals). */
class PqEncodeParitySpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val dim = 16

  private def assertParity(vecs: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame): Unit = {
    val native = Similarity.pqEncode(vecs, cb, m, dim)
      .select($"id", $"codes").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val ref = Similarity.pqEncodeSqlRef(vecs, cb, m, dim)
      .select($"id", $"codes").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.keySet == ref.keySet)
    val diffs = native.keys.filter(k => native(k) != ref(k))
    assert(diffs.isEmpty, diffs.map(k => s"$k: ${native(k)} vs ${ref(k)}").mkString(", "))
  }

  test("float store: native codes == SQL-formulation codes (incl. seeds)") {
    // deterministic pseudo-random store; ids 0..7 are also the seeds,
    // so their own encodings hit distance exactly 0
    val vecs = spark.range(200).select($"id",
      expr(s"transform(sequence(0, ${dim - 1}), j -> " +
        "CAST(CAST(hash(id, j) % 1000 AS DOUBLE) / 250.0 AS FLOAT))").as("emb"))
    val cb = Similarity.pqCodebook(vecs.filter($"id" < 8), m, dim)
    assertParity(vecs, cb)
  }

  test("double residuals and engineered near-ties keep parity") {
    val base = spark.range(200).select($"id",
      expr(s"transform(sequence(0, ${dim - 1}), j -> " +
        "CAST(hash(id * 7, j) % 100 AS DOUBLE) / 50.0)").as("emb"))
    // adversarial: every 5th vector is a tiny perturbation of a seed, so
    // its sketch distances crowd inside the verify margin
    val vecs = base.withColumn("emb",
      when($"id" % 5 === 0, expr(s"transform(sequence(0, ${dim - 1}), j -> " +
        "CAST(hash(CAST(id AS INT) div 5, j) % 100 AS DOUBLE) / 50.0 + 1.0e-7)"))
        .otherwise($"emb"))
    val cb = Similarity.pqCodebook(
      base.filter($"id" < 8).select($"id", $"emb"), m, dim)
    assertParity(vecs, cb)
  }
}
