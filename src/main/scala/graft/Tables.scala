package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table access. Tables documented in /root/repo/TESTDATA.md. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** [[apply]] plus a round-robin spread to the session's default
    * parallelism. A parquet row group is one scan task regardless of
    * split knobs, so a table that arrives as few row groups pins every
    * shuffle-free downstream map to a few cores. Callers whose next
    * stage is heavy PER-ROW work (vector encodes, ADC sweeps, norm
    * computations) pay this one small shuffle to run it wide — the
    * same move a 100 TB index build opens with, spreading the corpus
    * instead of trusting the ingest file layout.
    *
    * Use it SELECTIVELY: it wins when one dominant kernel consumes the
    * spread frame once (the ANN index builds; q143/q144's span
    * explodes — measured ~2× at sf0.1), and LOSES when the plan reads
    * the table through several pruned subtrees, each re-paying the
    * shuffle (A/B at sf0.1: q127 +1.3 s, q131 +1.9 s, q141 +1.4 s with
    * a blanket spread — those read documents 2–3×). */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
    * and truncate to microseconds with integer division — exactly what
    * DuckDB does when it casts TIMESTAMP_NS to its microsecond TIMESTAMP,
    * so both engines see identical values. (Double division would be wrong
    * here: epoch-nanos ≈ 1.7e18 exceeds the 2^53 double mantissa.) */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // a re-written events table (e.g. the bench scale tier) already
      // carries a real microsecond TIMESTAMP — no nanos detour
      case _ => df
    }
  }
}
