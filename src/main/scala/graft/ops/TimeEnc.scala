package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** Timestamp-encoding-agnostic epoch extraction.
  *
  * Parquet writers flip `isAdjustedToUTC` freely (pyarrow writes naive
  * `timestamp[us]` columns without it), and Spark then surfaces the same
  * instants as either `TIMESTAMP` or `TIMESTAMP_NTZ`
  * (`spark.sql.parquet.inferTimestampNTZ.enabled` defaults true).
  * `unix_micros` accepts only `TIMESTAMP`, so every epoch-arithmetic
  * call site must normalize first or die at analysis time on one of the
  * two encodings.
  *
  * The NTZ→TZ cast re-interprets the naive wall-clock value in the
  * session timezone; every entry point (Verify, Bench, Explain, the test
  * session) pins `spark.sql.session.timeZone=UTC`, which makes the cast
  * value-identity by construction — the naive value IS the UTC instant.
  * For a column that is already `TIMESTAMP` the cast is a no-op, so the
  * helper is safe to use unconditionally. EncodingSpec asserts both
  * encodings of one fixture produce bit-identical results through the
  * time-keyed operators.
  */
object TimeEnc {

  /** Epoch microseconds of `t`, whichever timestamp flavor it carries. */
  def usOf(t: Column): Column = unix_micros(t.cast(TimestampType))
}
