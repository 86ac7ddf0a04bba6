package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-discovery scan — the `mopdb varlist` operation
  * (mopdb_utils.py write_varlist 490-571): open a dataset, emit one row
  * per variable with its name, type, and occupancy stats. Catalog
  * construction is driver logic in every engine; the data pass is a
  * single Spark aggregation (one count per column), so discovery over a
  * 100 TB table costs one scan, not one scan per column.
  */
object Discovery {

  /** Normalized SQL type name (cross-engine comparable). */
  def sqlTypeName(dt: DataType): String = dt match {
    case LongType             => "BIGINT"
    case IntegerType          => "INTEGER"
    case DoubleType           => "DOUBLE"
    case FloatType            => "FLOAT"
    case StringType           => "VARCHAR"
    case BooleanType          => "BOOLEAN"
    case _: TimestampType     => "TIMESTAMP"
    case TimestampNTZType     => "TIMESTAMP"
    case DateType             => "DATE"
    case ArrayType(e, _)      => s"${sqlTypeName(e)}[]"
    case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
    case other                => other.simpleString.toUpperCase
  }

  /** One row per column: (var_name, dtype, n_rows, n_valid). */
  def varlist(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields
    val aggs: Seq[org.apache.spark.sql.Column] = count(lit(1)).as("__n") +:
      fields.toSeq.map(f => count(col(f.name)).as(s"__c_${f.name}"))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val n = stats.getLong(0)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      Row(f.name, sqlTypeName(f.dataType), n, stats.getLong(i + 1))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("var_name", StringType),
        StructField("dtype", StringType),
        StructField("n_rows", LongType),
        StructField("n_valid", LongType))))
  }
}
