package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table access. Tables documented in /root/repo/TESTDATA.md. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
