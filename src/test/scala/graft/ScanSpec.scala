package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scan-side operators (SURVEY.md §2.1): glob multi-file discovery,
  * filename-timestamp pruning via input_file_name, and equivalence of
  * pruned vs full-scan results. */
class ScanSpec extends SparkSpec {
  import spark.implicits._

  test("glob scan + filename-stamp pruning matches predicate filtering") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("stamp", date_format($"ts", "yyyyMMdd"))
    val root = Files.createTempDirectory("graft-scan").toString
    // one file-family per month, reference-style date-stamped names
    val stamps = ev.select($"stamp").distinct().as[String].collect().sorted
    stamps.foreach { st =>
      ev.filter($"stamp" === st).drop("stamp")
        .coalesce(1).write.parquet(s"$root/evt_$st")
    }

    // glob discovery (find_all_files, mop_utils.py:163-196)
    val all = spark.read.parquet(s"$root/evt_*")
    assert(all.count() == ev.count())

    // filename-timestamp pruning (check_timestamp, mop_utils.py:239-295):
    // parse the stamp out of the file path, keep files in range
    val lo = stamps(1)
    val hi = stamps(stamps.length - 2)
    val pruned = all
      .withColumn("fstamp",
        regexp_extract(input_file_name(), "evt_(\\d{8})", 1))
      .filter($"fstamp" >= lo && $"fstamp" <= hi)
      .drop("fstamp")
    val direct = ev.filter($"stamp" >= lo && $"stamp" <= hi).drop("stamp")
    assert(pruned.count() == direct.count())
    // decimal-exact sum: plain double sums are order-dependent and the
    // two scans fold partitions differently
    assert(pruned.agg(graft.ops.Exact.dsum($"value")).as[Double].head() ==
           direct.agg(graft.ops.Exact.dsum($"value")).as[Double].head())
  }
}
