package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The DataSource V2 lines connector: row contents, per-file
  * parallelism, column pruning, and composition with lineDedupe. */
class LinesSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("lines")
    Files.writeString(dir.resolve("a.txt"), "shared header\nalpha\nbeta\n")
    Files.writeString(dir.resolve("b.txt"), "shared header\ngamma\n")
    dir.toString
  }

  private def read(dir: String) =
    spark.read.format("graft.sources.LinesDataSource").load(dir)

  test("reads every file as (path, line_no, line), one partition per file") {
    val dir = writeFixture()
    val df = read(dir)
    assert(df.schema.fieldNames.toSeq == Seq("path", "line_no", "line"))
    assert(df.count() == 5)
    assert(df.rdd.getNumPartitions == 2)
    val aLines = df.filter($"path".endsWith("a.txt"))
      .orderBy($"line_no").select($"line").as[String].collect().toSeq
    assert(aLines == Seq("shared header", "alpha", "beta"))
  }

  test("column pruning reaches the scan (BatchScan outputs only the pruned column)") {
    val dir = writeFixture()
    val plan = read(dir).select($"line").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the scan node's own output is the pruned single column — path and
    // line_no never leave the reader
    val scanOut = plan.linesIterator
      .dropWhile(l => !l.startsWith("(1) BatchScan"))
      .find(_.startsWith("Output")).getOrElse("")
    assert(scanOut.startsWith("Output [1]:") && scanOut.contains("line#"),
      plan)
  }

  test("feeds lineDedupe: the q99 pipeline runs off the connector directly") {
    val dir = writeFixture()
    val lines = read(dir).select(
      $"path".as("doc_id"), $"line_no", $"line")
    val out = graft.ops.TextOps.lineDedupe(
        lines.withColumn("doc_id", xxhash64($"doc_id")), maxDocFreq = 2)
      .orderBy($"clean_text")
      .select($"clean_text").as[String].collect().toSeq
    // "shared header" appears in both files -> scrubbed; bodies survive
    assert(out == Seq("alpha\nbeta", "gamma"))
  }
}
