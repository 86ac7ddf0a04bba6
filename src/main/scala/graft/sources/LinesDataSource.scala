package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.expressions.Transform
import java.util.OptionalLong

import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read connector: text files as (path, line_no, line)
  * rows — the natural ingest for the line-level pipeline operators
  * (lineDedupe/q99 consumes exactly this shape).
  *
  * The last rung of the extension ladder demonstrated end-to-end
  * (ARCHITECTURE.md): where FloatDot extends the expression layer,
  * LowerPow the optimizer, and AsOfJoin the plan layer, this extends
  * the SOURCE layer — Spark plans it like any table, so filters and
  * limits stack on top and downstream shuffles see ordinary rows.
  *
  * Scale shape: one InputPartition per file (embarrassingly parallel,
  * no driver-side content reads — planning touches only the listing,
  * sorted for determinism), and column pruning is honored: a query
  * that needs only `line` deserializes only `line` (the reader
  * materializes just the pruned fields; `path` strings and line
  * numbers are never allocated when unused — visible as the narrowed
  * ReadSchema in explain). Predicates on `path`
  * (equality/prefix/suffix/contains) push down to the FILE LISTING —
  * pruned files are never scheduled, the file-source analog of
  * partition pruning (LinesSourceSpec pins the partition count).
  *
  * Usage: `spark.read.format("graft.sources.LinesDataSource")
  * .load(dir)` — reads every regular file under `dir` (one level). */
class LinesDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LinesDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LinesTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("path required")))

  override def supportsExternalMetadata(): Boolean = false
}

object LinesDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

private[sources] class LinesTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"lines($path)"
  override def schema(): StructType = LinesDataSource.schema
  // ACCEPT_ANY_SCHEMA: a sink of lines doesn't require writers to
  // fabricate the read-side path/line_no columns — the write builder
  // validates the one column it actually persists
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LinesScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LinesWriteBuilder(path, info.schema())
}

private[sources] class LinesScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = LinesDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** File pruning at PLANNING time — the file-source analog of
    * partition pruning: `path` is constant per input partition, so a
    * predicate on it decides whole files before any is opened. Only
    * path predicates a file listing can answer exactly are accepted
    * (equality, prefix/suffix/contains); everything else stays a
    * residual for Spark. At 100 TB this is the difference between
    * "open every file and filter rows" and "never schedule the task". */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("path", _: String)     => true
      case StringStartsWith("path", _)    => true
      case StringEndsWith("path", _)      => true
      case StringContains("path", _)      => true
      case _                              => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new LinesScan(path, required, pushed)
}

private[sources] class LinesScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Surfaces the pushed path predicates and pruned schema in
    * explain() — the audit trail for "did the filter reach the
    * listing", same convention as the parquet scan's detail. */
  override def description(): String =
    s"lines($path) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  private def keep(abs: String): Boolean = pushed.forall {
    case EqualTo("path", v: String)      => abs == v
    case StringStartsWith("path", v)     => abs.startsWith(v)
    case StringEndsWith("path", v)       => abs.endsWith(v)
    case StringContains("path", v)       => abs.contains(v)
    case _                               => true
  }

  /** The files that survive hidden-file skipping and pushed-path
    * pruning — shared by partition planning and statistics so both
    * describe the same scan. */
  private lazy val plannedFiles: Array[java.io.File] = {
    val dir = new java.io.File(path)
    if (dir.isFile) Array(dir)
    else Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      // the Hadoop hidden-file convention (same rule as Spark's own
      // InMemoryFileIndex): skip `_SUCCESS` markers and `.crc`
      // sidecars, so a directory written by another Spark job reads
      // back as data only
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .filter(f => keep(f.getAbsolutePath)) // pushed-path file pruning
      .sortBy(_.getName) // deterministic order
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedFiles.map(f => LinesPartition(f.getAbsolutePath): InputPartition)

  /** Post-pruning byte size from the listing (no file is opened).
    * Without this a DSv2 source reports `defaultSizeInBytes` (huge),
    * so a 2 KB config-file table could never auto-broadcast — with it
    * the planner treats a small lines table like any small dimension:
    * broadcast side of the join, no shuffle. Row count is left empty;
    * line counting would require reading the data at planning time. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = plannedFiles.map(_.length()).sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LinesReaderFactory(required.fieldNames)
}

private[sources] final case class LinesPartition(file: String)
    extends InputPartition

private[sources] class LinesReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LinesPartition]
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(p.file, "UTF-8")
      private val it = src.getLines()
      private var lineNo = -1L
      private var current: String = _
      // path is constant per partition — materialize the UTF8String once
      private val pathU = UTF8String.fromString(p.file)

      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); lineNo += 1; true } else false

      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "path" => pathU
          case "line_no" => lineNo
          case "line" => UTF8String.fromString(current)
        }.asInstanceOf[Array[Any]])

      override def close(): Unit = src.close()
    }
  }
}

/** DataSource V2 WRITE path — the sink half of the connector surface
  * (the read half is the scan above). Demonstrates the two-phase
  * commit contract end to end: each task streams its partition's
  * `line` column into a hidden `.tmp-…` file (invisible to concurrent
  * readers — the scan's hidden-file rule), its commit MESSAGE carries
  * the (tmp, final) rename pair back to the driver, and only the
  * DRIVER's `commit` makes any file visible — an aborted or
  * speculated task leaves nothing but an unreferenced tmp that
  * `abort` removes. Overwrite mode arrives as `truncate()`
  * (SupportsTruncate) and deletes prior `part-*` files inside the
  * driver commit. Guarantee, stated precisely: readers never observe a
  * PARTIAL part file (tasks write hidden dot-files; only whole-file
  * renames become visible), but the delete-then-rename sequence is not
  * atomic as a set — a reader overlapping the commit window can see a
  * mix of old and new part files. Snapshot isolation across overwrite
  * needs a directory-swap or manifest commit (what Iceberg/Delta do);
  * this connector's contract is crash-safety (no partial/torn files,
  * aborted jobs leave the old snapshot intact), not reader isolation.
  * `_SUCCESS` is written last, as the commit marker.
  *
  * Scale shape: no driver-side data movement — the driver handles
  * one rename pair per TASK, not per row; writers never buffer more
  * than one line. */
private[sources] class LinesWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    require(schema.fieldNames.contains("line"),
      s"lines sink needs a 'line' column, got ${schema.simpleString}")
    new LinesWrite(path, schema.fieldIndex("line"), truncateFirst)
  }
}

private[sources] class LinesWrite(path: String, lineIdx: Int,
    truncateFirst: Boolean) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LinesWriterFactory(path, lineIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    if (truncateFirst)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .foreach(_.delete())
    messages.foreach { case LinesCommit(tmp, fin) =>
      val ok = new java.io.File(tmp).renameTo(new java.io.File(dir, fin))
      require(ok, s"rename $tmp -> $fin failed")
    }
    new java.io.FileOutputStream(new java.io.File(dir, "_SUCCESS")).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LinesCommit(tmp, _) => new java.io.File(tmp).delete()
      case _ => ()
    }
}

private[sources] final case class LinesCommit(tmp: String, fin: String)
    extends WriterCommitMessage

private[sources] class LinesWriterFactory(path: String, lineIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    new DataWriter[InternalRow] {
      private val dir = new java.io.File(path)
      dir.mkdirs()
      // hidden while in flight: the scan skips dot-files, so a reader
      // racing this write never sees a partial part file
      private val tmp = new java.io.File(dir,
        f".tmp-$partitionId%05d-$taskId")
      // BufferedWriter, NOT PrintWriter: PrintWriter swallows
      // IOExceptions behind an internal error flag, so a disk-full or
      // I/O failure would commit a silently truncated part file —
      // defeating the 2PC guarantee. Write failures must THROW so the
      // task aborts and the driver never sees its commit message.
      private val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(
          new java.io.FileOutputStream(tmp), "UTF-8"))

      override def write(row: InternalRow): Unit = {
        out.write(row.getUTF8String(lineIdx).toString)
        out.write('\n')
      }

      override def commit(): WriterCommitMessage = {
        // close() flushes; a buffered failure surfaces HERE, before the
        // commit message exists — the task fails instead of publishing
        out.close()
        LinesCommit(tmp.getAbsolutePath, f"part-$partitionId%05d-$taskId.txt")
      }

      override def abort(): Unit = {
        try out.close() catch { case _: java.io.IOException => () }
        tmp.delete()
      }
      override def close(): Unit =
        try out.close() catch { case _: java.io.IOException => () }
    }
  }
}
