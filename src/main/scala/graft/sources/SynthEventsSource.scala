package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-event source — the STREAMING rung of the
  * extension ladder (MicroBatchStream + admission control), shaped
  * like Spark's `rate` source but with md5-derived row CONTENT, so the
  * stream's output is exactly reproducible by a closed-form DuckDB
  * `range()` query (and by a batch read of the same source: the
  * connector also exposes BATCH_READ over the identical generator).
  *
  * Row derivation for id i (identical in the reader, the DuckDB twin,
  * and any engine with md5 — the repo's determinism convention):
  *   h         = md5("ev|" + i) hex
  *   user_id   = int(h[0:4], 16) % 50
  *   event_type= ["view","click","purchase","signup","error"][int(h[4], 16) % 5]
  *   value     = int(h[5:9], 16) % 10000 / 100.0   (exact 2-dec double)
  *   ts        = 2024-01-01T00:00:00Z + i seconds
  *
  * Scale shape: offsets are plain row counts, each micro-batch plans
  * `partitions` range-splits generated independently on executors —
  * no driver-side buffering, no shared state beyond the committed
  * offset; admission control (`rowsPerBatch`) bounds every batch, so
  * a 100 TB replay is just more batches, not bigger ones. */
class SynthEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthEventsTable(opts.getLong("totalRows", 1000L),
      opts.getLong("rowsPerBatch", 1000L), opts.getInt("partitions", 4))
  }
}

object SynthEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val baseMicros: Long = 1704067200L * 1000000L // 2024-01-01T00:00:00Z

  private val types =
    Array("view", "click", "purchase", "signup", "error").map(UTF8String.fromString)

  /** One generated row; MessageDigest md5 matches Spark's `md5()` and
    * DuckDB's `md5()` byte-for-byte on the same input string. */
  private[sources] def rowFor(i: Long): InternalRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"ev|$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val user = java.lang.Long.parseLong(h.substring(0, 4), 16) % 50
    val et = types((java.lang.Long.parseLong(h.substring(4, 5), 16) % 5).toInt)
    val value = (java.lang.Long.parseLong(h.substring(5, 9), 16) % 10000) / 100.0
    InternalRow(i, baseMicros + i * 1000000L, user, et, value)
  }
}

private[sources] class SynthEventsTable(total: Long, perBatch: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synth-events[$total]"
  override def schema(): StructType = SynthEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new SynthEventsScan(total, perBatch, parts)
}

private[sources] class SynthEventsScan(total: Long, perBatch: Long, parts: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = SynthEventsSource.schema
  override def description(): String =
    s"graft-synth-events total=$total perBatch=$perBatch"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SynthEventsStream.split(0L, total, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    SynthEventsStream.readerFactory
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthEventsStream(total, perBatch, parts)
}

private[graft] case class SynthOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] case class SynthRange(start: Long, end: Long) extends InputPartition

/** Offsets are cumulative row counts; admission control caps each
  * batch at `perBatch` rows, so `processAllAvailable` on a 5000-row /
  * 1000-per-batch source executes exactly 5 micro-batches. */
private[graft] class SynthEventsStream(total: Long, perBatch: Long, parts: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = SynthOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].n
    SynthOffset(math.min(total, s + perBatch))
  }
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(perBatch)
  override def reportLatestOffset(): Offset = SynthOffset(total)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SynthEventsStream.split(start.asInstanceOf[SynthOffset].n,
      end.asInstanceOf[SynthOffset].n, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    SynthEventsStream.readerFactory
  override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object SynthEventsStream {
  def split(start: Long, end: Long, parts: Int): Array[InputPartition] = {
    val rows = (end - start).max(0)
    if (rows == 0) return Array.empty
    val n = math.min(rows, parts.max(1).toLong).toInt
    val step = (rows + n - 1) / n
    (0 until n).map { i =>
      val s = start + i * step
      SynthRange(s, math.min(s + step, end)): InputPartition
    }.filter { case SynthRange(s, e) => s < e }.toArray
  }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[SynthRange]
      new PartitionReader[InternalRow] {
        private var i = p.start - 1
        override def next(): Boolean = { i += 1; i < p.end }
        override def get(): InternalRow = SynthEventsSource.rowFor(i)
        override def close(): Unit = ()
      }
    }
  }
}
