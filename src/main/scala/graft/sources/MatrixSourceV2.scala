package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 provider for the reference's dense adjacency-matrix
  * text format (`secondary_server.c:91-100`): header token `n`, then
  * `n*n` row-major 0/1 cells; cell `(i,j)==1` is a directed edge.
  * Registered as `graft-matrix` (META-INF/services), so
  * `spark.read.format("graft-matrix").load(path)` yields the engine's
  * canonical `(src: Long, dst: Long)` edge schema.
  *
  * Why a V2 source when [[MatrixIO.readMatrix]] already parses the
  * format declaratively: this is the extension tier where SCAN
  * decisions live. The connector plans one `InputPartition` per
  * matrix-row range, accepts `src` range/equality filters and prunes
  * whole row ranges BEFORE any cell is parsed (`pushedFilters`
  * reports them, so they vanish from post-scan `Filter` nodes), and
  * honours column pruning (`dst`-only projection never materialises
  * `src` values). The same three hooks are exactly what a 100 TB
  * columnar source uses — this keeps the interop format on the same
  * contract. Per the reference contract n <= 100 (`client.c:11`), so
  * each partition re-reading its ~40 KB file is the right trade;
  * data-scale graphs enter as Parquet edge lists via GraphCatalog.
  */
class MatrixSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-matrix"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatrixSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-matrix: a load path is required")
    new MatrixTable(path)
  }
}

object MatrixSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** Whole-file token read (header contract keeps this tiny). Plain
    * java.nio — the interop format is a local/posix file by contract;
    * distributed storage carries graphs as Parquet edge lists. */
  private[sources] def tokens(path: String): Array[String] = {
    val clean = if (path.startsWith("file:")) new java.net.URI(path).getPath else path
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(clean)),
      java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
  }

  private[sources] def vertexCount(path: String): Int = {
    val t = tokens(path)
    val n = t(0).toInt
    require(n >= 0, s"$path: first token must be a non-negative vertex count")
    require(t.length == n.toLong * n + 1,
      s"$path: expected ${n.toLong * n} matrix cells for n=$n, found ${t.length - 1}")
    n
  }
}

private[sources] class MatrixTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-matrix:$path"
  override def schema(): StructType = MatrixSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MatrixScanBuilder(path, options.getInt("partitions", 4))
}

/** Accepts `src` bounds (their conjunction narrows the scanned row
  * range — matrix row i holds exactly the edges with src == i) and
  * column pruning; everything else is left for Spark's post-scan
  * Filter. */
private[sources] class MatrixScanBuilder(path: String, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val n = MatrixSourceV2.vertexCount(path)
  private var lo = 0L          // inclusive row bound
  private var hi = n.toLong    // exclusive row bound
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = MatrixSourceV2.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("src", _: Number) | GreaterThan("src", _: Number) |
           GreaterThanOrEqual("src", _: Number) | LessThan("src", _: Number) |
           LessThanOrEqual("src", _: Number) | IsNotNull("src") | IsNotNull("dst") => true
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v: Number)            => lo = lo.max(v.longValue()); hi = hi.min(v.longValue() + 1)
      case GreaterThan(_, v: Number)        => lo = lo.max(v.longValue() + 1)
      case GreaterThanOrEqual(_, v: Number) => lo = lo.max(v.longValue())
      case LessThan(_, v: Number)           => hi = hi.min(v.longValue())
      case LessThanOrEqual(_, v: Number)    => hi = hi.min(v.longValue() + 1)
      case IsNotNull(_)                     => () // columns are non-null by schema
      case f => throw new IllegalStateException(s"unreachable: $f")
    }
    accepted = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark may ask for zero columns (pure count) — keep the pruned
    // struct as-is; the reader emits empty rows then.
    required = requiredSchema
  }

  override def build(): Scan =
    new MatrixScan(path, n, lo.max(0), hi.min(n), required, parts)
}

private[sources] class MatrixScan(path: String, n: Int, lo: Long, hi: Long,
                                  required: StructType, parts: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-matrix $path rows=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val rows = (hi - lo).max(0)
    if (rows == 0) return Array.empty
    // honor the `partitions` read option (default 4) — clamped to the
    // surviving row range so empty splits are never planned
    val nParts = math.min(rows, parts.max(1).toLong).toInt
    val step = (rows + nParts - 1) / nParts
    (0 until nParts).map { i =>
      val s = lo + i * step
      MatrixPartition(path, n, s, (s + step).min(hi)): InputPartition
    }.filter { case MatrixPartition(_, _, s, e) => s < e }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new MatrixReaderFactory(required)
}

private[sources] case class MatrixPartition(path: String, n: Int,
                                            rowStart: Long, rowEnd: Long) extends InputPartition

private[sources] class MatrixReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MatrixPartition]
    new PartitionReader[InternalRow] {
      private val toks = MatrixSourceV2.tokens(p.path) // ~40 KB by contract
      private var row = p.rowStart
      private var j = -1L
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (row < p.rowEnd) {
          j += 1
          if (j >= p.n) { j = -1L; row += 1 }
          else if (toks((row * p.n + j + 1).toInt) == "1") {
            val vals = required.fieldNames.map {
              case "src" => row
              case "dst" => j
            }
            current = InternalRow.fromSeq(vals.toIndexedSeq)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
