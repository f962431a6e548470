package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Named-graph store replacing the reference's write path
  * (ops 1/2, `primary_server.c:70-99`) and its per-graph
  * reader/writer-lock machinery (`load_balancer.c:36-40`,
  * `secondary_server.c:74-113`).
  *
  * Graphs persist as Parquet edge lists under `root/<name>/edges`.
  * Consistency model: `mode("overwrite")` gives the same
  * last-writer-wins whole-graph replacement the reference's writer
  * lock provided. Readers are **fail-stop, never torn**: a query
  * executed against a [[load]] snapshot reads one complete graph
  * version; if the files were replaced underneath it, the read fails
  * with FILE_NOT_EXIST (verified) rather than mixing versions. For a
  * read that must survive concurrent overwrites, [[loadPinned]]
  * materialises the snapshot first (the moral equivalent of the
  * reference's reader lock, without blocking writers).
  * No fixed caps (reference: 20 graphs / 100 vertices); names are
  * real names, not a load-bearing `G<k>.txt` convention
  * (`primary_server.c:43-51`).
  */
final class GraphCatalog(spark: SparkSession, root: String) {

  private def edgePath(name: String) = s"$root/$name/edges"
  private def validate(name: String): Unit =
    require(name.nonEmpty && !name.contains("/") && !name.contains(".."),
      s"invalid graph name: $name")

  /** Reference op=1 (Add graph). Create-or-replace, atomic per graph. */
  def addGraph(name: String, edges: DataFrame): Unit = {
    validate(name)
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(edgePath(name))
  }

  /** Reference op=2 (Modify graph) — behaviourally identical to add
    * (`primary_server.c:70-99` uses one write path for both). */
  def modifyGraph(name: String, edges: DataFrame): Unit = addGraph(name, edges)

  /** Snapshot read of a named graph's edge list (fail-stop under
    * concurrent overwrite — see class doc). */
  def load(name: String): DataFrame = { validate(name); spark.read.parquet(edgePath(name)) }

  /** Materialised snapshot: survives a concurrent overwrite of the
    * underlying files. `persist()` is NOT enough — Spark's
    * CacheManager re-caches by path on write, silently swapping in the
    * new version (observed) — so the snapshot is `localCheckpoint`ed:
    * the computed rows are detached from the file source entirely. */
  def loadPinned(name: String): DataFrame =
    load(name).localCheckpoint(eager = true)

  private def tableName(name: String) = {
    // table identifiers are strict so two catalog names can never
    // collide after sanitisation ("a-b" vs "a.b" -> same table)
    require(name.matches("[A-Za-z0-9_]+"),
      s"bucketed graph names must be [A-Za-z0-9_]+, got: $name")
    "graft_" + name
  }

  /** Add a graph as a **bucketed** table (hash-bucketed + sorted by
    * `src`): repeated traversals and edge-edge joins keyed on `src`
    * read co-located buckets and skip the shuffle entirely — the
    * persistent-storage counterpart of
    * [[Traversals.partitionEdges]]'s in-memory partitioning, and the
    * right layout for a graph queried many times at 100 TB. */
  def addGraphBucketed(name: String, edges: DataFrame, buckets: Int = 32): Unit = {
    validate(name)
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "src").sortBy("src")
      .option("path", edgePath(name))
      .saveAsTable(tableName(name))
  }

  /** Load a bucketed graph with its bucket metadata (required for
    * shuffle elimination — a plain parquet read loses it). */
  def loadBucketed(name: String): DataFrame = { validate(name); spark.table(tableName(name)) }

  /** Append-mode mutation — the operation a 100 TB catalog needs that
    * the reference's whole-graph op=2 rewrite can't provide: new edges
    * land as ADDITIONAL parquet files, touching none of the existing
    * data. Readers keep their snapshot semantics: an in-flight [[load]]
    * planned before the append never sees the new files (file listing
    * is plan-time), and a [[loadPinned]] snapshot is immune by
    * construction. Creates the graph when absent (append to empty). */
  def addEdges(name: String, edges: DataFrame): Unit = {
    validate(name)
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .write.mode(SaveMode.Append).parquet(edgePath(name))
  }

  private def bucketSpecOf(name: String) = spark.sessionState.catalog
    .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tableName(name)))
    .bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"graph '$name' has no bucket spec — use addEdges for plain-layout graphs"))

  /** [[addEdges]] into the BUCKETED layout: the delta is written as its
    * own set of bucket files under the same spec (bucket count read
    * from the catalog, so it can never diverge), which keeps src-keyed
    * joins and traversals shuffle-free — each bucket id just has more
    * than one file until [[compactBucketed]] folds them together. */
  def addEdgesBucketed(name: String, edges: DataFrame): Unit = {
    validate(name)
    val spec = bucketSpecOf(name)
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .write.mode(SaveMode.Append).format("parquet")
      .bucketBy(spec.numBuckets, "src").sortBy("src")
      .saveAsTable(tableName(name))
  }

  /** Fold a bucketed graph's accumulated append deltas back into one
    * write's worth of bucket files (pre-clustered on `src` so the
    * bucketed write needs no extra exchange and each task emits one
    * bucket file). `dedup` drops exact duplicate edges — optional
    * because the edge list is a multiset on the write path and
    * compaction must default to changing nothing but layout. The
    * snapshot is pinned BEFORE the overwrite: localCheckpoint detaches
    * the rows from the files being replaced, so compaction is safe
    * against its own read (and concurrent pinned readers stay stable,
    * suite-tested). */
  def compactBucketed(name: String, dedup: Boolean = false): Unit = {
    validate(name)
    val spec = bucketSpecOf(name)
    val snap = loadBucketed(name).localCheckpoint(eager = true)
    val data = if (dedup) snap.distinct() else snap
    addGraphBucketed(name,
      data.repartition(spec.numBuckets, col("src")), spec.numBuckets)
  }

  // Hadoop FS API, not java.io.File — the catalog root may be hdfs://
  // or s3a:// (the write/read paths already go through Spark's FS).
  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(name: String): Boolean = {
    validate(name)
    fs.exists(new org.apache.hadoop.fs.Path(edgePath(name)))
  }

  def listGraphs(): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "edges")))
      .map(_.getPath.getName).sorted
  }

  /** Reference op=4 routed through the catalog. */
  def bfs(name: String, start: Long): DataFrame = Traversals.bfs(load(name), start)

  /** Reference op=3 routed through the catalog. */
  def dfsLeaves(name: String, start: Long): DataFrame = Traversals.dfsLeaves(load(name), start)
}
