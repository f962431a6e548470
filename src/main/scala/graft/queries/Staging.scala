package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped staging of derived BUCKETED catalog tables — the
  * "index build once, probe many" layout a 100 TB deployment maintains
  * in its catalog (a bucketed dimension for the as-of exec, a bucketed
  * IVF cell assignment for ANN probes). Memoized per (session, dataset,
  * tag) so repeated bench reps time the PROBE, not the staging write.
  *
  * Lifecycle (same contract the as-of purchases stage has carried since
  * round 5): entries of stopped sessions are swept on the next stage
  * call — their catalog table dropped via a live session and their temp
  * dir deleted — and a JVM shutdown hook reaps every dir still memoized
  * at exit, so normal bench/verify runs (which never cycle sessions)
  * leave nothing behind.
  */
object Staging {

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), (String, java.nio.file.Path)]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    memo.values.forEach(v => deleteRecursively(v._2))))

  private[graft] def deleteRecursively(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch {
          case _: Throwable => ()
        })
    }

  /** Returns the staged table for `(s, dataDir, tag)`, invoking
    * `stage(tableName, tempDir)` exactly once per key to create it.
    * `stage` MUST `saveAsTable(tableName)` with its files under
    * `tempDir`. The table name salts in the session's identity hash:
    * the external catalog is shared across sessions of one context, so
    * a path-only name would let the stopped-session sweep DROP a table
    * a different live session still memoizes. md5, not String.hashCode
    * — a 32-bit collision would silently probe the WRONG dataset. */
  def bucketedTable(s: SparkSession, dataDir: String, tag: String)
                   (stage: (String, java.nio.file.Path) => Unit): DataFrame = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) {
        try s.sql(s"DROP TABLE IF EXISTS ${e.getValue._1}") catch { case _: Throwable => () }
        deleteRecursively(e.getValue._2)
        it.remove()
      }
    }
    val canon = new java.io.File(dataDir).getCanonicalPath
    val tbl = memo.computeIfAbsent((s, canon, tag), { key =>
      val name = s"graft_${tag}_" + java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"${key._2}#${System.identityHashCode(key._1)}".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString
      val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag")
      stage(name, dir)
      (name, dir)
    })
    s.table(tbl._1)
  }

  /** TEST-ONLY eviction of one memoized staging (drop the catalog
    * table, delete its files, forget the key) so the next
    * [[bucketedTable]] call re-runs the builder — provider-invariance
    * specs need the INGEST side of a staged stream entry (e.g. the
    * q_stream_ivf_upsert foreachBatch loop) to genuinely re-execute
    * under the provider being pinned, not to serve the memo built
    * under the default one. Never called by gate/bench code paths —
    * the memo's whole point there is that reps time the probe. */
  private[graft] def evict(s: SparkSession, dataDir: String, tag: String): Unit = {
    val canon = new java.io.File(dataDir).getCanonicalPath
    val entry = memo.remove((s, canon, tag))
    if (entry != null) {
      try s.sql(s"DROP TABLE IF EXISTS ${entry._1}") catch { case _: Throwable => () }
      deleteRecursively(entry._2)
    }
  }
}
