package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 verdict item 1: q_graph_pagerank_big's superstep phase went
  * 2.94 s (r15) → 8.25 s (r16) on byte-identical code, the whole
  * iterative-superstep family co-drifting — window evidence says
  * "barrier latency", but evidence-collection is not resolution. This
  * probe pins the MECHANISM: a stage-level listener records, for every
  * stage of the staged pagerank run, its wall time, task count, total
  * task time, JVM GC time, and shuffle read/write bytes — so a slow
  * run decomposes into (a) bigger shuffles / more tasks (a plan or
  * data regression), (b) task-time inflation (CPU steal / frequency),
  * or (c) submit-to-first-task and inter-stage gaps (scheduler /
  * barrier latency, the co-drift hypothesis). Run at bench geometry:
  * local[32], shuffle.partitions=32, sf0.1 bipartite graph, 5 iters.
  *
  * args: [sfDir] [reps]  (defaults /root/testdata/sf0.1, 3) */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("pagerank-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var collecting = false
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val wall = for {
            a <- si.submissionTime; b <- si.completionTime
          } yield b - a
          println(f"[pr-stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall_ms=${wall.getOrElse(-1L)}%6d taskTime_ms=${tm.executorRunTime}%7d " +
            f"gc_ms=${tm.jvmGCTime}%6d deser_ms=${tm.executorDeserializeTime}%5d " +
            f"shufRead=${tm.shuffleReadMetrics.totalBytesRead}%11d " +
            f"shufWrite=${tm.shuffleWriteMetrics.bytesWritten}%11d " +
            s"name=${si.name.takeWhile(_ != '\n').take(48)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // the gate's bipartite graph, inlined (GraphQueries' memo is
    // private): order–supplier edges, mirrored, degree-annotated
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val half = li.select((col("l_orderkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val eo = graft.operators.Traversals.pageRankEdgeTable(edges)
    println(s"[pr-probe] edge rows: ${eo.count()} (staged + cached)")

    val spin0 = graft.Bench.spinProbe(32)
    println(f"[pr-probe] spin pre: $spin0%.3f")
    (1 to reps).foreach { rep =>
      collecting = true
      val t0 = System.nanoTime()
      val r = graft.operators.Traversals.pageRankDeterministicStaged(eo, iters = 5)
      val n = r.count()
      val dt = (System.nanoTime() - t0) / 1e9
      collecting = false
      val phases = graft.operators.Traversals.lastPageRankPhases.get()
        .map { case (nm, s) => f"$nm=$s%.2f" }.mkString(" ")
      println(f"[pr-probe] rep$rep: $n vertices in $dt%.2f s  phases: $phases " +
        f" spin_now=${graft.Bench.spinProbe(32)}%.3f")
    }
    println("[pr-probe] executed plan (last rep):")
    graft.operators.Traversals.pageRankDeterministicStaged(eo, iters = 5)
      .explain("formatted")
    spark.stop()
  }
}
