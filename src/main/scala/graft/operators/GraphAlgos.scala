package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge, Graph}

/** GraphX-backed analytics (BASELINE.json: "GraphX for analytics") —
  * the algorithms beyond the reference's BFS/DFS surface that a graph
  * engine user expects. DataFrame in, DataFrame out; GraphX's
  * vertex-cut partitioning does the distribution. */
object GraphAlgos {

  private def toGraph(edges: DataFrame): Graph[Unit, Unit] = {
    val rdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    Graph.fromEdges[Unit, Unit](rdd, ())
  }

  /** Static PageRank, fixed iteration count (deterministic). */
  def pageRank(edges: DataFrame, iters: Int = 10, reset: Double = 0.15): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges).staticPageRank(iters, reset)
      .vertices.map { case (v, r) => (v, r) }.toDF("vertex", "rank")
  }

  /** Per-vertex triangle counts (GraphX canonicalises internally). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges).triangleCount()
      .vertices.map { case (v, c) => (v, c) }.toDF("vertex", "triangles")
  }

  /** Connected components via GraphX's optimized Pregel implementation
    * (same contract as [[Traversals.connectedComponents]]: component =
    * min vertex id, undirected). */
  def connectedComponentsGraphX(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges).connectedComponents()
      .vertices.map { case (v, c) => (v, c) }.toDF("vertex", "component")
  }

  /** In/out degree per vertex. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("vertex"), lit(1).as("out"), lit(0).as("in"))
      .union(edges.select(col("dst").cast("long"), lit(0), lit(1)))
      .groupBy("vertex")
      .agg(sum(col("out")).cast("long").as("out_degree"),
        sum(col("in")).cast("long").as("in_degree"))
}
