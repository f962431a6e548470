package graft.tools
import org.apache.spark.sql.SparkSession
import graft.sources.MatrixIO
import graft.operators.{Traversals, GraphCatalog}

/** Dev driver: exercises the public API end-to-end against the
  * reference's sample graphs. Run: sbt "Test/runMain graft.tools.Drive" */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e7 = MatrixIO.readMatrix(spark, "/root/reference/G7.txt")
    println("EDGES_G7=" + e7.count())
    Traversals.bfs(e7, 0).show(20, false)
    Traversals.dfsLeaves(e7, 0).show()
    val cat = new GraphCatalog(spark, "/tmp/graft-verify-cat")
    cat.addGraph("g7", e7)
    println("CATALOG=" + cat.listGraphs())
    println("BFS_VIA_CATALOG=" + cat.bfs("g7", 3).orderBy("order").collect().map(_.getAs[Long]("vertex")).mkString(","))
    val e1 = MatrixIO.readMatrix(spark, "/root/reference/G1.txt")
    println("G1_BFS_FROM_1=" + Traversals.bfs(e1, 1).collect().map(r=>(r.getLong(0),r.getInt(1),r.getLong(2))).mkString(";"))
    println("G7_BFS_FROM_99=" + Traversals.bfs(e7, 99).collect().map(r=>(r.getLong(0),r.getInt(1),r.getLong(2))).mkString(";"))
    try { cat.addGraph("../evil", e7); println("BAD_NAME_ACCEPTED!") }
    catch { case ex: IllegalArgumentException => println("BAD_NAME_REJECTED: " + ex.getMessage.take(60)) }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/dir.txt"), "3\n0 1 0\n0 0 1\n0 0 0\n".getBytes)
    println("DIRECTED_FROM_2=" + Traversals.bfs(MatrixIO.readMatrix(spark, "/tmp/dir.txt"), 2).collect().map(_.getLong(2)).mkString(","))
    println("DIRECTED_FROM_0=" + Traversals.bfs(MatrixIO.readMatrix(spark, "/tmp/dir.txt"), 0).collect().map(_.getLong(2)).mkString(","))
    spark.stop()
  }
}
