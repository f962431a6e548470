package graft.tools
import org.apache.spark.sql.SparkSession
import graft.sources.MatrixIO
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def w(c: String) = { val p = java.nio.file.Files.createTempFile("m", ".txt"); java.nio.file.Files.write(p, c.getBytes); p.toString }
    // truncated matrix (2 declared, only 3 cells)
    try println("TRUNCATED=" + MatrixIO.readMatrix(spark, w("2\n1 0 1")).collect().mkString(","))
    catch { case e: Exception => println("TRUNCATED_THROWS=" + e.getMessage.take(80)) }
    // non-numeric cells
    try println("GARBAGE=" + MatrixIO.readMatrix(spark, w("2\n1 x 0 1")).collect().mkString(","))
    catch { case e: Exception => println("GARBAGE_THROWS=" + e.getMessage.take(80)) }
    // negative header
    try println("NEGN=" + MatrixIO.readMatrix(spark, w("-3\n")).collect().mkString(","))
    catch { case e: Exception => println("NEGN_THROWS=" + e.getMessage.take(80)) }
    spark.stop()
  }
}
