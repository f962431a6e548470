package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.GraphCatalog
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cat = new GraphCatalog(spark, java.nio.file.Files.createTempDirectory("snap").toString)
    cat.addGraph("g", Seq((0L,1L),(1L,2L),(2L,3L)).toDF("src","dst"))
    val snap = cat.load("g")
    println("BEFORE_OVERWRITE=" + snap.count())
    cat.modifyGraph("g", Seq((9L,9L)).toDF("src","dst"))
    try println("AFTER_OVERWRITE_SNAP=" + snap.count())
    catch { case e: Exception => println("AFTER_OVERWRITE_THROWS=" + e.getClass.getSimpleName + ": " + e.getMessage.linesIterator.next().take(90)) }
    println("FRESH_LOAD=" + cat.load("g").count())
    spark.stop()
  }
}
