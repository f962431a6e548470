package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.{GraphCatalog, AsOfJoin}
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = Seq((0L,1L)).toDF("src","dst")
    val cat = new GraphCatalog(spark, java.nio.file.Files.createTempDirectory("c").toString)
    // probe: the a-b vs a.b collision is now rejected at the API
    try { cat.addGraphBucketed("a-b", e); println("DASH_ACCEPTED!") }
    catch { case ex: IllegalArgumentException => println("DASH_REJECTED=" + ex.getMessage.take(70)) }
    // probe: asof payload colliding with a left column
    val l = Seq((1L, 5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "v")).toDF("id","user_id","ts","value")
    val r = Seq((5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x")).toDF("user_id","rts","value")
    try { AsOfJoin.asof(l, r, "user_id", "ts", "rts", Seq("value")); println("CLASH_ACCEPTED!") }
    catch { case ex: IllegalArgumentException => println("CLASH_REJECTED=" + ex.getMessage.take(70)) }
    spark.stop()
  }
}
