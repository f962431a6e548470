package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Degenerate-fixture drive for the r13-advice guards: a 3-day
    // events study (holt needs 16), and the real fixtures as control.
    val tmp = "/tmp/drive_degenerate"
    val full = "/root/testdata/sf0.01"
    // copy every table holt's deps DON'T need, then a 3-day events
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$full/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    // take the first 3 distinct days regardless of fixture dates
    val ev = spark.read.parquet(s"$full/events.parquet")
    val d3 = ev.select(col("ts").cast("date").as("day")).distinct()
      .orderBy("day").limit(3)
    ev.join(broadcast(d3), ev("ts").cast("date") === d3("day"))
      .drop("day").write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val holtDeg = graft.SparkEntry.queries("q_events_holt")(spark, tmp).collect()
    println(s"[drive] holt on 3-day study rows=${holtDeg.length} (want 0)")
    val holtFull = graft.SparkEntry.queries("q_events_holt")(spark, full).collect()
    println(s"[drive] holt on full study rows=${holtFull.length} (want 1): ${holtFull.headOption}")
    val rc = graft.SparkEntry.queries("q_graph_richclub")(spark, full).collect()
    println(s"[drive] richclub rows=${rc.length}, phi finite=${rc.forall(r => !r.getDouble(3).isInfinite && !r.getDouble(3).isNaN)}")
    val sp = graft.SparkEntry.queries("q_embed_spearman")(spark, full).collect()
    println(s"[drive] spearman rows=${sp.length}, rho=${sp.headOption.map(_.get(2))}")
    spark.stop()
  }
}
