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
    val d = "/root/testdata/sf0.1"
    println(s"[drive] heap=${Runtime.getRuntime.maxMemory() / (1L << 20)}MiB")
    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0L; var i = 0
      while (i < 200000000) { x += i * 31; i += 1 }
      if (x == 42) println(x)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[drive] spin_pre=${spin()}%.3f")

    // job counter: how many Spark jobs does one rep fire?
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    val q = graft.SparkEntry.queries("q_dedup_incremental")
    // warm (memo build + JIT)
    q(spark, d).count()
    (1 to 5).foreach { i =>
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = q(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[drive] rep$i t=$dt%.3f n=$n jobs=${jobs.get()}")
    }
    def blooms(tag: String): Unit = {
      val df = q(spark, d)
      df.collect()
      val n = "might_contain".r.findAllIn(df.queryExecution.executedPlan.toString).size
      println(s"[drive] $tag might_contain=$n")
    }
    blooms("default")
    (6 to 12).foreach { i =>
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = q(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[drive] rep$i t=$dt%.3f n=$n jobs=${jobs.get()}")
    }
    spark.catalog.listTables().collect().filter(_.name.startsWith("graft_corpus_band_idx"))
      .foreach { tb =>
        val md = spark.table(tb.name).schema("corpus_id").metadata
        println(s"[drive] staged idx metadata=$md")
      }
    println(f"[drive] spin_post=${spin()}%.3f")
    spark.stop()
  }
}
