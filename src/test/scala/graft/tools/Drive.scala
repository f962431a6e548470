package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup}
import graft.streaming.EventStreams

/** Dev driver: exercises the public API end-to-end.
  * Run: sbt "Test/runMain graft.tools.Drive" */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // --- as-of exec with NULL keys/times (null must never match)
    val left = Seq((1L, Some(10L), Some(100L)), (2L, None, Some(100L)),
      (3L, Some(10L), None), (4L, Some(10L), Some(200L)))
      .toDF("event_id", "user_id", "t")
    val right = Seq((Some(10L), Some(50L), 7L), (Option.empty[Long], Some(60L), 8L),
      (Some(10L), Option.empty[Long], 9L), (Some(10L), Some(150L), 11L))
      .toDF("r_user", "rt", "mark")
    println("ASOF_EXEC_NULLS:")
    AsOfJoin.asofExec(left, right, "user_id", "r_user", "t", "rt", Seq("mark"))
      .orderBy("event_id").show(10, false)
    println("ASOF_COMPOSED_NULLS:")
    AsOfJoin.asof(left, right.select($"r_user".as("user_id"), $"rt", $"mark"),
      "user_id", "t", "rt", Seq("mark")).orderBy("event_id").show(10, false)
    println("ASOF_FORWARD_NULLS:")
    AsOfJoin.asofForward(left, right.select($"r_user".as("user_id"), $"rt", $"mark"),
      "user_id", "t", "rt", Seq("mark")).orderBy("event_id").show(10, false)

    // --- as-of exec with Int keys and Date event times
    val dl = Seq((1L, 10, java.sql.Date.valueOf("2024-01-05")),
      (2L, 10, java.sql.Date.valueOf("2024-01-01"))).toDF("eid", "k", "d")
    val dr = Seq((10, java.sql.Date.valueOf("2024-01-03"), 77L)).toDF("rk", "rd", "mark")
    println("ASOF_EXEC_INT_DATE:")
    AsOfJoin.asofExec(dl, dr, "k", "rk", "d", "rd", Seq("mark")).orderBy("eid").show(5, false)

    // --- repeated strategy + function registration must be idempotent
    AsOfJoin.asofExec(dl, dr, "k", "rk", "d", "rd", Seq("mark")).count()
    graft.functions.expressions.GraftFunctions.register(spark)
    graft.functions.expressions.GraftFunctions.register(spark)
    println("STRATEGIES_WITH_ASOF=" + spark.experimental.extraStrategies
      .count(_ == graft.plans.AsOfJoinStrategy))

    // --- dedup family sharing one signature table
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val sig = Dedup.minhashSignatures(docs).localCheckpoint(true)
    println("SIG_ROWS=" + sig.count())
    println("PAIRS_SHARED=" + Dedup.minhashPairs(docs, sigOpt = Some(sig)).count())
    println("PAIRS_FRESH =" + Dedup.minhashPairs(docs).count())

    // --- streaming left-outer interval join over staged event files
    val sd = java.nio.file.Files.createTempDirectory("drv-join-outer")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = 1700000000L * 1000000000L
    Seq((100L, base, 1L, "view", 0.0, "{}"), (200L, base, 2L, "view", 0.0, "{}"),
        (201L, base + 600L*1000000000L, 2L, "click", 0.0, "{}"),
        (900L, base + 4L*3600L*1000000000L, 99L, "view", 0.0, "{}"),
        (901L, base + 4L*3600L*1000000000L, 99L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(sd.resolve("b1").toString)
    val views = EventStreams.eventsStream(spark, sd.toString + "/*")
      .where($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts".as("vts"))
    val clicks = EventStreams.eventsStream(spark, sd.toString + "/*")
      .where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("cts"))
    val q = EventStreams.intervalJoin(views, clicks, "user_id", "c_user", "vts", "cts",
        joinType = "left_outer")
      .select($"view_id", $"click_id")
      .writeStream.outputMode("append").format("memory").queryName("ivo").start()
    q.processAllAvailable(); q.stop()
    println("LEFT_OUTER_STREAM_ROWS:")
    spark.table("ivo").orderBy("view_id").show(10, false)

    // --- graph catalog append + compaction
    val tmp = java.nio.file.Files.createTempDirectory("drv-cat").toString
    val cat = new graft.operators.GraphCatalog(spark, tmp)
    cat.addGraphBucketed("g", Seq((0L,1L),(1L,2L)).toDF("src","dst"), buckets = 4)
    cat.addEdgesBucketed("g", Seq((2L,3L),(0L,1L)).toDF("src","dst"))
    println("AFTER_APPEND=" + cat.loadBucketed("g").count())
    cat.compactBucketed("g")
    println("AFTER_COMPACT=" + cat.loadBucketed("g").count())
    cat.compactBucketed("g", dedup = true)
    println("AFTER_DEDUP_COMPACT=" + cat.loadBucketed("g").count())
    println("BFS_FROM_0=" + cat.bfs("g", 0L).count())
    spark.stop()
  }
}
