package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("asof attaches latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:30")),  // after m1
      (2L, 10L, ts("2024-01-01 00:02:00")),  // exactly at m2 (inclusive)
      (3L, 10L, ts("2024-01-01 00:00:05")),  // before any mark -> null
      (4L, 20L, ts("2024-01-01 00:05:00"))   // other key, only m3
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:10"), 101L), // m1
      (10L, ts("2024-01-01 00:02:00"), 102L), // m2
      (20L, ts("2024-01-01 00:01:00"), 103L)  // m3
    ).toDF("user_id", "rts", "mark_id")
    val got = AsOfJoin.asof(left, right, "user_id", "ts", "rts", Seq("mark_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("mark_id")).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> Some(103L)))
  }

  test("a newer right row with a NULL payload field wins atomically (no cross-row stitching)") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:03:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:01:00"), Some(101L), Some("x")),
      (10L, ts("2024-01-01 00:02:00"), Some(102L), None) // newer, note=NULL
    ).toDF("user_id", "rts", "mark_id", "note")
    val r = AsOfJoin.asof(left, right, "user_id", "ts", "rts", Seq("mark_id", "note")).head()
    assert(r.getAs[Long]("mark_id") === 102L)
    assert(r.getAs[Any]("note") === null, "note must come from the SAME right row as mark_id")
  }

  test("asof keeps all left rows and columns") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:00:01"), "x")).toDF("event_id", "user_id", "ts", "tag")
    val right = Seq((6L, ts("2024-01-01 00:00:00"), 9L)).toDF("user_id", "rts", "mark_id")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "rts", Seq("mark_id"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "tag", "mark_id"))
    assert(out.count() === 1)
    assert(out.head().getAs[Any]("mark_id") === null) // different key -> no match
  }

  test("asofExec (custom plan) matches the composed asof on events, multi-partition") {
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Tables.events(spark, TestSpark.sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val left = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .repartition(7) // exec must re-cluster via EnsureRequirements
    val exec = AsOfJoin.asofExec(left, purchases, "user_id", "p_user", "ts", "p_ts",
      Seq("purchase_id", "p_ts"))
    // nodeName strips the Exec suffix: the operator prints as "AsOfJoin"
    assert(exec.queryExecution.executedPlan.toString.contains("AsOfJoin "),
      "the custom strategy must plan the dedicated operator")
    val composed = AsOfJoin.asof(left,
      purchases.select(col("p_user").as("user_id"), col("p_ts"), col("purchase_id")),
      "user_id", "ts", "p_ts", Seq("purchase_id", "p_ts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("purchase_id"), col("p_ts").cast("long").as("pts"))
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[Any]("purchase_id")), Option(r.getAs[Any]("pts")))).toSet
    assert(canon(exec) === canon(composed))
    assert(canon(exec).nonEmpty)
  }

  test("asofExec handles a self-join source (analyzer dedups relations) and empty right") {
    import org.apache.spark.sql.functions._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("event_id", "user_id", "t")
    val right = Seq((10L, 150L, 7L)).toDF("r_user", "rt", "mark")
    val got = AsOfJoin.asofExec(left, right, "user_id", "r_user", "t", "rt", Seq("mark"))
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("mark"))).toMap
    assert(got === Map(1L -> None, 2L -> Some(7L)))
    val emptyRight = right.where(col("mark") < 0)
    val got2 = AsOfJoin.asofExec(left, emptyRight, "user_id", "r_user", "t", "rt", Seq("mark"))
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("mark"))).toMap
    assert(got2 === Map(1L -> None, 2L -> None))
  }

  test("asofExec and composed asof agree on NULL keys/times (join semantics: null never matches)") {
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, Some(10L), Some(100L)), // normal match
      (2L, None, Some(100L)),      // NULL key -> null payload (must NOT alias key 0 / match null right)
      (3L, Some(10L), None),       // NULL event time -> null payload (must NOT alias the epoch)
      (4L, Some(10L), Some(200L))  // later match
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (Some(10L), Some(50L), 7L),  // the as-of mark for t in [50, 150)
      (Option.empty[Long], Some(60L), 8L), // NULL key: matches nothing
      (Some(10L), Option.empty[Long], 9L), // NULL time: matches nothing
      (Some(10L), Some(150L), 11L)
    ).toDF("r_user", "rt", "mark")
    def got(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("mark"))).toMap
    val exec = got(AsOfJoin.asofExec(left, right, "user_id", "r_user", "t", "rt", Seq("mark")))
    assert(exec === Map(1L -> Some(7L), 2L -> None, 3L -> None, 4L -> Some(11L)))
    val composed = got(AsOfJoin.asof(left,
      right.select(col("r_user").as("user_id"), col("rt"), col("mark")),
      "user_id", "t", "rt", Seq("mark")))
    assert(composed === exec, "composed union+window form must share the exec's null semantics")
    // forward direction: desc scan must put NULL left times FIRST, not
    // hand them the partition's running match
    val fwd = got(AsOfJoin.asofForward(left,
      right.select(col("r_user").as("user_id"), col("rt"), col("mark")),
      "user_id", "t", "rt", Seq("mark")))
    assert(fwd === Map(1L -> Some(11L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("asofExec supports Int keys and Date event times (4-byte layouts)") {
    import java.sql.Date
    val left = Seq(
      (1L, 10, Date.valueOf("2024-01-05")),
      (2L, 10, Date.valueOf("2024-01-01")), // before every mark -> null
      (3L, 20, Date.valueOf("2024-03-01"))
    ).toDF("event_id", "k", "d")
    val right = Seq(
      (10, Date.valueOf("2024-01-03"), 7L),
      (10, Date.valueOf("2024-01-06"), 8L),
      (20, Date.valueOf("2024-02-01"), 9L)
    ).toDF("rk", "rd", "mark")
    val got = AsOfJoin.asofExec(left, right, "k", "rk", "d", "rd", Seq("mark"))
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("mark"))).toMap
    assert(got === Map(1L -> Some(7L), 2L -> None, 3L -> Some(9L)))
  }

  test("asofExec rejects mixed key widths and Date-vs-micros time pairs") {
    import org.apache.spark.sql.functions._
    import java.sql.Date
    val left = Seq((1L, 10, 100L)).toDF("event_id", "k", "t")
    val rightLongKey = Seq((10L, 50L, 7L)).toDF("rk", "rt", "mark")
    val e1 = intercept[Throwable] {
      AsOfJoin.asofExec(left, rightLongKey, "k", "rk", "t", "rt", Seq("mark")).collect()
    }
    assert(e1.getMessage.contains("SAME type"), s"got: ${e1.getMessage}")
    val rightDate = Seq((10, Date.valueOf("2024-01-01"), 7L)).toDF("rk", "rd", "mark")
    val e2 = intercept[Throwable] {
      AsOfJoin.asofExec(left, rightDate, "k", "rk", "t", "rd", Seq("mark")).collect()
    }
    assert(e2.getMessage.contains("Date"), s"got: ${e2.getMessage}")
  }

  test("asofForward attaches earliest right row at-or-after each left row, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:30")),  // next mark is m2
      (2L, 10L, ts("2024-01-01 00:02:00")),  // exactly at m2 (inclusive)
      (3L, 10L, ts("2024-01-01 00:03:00")),  // after all marks -> null
      (4L, 20L, ts("2024-01-01 00:00:30"))   // other key, m3 ahead
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:10"), 101L), // m1 (before all lefts)
      (10L, ts("2024-01-01 00:02:00"), 102L), // m2
      (20L, ts("2024-01-01 00:01:00"), 103L)  // m3
    ).toDF("user_id", "rts", "mark_id")
    val got = AsOfJoin.asofForward(left, right, "user_id", "ts", "rts", Seq("mark_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("mark_id")).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(1L -> Some(102L), 2L -> Some(102L), 3L -> None, 4L -> Some(103L)))
  }
}
