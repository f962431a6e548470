package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming over the `events` table shape: watermarked
  * time-window aggregation and custom sessionization state
  * (`flatMapGroupsWithState`) — the streaming half of the engine
  * (SURVEY.md §2.2: the reference has no streaming; this is the
  * north-star pipeline surface).
  *
  * At scale: the windowed aggregate is a standard partial/final
  * streaming hash agg keyed by (window, event_type); sessionization
  * state is per-user in the state store, pruned by the event-time
  * timeout, so state size tracks active users, not history.
  */
object EventStreams {

  /** File-stream source over an events directory.
    *
    * A file stream needs a user-supplied schema, and supplying a WRONG
    * one is the worst failure mode this engine has: parquet happily
    * reinterprets int64 micros as nanos and every timestamp silently
    * collapses 1000×. So the schema is never assumed — it is read from
    * the files already present (batch footer read; at least one file
    * must exist when the stream is defined, which every caller
    * guarantees by staging before starting). The ts normalization then
    * branches on the FOOTER dtype, exactly like the batch
    * [[graft.queries.Tables.events]]:
    * nanos-long → integer-truncate to micros; TIMESTAMP_NTZ → session
    * zone; TIMESTAMP → pass through. */
  def eventsStream(spark: SparkSession, dir: String,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(dir).schema
    require(fileSchema.fieldNames.contains("ts"),
      s"events stream dir $dir has no ts column: $fileSchema")
    val reader = spark.readStream.schema(fileSchema)
    // bound files per micro-batch when the caller needs a MULTI-batch
    // execution (the exactly-once replay entry splits its input so the
    // forced replay re-executes one batch, not the whole stream)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(dir)
    fileSchema("ts").dataType match {
      case LongType =>
        stream.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
      case TimestampNTZType => stream.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => stream
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other (expected " +
          "nanos-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  /** Hourly tumbling-window counts/sums per event type, 2h watermark
    * for late data. Output: (window_start, event_type, cnt, val). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("val"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("val"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast — the static side is planned once per
    * micro-batch; no state). */
  def enrichStream(events: DataFrame, dim: DataFrame, streamKey: String,
                   dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      events(streamKey) === dim(dimKey), "left_outer")

  /** Streaming exact-dedup: drops replayed event_ids arriving within
    * the watermark window — the streaming counterpart of
    * [[graft.operators.Dedup.exact]] (state pruned by event time, so
    * state size tracks the dedup window, not the stream's history). */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STREAM interval join: rows of `left` (carrying `lts`)
    * matched to rows of `right` (carrying `rts`) on `key`, with
    * `rts` in [lts, lts + gap]. Both sides are watermarked, so the
    * join state store evicts a buffered left row once the right
    * watermark passes lts + gap (and vice versa) — state size tracks
    * the interval, not stream history, which is what makes the
    * operator viable on an unbounded stream. Inner-join results emit
    * as soon as both matching rows have arrived (no watermark wait).
    *
    * `joinType` extends the operator to the outer modes
    * ("left_outer" / "right_outer" / "full_outer"): an unmatched
    * outer-side row is emitted null-padded only once the OTHER side's
    * watermark has passed the end of its interval — i.e. the state
    * store can prove no future match can arrive — so outer results
    * trail the watermark by design (drive the stream past the row's
    * interval, e.g. with later data, before expecting its null row).
    *
    * Input frames must carry DISJOINT column names (rename first) —
    * the join condition resolves per side, but a shared name would
    * make the joined output ambiguous for every downstream select. */
  def intervalJoin(left: DataFrame, right: DataFrame, lkey: String,
                   rkey: String, lts: String, rts: String,
                   gap: String = "30 minutes",
                   joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"intervalJoin requires disjoint column names; overlapping: ${overlap.mkString(", ")}")
    val l = left.withWatermark(lts, "2 hours")
    val r = right.withWatermark(rts, "2 hours")
    l.join(r, l(lkey) === r(rkey) &&
      r(rts) >= l(lts) && r(rts) <= l(lts) + expr(s"INTERVAL $gap"), joinType)
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Scd2Open(ver: Long, etype: String, from: Long, to: Long, n: Long)
  /** `lastVer`: tombstone carry — the final version number of a chain
    * finalized by timeout, kept (buf=Nil, open=None) for one more
    * horizon so a dormant entity resuming soon CONTINUES its version
    * numbering instead of silently restarting at 1. */
  case class Scd2State(buf: List[(Long, Long, String)], open: Option[Scd2Open],
                       lastVer: Long = 0L)
  case class Scd2Out(user_id: Long, ver: Long, event_type: String,
                     valid_from: Long, valid_to: Long, n_events: Long)

  /** Type-2 SCD interval build EXECUTED AS A STREAM — the streaming
    * counterpart of the batch `q_events_scd2` CDC-merge: per user,
    * consecutive same-state events collapse into validity intervals
    * (epoch-micro bounds), versions numbered in event-time order.
    *
    * State discipline (the 100 TB story): events are buffered ONLY
    * until the watermark passes them — each invocation folds the
    * ready prefix (ts strictly below the watermark, sorted by
    * (ts, event_id)) into the carried open interval, emits intervals
    * CLOSED by a state change immediately, and keeps just the
    * still-ambiguous suffix plus the single open interval in state.
    * So state size tracks the lateness window and one interval per
    * active user — never user history. Ordering is safe because every
    * buffered-pending event has ts above the watermark and therefore
    * above every ready event.
    *
    * Completion contract: the event-time timeout fires only once the
    * watermark passes the entity's last event by the FINALIZATION
    * HORIZON (`finalizeAfterDays` of event time) — then the final
    * open interval is emitted and the state entry pruned. The horizon
    * is deliberately SEPARATE from (and much longer than) the
    * `lateness` watermark delay: lateness bounds out-of-ORDER
    * arrival, while finalization declares a DORMANT entity closed.
    * Conflating them (finalizing at the lateness bound) split any
    * entity quiet for more than the watermark delay mid-stream and
    * restarted its version chain — measured as exactly that split in
    * the cross-batch spec before the horizon existed. An entity
    * resuming after `finalizeAfterDays` of event-time silence starts
    * a fresh version chain BY CONTRACT (the dormant-entity
    * re-registration case); exact batch parity holds whenever
    * per-entity activity gaps stay below the horizon, which is how
    * the exact-match gate (and any bounded replay) drives it.
    *
    * Restart DETECTABILITY: finalization leaves a version-carrying
    * tombstone in state for one further horizon, so a chain that
    * resumes within it continues `ver` monotonically (its first new
    * interval has ver = lastVer + 1 — downstream consumers can tell a
    * restarted chain from a brand-new entity by ver > 1). Only after
    * a second horizon of silence is the tombstone pruned and the
    * numbering genuinely reset; state stays bounded either way. */
  def scd2(events: Dataset[Event], lateness: String = "2 hours",
           finalizeAfterDays: Int = 7): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness).as[Event].groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Scd2State]) =>
          def out(o: Scd2Open) = Scd2Out(userId, o.ver, o.etype, o.from, o.to, o.n)
          // fold (ts, event_id, type) rows, ascending, into the open
          // interval; a chain (re)started with no open interval numbers
          // from baseVer + 1 (baseVer > 0 only on a tombstone resume)
          def fold(sorted: Seq[(Long, Long, String)], open0: Option[Scd2Open],
                   baseVer: Long):
              (List[Scd2Out], Option[Scd2Open]) = {
            var open = open0
            var closed = List.empty[Scd2Out]
            sorted.foreach { case (t, _, typ) =>
              open = open match {
                case Some(o) if o.etype == typ => Some(o.copy(to = t, n = o.n + 1))
                case Some(o) => closed ::= out(o); Some(Scd2Open(o.ver + 1, typ, t, t, 1))
                case None => Some(Scd2Open(baseVer + 1, typ, t, t, 1))
              }
            }
            (closed.reverse, open)
          }
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(Scd2State(Nil, None))
            val (closed, open) = fold(st.buf.sortBy(r => (r._1, r._2)), st.open,
              st.lastVer)
            open match {
              case Some(o) =>
                // finalize the chain but leave a version-carrying
                // tombstone for one more horizon (restart detectability
                // — see the scaladoc contract); it holds no events, so
                // state stays O(1) per dormant entity and is pruned at
                // the next timeout below
                state.update(Scd2State(Nil, None, o.ver))
                state.setTimeoutTimestamp(scala.util.Try(
                  state.getCurrentWatermarkMs()).getOrElse(0L) +
                  finalizeAfterDays * 86400000L)
              case None =>
                state.remove() // tombstone (or empty state) expired
            }
            (closed ++ open.map(out).toList).iterator
          } else {
            val st = state.getOption.getOrElse(Scd2State(Nil, None))
            // exact epoch MICROS: getTime is millis (would zero the
            // sub-milli digits the batch twin's unix_micros keeps);
            // the sub-milli remainder lives in getNanos
            val incoming = rows.map(e =>
              (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000,
                e.event_id, e.event_type)).toList
            val wmMicros = scala.util.Try(state.getCurrentWatermarkMs())
              .getOrElse(0L) * 1000
            val buf = st.buf ++ incoming
            val (ready, pending) = buf.partition(_._1 < wmMicros)
            val (closed, open) = fold(ready.sortBy(r => (r._1, r._2)), st.open,
              st.lastVer)
            // once an interval is open its ver carries the numbering;
            // until then the tombstone's lastVer must survive the batch
            state.update(Scd2State(pending, open,
              if (open.isDefined) 0L else st.lastVer))
            // finalize only after the HORIZON of event-time silence
            // past the entity's last known activity (buffered or
            // already folded) — not merely past the lateness window
            val wmMs = wmMicros / 1000
            val lastSeenMs = math.max(
              pending.map(_._1).foldLeft(0L)(math.max) / 1000,
              open.map(_.to / 1000).getOrElse(0L))
            state.setTimeoutTimestamp(
              math.max(wmMs + 1, lastSeenMs + finalizeAfterDays * 86400000L))
            closed.iterator
          }
      }
  }
  case class AsofOut(event_id: Long, user_id: Long,
                     purchase_id: Option[Long], gap_sec: Option[Long])
  /** `purchases`: (tsMicros, purchase_id), sorted ascending — every
    * purchase at/above the watermark plus the single latest one below
    * it (older ones are dominated for every future left row).
    * `pending`: left rows (tsMicros, event_id) whose ts the watermark
    * has not passed. `lastSeen`: max event time observed, for the
    * dormancy horizon. */
  case class AsofState(purchases: List[(Long, Long)],
                       pending: List[(Long, Long)], lastSeen: Long)

  /** STREAM-STREAM as-of enrichment: every non-purchase event is
    * joined to the user's latest purchase with `purchase_ts <= ts`
    * (inclusive, matching the batch union+window operator and DuckDB
    * ASOF) — the streaming counterpart of the batch `q_asof_join`
    * family, same output row shape (event_id, user_id, purchase_id,
    * gap_sec), purchases deduplicated per (user, ts) by max event_id
    * exactly like the batch pre-aggregation.
    *
    * State discipline (the 100 TB story): a left row is held ONLY
    * until the watermark passes its event time — at that point every
    * purchase that could match it (purchase_ts <= ts < watermark) is
    * guaranteed to have arrived, so the emission is exact, never
    * revised. Purchases below the watermark are pruned to the single
    * latest one (it dominates older ones for every future left row,
    * whose ts is >= the watermark), so per-user state is the lateness
    * window of pending rows plus O(1) purchase history — never the
    * stream's history. A user silent past `dormantAfterDays` of event
    * time has the entry dropped entirely (a later left row then
    * enriches as purchase-less BY CONTRACT, like scd2's dormant
    * re-registration); exactness vs the batch oracle holds whenever
    * per-user gaps stay under the horizon, which is how the gate
    * drives it. */
  def asofEnrich(events: Dataset[Event], lateness: String = "2 hours",
                 dormantAfterDays: Int = 30): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness).as[Event].groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[AsofState]) =>
          // exact epoch micros (getTime is millis; sub-milli lives in getNanos)
          def micros(e: Event) = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
          val wmMicros = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(0L) * 1000
          val st = state.getOption.getOrElse(AsofState(Nil, Nil, 0L))
          val (pRows, lRows) = rows.toList.partition(_.event_type == "purchase")
          val purchases = (st.purchases ++ pRows.map(e => (micros(e), e.event_id)))
            .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).max) }
            .toList.sorted
          val buf = st.pending ++ lRows.map(e => (micros(e), e.event_id))
          val (ready, pending) = buf.partition(_._1 < wmMicros)
          val out = ready.sorted.map { case (lt, eid) =>
            val m = purchases.takeWhile(_._1 <= lt).lastOption
            AsofOut(eid, userId, m.map(_._2),
              m.map(p => Math.floorDiv(lt, 1000000L) - Math.floorDiv(p._1, 1000000L)))
          }
          val (below, above) = purchases.partition(_._1 < wmMicros)
          val kept = below.lastOption.toList ++ above
          val lastSeen = (st.lastSeen :: kept.map(_._1) ::: pending.map(_._1)).max
          val horizonUs = dormantAfterDays * 86400000000L
          if (pending.isEmpty && wmMicros > 0 && lastSeen + horizonUs < wmMicros) {
            state.remove() // dormant past the horizon: drop the entry
          } else {
            state.update(AsofState(kept, pending, lastSeen))
            val wmMs = wmMicros / 1000
            // pending rows emit as soon as the watermark moves again;
            // an idle entry waits out the dormancy horizon
            state.setTimeoutTimestamp(
              if (pending.nonEmpty) wmMs + 1
              else math.max(wmMs + 1, lastSeen / 1000 + dormantAfterDays * 86400000L))
          }
          out.iterator
      }
  }

  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /** Gap-based sessionization (30 min) with explicit state: emits a
    * session row when a later event closes the gap, or — on a stream
    * with a watermark — when the event-time timeout fires (which also
    * emits the user's final session and prunes the state entry, so
    * state size tracks *active* users). In batch mode timeouts never
    * fire, so only gap-closed sessions are emitted.
    * Late events that fall inside an open session's `[start-gap,
    * last+gap]` envelope extend it (start/last move monotonically
    * outward — a late event never drags `last` backwards).
    * The stateful counterpart of the batch `q_events_sessionize`. */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
                 lateness: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // event-time timeout needs a watermark (no-op in batch mode)
    events.withWatermark("ts", lateness).as[Event].groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          def emit(s: SessionState) = SessionOut(userId,
            new Timestamp(s.start * 1000), new Timestamp(s.last * 1000), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map(emit)
            state.remove()
            out.iterator
          } else {
            // Events within a micro-batch arrive unordered: sort, then fold.
            // State is head (the most recent open session) :: tail (older
            // late-opened sessions awaiting timeout) — an out-of-envelope
            // LATE event must NOT close/replace the open head (that would
            // split the head session across its own continuation).
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var sessions = state.getOption.getOrElse(Nil)
            var closed = List.empty[SessionOut]
            def intoTail(tail: List[SessionState], t: Long): List[SessionState] =
              tail.span(s => t < s.start - gapSec || t > s.last + gapSec) match {
                case (before, hit :: after) =>
                  before ::: hit.copy(start = math.min(hit.start, t),
                    last = math.max(hit.last, t), n = hit.n + 1) :: after
                case (all, Nil) => SessionState(t, t, 1) :: all
              }
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              sessions match {
                case cur :: rest if t >= cur.start - gapSec && t <= cur.last + gapSec =>
                  sessions = cur.copy(start = math.min(cur.start, t),
                    last = math.max(cur.last, t), n = cur.n + 1) :: rest
                case cur :: rest if t > cur.last + gapSec =>  // forward gap: close head
                  closed ::= emit(cur)
                  sessions = SessionState(t, t, 1) :: rest
                case cur :: rest =>                           // late: park in tail
                  sessions = cur :: intoTail(rest, t)
                case Nil =>
                  sessions = SessionState(t, t, 1) :: Nil
              }
            }
            // Late events can bridge two parked sessions (or a parked one
            // and the head) — coalesce any sessions whose gap-envelopes
            // now touch, else we'd emit two overlapping sessions where
            // batch sessionization produces one. Sessions are disjoint
            // after merging, so descending-start order puts the most
            // recent back at the head (the fold builds exactly that).
            sessions = sessions.sortBy(_.start)
              .foldLeft(List.empty[SessionState]) {
                case (prev :: rest, s) if s.start - prev.last <= gapSec =>
                  prev.copy(start = math.min(prev.start, s.start),
                    last = math.max(prev.last, s.last), n = prev.n + s.n) :: rest
                case (acc, s) => s :: acc
              }
            // sessions already closable relative to the watermark are
            // emitted NOW (setting their timeout would throw: it must be
            // strictly later than the watermark); the rest wait for it.
            val wmSec = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L) / 1000
            val (expired, open) = sessions.partition(s => s.last + gapSec <= wmSec)
            closed = expired.map(emit) ::: closed
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              state.setTimeoutTimestamp((open.map(_.last).max + gapSec) * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Exactly-once SINK pattern (r12 VERDICT item 7): Structured
    * Streaming guarantees every micro-batch a batchId that is STABLE
    * across failure and replay, so a foreachBatch sink that writes
    * batch b under a b-keyed location with overwrite semantics is
    * idempotent — a replayed batch replaces its own earlier (possibly
    * partial) output instead of appending a duplicate. This is the
    * standard foreachBatch exactly-once recipe from the Structured
    * Streaming guide, made concrete: one `batch_id=<b>` partition
    * directory per micro-batch; read the root back with partition
    * discovery. `counter` (optional) records invocations so a spec
    * can prove a replay actually re-executed the batch. */
  def idempotentBatchWrite(outDir: String,
      counter: Option[java.util.concurrent.atomic.AtomicInteger] = None)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    counter.foreach(_.incrementAndGet())
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** Force a REPLAY of the newest committed micro-batch: deleting the
    * latest commit-log entry re-opens exactly the
    * wrote-but-never-committed window a sink crash leaves behind; on
    * restart from the same checkpoint the engine re-executes that
    * batch — same offsets, same batchId. The idempotent sink must
    * absorb it; an append sink would double it. */
  def forceReplayOfLastBatch(checkpointDir: String): Unit = {
    val commits = new java.io.File(checkpointDir, "commits")
    val entries = Option(commits.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.nonEmpty && f.getName.forall(_.isDigit))
    require(entries.nonEmpty, s"no commit-log entries under $commits to replay")
    val last = entries.maxBy(_.getName.toLong)
    require(last.delete(), s"could not remove commit entry $last")
    // the local-FS checksum sibling must go WITH the entry: a stale
    // .N.crc makes the replayed commit's rename fail and Spark reports
    // it as a concurrent-modification of the checkpoint
    new java.io.File(commits, s".${last.getName}.crc").delete()
  }
}
