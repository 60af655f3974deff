package graft.streaming

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half of [[graft.pipeline.Events]]: gap-based sessionization as
  * a STATEFUL streaming operator (`flatMapGroupsWithState` with event-time
  * timeout) instead of the batch window-function form. A session closes when
  * the event-time watermark passes `last event + gap` — the standard way to
  * get batch-identical sessions out of an unbounded stream without keeping
  * unbounded state.
  *
  * Parity contract (tested): on in-order input, the emitted closed sessions
  * are exactly the batch `Events.sessions` rows — same strict-gap predicate
  * (`t − prev > gap` in integer microseconds), same (n_events, sum_value,
  * start_ts) values. Out-of-order events WITHIN a batch are sorted before
  * folding; events later than the watermark horizon are the batch pass's
  * job (same honest split as [[DocStream.dedupExact]]).
  *
  * 100 TB design: state is ONE open session record per active user —
  * bounded by concurrent-user count, not event count — sharded by the state
  * store; each micro-batch touches only users with arrivals or timeouts.
  */
object EventStream {

  /** Open-session state: fold of the events seen so far. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sumValue: Double)

  /** A closed session, batch-schema-compatible (user_id, n_events,
    * sum_value, start_ts).
    */
  case class ClosedSession(user_id: Long, n_events: Long, sum_value: Double,
                           start_ts: String)

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  private def fmt(us: Long): String =
    TsFmt.format(java.time.Instant.ofEpochMilli(us / 1000L))

  private def close(s: OpenSession, uid: Long): ClosedSession =
    ClosedSession(uid, s.n,
      BigDecimal(s.sumValue).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      fmt(s.startUs))

  /** Closed sessions for an event stream (user_id, ts, value, ...). Emits a
    * session once the watermark passes its last event + gap; the open tail
    * session of each user stays in state until then.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
               lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      // cast BEFORE the watermark — a cast afterwards would mint a fresh
      // column without the event-time tag and break EventTimeTimeout
      .select(col("user_id").cast("long").as("uid"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("v"))
      .withWatermark("ts", lateness)
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val out = state.getOption.map(close(_, uid)).toSeq
            state.remove()
            out.iterator
          } else {
            // fold this batch's arrivals in event-time order; strict-gap
            // predicate identical to the batch operator
            val evs = rows.map(r => (r._2.getTime * 1000L, r._3)).toSeq.sortBy(_._1)
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            for ((t, v) <- evs) cur match {
              case Some(s) if t - s.lastUs > gapUs =>
                closed += close(s, uid)
                cur = Some(OpenSession(t, t, 1L, v))
              case Some(s) =>
                cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1,
                  sumValue = s.sumValue + v))
              case None =>
                cur = Some(OpenSession(t, t, 1L, v))
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last + gap (ms precision —
              // the GroupState timeout clock)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }
}
