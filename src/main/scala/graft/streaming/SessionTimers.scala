package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One finalized session per (user, inactivity island). */
case class TimedSession(userId: Long, sessionStart: Long,
    sessionEnd: Long, nEvents: Long)

/** EVENT-TIME-TIMER sessionization on `transformWithState` — the
  * timer half of the arbitrary-stateful-processing v2 API
  * ([[FingerprintDedupProcessor]] covers the TTL half): each key
  * buffers its event times in ListState and keeps ONE registered
  * event-time timer at (max buffered time + gap); when the watermark
  * passes it, no in-order event can extend any buffered session
  * (later events would have re-registered the timer), so the expiry
  * callback sorts the buffer, splits it into gap-islands, emits every
  * session FINAL (Append semantics, no reconcile), and clears the
  * key's state — state size tracks OPEN sessions only, the bounded
  * shape an unbounded 100 TB clickstream needs. session_end follows
  * the engine's session_window convention (last event + gap), so the
  * emitted set replays as batch gaps-and-islands in the oracle.
  *
  * vs c9's engine-native `session_window`: same semantics, but the
  * session logic is user code — the pattern to reach for when the
  * window rule ISN'T expressible declaratively (e.g. caps on session
  * length, per-key gaps), demonstrated on the rule where an exact
  * batch oracle exists. */
class SessionTimerProcessor(gapS: Long)
    extends StatefulProcessor[Long, (Long, Long), TimedSession] {

  @transient private var buf: ListState[Long] = _
  @transient private var deadline: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Long]("events", Encoders.scalaLong,
      TTLConfig.NONE)
    deadline = getHandle.getValueState[Long]("deadline", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[TimedSession] = {
    var maxT = if (deadline.exists()) deadline.get() - gapS else Long.MinValue
    rows.foreach { case (_, t) =>
      buf.appendValue(t)
      if (t > maxT) maxT = t
    }
    val newDeadline = maxT + gapS
    if (deadline.exists() && deadline.get() != newDeadline)
      getHandle.deleteTimer(deadline.get() * 1000L)
    if (!deadline.exists() || deadline.get() != newDeadline) {
      getHandle.registerTimer(newDeadline * 1000L)
      deadline.update(newDeadline)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[TimedSession] = {
    // watermark >= (max buffered time + gap): every buffered event's
    // session is closed; sort (micro-batches deliver a key's rows
    // unordered) and split into gap-islands
    val ts = buf.get().toArray.sorted
    buf.clear()
    deadline.clear()
    if (ts.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[TimedSession]
      var start = ts(0)
      var prev = ts(0)
      var n = 1L
      var i = 1
      while (i < ts.length) {
        val t = ts(i)
        if (t - prev > gapS) { // strict >: touching events merge
          out += TimedSession(key, start, prev + gapS, n)
          start = t
          n = 0L
        }
        n += 1
        prev = t
        i += 1
      }
      out += TimedSession(key, start, prev + gapS, n)
      out.iterator
    }
  }
}

object SessionTimers {
  /** (user_id, t_epoch_s) stream (event-time watermark REQUIRED on the
    * timestamp the seconds derive from) → finalized gap-sessions. */
  def sessions(events: Dataset[(Long, Long)],
      gapS: Long): Dataset[TimedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapS),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
