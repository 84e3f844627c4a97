package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom stateful streaming (SURVEY.md §2.10): per-user sessionization via
 * `flatMapGroupsWithState` — the arbitrary-state API for semantics that
 * `session_window` can't express (here: session closed by an explicit
 * terminal event OR an inactivity gap, with per-session running stats).
 *
 * State is one small struct per active user key, bounded by event-time
 * timeout — the streaming analogue of the reference's size-bounded
 * incremental buffering (`reader-writer2.cc:74-93`).
 */
object StatefulSessions {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double, closed_by: String)

  val GapMs: Long = 30 * 60 * 1000L

  /** Emits a session row whenever a user's session closes (terminal "error"
    * event or >30 min gap); keeps an open-session struct otherwise. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.nEvents, s.totalValue, "timeout"))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen > GapMs =>
                  out += SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.nEvents, s.totalValue, "gap")
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, t, s.nEvents + 1, s.totalValue + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
              if (e.event_type == "error") {          // terminal event closes the session
                val s = cur.get
                out += SessionOut(userId, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(t), s.nEvents, s.totalValue, "terminal")
                cur = None
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastSeen + GapMs)
              case None => if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }

  /** Typed view of the events stream/batch for sessionization. */
  def asEvents(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select("event_id", "ts", "user_id", "event_type", "value").as[Event]
  }
}
