package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming (SURVEY.md §2.2 streaming row, "custom
  * state"): a per-function consecutive-error burst detector via
  * `flatMapGroupsWithState` — the operator class the reference's stateless
  * pipeline can't express at all.
  *
  * State per key is O(1) (a counter + last timestamp), evicted by processing
  * -time timeout — bounded state no matter how many functions exist, which
  * is the property that matters at 100 TB/day of logs.
  */
object ErrorBurst {

  case class Doc(function_name: String, severity: String, event_ms: Long)
  case class BurstState(consecutiveErrors: Int, sinceMs: Long)
  case class Alert(function_name: String, consecutiveErrors: Int,
                   sinceMs: Long, untilMs: Long)

  /** Emit an Alert whenever a function logs `threshold` or more errors in a
    * row (one alert per new error beyond the threshold; a non-error doc
    * resets the streak).
    *
    * `stateTimeout`: Some(duration) enables processing-time state eviction
    * for idle keys (bounded state under key churn). Note that with a
    * processing-time timeout the engine schedules timeout-check batches
    * continuously, so `processAllAvailable` never quiesces — use it with a
    * real trigger interval in production, None in synchronous tests.
    *
    * `maxBatchBuffer` bounds per-key memory: event-time ordering within a
    * micro-batch needs a sort buffer, and a hot key under a long trigger
    * interval would otherwise materialize the whole group (the round-1
    * unbounded buffer). A bounded heap keeps the EARLIEST `maxBatchBuffer`
    * rows; on overflow the tail is dropped from streak tracking and the
    * carried streak resets — conservative (alerts may be missed for the
    * overflowing batch, never fabricated), and the alert gap is bounded by
    * one trigger interval.
    */
  def detect(docs: Dataset[Doc], threshold: Int = 3,
             stateTimeout: Option[String] = None,
             maxBatchBuffer: Int = 100000): Dataset[Alert] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def update(key: String, rows: Iterator[Doc],
               state: GroupState[BurstState]): Iterator[Alert] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(BurstState(0, 0L))
      val alerts = Seq.newBuilder[Alert]
      // bounded min-buffer: max-heap of the smallest `maxBatchBuffer`
      // event times — O(cap) memory however large the group is
      val heap = scala.collection.mutable.PriorityQueue.empty[Doc](
        Ordering.by(_.event_ms))
      var overflowed = false
      rows.foreach { d =>
        heap.enqueue(d)
        if (heap.size > maxBatchBuffer) { heap.dequeue(); overflowed = true }
      }
      heap.dequeueAll.reverseIterator.foreach { (d: Doc) =>
        st =
          if (d.severity == "error") {
            val next = BurstState(st.consecutiveErrors + 1,
              if (st.consecutiveErrors == 0) d.event_ms else st.sinceMs)
            if (next.consecutiveErrors >= threshold)
              alerts += Alert(key, next.consecutiveErrors, next.sinceMs, d.event_ms)
            next
          } else BurstState(0, 0L)
      }
      if (overflowed) st = BurstState(0, 0L)
      state.update(st)
      stateTimeout.foreach(state.setTimeoutDuration)
      alerts.result().iterator
    }

    docs.groupByKey(_.function_name)
      .flatMapGroupsWithState(OutputMode.Append,
        stateTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
          .getOrElse(GroupStateTimeout.NoTimeout))(update)
  }
}
