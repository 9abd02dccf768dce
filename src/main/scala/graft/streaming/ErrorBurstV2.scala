package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The [[ErrorBurst]] detector re-expressed on Spark 4's
  * `transformWithState` — the current arbitrary-state API (typed per-key
  * state variables with native TTL eviction, RocksDB-backed stores,
  * timers). Kept ALONGSIDE the `flatMapGroupsWithState` original so both
  * stateful APIs are exercised against the same semantics:
  * StateAndStoreSpec drives identical input through both and asserts equal
  * alerts.
  *
  * Differences from the legacy API worth the duplication:
  *  - state eviction is declarative ([[TTLConfig]]) instead of manual
  *    timeout bookkeeping inside the update function;
  *  - state is a named, typed handle (`getValueState`) — a processor can
  *    hold several independently-TTL'd variables;
  *  - requires the RocksDB state store provider, which is also the store
  *    you want at 100 TB/day (bounded JVM heap, incremental checkpoints).
  *
  * State per key remains O(1): a counter + first-error timestamp.
  */
object ErrorBurstV2 {
  import ErrorBurst.{Alert, BurstState, Doc}

  /** Same contract as [[ErrorBurst.detect]]'s update loop: one alert per
    * error at-or-beyond `threshold` consecutive errors; a non-error doc
    * resets the streak; batch rows process in event-time order through a
    * bounded buffer (overflow drops the tail and conservatively resets).
    */
  private class BurstProcessor(threshold: Int, ttl: TTLConfig,
                               maxBatchBuffer: Int)
      extends StatefulProcessor[String, Doc, Alert] {
    @transient private var state: ValueState[BurstState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BurstState]("burst",
        Encoders.product[BurstState], ttl)

    override def handleInputRows(key: String, rows: Iterator[Doc],
                                 timers: TimerValues): Iterator[Alert] = {
      var st = if (state.exists()) state.get() else BurstState(0, 0L)
      val alerts = Seq.newBuilder[Alert]
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
              alerts += Alert(key, next.consecutiveErrors, next.sinceMs,
                d.event_ms)
            next
          } else BurstState(0, 0L)
      }
      if (overflowed) st = BurstState(0, 0L)
      state.update(st)
      alerts.result().iterator
    }
  }

  /** Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState's only supported store).
    *
    * A TTL'd state variable is only legal under processing-time semantics,
    * so the time mode follows the `stateTtl` choice (Spark rejects a
    * non-NONE TTLConfig under TimeMode.None at query start).
    */
  def detect(docs: Dataset[Doc], threshold: Int = 3,
             stateTtl: Option[java.time.Duration] = None,
             maxBatchBuffer: Int = 100000): Dataset[Alert] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ttl = stateTtl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val timeMode =
      if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs.groupByKey(_.function_name)
      .transformWithState(new BurstProcessor(threshold, ttl, maxBatchBuffer),
        timeMode, OutputMode.Append())
  }
}
