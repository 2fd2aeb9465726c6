package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** mapGroupsWithState with processing-time TIMERS (SURVEY §2.10: a
  * documented capability with unit tests only — the mechanism behind
  * session expiry / inactivity flushes in custom stateful operators).
  *
  * NB: `processAllAvailable` cannot be used as the sync point once
  * timers are registered — the engine then always has a runnable
  * timer-sweep batch and the call never returns. The test polls the
  * memory sink with a deadline instead.
  */
class StateTimerSpec extends SparkSpecBase {
  import spark.implicits._

  private def pollUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    while (System.currentTimeMillis() < end) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("processing-time timeout expires idle groups on a later batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user, value)
    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long, Boolean)](
        GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            (user, n, true) // flushed by TIMER, not by data
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            state.setTimeoutDuration("50 milliseconds")
            (user, n, false)
          }
      }
    val q = counted.toDF("user", "n", "timedOut").writeStream
      .format("memory").queryName("timers").outputMode(OutputMode.Update()).start()
    try {
      def rows() = spark.table("timers").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      input.addData((1L, 10L), (1L, 11L)) // user 1: 2 events
      assert(pollUntil(30000)(rows().contains((1L, 2L, false))), s"no data batch: ${rows()}")
      Thread.sleep(300)                   // let user 1's 50ms timer lapse
      input.addData((2L, 20L))            // keep the stream moving
      assert(pollUntil(30000)(rows().contains((1L, 2L, true))), s"timer never fired: ${rows()}")
      assert(pollUntil(30000)(rows().contains((2L, 1L, false))), s"batch-2 row missing: ${rows()}")
    } finally q.stop()
  }
}
