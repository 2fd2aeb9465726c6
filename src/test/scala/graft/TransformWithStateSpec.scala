package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4's new-generation arbitrary-state API (`transformWithState`
  * + `StatefulProcessor` + typed state variables) — the successor to
  * flatMapGroupsWithState. Demonstrated as a per-user running counter
  * (SURVEY §2.10/§2.11 custom-state surface). Requires the RocksDB
  * state store provider. */
/** Top-level (not nested in the spec): the processor is shipped to
  * tasks and must not capture the test class. */
private[graft] class RunningCountProcessor
  extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var count: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator((key, n))
  }
}

class TransformWithStateSpec extends SparkSpecBase {
  import spark.implicits._

  test("transformWithState keeps typed per-key state across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long)]
      val counted = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
      val q = counted.toDF("user", "n").writeStream
        .format("memory").queryName("tws").outputMode(OutputMode.Update()).start()
      try {
        input.addData((1L, 10L), (1L, 11L), (2L, 20L))
        q.processAllAvailable()
        input.addData((1L, 12L)) // state must survive into batch 2
        q.processAllAvailable()
        val rows = spark.table("tws").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows.contains((1L, 2L)) && rows.contains((2L, 1L)), rows.toString)
        assert(rows.contains((1L, 3L)), s"state lost across batches: $rows")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
