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

  test("online z-score: state survives batches, spike flagged, Welford equals batch stats") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Double)]
      val scored = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.OnlineZScoreProcessor(threshold = 3.0),
          TimeMode.None(), OutputMode.Update())
      val q = scored.toDF("k", "eid", "z", "flagged").writeStream
        .format("memory").queryName("zs").outputMode(OutputMode.Update()).start()
      try {
        // batch 1: values 1..9 build the baseline (none should flag —
        // z of 9 against mean-so-far stays small)
        input.addData((1 to 9).map(i => ("click", i.toLong, i.toDouble)): _*)
        q.processAllAvailable()
        // batch 2: the spike is scored against batch-1 state (mean 5,
        // sd sqrt(60/8)≈2.74 → z≈34.7) — state crossed the batch gap
        input.addData(("click", 10L, 100.0))
        q.processAllAvailable()
        val rows = spark.table("zs").collect()
          .map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
        assert(rows.count { case (_, (_, f)) => f == 1 } == 1)
        assert(rows(10L)._2 == 1 && math.abs(rows(10L)._1 - 34.7) < 0.1,
          s"spike not flagged against prior-batch state: $rows")
        // batch 3: a normal value scored against stats INCLUDING the
        // spike — Welford state must equal the exact batch stats of
        // values (1..9, 100): mean 14.5, stddev_samp of the 10 values
        input.addData(("click", 11L, 14.5))
        q.processAllAvailable()
        val vs = (1 to 9).map(_.toDouble) :+ 100.0
        val mean = vs.sum / vs.size
        val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (vs.size - 1))
        val z11 = spark.table("zs").collect().find(_.getLong(1) == 11L).get.getDouble(2)
        assert(math.abs(z11 - (14.5 - mean) / sd) < 1e-9,
          s"online state diverged from exact batch stats: z=$z11")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("online EWMA: recurrence matches the batch fold exactly across batch boundaries") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Double)]
      val smoothed = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.OnlineEwmaProcessor(alpha = 0.25),
          TimeMode.None(), OutputMode.Update())
      val q = smoothed.toDF("k", "eid", "s").writeStream
        .format("memory").queryName("ews").outputMode(OutputMode.Update()).start()
      try {
        // the series splits across two batches — state must carry s
        input.addData(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 7.0))
        q.processAllAvailable()
        input.addData(("a", 3L, 40.0))
        q.processAllAvailable()
        val got = spark.table("ews").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
        // the exact batch recurrence: s1=10, s2=.25*20+.75*10=12.5,
        // s3=.25*40+.75*12.5=19.375; key b: single 7
        assert(got == Map(("a", 1L) -> 10.0, ("a", 2L) -> 12.5,
                          ("a", 3L) -> 19.375, ("b", 1L) -> 7.0), got.toString)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
