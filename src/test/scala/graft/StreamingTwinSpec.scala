package graft

import graft.queries.Events
import graft.streaming.Twins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming twins produce the same aggregates as the
  * declared batch forms (SURVEY §2.10: twins are test-only — a
  * streaming sink can't be hash-compared by Verify). */
class StreamingTwinSpec extends SparkSpecBase {

  private def runToTable(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  private def diff(a: DataFrame, b: DataFrame): Long =
    a.except(b).count() + b.except(a).count()

  test("streaming tumbling twin matches batch q_tumbling_window") {
    val stream = runToTable(Twins.tumbling(spark, sf), "t_tumbling")
    val batch = Events.q_tumbling_window(spark, sf)
    assert(diff(stream, batch.orderBy()) == 0)
  }

  test("streaming sliding twin matches batch q_sliding_window") {
    val stream = runToTable(Twins.sliding(spark, sf), "t_sliding")
    val batch = Events.q_sliding_window(spark, sf)
    assert(diff(stream, batch.orderBy()) == 0)
  }

  test("streaming session twin: per-user session counts match batch") {
    import org.apache.spark.sql.functions._
    val stream = runToTable(Twins.session(spark, sf), "t_session")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val batch = Events.q_session_window(spark, sf)
      .select(col("user_id"), col("n_sessions"))
    assert(diff(stream, batch) == 0)
  }

  test("flatMapGroupsWithState: custom per-user running count (§2.11 state API)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val sch = Tables.events(spark, sf).schema
    val src = spark.readStream.schema(sch).parquet(s"$sf/events.parquet*")
      .select(col("user_id").as[Long])
    val counted = src.groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "n_events")
    val q = counted.writeStream.format("memory").queryName("t_fmgws")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("t_fmgws")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(diff(got, want) == 0)
  }
}
