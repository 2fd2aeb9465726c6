package graft

import graft.queries.Events
import org.apache.spark.sql.functions._

/** §2.10 batch event-window tests: micro-fixture session semantics and
  * the sliding≡tumbling property at slide=width (SURVEY §5.3). */
class EventsSpec extends SparkSpecBase {
  import spark.implicits._

  test("session micro-fixture: 10-min gaps merge, >30-min gap splits") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ev").toString
    val t0 = 1704067200L * 1000000000L // 2024-01-01 epoch-ns
    val min = 60L * 1000000000L
    // user 1: t0, t0+10min (same session), t0+50min (gap 40min -> new);
    // user 2: single event
    Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, t0 + 10 * min, 1L, "view", 1.0, "{}"),
      (3L, t0 + 50 * min, 1L, "view", 1.0, "{}"),
      (4L, t0, 2L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q_session_window(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 1: 2 sessions, lengths 600s and 0s -> avg 300s
    assert(got(1L) == ((2L, 300.0)))
    // user 2: 1 session of length 0
    assert(got(2L) == ((1L, 0.0)))
  }

  test("funnel micro-fixture: order matters, hours scope, stages count") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ev_funnel").toString
    val t0 = 1704067200L * 1000000000L // 2024-01-01 epoch-ns, hour-aligned
    val min = 60L * 1000000000L
    // user 1 hour 0: view->click->purchase in order   -> stage 3
    // user 2 hour 0: purchase->click->view (reversed) -> stage 1 (view only)
    // user 3 hour 0: click->view->click               -> stage 2 (view then click)
    // user 4 hour 0: error,signup                     -> stage 0
    // user 1 hour 1: view->purchase (no click between)-> stage 1
    Seq(
      (1L, t0 + 1 * min, 1L, "view"), (2L, t0 + 2 * min, 1L, "click"),
      (3L, t0 + 3 * min, 1L, "purchase"),
      (4L, t0 + 1 * min, 2L, "purchase"), (5L, t0 + 2 * min, 2L, "click"),
      (6L, t0 + 3 * min, 2L, "view"),
      (7L, t0 + 1 * min, 3L, "click"), (8L, t0 + 2 * min, 3L, "view"),
      (9L, t0 + 3 * min, 3L, "click"),
      (10L, t0 + 1 * min, 4L, "error"), (11L, t0 + 2 * min, 4L, "signup"),
      (12L, t0 + 70 * min, 1L, "view"), (13L, t0 + 71 * min, 1L, "purchase")
    ).map { case (id, ts, u, et) => (id, ts, u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q_funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("retention micro-fixture: cohorts anchor at first week, actives counted once") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ev_retention").toString
    val t0 = 1704067200L * 1000000000L
    val week = 7L * 86400L * 1000000000L
    // user 1 active weeks 0,1,2; user 2 active weeks 0,2 (twice in w2 —
    // distinct!); user 3 first appears week 1, active weeks 1,2
    Seq(
      (1L, t0, 1L), (2L, t0 + week, 1L), (3L, t0 + 2 * week, 1L),
      (4L, t0, 2L), (5L, t0 + 2 * week, 2L), (6L, t0 + 2 * week + 1L, 2L),
      (7L, t0 + week, 3L), (8L, t0 + 2 * week, 3L)
    ).map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q_retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = 1704067200L * 1000000L / 86400000000L / 7  // epoch-week of t0
    assert(got == Map(
      (w0, 0L) -> 2L, (w0, 1L) -> 1L, (w0, 2L) -> 2L,
      (w0 + 1, 0L) -> 1L, (w0 + 1, 1L) -> 1L))
  }

  test("gapfill micro-fixture: empty hours appear zero-filled for every type") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ev_gapfill").toString
    val t0 = 1704067200L * 1000000000L // hour-aligned epoch-ns
    val hr = 3600L * 1000000000L
    // events in hours 0 and 2 only; hour 1 must appear with n = 0;
    // type "view" active both hours, "click" only hour 0
    Seq(
      (1L, t0, 1L, "view"), (2L, t0 + 1L, 1L, "click"),
      (3L, t0 + 2 * hr, 2L, "view")
    ).map { case (id, ts, u, et) => (id, ts, u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q_gapfill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val h0 = t0 / 1000 / 3600000000L
    assert(got == Map(
      (h0, "view") -> 1L, (h0, "click") -> 1L,
      (h0 + 1, "view") -> 0L, (h0 + 1, "click") -> 0L,
      (h0 + 2, "view") -> 1L, (h0 + 2, "click") -> 0L))
  }

  test("tumbling buckets partition events: counts sum to table size") {
    val out = Events.q_tumbling_window(spark, sf)
      .agg(sum("n")).collect().head.getLong(0)
    assert(out == Tables.events(spark, sf).count())
  }

  test("sliding window: every event lands in exactly 4 windows") {
    val total = Events.q_sliding_window(spark, sf)
      .agg(sum("n")).collect().head.getLong(0)
    assert(total == 4 * Tables.events(spark, sf).count())
  }

  test("sliding at slide=width degenerates to tumbling (property)") {
    // reconstruct tumbling 15-min counts two ways on the real table
    val slot = Tables.events(spark, sf)
      .select((expr(s"${Tables.tsUsSql} div 900000000") * 900000000L).as("win_start"),
              col("event_type"))
      .groupBy("win_start", "event_type").agg(count(lit(1)).as("n"))
    // sliding-form with k=0 only (slide == width == 15 min)
    val slide = Tables.events(spark, sf)
      .select(expr(s"${Tables.tsUsSql} div 900000000").as("slot"), col("event_type"))
      .select((col("slot") * 900000000L).as("win_start"), col("event_type"))
      .groupBy("win_start", "event_type").agg(count(lit(1)).as("n"))
    assert(slot.except(slide).count() == 0 && slide.except(slot).count() == 0)
  }

  test("late data: ordering arrival stream by ts leaves nothing late") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("late").toString
    val t0 = 1704067200L * 1000000000L
    // event_ids ordered by ts => running max == own ts => never late
    Seq.tabulate(50)(i => (i.toLong, t0 + i * 60L * 1000000000L, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val late = Events.q_late_data(spark, dir)
      .agg(sum("n_late")).collect().head.getLong(0)
    assert(late == 0L)
  }

  test("late data: one 10-min-backdated arrival is counted") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("late2").toString
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, t0 + 30 * min, 1L, "view", 1.0, "{}"),
      (3L, t0 + 20 * min, 1L, "click", 1.0, "{}"), // 10 min behind max -> late
      (4L, t0 + 31 * min, 1L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val byType = Events.q_late_data(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("click") == 1L && byType("view") == 0L)
  }

  test("window-sum with unbounded frame equals group-sum (property)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val viaWindow = Tables.events(spark, sf)
      .select(col("event_type"), sum("value").over(w).as("s"))
      .distinct().orderBy("event_type")
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
    val viaGroup = Tables.events(spark, sf)
      .groupBy("event_type").agg(sum("value").as("s")).orderBy("event_type")
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
    assert(viaWindow.toSeq == viaGroup.toSeq)
  }

  test("scd2 micro-fixture: versions chain, non-purchase ignored, one open per key") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ev_scd2").toString
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // user 1: purchases at t0 / t0+10 / t0+50 (a view between must not
    // split an interval); user 2: single purchase -> immediately current
    Seq(
      (1L, t0, 1L, "purchase", 10.0), (2L, t0 + 5 * min, 1L, "view", 0.0),
      (3L, t0 + 10 * min, 1L, "purchase", 20.0),
      (4L, t0 + 50 * min, 1L, "purchase", 30.0),
      (5L, t0, 2L, "purchase", 7.0)
    ).map { case (id, ts, u, et, v) => (id, ts, u, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q_scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    val us0 = t0 / 1000
    val minUs = 60L * 1000000L
    assert(got.toSeq == Seq(
      (1L, 10.0, us0, us0 + 10 * minUs, 0),
      (1L, 20.0, us0 + 10 * minUs, us0 + 50 * minUs, 0),
      (1L, 30.0, us0 + 50 * minUs, -1L, 1),
      (2L, 7.0, us0, -1L, 1)))
  }

  test("scd2 on real data: intervals tile per user, exactly one current each") {
    val rows = Events.q_scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      // already sorted by (user, valid_from); closed intervals chain
      // exactly onto the next version's start, the single open one last
      vs.init.zip(vs.tail).foreach { case (a, b) =>
        assert(a._3 == b._2, s"user $u: valid_to ${a._3} != next valid_from ${b._2}")
      }
      assert(vs.count(_._4 == 1) == 1 && vs.last._4 == 1 && vs.last._3 == -1L)
      vs.filter(_._4 == 0).foreach(v => assert(v._2 < v._3))
    }
  }

  test("anomaly micro-fixture: 2σ flags the spike, degenerate groups emit none") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ev_anom").toString
    val t0 = 1704067200L * 1000000000L
    // 'click': nine 0.0s and one 100.0 -> sd=sqrt(1000)≈31.6, spike
    // z≈2.85 (flagged), zeros z≈0.32; 'view': constant (sd=0) -> none;
    // 'error': single row (sd NULL) -> none
    val rows =
      (1 to 9).map(i => (i.toLong, t0 + i * 1000000000L, 1L, "click", 0.0, "{}")) ++
      Seq((10L, t0 + 10 * 1000000000L, 1L, "click", 100.0, "{}"),
          (11L, t0, 2L, "view", 5.0, "{}"), (12L, t0 + 1000000000L, 2L, "view", 5.0, "{}"),
          (13L, t0, 3L, "error", 42.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q_anomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("click", 1L, 2.85)))
  }

  test("q_rolling_median: frame semantics — driver-computed quantiles per trailing window") {
    // robust-baseline contract: for every row, med5/iqr5 equal the
    // interpolated quantiles of that type's trailing <=5 dense-spine
    // counts, computed independently on the driver (rank p*(cnt-1),
    // linear interpolation — the definition both engines share)
    val rows = Events.q_rolling_median(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    def quantile(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val rank = p * (s.length - 1)
      val lo = rank.toInt
      val frac = rank - lo
      if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo).toDouble
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._2).foreach { case (_, tr) =>
      val series = tr.sortBy(_._1)
      series.indices.foreach { i =>
        val frame = series.slice(math.max(0, i - 4), i + 1).map(_._3)
        assert(series(i)._4 == r4(quantile(frame, 0.5)),
          s"med5 mismatch at ${series(i)}")
        assert(series(i)._5 == r4(quantile(frame, 0.75) - quantile(frame, 0.25)),
          s"iqr5 mismatch at ${series(i)}")
      }
    }
  }
}
