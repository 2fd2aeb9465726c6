package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming twins of the §2.10 batch event-window queries
  * (SURVEY.md §2.10). These are demonstrated in StreamingTwinSpec only:
  * a streaming sink can't be hash-compared by the Verify harness, so
  * the batch forms in [[graft.queries.Events]] are the declared
  * contract and these prove the same logic runs as
  * `readStream → watermark → window → sink`.
  *
  * Event time: `ts` is TIMESTAMP_NTZ at µs precision; the NTZ→LTZ
  * cast (session timezone pinned UTC) yields the event-time column
  * watermarking needs, at exactly the µs granularity the batch forms
  * bucket on.
  */
object Twins {

  private def src(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.events(spark, sfDir).schema
    // The path must be a GLOB: for a plain path FileStreamSource pins
    // option basePath to the path itself, which for a single .parquet
    // file fails "Option 'basePath' must be a directory".
    spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet*")
      .select(expr("cast(ts as timestamp)").as("etime"),
              col("user_id"), col("event_type"), col("value"))
  }

  /** Twin of q_tumbling_window: 1h tumbling window + 1h watermark.
    * Output is mapped back to the batch query's (hour_bucket,
    * event_type, n, sum_value) shape for direct comparison. */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame =
    src(spark, sfDir)
      .withWatermark("etime", "1 hour")
      .groupBy(window(col("etime"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(expr("unix_micros(window.start) div 3600000000").as("hour_bucket"),
              col("event_type"), col("n"), col("sum_value"))

  /** Twin of q_sliding_window: 1h window sliding every 15 min. */
  def sliding(spark: SparkSession, sfDir: String): DataFrame =
    src(spark, sfDir)
      .withWatermark("etime", "1 hour")
      .groupBy(window(col("etime"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start"),
              col("event_type"), col("n"))

  /** Twin of q_session_window: built-in session_window with a 30-min
    * gap — one row per (user, session). A single stateful aggregation
    * (chaining a second agg over it is restricted in streaming); the
    * test rolls sessions up to per-user counts after the sink. The
    * custom-state alternative is flatMapGroupsWithState;
    * session_window is the declarative form. */
  def session(spark: SparkSession, sfDir: String): DataFrame =
    src(spark, sfDir)
      .withWatermark("etime", "2 hours")
      .groupBy(session_window(col("etime"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("sess_start"),
              col("n_events"))

  private def srcWithId(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.events(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet*")
      .select(expr("cast(ts as timestamp)").as("etime"),
              col("event_id"), col("user_id"), col("event_type"))
  }

  /** Stream-stream INTERVAL join — the streaming twin of
    * q_range_join: purchases joined to clicks within ±10 s of event
    * time. A streaming join REQUIRES an equality predicate, so this
    * reuses the batch query's decomposition verbatim: clicks exploded
    * to their 3 adjacent 10-s cells, equi-join on the cell, residual
    * |Δt| ≤ 10 s filter (each pair meets in exactly one exploded
    * cell). Both sides carry a watermark and the join adds event-time
    * range bounds, so the state store evicts rows once the watermark
    * passes — the non-negotiable requirement for an unbounded
    * stream-stream join. Emits one row per qualifying pair. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val purchases = srcWithId(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("etime").as("p_time"),
              expr("unix_micros(etime) div 10000000").as("cell"))
      .withWatermark("p_time", "30 seconds")
    val clicks = srcWithId(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("etime").as("c_time"),
              explode(array(lit(-1L), lit(0L), lit(1L)))
                .as("off"))
      .select(col("c_id"), col("c_time"),
              (expr("unix_micros(c_time) div 10000000") + col("off")).as("cell"))
      .withWatermark("c_time", "30 seconds")
    purchases.join(clicks,
      purchases("cell") === clicks("cell") &&
      col("c_time") >= col("p_time") - expr("INTERVAL 10 SECONDS") &&
      col("c_time") <= col("p_time") + expr("INTERVAL 10 SECONDS"))
      .select(col("p_id"), col("c_id"))
  }

  /** Streaming AS-OF join — the streaming twin of q_asof_join /
    * AsOfJoinExec, via Spark 4's `transformWithState`: ONE long of
    * per-user state (the latest click time — exactly the O(1) merge
    * state of the batch operator) keyed by user. Each batch's rows for
    * a user are folded in (us, event_id) order, so within a batch the
    * semantics equal q_asof_join's ROWS frame; across batches the
    * state carries forward, which is exact as long as batches respect
    * per-key event-time order (true for AvailableNow file replay; a
    * production out-of-order stream would add a watermark-buffered
    * reorder in front, like the interval-join twin's bounds). */
  def asof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val schema = Tables.events(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet*")
      .select(col("user_id"), col("event_id"),
              expr(Tables.tsUsSql).as("us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new AsOfStateProcessor, TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "event_id", "gap_us")
  }

  /** Streaming DEDUP — the streaming face of the §2.9 dedup family:
    * dropDuplicatesWithinWatermark on the event id keeps exactly the
    * first arrival of each id while the watermark lets state for old
    * ids expire (a plain dropDuplicates would hold every id forever —
    * unbounded state at 100 TB/day). */
  def dedup(spark: SparkSession, sfDir: String): DataFrame =
    srcWithId(spark, sfDir)
      .withWatermark("etime", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming MAINTENANCE of the shared gram-df statistic — the
    * online face of q_gramdf_merge's batch merge argument: document
    * frequency is a SUM, so a streaming aggregation over the exploded
    * distinct word-3-grams of a document stream maintains (gram, gdf)
    * incrementally across micro-batches, and at any point where the
    * stream has fully arrived the state IS the batch
    * [[graft.Graft.gramDocFreq]] table (asserted exactly in
    * StreamingTwinSpec). This is how the per-sfDir gram-df artifact
    * would stay fresh under continuous crawl ingest: no recompute
    * over the existing corpus, ever. The same explode + count shape
    * as the batch build, so partial aggregation combines map-side
    * within every micro-batch before touching the state store. */
  def gramDf(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.documents(spark, sfDir).schema
    val t = split(col("text"), " ")
    spark.readStream.schema(schema).parquet(s"$sfDir/documents.parquet*")
      .filter(size(t) >= 3)
      .select(explode(array_distinct(
        graft.functions.TokenNGrams.ngrams(t, 3))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
  }

  /** Streaming face of q_phrase_search's positional probe (round
    * 16) — the "standing index artifact" claim made live: when the
    * probe phrase is a known constant (as in deployment — the batch
    * query self-derives it only for determinism), per-doc adjacency
    * hits are ROW-LOCAL (a zip-with-shift over the token array; no
    * postings join at all), and the per-source rollup is a pair of
    * mergeable SUMs — so a plain streaming aggregation maintains
    * (source, n_docs, n_hits) incrementally across micro-batches,
    * combining map-side within every batch before touching the
    * state store. After full arrival the state equals the batch
    * [[graft.queries.PipelineOps.q_phrase_search]] output for that
    * phrase under ANY batch split (each doc arrives exactly once, so
    * the hits>0 indicator sums to the distinct-doc count) — asserted
    * exactly in StreamingTwinSpec. Zero-hit sources emit no row, the
    * batch contract. */
  def phraseHits(spark: SparkSession, sfDir: String,
                 w1: String, w2: String): DataFrame = {
    val schema = Tables.documents(spark, sfDir).schema
    val t = split(col("text"), " ")
    val h = size(filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
               (a, b) => a === lit(w1) && b === lit(w2)),
      x => x)).cast("long")
    spark.readStream.schema(schema).parquet(s"$sfDir/documents.parquet*")
      .select(col("source"), h.as("h"))
      .groupBy("source")
      .agg(sum(when(col("h") > 0, 1L).otherwise(0L)).as("n_docs"),
           sum(col("h")).as("n_hits"))
      .filter(col("n_hits") > 0)
  }
}

/** Streaming face of [[graft.Graft.zscoreOutliers]] (q_anomaly): an
  * ONLINE per-key z-score detector. The batch form is inherently
  * two-pass (global stats, then score every row); a stream cannot
  * re-score the past, so the honest streaming analogue scores each
  * event against the stats of everything seen BEFORE it, then folds
  * it in — per-key state is the O(1) Welford triple (n, mean, m2),
  * which accumulates the batch aggregate's exact partial state (same
  * algebra Spark's stddev_samp partials use), so the final state's
  * (mean, stddev) equals the batch computation's. In: (key, event_id,
  * value) keyed by key; out: (key, event_id, z, flagged) with z = 0 /
  * flagged = 0 while the key's history is degenerate (n < 2 or zero
  * spread). Rows fold in event_id order so replays are deterministic.
  * Top-level (shipped to tasks; must not capture a test class). */
private[graft] class OnlineZScoreProcessor(threshold: Double)
  extends StatefulProcessor[String, (String, Long, Double), (String, Long, Double, Int)] {
  @transient private var stats: ValueState[(Long, Double, Double)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stats = getHandle.getValueState[(Long, Double, Double)](
      "welford", Encoders.product[(Long, Double, Double)], TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Long, Double)],
                               timerValues: TimerValues): Iterator[(String, Long, Double, Int)] = {
    var (n, mean, m2) = if (stats.exists()) stats.get() else (0L, 0.0, 0.0)
    val out = Seq.newBuilder[(String, Long, Double, Int)]
    rows.toSeq.sortBy(_._2).foreach { case (_, eid, x) =>
      val z = if (n >= 2 && m2 > 0) (x - mean) / math.sqrt(m2 / (n - 1)) else 0.0
      out += ((key, eid, z, if (math.abs(z) > threshold) 1 else 0))
      n += 1
      val d = x - mean
      mean += d / n
      m2 += d * (x - mean)
    }
    stats.update((n, mean, m2))
    out.result().iterator
  }
}

/** Streaming face of [[graft.Graft.ewma]] (q_ewma): the ONLINE
  * exponential smoother. The batch form folds a completed series;
  * the streaming analogue emits each arrival's smoothed value as it
  * lands and carries s forward — per-key state is ONE double (the
  * last s), the minimal forecaster state. In: (key, event_id, value)
  * keyed by key; out: (key, event_id, s) with s_1 = x_1,
  * s_t = α·x_t + (1−α)·s_{t−1} — the identical recurrence and
  * literal form the batch fold uses. Rows fold in event_id order
  * WITHIN each micro-batch; across batches the carried state equals
  * the batch fold exactly as long as batches respect per-key event
  * order (true for AvailableNow file replay — the caveat
  * [[AsOfStateProcessor]] documents; a production out-of-order
  * stream would add a watermark-buffered reorder in front).
  * Top-level (shipped to tasks; must not capture a test class). */
private[graft] class OnlineEwmaProcessor(alpha: Double)
  extends StatefulProcessor[String, (String, Long, Double), (String, Long, Double)] {
  @transient private var last: ValueState[Double] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[Double]("ewma", Encoders.scalaDouble, TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Long, Double)],
                               timerValues: TimerValues): Iterator[(String, Long, Double)] = {
    var s = if (last.exists()) Some(last.get()) else None
    val out = Seq.newBuilder[(String, Long, Double)]
    rows.toSeq.sortBy(_._2).foreach { case (_, eid, x) =>
      val next = s match {
        case None       => x
        case Some(prev) => alpha * x + (1 - alpha) * prev
      }
      out += ((key, eid, next))
      s = Some(next)
    }
    s.foreach(last.update)
    out.result().iterator
  }
}

/** Top-level (shipped to tasks; must not capture a test/suite class):
  * per-user as-of state = the greatest click time seen, folded in
  * (us, event_id) order within each batch. In: (user, event_id, us,
  * event_type); out: (user, event_id, gap_us) for error events, gap
  * -1 when the user has no prior click. */
private[graft] class AsOfStateProcessor
  extends StatefulProcessor[Long, (Long, Long, Long, String), (Long, Long, Long)] {
  @transient private var lastClick: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastClick = getHandle.getValueState[Long]("lastClick", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long, String)],
                               timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var last = if (lastClick.exists()) lastClick.get() else -1L
    val out = Seq.newBuilder[(Long, Long, Long)]
    rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, eid, us, typ) =>
      if (typ == "click") last = math.max(last, us)
      else if (typ == "error") out += ((user, eid, if (last >= 0) us - last else -1L))
    }
    if (last >= 0) lastClick.update(last)
    out.result().iterator
  }
}
