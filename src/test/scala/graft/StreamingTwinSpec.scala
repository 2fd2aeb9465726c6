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

  test("per-row pipeline facades run unchanged under readStream") {
    import org.apache.spark.sql.functions._
    // qualitySignals / tokenCounts / htmlExtract / urlCanonicalize
    // are pure per-row expressions, so the same Column works in a
    // streaming plan; the quality gate must keep exactly the rows
    // the batch form keeps (the extraction/normalization columns
    // ride along to prove the crawl-ingest front of the pipeline —
    // strip markup, canonicalize the URL, gate on quality — is one
    // stateless streaming stage end to end)
    val schema = Tables.documents(spark, sf).schema
    def shaped(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
              Graft.qualitySignals(col("text"), col("n_chars")).as("q"),
              Graft.tokenCounts(col("text")).as("t"),
              Graft.htmlExtract(
                concat(lit("<p>"), col("text"), lit("</p><footer>f</footer>")))
                .as("clean"),
              Graft.urlCanonicalize(
                concat(lit("HTTPS://A.com:443/d/"), col("doc_id"),
                       lit("?utm_source=s"))).as("url"))
      .filter(col("q.quality_permille") >= 400)
      .select(col("doc_id"), col("t.n_subword"), col("clean"), col("url"))
    val gated = shaped(spark.readStream.schema(schema)
      .parquet(s"$sf/documents.parquet*"))
    val q = gated.writeStream.format("memory").queryName("t_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("t_gate")
    val batch = shaped(Tables.documents(spark, sf))
    assert(stream.count() > 0)
    assert(diff(stream, batch) == 0)
    // and the riders did real work: extraction stripped the footer,
    // canonicalization folded/stripped the synthetic mess
    val r = stream.limit(1).collect().head
    assert(r.getString(2).nonEmpty && !r.getString(2).contains("<"))
    assert(r.getString(3).startsWith("https://a.com/d/") &&
           !r.getString(3).contains("utm"))
  }

  test("slidingChunks chunks a document stream exactly as in batch") {
    import org.apache.spark.sql.functions._
    // select/filter/Generate only — no aggregate, no sort — so the
    // same facade call chunks a document stream in append mode: the
    // streaming face of context-window preparation
    val schema = Tables.documents(spark, sf).schema
    val src = spark.readStream.schema(schema).parquet(s"$sf/documents.parquet*")
    val chunked = Graft.slidingChunks(src, col("doc_id"), col("text"),
      chunkTokens = 32, overlapTokens = 8)
    val q = chunked.writeStream.format("memory").queryName("t_chunks")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("t_chunks")
    val batch = Graft.slidingChunks(Tables.documents(spark, sf),
      col("doc_id"), col("text"), chunkTokens = 32, overlapTokens = 8)
    assert(stream.count() > 0)
    assert(diff(stream, batch) == 0)
  }

  test("ivfAssign routes a vector stream against an offline-trained model") {
    import org.apache.spark.sql.functions._
    // train offline (batch), assign online: the row-local broadcast-
    // array argmax is stateless, so the SAME facade call routes a
    // vector stream to cells — online vector routing / inverted-file
    // ingestion. Stream-static cross join against the 1-row centroid
    // scalar is a broadcast nested loop, legal in append mode.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val model = Graft.ivfTrain(e, col("vec_id"), col("v"), k = 4, iters = 1)
      .localCheckpoint()
    val raw = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val src = spark.readStream.schema(raw).parquet(s"$sf/embeddings.parquet*")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val routed = Graft.ivfAssign(model, src, col("v"), "cell")
      .select("vec_id", "cell")
    val q = routed.writeStream.format("memory").queryName("t_route")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("t_route")
    val batch = Graft.ivfAssign(model, e, col("v"), "cell").select("vec_id", "cell")
    assert(stream.count() > 0)
    assert(diff(stream, batch) == 0)
  }

  test("unigramScore gates a document stream against an offline model") {
    import org.apache.spark.sql.functions._
    // train offline (batch), score online: the model is a 1-row
    // broadcast scalar and scoring a row-local fold, so the SAME
    // facade call is a streaming quality gate — the text sibling of
    // the ivfAssign online-routing demo below.
    val docs = Tables.documents(spark, sf)
    val model = Graft.unigramModel(docs, col("text")).localCheckpoint()
    val schema = docs.schema
    val src = spark.readStream.schema(schema).parquet(s"$sf/documents.parquet*")
    val scored = Graft.unigramScore(model, src, col("doc_id"), col("text"))
    val q = scored.writeStream.format("memory").queryName("t_ppl")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("t_ppl")
    val batch = Graft.unigramLogProb(docs, col("doc_id"), col("text"))
    assert(stream.count() > 0)
    assert(diff(stream, batch) == 0)
  }

  test("TopK aggregate merges correctly across micro-batches (running top-k)") {
    import org.apache.spark.sql.functions._
    // split the vectors into two parquet files and feed them as TWO
    // micro-batches (maxFilesPerTrigger=1): the state store must MERGE
    // the per-batch TopK partial buffers — the streaming face of the
    // combiner-safety the ScalaCheck property proves JVM-side
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_stream")
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
              element_at(col("embedding"), 1).cast("double").as("score"))
    e.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    e.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    val topAgg = udaf(TopK.agg(4))
    val src = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val running = src.groupBy("label").agg(topAgg(col("vec_id"), col("score")).as("top"))
    val q = running.writeStream.format("memory").queryName("t_topk")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.recentProgress.length >= 2, "expected >= 2 micro-batches")
    val stream = spark.table("t_topk")
      .select(col("label"), explode(col("top")).as("e"))
      .select(col("label"), col("e.id"), col("e.score"))
    val batch = e.groupBy("label").agg(topAgg(col("vec_id"), col("score")).as("top"))
      .select(col("label"), explode(col("top")).as("e"))
      .select(col("label"), col("e.id"), col("e.score"))
    assert(stream.count() > 0)
    assert(diff(stream, batch) == 0)
  }

  test("FreqItems sketch merges across micro-batches with the containment bound intact") {
    import org.apache.spark.sql.functions._
    // two micro-batches force the state store to merge MG partial
    // buffers; estimates are merge-order-dependent by design, so the
    // assertion is the deterministic part: containment of every true
    // heavy hitter plus the n/(k+1) underestimate bound
    val dir = java.nio.file.Files.createTempDirectory("graft_freq_stream")
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    toks.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    toks.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    val k = 8
    val sk = udaf(FreqItems.agg(k))
    val src = spark.readStream.schema(toks.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = src.agg(sk(col("tok")).as("sk"))
      .writeStream.format("memory").queryName("t_freq")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.recentProgress.length >= 2, "expected >= 2 micro-batches")
    val got = spark.table("t_freq").collect()(0).getMap[String, Long](0)
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for ((t, c) <- exact if c * (k + 1) > n)
      assert(got.contains(t), s"lost heavy hitter $t ($c of $n)")
    for ((t, est) <- got)
      assert(est <= exact(t) && est >= exact(t) - n / (k + 1) - 1,
        s"estimate $est outside MG bound for $t (${exact(t)})")
  }

  test("streaming as-of twin matches batch q_asof_join exactly") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Twins.asof(spark, sf).writeStream.format("memory")
        .queryName("t_asof").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val stream = spark.table("t_asof")
      val batch = Events.q_asof_join(spark, sf)
      assert(stream.count() > 0)
      assert(diff(stream, batch.orderBy()) == 0)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

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

  test("stream-stream interval join pairs == batch q_range_join pair total") {
    import org.apache.spark.sql.functions._
    // sf0.001's events are too sparse for any ±10 s pair (total = 0,
    // which would make the assertion vacuous) — use sf0.01's 31 pairs
    val sf001 = "/root/testdata/sf0.01"
    val q = Twins.rangeJoin(spark, sf001).writeStream.format("memory")
      .queryName("t_rangejoin").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamPairs = spark.table("t_rangejoin").count()
    val batchPairs = Events.q_range_join(spark, sf001)
      .agg(sum("n_nearby_clicks")).collect().head.getLong(0)
    assert(streamPairs == batchPairs && streamPairs > 0)
  }

  test("dropDuplicatesWithinWatermark collapses a doubled source to one arrival per id") {
    import org.apache.spark.sql.functions._
    // double the corpus: two copies of events.parquet behind the glob
    val dir = java.nio.file.Files.createTempDirectory("dedupstream")
    for (n <- Seq("events.parquet", "events.parquet2"))
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
                               dir.resolve(n))
    val stream = runToTable(Twins.dedup(spark, dir.toString), "t_dedup")
    // every event_id arrives twice; dedup must reduce to the ORIGINAL counts
    val want = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    assert(diff(stream, want) == 0)
  }

  test("foreachBatch MinHash ingest probe: union of per-crawl batches == monolithic probe") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // The production shape of continuous near-dup ingest: each
    // micro-batch IS a crawl batch, and foreachBatch runs the full
    // bipartite probe (Graft.nearDupPairsMinhashAgainst) against the
    // STANDING corpus. Micro-batch decomposition is EXACT for this
    // operator — a batch doc's cross pairs depend only on itself and
    // the static index, never on its batch-mates — so the union over
    // any batch split must equal the monolithic probe of all streamed
    // docs. (Within-batch near-dup pairs are the separate self-join
    // stage of the pipeline, batch-local by design.)
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batchDocs = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= Graft.nearDupPairsMinhashAgainst(
            b, col("doc_id"), col("text"),
            corpus, col("doc_id"), col("text"), estPermille = 900)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        (): Unit
      }
      .start()
    // three uneven "crawls"
    batchDocs.grouped(math.max(1, batchDocs.length / 3 + 1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val mono = Graft.nearDupPairsMinhashAgainst(
        docs.filter(col("doc_id") % 10 === 0), col("doc_id"), col("text"),
        corpus, col("doc_id"), col("text"), estPermille = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "vacuous: no cross pairs streamed")
    assert(got.sortBy(t => (t._1, t._2)).toSeq == mono.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("foreachBatch semantic ingest probe: union of per-crawl batches == monolithic probe") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // round 13: the ingest shape of semantic dedup — each micro-batch
    // is a crawl batch screened by Graft.semanticDupVerdictsIvfAgainst
    // against the STANDING corpus under the STANDING quantizer. A
    // batch doc's verdict row depends only on itself, the model, and
    // the corpus — never on batch-mates — so micro-batch decomposition
    // is EXACT: the union over any split equals the monolithic probe.
    val tau = 400
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
              (col("vec_id") % 7).as("q"))
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val model = Graft.ivfTrain(corpus, col("vec_id"), col("v"), k = 4, iters = 3)
      .localCheckpoint()
    val batchRows = emb.filter(col("vec_id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double], Long)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = mem.toDF().toDF("doc_id", "v", "q").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= Graft.semanticDupVerdictsIvfAgainst(model,
            b, col("doc_id"), col("v"), col("q"),
            corpus, col("vec_id"), col("v"), col("q"), tau)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        (): Unit
      }
      .start()
    batchRows.grouped(math.max(1, batchRows.length / 3 + 1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val mono = Graft.semanticDupVerdictsIvfAgainst(model,
        emb.filter(col("vec_id") % 10 === 0), col("vec_id"), col("v"), col("q"),
        corpus, col("vec_id"), col("v"), col("q"), tau)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "vacuous: no cross verdicts streamed")
    assert(got.sortBy(_._1).toSeq == mono.sortBy(_._1).toSeq)
  }

  test("foreachBatch Hamming ingest probe: union of per-crawl batches == monolithic probe") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // round 13: the fourth probe family gets the same streaming face —
    // 64-bit signatures (SimHash here; perceptual media hashes ride
    // the identical facade) screened per micro-batch against a
    // standing signature corpus by Graft.nearDupPairsHammingAgainst.
    // A batch signature's cross pairs depend only on itself and the
    // standing index, so any batch split unions to the monolithic
    // probe.
    val docs = Tables.documents(spark, sf)
    val sigs = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.udaf(SimHash.agg)
        .apply(col("token"), col("tf")).as("sig"))
    val corpus = sigs.filter(col("doc_id") % 10 =!= 0).localCheckpoint()
    val batchRows = sigs.filter(col("doc_id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = mem.toDF().toDF("id", "sig").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= Graft.nearDupPairsHammingAgainst(b, col("id"), col("sig"),
            corpus, col("doc_id"), col("sig"), maxHamming = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        (): Unit
      }
      .start()
    batchRows.grouped(math.max(1, batchRows.length / 3 + 1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val mono = Graft.nearDupPairsHammingAgainst(
        sigs.filter(col("doc_id") % 10 === 0), col("doc_id"), col("sig"),
        corpus, col("doc_id"), col("sig"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty, "vacuous: no cross pairs streamed")
    assert(got.sortBy(t => (t._1, t._2)).toSeq ==
           mono.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("streaming phrase-hit maintenance equals the batch positional probe") {
    // round 16: the phrase query's scaladoc claims the postings table
    // is "the standing index artifact and this query is its probe
    // path" — this is that claim live: with the probe phrase fixed
    // (deployment constant), per-doc hits are row-local and the
    // rollup is mergeable sums, so the streaming aggregation's state
    // after full arrival must equal the batch output exactly.
    val batch = graft.queries.PipelineOps.q_phrase_search(spark, sf)
    val row = batch.limit(1).collect()(0)
    val (w1, w2) = (row.getString(1), row.getString(2))
    val got = runToTable(Twins.phraseHits(spark, sf, w1, w2), "t_phrase")
    val want = batch.select("source", "n_docs", "n_hits")
    assert(want.count() > 0, "vacuous: the probe phrase hits nothing")
    assert(diff(got, want) == 0)
  }

  test("streaming gram-df maintenance equals the batch table (mergeable stats online)") {
    import org.apache.spark.sql.functions._
    // df is a sum, so the streaming aggregation's state after full
    // arrival must equal the batch gram-df table EXACTLY — the online
    // face of q_gramdf_merge's merge argument
    val got = runToTable(Twins.gramDf(spark, sf), "t_gramdf")
    val want = Graft.gramDocFreq(Tables.documents(spark, sf),
      col("doc_id"), col("text"))
    assert(diff(got, want) == 0 && got.count() > 0)
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

  test("foreachBatch KS-drift monitor: accumulated count deltas == batch statistic") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // round 14: the drift monitor's streaming face. q_ks_drift's
    // whole state is the (source, n_chars) count table, and counts
    // are MERGEABLE sums — so a deployment accumulates per-crawl
    // count deltas in foreachBatch and re-runs only the
    // metadata-scale KS tail (ksDriftFromCounts), never re-scanning
    // the corpus. Exact under ANY batch split: summed deltas equal
    // the global counts, and the tail is a pure function of them.
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val state = scala.collection.mutable.Map.empty[(String, Long), Long]
    val q = mem.toDF().toDF("source", "n_chars").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
          .collect().foreach { r =>
            val k = (r.getString(0), r.getLong(1))
            state(k) = state.getOrElse(k, 0L) + r.getLong(2)
          }
        (): Unit
      }
      .start()
    // three uneven "crawls"
    docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val accumulated = state.toSeq
      .map { case ((src, nc), c) => (src, nc, c) }
      .toDF("source", "n_chars", "c")
    val got = graft.queries.PipelineOps.ksDriftFromCounts(accumulated)
    val want = graft.queries.PipelineOps.q_ks_drift(spark, sf)
    assert(want.count() > 0, "vacuous: no source pairs")
    assert(diff(got, want) == 0)
  }
}
