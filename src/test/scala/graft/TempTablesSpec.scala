package graft

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** The temp-parquet materialization utility that every shared-subtree
  * cache in the engine rides on (pair graph, CC labels, co-purchase
  * edges, tf-idf vectors, jaccard gram tables): build-once semantics,
  * file-stats-backed reads, the concurrent-build no-leak contract
  * (round-8 ADVICE), and the explicit anon sweep. */
class TempTablesSpec extends SparkSpecBase {

  private def tmpDirs(prefix: String): Set[String] = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val s = Files.list(tmp)
    try {
      val b = Set.newBuilder[String]
      s.forEach(p => if (p.getFileName.toString.startsWith(prefix)) b += p.toString)
      b.result()
    } finally s.close()
  }

  test("cached: builds once per (session, key); reads are parquet-backed with real stats") {
    val builds = new AtomicInteger(0)
    def get() = TempTables.cached(spark, "tts_spec_build_once") {
      builds.incrementAndGet()
      spark.range(100).toDF("id").withColumn("v", col("id") * 2)
    }
    val a = get(); val b = get()
    assert(builds.get() == 1, "second call must reuse the written table")
    assert(rows(a.orderBy("id")) == rows(b.orderBy("id")))
    assert(a.count() == 100)
    // the whole point vs localCheckpoint: the relation reports its
    // FILE size, not defaultSizeInBytes and not an estimate over the
    // origin plan — downstream joins can broadcast it
    val size = a.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size > 0 && size < spark.sessionState.conf.defaultSizeInBytes)
    assert(a.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName != "LogicalRDD"))
  }

  test("cached: concurrent first calls converge to one dir, losers deleted (no leak)") {
    val before = tmpDirs("graft_tt_")
    val builds = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        TempTables.cached(spark, "tts_spec_race") {
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
          spark.range(10).toDF("id")
        }.count()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val after = tmpDirs("graft_tt_")
    // racing builders may each run (build is outside any lock), but
    // exactly one dir survives as the cache entry; every loser's copy
    // is deleted on the spot rather than leaking until shutdown
    assert(builds.get() >= 1)
    assert((after -- before).size == 1,
      s"expected exactly one surviving dir, got ${(after -- before).size}")
  }

  test("materialize: parquet-backed copy per call; sweepAnon bounds /tmp") {
    val before = tmpDirs("graft_ttsspec_")
    val df = TempTables.materialize(
      spark.range(50).toDF("id"), "ttsspec")
    assert(df.count() == 50)
    assert(df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName != "LogicalRDD"))
    val created = tmpDirs("graft_ttsspec_") -- before
    assert(created.size == 1)
    TempTables.sweepAnon() // this spec holds no lazy readers — quiescent
    assert(created.forall(p => !Files.exists(Paths.get(p))),
      "sweepAnon must delete materialized dirs")
  }
}
