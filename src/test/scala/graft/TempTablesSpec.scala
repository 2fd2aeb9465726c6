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

  test("build ledger records SELF time: nested child builds subtract from the parent") {
    // round 12: a parent build that first-touches a child table runs
    // the child inside its own timer; the ledger must charge the
    // child's wall to the child row ONLY, so rows add up across a run
    // (the r12 triple read ngram_pairs at 2×+ its own cost before
    // this). The child sleeps measurably; the parent's self row must
    // not include it.
    def childBuild() = TempTables.cached(spark, "tts_ledger_child") {
      Thread.sleep(600)
      spark.range(10).toDF("id")
    }
    TempTables.cached(spark, "tts_ledger_parent") {
      childBuild().withColumn("v", col("id") + 1)
    }
    val costs = TempTables.buildCosts
    val (childSelf, _, childN) = costs("tts_ledger_child")
    val (parentSelf, _, parentN) = costs("tts_ledger_parent")
    assert(childN == 1 && parentN == 1)
    assert(childSelf >= 0.6, s"child must carry its own sleep, got $childSelf")
    assert(parentSelf < childSelf,
      s"parent self time ($parentSelf) must exclude the child's 0.6 s sleep ($childSelf)")
  }

  test("first-read ledger: first access AFTER the building call records a row") {
    val key = "tts_read_ledger"
    TempTables.cached(spark, key)(spark.range(50).toDF("id"))
    assert(!TempTables.firstReadCosts.contains(key),
      "the builder's own call must not record a read row")
    TempTables.cached(spark, key)(sys.error("must not rebuild"))
    val (sec, bytes) = TempTables.firstReadCosts(key)
    assert(sec >= 0.0 && bytes > 0,
      s"first post-build access must stream and record the files, got ($sec, $bytes)")
    // idempotent: later calls don't re-stream (one row per key)
    TempTables.cached(spark, key)(sys.error("must not rebuild"))
    assert(TempTables.firstReadCosts(key) == ((sec, bytes)))
  }
}
