package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import scala.util.Using

/** Temp-parquet materialization for shared or repeatedly-consumed
  * subtrees — the project's ONE sanctioned "cache a DataFrame" tool
  * for anything a downstream JOIN consumes.
  *
  * Why parquet and not localCheckpoint/persist: a downstream join's
  * broadcast decision needs relation STATS. An RDD-backed checkpoint
  * reports `defaultSizeInBytes` (= treat as huge → sort-merge join
  * everywhere), and a not-yet-materialized InMemoryRelation is no
  * better on first touch — both measured as multi-second regressions
  * on the §2.14 edge consumers (BASELINE.md round 9: +4 s / +8 s on
  * q_triangle_count). A parquet round-trip keeps file-size stats, so
  * a metadata-scale table broadcasts and a big one shuffles, exactly
  * as the planner should choose. At cluster scale this is the
  * ordinary "write the shared table once, read it N times" pattern
  * (a real pipeline would point it at the warehouse instead of
  * java.io.tmpdir). localCheckpoint remains correct ONLY for
  * iterative-loop lineage truncation (pageRank/kcore/BFS/CC), where
  * the checkpointed side is metadata-scale and re-planned each round.
  *
  * Eviction discipline (round-7 ADVICE): sweeps remove ONLY entries
  * keyed by STOPPED sessions — a live session may still hold a lazy
  * reader over the path, and deleting under it surfaces later as
  * FileNotFoundException. Entry count is bounded in practice by
  * |live sessions| × |sf dirs|; a JVM shutdown hook sweeps whatever
  * remains so repeated runs don't accumulate tmp dirs.
  */
object TempTables {

  private val cache = TrieMap.empty[(SparkSession, String), String]
  private val anon = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Every build this JVM has paid: key (or materialize tag) →
    * (cumulative build seconds, cumulative bytes written, build
    * COUNT). Round-11: the gram-family driver-bench inflation was
    * localized to in-query first-touch builds, but the cost was an
    * INFERENCE from query-time deltas — this ledger makes it a
    * measurement Bench can print (`"temp_builds"` in the compact
    * line). The count matters for attribution (review catch,
    * round 11): `cached` keys build once per (session, sfDir) —
    * n = first-touch count — but `materialize` tags rebuild on EVERY
    * invocation of their query, so their seconds are N builds
    * summed, not a first-touch figure; n says which reading you are
    * looking at.
    *
    * Seconds are SELF time (round-12 review of the r12 triple): a
    * build closure that first-touches ANOTHER shared table runs that
    * child build inside its own timer — ngram_pairs' reading carried
    * the whole gram_df + doc_grams3 builds on top of their own ledger
    * rows, so the family's first-touch total double-counted and the
    * pair graph's own cost was unreadable. A per-thread nesting stack
    * subtracts each child's wall time from its parent, so ledger rows
    * now ADD UP across a run. */
  private val costs = TrieMap.empty[String, (Double, Long, Long)]

  /** Wall seconds of completed CHILD builds at each open nesting
    * level of the current thread (query construction and eager build
    * evaluation are driver-thread-local). */
  private val openBuilds = ThreadLocal.withInitial(
    () => new java.util.ArrayDeque[java.lang.Double]())

  /** Times `body`, records its SELF seconds (wall minus nested child
    * builds) against `key`, and charges its WALL seconds to the
    * enclosing build, if any. */
  private def timedBuild[A](key: String, path: => String)(body: => A): A = {
    val stack = openBuilds.get()
    stack.push(0.0)
    val t0 = System.nanoTime()
    try {
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      val children: Double = stack.pop()
      if (!stack.isEmpty) stack.push(stack.pop() + wall)
      recordBuild(key, math.max(0.0, wall - children), path)
      out
    } catch {
      case e: Throwable =>
        // charge the failed build's wall to the enclosing parent too
        // (round-12 ADVICE): without it the parent's SELF row would
        // silently absorb the thrown child's partial wall and the
        // rows-add-up invariant breaks exactly when debugging most
        // needs it
        val wall = (System.nanoTime() - t0) / 1e9
        stack.pop()
        if (!stack.isEmpty) stack.push(stack.pop() + wall)
        throw e
    }
  }

  private def recordBuild(key: String, secs: Double, path: String): Unit = {
    val bytes =
      try Using.resource(Files.walk(Paths.get(path)))(
        _.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum)
      catch { case scala.util.control.NonFatal(_) => 0L }
    costs.updateWith(key) {
      case Some((s, b, n)) => Some((s + secs, b + bytes, n + 1))
      case None            => Some((secs, bytes, 1L))
    }
  }

  /** Snapshot of the per-key build ledger (seconds, bytes, builds),
    * keyed by the `cached` key's prefix before any ':' (the sf-dir
    * suffix is per-run noise) or the `materialize` tag. */
  def buildCosts: Map[String, (Double, Long, Long)] =
    costs.readOnlySnapshot().toMap

  /** The build ledger's READ-side sibling (round-12 verdict #2): per
    * cached key, the seconds one sequential byte-stream pass over the
    * table's parquet files cost at the FIRST post-build access — a
    * direct measurement of the cold-file-I/O component of a shared
    * table's first consumer (the round-11 q_dedup_fuzzy-class
    * excursions were unattributed precisely because consumer-side
    * first-read cost was invisible). The pass doubles as a PREFETCH:
    * it leaves the files page-cache-hot and turns the consumer's
    * random column-chunk reads into one sequential scan — measurement
    * and remedy in one move. Bounded: tables over
    * [[PrefetchBoundBytes]] are skipped (recorded with secs = -1), so
    * the local-mode shim can never decide to stream a warehouse-scale
    * table through the driver. */
  private val readCosts = TrieMap.empty[String, (Double, Long)]
  private val warmedKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Prefetch ceiling — broadcast-scale by design: every table
    * TempTables holds is pair/vocab/model-scale per its own contract,
    * and anything bigger than this is a contract violation we refuse
    * to amplify with driver-side streaming. */
  val PrefetchBoundBytes: Long = 64L * 1024 * 1024

  /** Snapshot of the first-read ledger: key prefix → (seconds spent
    * in the sequential warm pass, bytes streamed). secs = -1 marks a
    * table over the prefetch bound (measured size, skipped stream). */
  def firstReadCosts: Map[String, (Double, Long)] =
    readCosts.readOnlySnapshot().toMap

  private def warmFiles(key: String, path: String): Unit = {
    try {
      val files = Using.resource(Files.walk(Paths.get(path))) { w =>
        import scala.jdk.CollectionConverters._
        w.filter(Files.isRegularFile(_)).iterator().asScala.toList
      }
      val total = files.map(Files.size).sum
      // ACCUMULATE like recordBuild (round-12 ADVICE): warmedKeys
      // fires once per (session, key) — i.e. once per sfDir — so in a
      // multi-sfDir session later sfDirs' warm passes run and must be
      // visible, not silently discarded by a putIfAbsent on the
      // prefix key. secs = -1 is sticky: once any read of the key was
      // skipped as over-bound, the row stays flagged (the unmeasured
      // cold-I/O candidate the ledger exists to surface), bytes still
      // accumulating.
      if (total > PrefetchBoundBytes) {
        readCosts.updateWith(key) {
          case Some((_, b)) => Some((-1.0, b + total))
          case None         => Some((-1.0, total))
        }
        return
      }
      val t0 = System.nanoTime()
      val buf = new Array[Byte](1 << 20)
      files.foreach { f =>
        Using.resource(Files.newInputStream(f)) { in =>
          while (in.read(buf) >= 0) {}
        }
      }
      val secs = (System.nanoTime() - t0) / 1e9
      readCosts.updateWith(key) {
        case Some((s, b)) if s < 0 => Some((s, b + total))
        case Some((s, b))          => Some((s + secs, b + total))
        case None                  => Some((secs, total))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  private def deleteRecursively(path: String): Unit = {
    val root = Paths.get(path)
    if (Files.exists(root))
      Using.resource(Files.walk(root)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
  }

  private def evict(key: (SparkSession, String)): Unit =
    cache.remove(key).foreach(deleteRecursively)

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    cache.keys.foreach(evict)
    anon.forEach(p => deleteRecursively(p))
  }))

  /** Build-once keyed cache: the first call per (session, key) runs
    * `build`, writes the result to a temp parquet dir, and every call
    * (including the first) returns a fresh parquet-backed reader over
    * it — file-size stats intact. The WRITE is eager (it runs a job
    * at construction time, like the localCheckpoint it replaces);
    * consumers stay lazy. */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(evict)
    // sweep warmedKeys with the same stopped-session rule (round-12
    // review): entries key SparkSessions, and without eviction every
    // stopped session stays strongly reachable for the JVM lifetime —
    // the leak the cache map's sweep exists to prevent
    warmedKeys.removeIf(_._1.sparkContext.isStopped)
    val path = cache.get((s, key)) match {
      case Some(p) =>
        // first access AFTER the building call: one timed sequential
        // byte pass (ledger row + page-cache prefetch — see
        // firstReadCosts). Right after a build the files are still
        // page-hot and the pass reads in milliseconds — the ~0 row is
        // itself the measurement ("reads were never cold here");
        // under I/O pressure that evicts /tmp between first touch and
        // first re-read (the driver-machine hypothesis), the same row
        // reads in seconds and names the query that paid it.
        if (warmedKeys.add((s, key))) warmFiles(key.takeWhile(_ != ':'), p)
        p
      case None =>
        // build OUTSIDE any map lock (it runs Spark jobs); the candidate
        // dir sits in `anon` while unowned so a racing loser — or a crash
        // mid-build — still gets swept at shutdown instead of leaking
        val p = Files.createTempDirectory("graft_tt_").toString
        anon.add(p)
        timedBuild(key.takeWhile(_ != ':'), p) {
          build.write.mode("overwrite").parquet(p)
        }
        cache.putIfAbsent((s, key), p) match {
          case None         => anon.remove(p); p
          case Some(winner) => anon.remove(p); deleteRecursively(p); winner
        }
    }
    s.read.parquet(path)
  }

  /** Uncached per-call materialization, for facade-internal shared
    * subtrees over ARBITRARY caller DataFrames (no stable cache key
    * exists). Each call writes one temp dir, registered for the
    * shutdown sweep — never deleted mid-JVM automatically, because
    * the returned reader is lazy and may be consumed much later. A
    * long-lived service JVM calling materialize-backed facades in a
    * loop should call [[sweepAnon]] at its own quiescent points. */
  def materialize(df: DataFrame, tag: String): DataFrame = {
    val p = Files.createTempDirectory(s"graft_${tag}_").toString
    anon.add(p)
    timedBuild(tag, p) {
      df.write.mode("overwrite").parquet(p)
    }
    df.sparkSession.read.parquet(p)
  }

  /** Deletes every [[materialize]]-created dir now instead of at JVM
    * shutdown — the /tmp bound for long-lived JVMs. CALLER asserts
    * quiescence: any still-lazy reader over a materialized facade
    * result surfaces later as FileNotFoundException, exactly like
    * dropping a warehouse temp table under a running reader. */
  def sweepAnon(): Unit = {
    val it = anon.iterator()
    while (it.hasNext) { deleteRecursively(it.next()); it.remove() }
  }
}
