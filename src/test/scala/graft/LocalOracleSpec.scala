package graft

import java.nio.file.Files
import scala.sys.process._

/** The real bar (SURVEY §5.2): pre-flight EVERY declared query against
  * DuckDB on sf0.001, exactly as the driver will on sf0.01. Rule E:
  * Verify.dump swallows per-query throws, so this spec first asserts
  * that every declared query produced output, then that every oracle pair
  * hash-match (via tools/preflight.py — duckdb is available to the dev
  * environment; the shipped engine itself is pure Scala/Spark). The 8
  * oracle-less ids (q_approx_distinct, q_dedup_minhash,
  * q_dedup_simhash, q_doc_fingerprint, q_ivf_build, q_sim_ivf,
  * q_sim_srp, q_pca_power) get rows-only checks here plus dedicated
  * unit/property suites. */
class LocalOracleSpec extends SparkSpecBase {

  test("all declared queries run and all oracle pairs match DuckDB on sf0.001") {
    val out = Files.createTempDirectory("oracle_preflight").toString
    Verify.dump(spark, sf, out)
    val produced = new java.io.File(out).listFiles().map(_.getName).toSet
    val missing = SparkEntry.queries.keySet -- produced
    assert(missing.isEmpty, s"queries that threw during dump (rule E): $missing")

    val logBuf = new StringBuilder
    val code = Process(Seq("python3", "tools/preflight.py", sf, out), new java.io.File("/root/repo"))
      .!(ProcessLogger(l => logBuf.append(l).append('\n'), l => logBuf.append(l).append('\n')))
    assert(code == 0, s"oracle mismatches:\n$logBuf")
  }
}
