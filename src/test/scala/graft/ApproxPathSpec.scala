package graft

import graft.queries.{Events, Relational}

/** Exercises the `graft.percentile.approx` session toggle — the
  * executed 100 TB percentile path (round-8 verdict item 7). The
  * exact and approx variants must agree within sketch tolerance:
  * `approx_percentile` returns an OBSERVED value nearest the target
  * rank (never interpolates), so boundaries shift by at most one
  * observation's gap and bucket populations by the local density
  * around each boundary. The assertions pin that contract tightly
  * enough that a broken swap (wrong column, wrong accuracy, silently
  * ignored toggle) fails loudly.
  */
class ApproxPathSpec extends SparkSpecBase {

  private def withApprox[A](body: => A): A = {
    spark.conf.set("graft.percentile.approx", "true")
    try body finally spark.conf.unset("graft.percentile.approx")
  }

  test("q_equidepth on approx_percentile: same plan family, boundary-tolerant buckets") {
    val exact = Relational.q_equidepth(spark, sf).collect()
    val approx = withApprox {
      val df = Relational.q_equidepth(spark, sf)
      // the swap keeps the plan shape: still a partial+final object
      // aggregate feeding a broadcast — no sort, no extra exchange
      assert(planString(df).contains("ObjectHashAggregate"))
      df.collect()
    }
    assert(approx.map(_.getLong(0)).toSeq == exact.map(_.getLong(0)).toSeq,
      "same 8 bucket ids")
    val total = exact.map(_.getLong(1)).sum
    assert(approx.map(_.getLong(1)).sum == total,
      "bucketing is a partition of the input — approx boundaries move rows, never drop them")
    // each approx boundary is an observed value at rank within the
    // sketch error of the target octile: per-bucket population stays
    // within 5% of the ideal n/8 on this smooth distribution
    val ideal = total / 8.0
    for (r <- approx)
      assert(math.abs(r.getLong(1) - ideal) <= ideal * 0.05,
        s"bucket ${r.getLong(0)} count ${r.getLong(1)} vs ideal $ideal")
    // bucket envelopes stay ordered and cover the same global range
    assert(approx.head.getDouble(2) == exact.head.getDouble(2), "global min")
    assert(approx.last.getDouble(3) == exact.last.getDouble(3), "global max")
    val maxes = approx.map(_.getDouble(3))
    assert(maxes.sameElements(maxes.sorted), "bucket max monotone")
  }

  test("q_outlier_mad on approx_percentile: medians within one observation of exact") {
    val exact = Events.q_outlier_mad(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = withApprox { Events.q_outlier_mad(spark, sf).collect() }
    assert(approx.map(_.getString(0)).toSet == exact.keySet,
      "same outlier-bearing event types")
    for (r <- approx) {
      val e = exact(r.getString(0))
      // median/MAD come straight off the sketch: relative tolerance
      // covers the observed-value-vs-interpolation gap at accuracy 1e4
      assert(math.abs(r.getDouble(2) - e.getDouble(2)) <= math.abs(e.getDouble(2)) * 0.02,
        s"${r.getString(0)} median ${r.getDouble(2)} vs exact ${e.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - e.getDouble(3)) <= math.abs(e.getDouble(3)) * 0.05,
        s"${r.getString(0)} MAD ${r.getDouble(3)} vs exact ${e.getDouble(3)}")
      // outlier census follows the (median, MAD) pair: small boundary
      // shifts move only the points sitting AT the 4.4478·MAD fence
      assert(math.abs(r.getLong(1) - e.getLong(1)) <= math.max(2L, e.getLong(1) / 10),
        s"${r.getString(0)} n_outliers ${r.getLong(1)} vs exact ${e.getLong(1)}")
    }
  }

  test("toggle off is the exact path (oracle default untouched)") {
    assert(spark.conf.getOption("graft.percentile.approx").isEmpty)
    val plan = Relational.q_equidepth(spark, sf).queryExecution.analyzed.toString
    assert(plan.contains("percentile") && !plan.contains("approx_percentile"),
      "default path must remain exact percentile for the oracle gate")
  }
}
