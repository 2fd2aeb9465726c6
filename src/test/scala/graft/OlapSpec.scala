package graft

import graft.queries.Relational

/** §2.13 OLAP-completion semantics on sf0.001 (oracle parity is
  * separately enforced at three scales by LocalOracleSpec/preflight). */
class OlapSpec extends SparkSpecBase {

  test("cube emits all four grouping sets; grand total matches row count") {
    val out = Relational.q_cube(spark, sf).collect()
    val gids = out.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    val grand = out.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
  }

  test("grouping sets emits exactly the three declared sets (no per-year rows)") {
    val out = Relational.q_grouping_sets(spark, sf).collect()
    val gids = out.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 2L, 3L)) // detail, per-priority, grand — NO gid=1 (per-year)
    val grand = out.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
    // per-priority totals must sum to the grand total
    val perPriority = out.filter(_.getAs[Long]("gid") == 2L).map(_.getAs[Long]("n_orders")).sum
    assert(perPriority == grand.head.getAs[Long]("n_orders"))
  }

  test("listagg: alphabetical nation lists, counts match the list lengths") {
    val out = Relational.q_listagg(spark, sf).collect()
    assert(out.length == 5) // five regions
    out.foreach { r =>
      val parts = r.getAs[String]("nations").split(",").toSeq
      assert(parts == parts.sorted, s"${r.getString(0)} list not ordered")
      assert(parts.length.toLong == r.getAs[Long]("n_nations"))
    }
  }

  test("percentiles are ordered: median <= p90 <= max") {
    val maxes = Tables.orders(spark, sf).groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.max("o_totalprice").as("mx"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Relational.q_percentile(spark, sf).collect().foreach { r =>
      val (m, p90) = (r.getDouble(1), r.getDouble(2))
      assert(m <= p90 && p90 <= maxes(r.getString(0)) + 0.01)
    }
  }

  test("pivot row sums equal per-year order counts") {
    val out = Relational.q_pivot(spark, sf).collect()
    val perYear = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")).as("y"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val total = (1 to 5).map(r.getLong(_)).sum
      assert(total == perYear(r.getInt(0)))
    }
  }

  test("ntile quartiles are balanced; percent_rank spans [0, 1]") {
    val out = Relational.q_window_ntile(spark, sf).collect()
    val sizes = out.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1) // ntile balance property
    val prs = out.map(_.getDouble(2))
    assert(prs.min == 0.0 && prs.max == 1.0)
  }

  test("stats aggregates are finite and correlation is in [-1, 1]") {
    Relational.q_stats_agg(spark, sf).collect().foreach { r =>
      assert(r.getDouble(1) > 0)                      // sd_qty
      assert(math.abs(r.getDouble(3)) <= 1.0)         // corr
    }
  }
}
