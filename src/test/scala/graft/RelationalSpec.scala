package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Unit + plan-shape tests for SURVEY §2.1–§2.8 (micro-fixtures per
  * FIXTURES.md; plan assertions per SURVEY §5.1). */
class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- micro-fixture semantics tests --------------------------------

  test("left outer join keeps order-less customers with count 0") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val got = cust.join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy("c_custkey").agg(count($"o_orderkey").as("n"))
      .orderBy("c_custkey")
    assert(rows(got) == Seq(Seq(1L, 2L), Seq(2L, 1L), Seq(3L, 0L)))
  }

  test("semi/anti join partition a relation") {
    val cust = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val ord = Seq(2L, 4L).toDF("o_custkey")
    val semi = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
    val anti = cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
    assert(semi.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    assert(anti.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(semi.count() + anti.count() == cust.count())
  }

  test("rollup emits detail, subtotal and grand-total rows") {
    val df = Seq((2024, "A", 10.0), (2024, "B", 20.0), (2025, "A", 5.0))
      .toDF("y", "p", "v")
    val got = df.rollup("y", "p").agg(sum("v").as("s"), grouping_id().as("gid"))
    val byGid = got.collect().groupBy(_.getAs[Long]("gid")).view.mapValues(_.length).toMap
    assert(byGid == Map(0L -> 3, 1L -> 2, 3L -> 1))
    val grand = got.filter($"gid" === 3).collect().head.getAs[Double]("s")
    assert(grand == 35.0)
  }

  test("window rank/running frame semantics on a tiny partition") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 100.0), (1L, 300.0), (1L, 200.0), (2L, 50.0))
      .toDF("k", "v")
    val w = Window.partitionBy("k").orderBy($"v".desc)
    val top1 = df.select($"k", $"v", row_number().over(w).as("rn"))
      .filter($"rn" === 1).orderBy("k")
    assert(rows(top1) == Seq(Seq(1L, 300.0, 1), Seq(2L, 50.0, 1)))
    val wr = Window.partitionBy("k").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = df.select($"k", $"v", sum("v").over(wr).as("rs"))
      .filter($"k" === 1).orderBy($"v")
    assert(rows(run) == Seq(Seq(1L, 100.0, 100.0), Seq(1L, 200.0, 300.0), Seq(1L, 300.0, 600.0)))
  }

  test("set ops: union-distinct / intersect / except") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(3, 4).toDF("k")
    assert(a.union(b).distinct().count() == 4)
    assert(a.intersect(b).collect().map(_.getInt(0)).toSeq == Seq(3))
    assert(a.except(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("approx_count_distinct within 5% of exact on events") {
    val approx = Relational.q_approx_distinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("map-typed column capability (map_from_arrays / element_at)") {
    val df = Seq((Array("a", "b"), Array(1, 2))).toDF("ks", "vs")
      .select(map_from_arrays($"ks", $"vs").as("m"))
      .select(element_at($"m", "b").as("b"), map_keys($"m").as("keys"))
    val r = df.collect().head
    assert(r.getInt(0) == 2 && r.getSeq[String](1) == Seq("a", "b"))
  }

  test("scalar UDF surface (demo — declared queries use built-ins only)") {
    val vowels = udf((s: String) => s.count("aeiou".contains(_)))
    val got = Seq("spark", "graft").toDF("w")
      .select(vowels($"w").as("n")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1))
  }

  // ---- plan-shape assertions (SURVEY §5.1) --------------------------

  test("q_join_broadcast plans a BroadcastHashJoin") {
    val plan = planString(Relational.q_join_broadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q_join_shuffle plans a SortMergeJoin (MERGE hint holds at scale)") {
    val plan = planString(Relational.q_join_shuffle(spark, sf))
    assert(plan.contains("SortMergeJoin"), s"no sort-merge join in:\n$plan")
  }

  test("q_skew_join shuffles on (key, salt) — the exchange the salt exists to splinter") {
    // Under a broadcast there is no per-key shuffle bucket, so the salt
    // would be dead weight; the MERGE hint pins the shuffle regime and
    // this pin keeps a future broadcast-threshold change from silently
    // turning the declared skew query into a no-op demo.
    val plan = planString(Relational.q_skew_join(spark, sf))
    assert(plan.contains("SortMergeJoin"), s"salted join is not a shuffle join:\n$plan")
    assert(plan.contains("__salt_l"), s"exchange does not hash on the salt:\n$plan")
  }

  test("q_winsorize shares ONE hash exchange between percentile window and aggregate") {
    // the facade's point: bounds via a window over the aggregate's own
    // partitioning — a second fact shuffle (stats-join shape) would
    // show up as a second hashpartitioning exchange
    val plan = planString(Relational.q_winsorize(spark, sf))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$plan")
  }

  test("q_filter_range pushes predicates into the parquet scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // FileScan.toString truncates PushedFilters — read the scan node's
    // metadata instead of the plan string.
    // sparkPlan, not executedPlan: AQE wraps the tree in a childless
    // AdaptiveSparkPlanExec, hiding the scan from collectLeaves.
    val pushed = Relational.q_filter_range(spark, sf)
      .queryExecution.sparkPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f.metadata("PushedFilters") }
      .mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate range not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(l_discount"), s"discount range not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity"), s"quantity bound not pushed: $pushed")
  }

  test("q_scan_project prunes columns at the scan") {
    val plan = planString(Relational.q_scan_project(spark, sf))
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_shipdate"), s"unpruned scan reads l_shipdate:\n$plan")
  }

  test("q_topk_global compiles to TakeOrderedAndProject (no global sort)") {
    val plan = planString(Relational.q_topk_global(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
  }

  test("q_bm25's k-cut compiles to TakeOrderedAndProject (no global sort)") {
    val plan = planString(queries.TextOps.q_bm25(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
  }

  test("q_agg_pricing aggregates partially before the shuffle (combiner)") {
    val plan = planString(Relational.q_agg_pricing(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
    // two HashAggregate levels = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial+final agg in:\n$plan")
  }
}
