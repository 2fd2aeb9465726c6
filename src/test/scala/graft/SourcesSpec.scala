package graft

import org.apache.spark.sql.functions._

/** Multi-format source capability (SURVEY §2.1 origin: the reference
  * paradigm reads text files): the same corpus round-trips through
  * text, CSV and JSON sources and produces identical query results —
  * i.e. the engine is source-format-agnostic above the scan. Parquet
  * stays the declared contract (columnar + statistics at scale); these
  * prove the ingest edge. */
class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")

  test("text source: wordcount over spark.read.text equals DataFrame path") {
    val dir = java.nio.file.Files.createTempDirectory("srctext").toString
    docs.select("text").write.text(s"$dir/corpus")
    val fromText = spark.read.text(s"$dir/corpus")
      .select(explode(split($"value", " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val fromTable = docs
      .select(explode(split($"text", " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    assert(fromText.except(fromTable).count() == 0 &&
           fromTable.except(fromText).count() == 0)
  }

  test("csv + json + orc sources: round-trip preserves rows and schema-on-read works") {
    val dir = java.nio.file.Files.createTempDirectory("srcfmt").toString
    docs.write.option("header", "true").csv(s"$dir/csv")
    docs.write.json(s"$dir/json")
    docs.write.orc(s"$dir/orc")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
    val json = spark.read.json(s"$dir/json")
    val orc = spark.read.orc(s"$dir/orc")
    assert(csv.count() == docs.count() && json.count() == docs.count() &&
           orc.count() == docs.count())
    // same per-lang distribution through every format
    def byLang(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("lang").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang(csv) == byLang(docs) && byLang(json) == byLang(docs) &&
           byLang(orc) == byLang(docs))
    // ORC is columnar like parquet: filters push into the scan
    val scan = orc.filter($"lang" === "en").queryExecution.sparkPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)"),
           s"no ORC pushdown:\n$scan")
  }

  test("partitionBy sink: hive-style layout, partition PRUNING on read (MultipleOutputs analog)") {
    // SURVEY §1.1: df.write.partitionBy is the Spark face of the
    // paradigm's MultipleOutputs — and at 100 TB the point is the
    // read side: a partition filter must prune directories in the
    // scan, not filter rows after reading everything
    val dir = java.nio.file.Files.createTempDirectory("srcpart").toString
    docs.write.partitionBy("lang").parquet(s"$dir/bylang")
    val langs = new java.io.File(s"$dir/bylang").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langs.forall(_.startsWith("lang=")) && langs.size >= 2,
           s"no hive-style partition dirs: $langs")
    val back = spark.read.parquet(s"$dir/bylang")
    val pruned = back.filter($"lang" === "en")
    // row parity vs the unpartitioned table
    assert(pruned.count() == docs.filter($"lang" === "en").count())
    // the partition predicate must land in PartitionFilters (dir
    // pruning), NOT PushedFilters (row-group filtering)
    val plan = pruned.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
           s"partition filter not pruning directories:\n$plan")
  }

  test("bucketed tables: co-located join plans ZERO shuffles (the 100 TB join layout)") {
    // The big-fact-join-big-fact answer at scale is LAYOUT, not
    // runtime: write both sides bucketed by the join key and the
    // sort-merge join consumes the bucket files' distribution directly
    // — no Exchange on either side, on any later query, forever.
    // Bucketed writes need a warehouse-backed saveAsTable (hive-style
    // bucket metadata lives in the catalog, not in the files).
    val wh = java.nio.file.Files.createTempDirectory("srcbuck").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '$wh'")
    // sf0.001 tables are broadcast-sized; kill broadcast so the test
    // exercises the big-big regime bucketing exists for
    val prevBjt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("buckdemo.docs_b")
      docs.select($"doc_id", length($"text").as("len"))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("buckdemo.lens_b")
      val joined = spark.table("buckdemo.docs_b")
        .join(spark.table("buckdemo.lens_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
             s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == docs.count())
      // the layout survives aggregation too: groupBy the bucket key
      // reuses the distribution — no shuffle before the final agg
      val agg = spark.table("buckdemo.docs_b").groupBy("doc_id")
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(!agg.contains("Exchange hashpartitioning"),
             s"bucketed groupBy still shuffles:\n$agg")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBjt)
    }
  }
}
