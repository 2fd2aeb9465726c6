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
}
