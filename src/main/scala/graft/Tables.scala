package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every engine query reads exclusively through here so per-table read
  * quirks live in exactly one place. Timestamp note: all time columns
  * (including `events.ts`, regenerated 2026-08-13 from its earlier
  * TIMESTAMP(NANOS) encoding) are physical parquet `timestamp[us]`
  * without UTC adjustment, which Spark 4 reads as `TimestampNTZType`.
  * Event-time arithmetic runs on epoch-microsecond longs via [[tsUs]]
  * so every bucket/lag/frame computation is exact integer math shared
  * with DuckDB's `epoch_us(ts)` (SURVEY.md §7.4 rule T).
  *
  * Scale note: each table is a single parquet file at test scale, but
  * nothing here assumes that — `spark.read.parquet(dir)` works the same
  * on a 10k-file 100 TB dataset; partitioning/pushdown decisions are
  * taken per-query, not here.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.ts arrives as TIMESTAMP_NTZ at microsecond precision
    * (see scaladoc above). */
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** SQL fragment turning the TIMESTAMP_NTZ `ts` into exact
    * epoch-microseconds. The NTZ→TIMESTAMP cast interprets the wall
    * time in the session timezone, which the harness pins to UTC
    * (build.sbt `-Dspark.sql.session.timeZone=UTC`, Verify/Bench/spec
    * session builders) — so this equals DuckDB's `epoch_us(ts)`
    * exactly, with no float step anywhere (SURVEY.md §7.4 rule T). */
  val tsUsSql: String = "unix_micros(cast(ts as timestamp))"

  /** Epoch-microseconds column from `ts` — see [[tsUsSql]]. */
  val tsUs: Column = expr(tsUsSql)
}
