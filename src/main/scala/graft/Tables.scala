package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every engine query reads exclusively through here so per-table read
  * quirks live in exactly one place. The one real quirk: `events.ts` is
  * physical parquet TIMESTAMP(NANOS), which Spark 4.x refuses to read
  * (`[PARQUET_TYPE_ILLEGAL]`) unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`; with the flag it reads
  * as LongType epoch-nanoseconds at full precision (SURVEY.md §1.3).
  * The flag is a runtime SQLConf — set defensively before every events
  * read (build.sbt additionally passes it as a `-D` system property so
  * harness-created sessions absorb it at construction time).
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

  /** events.ts arrives as LongType epoch-NANOSECONDS (see scaladoc above). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** Epoch-microseconds from the epoch-nanos `ts` long. Integer `div`,
    * never `/`: epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact-integer
    * range, so float division would corrupt low-order digits. Matches
    * DuckDB `epoch_us(ts)` exactly (SURVEY.md §7.4 rule T). */
  val tsUs: Column = expr("ts div 1000")
}
