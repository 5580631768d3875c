package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders over the driver-generated parquet testdata (TESTDATA.md,
  * FIXTURES.md). All schemas are inferred from parquet footers — no DDL.
  *
  * Scale note: each loader is a plain parquet scan, so Catalyst predicate
  * pushdown / column pruning apply to whatever query is layered on top. At
  * 100 TB the same code works against a partitioned directory tree — nothing
  * here assumes a single file.
  */
object Tables {

  /** Generic parquet scan for one of the ten testdata tables. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = t(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = t(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = t(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = t(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")

  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4.x rejects by
    * default (SURVEY.md §1.2). Read nanos as long and expose:
    *   - `ts`      original bigint nanoseconds (exact, for arithmetic)
    *   - `ts_us`   timestamp (µs precision) for window/date functions
    *   - `ts_sec`  bigint epoch seconds (for oracle-safe output)
    * The conf is a runtime SQL conf, set per-session here because the
    * harness-created sessions do not set it.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      .withColumn("ts_sec", expr("ts div 1000000000"))
  }
}
