package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Schema contract for the events source (SURVEY.md §1.2, VERDICT r7 ask #2).
  *
  * The driver has regenerated events.parquet with different `ts` physical
  * encodings across rounds — INT64 TIMESTAMP(NANOS) originally, plain
  * timestamp[us] (TIMESTAMP_NTZ to Spark) since 2026-08-13. `Tables.events`
  * must normalize EITHER encoding to the canonical contract every downstream
  * consumer assumes:
  *   ts     bigint epoch nanoseconds
  *   ts_us  timestamp (µs precision)
  *   ts_sec bigint epoch seconds
  * These fixtures pin both branches so a silent testdata regeneration can
  * never again break the 30 events queries without a red test.
  */
class EventsContractSpec extends SparkSpec {

  private def tmp(tag: String) = Files.createTempDirectory(s"graft-events-$tag").toString

  /** Fixed instants (epoch µs), all post-2020, covering a µs-odd value. */
  private val micros = Seq(1700000000000000L, 1700000000000001L, 1700003600123456L)

  private def writeFixture(dir: String, tsExpr: String): Unit = {
    import spark.implicits._
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, s"e$i", i.toDouble, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr(tsExpr))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def rows(dir: String): Seq[(Long, Long, Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == LongType, s"ts must be bigint ns, got ${df.schema("ts").dataType}")
    assert(df.schema("ts_us").dataType == TimestampType, s"ts_us must be timestamp, got ${df.schema("ts_us").dataType}")
    assert(df.schema("ts_sec").dataType == LongType, s"ts_sec must be bigint, got ${df.schema("ts_sec").dataType}")
    df.select(col("event_id"), col("ts"), unix_micros(col("ts_us")).as("us"), col("ts_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
      .toSeq
  }

  private def expected: Seq[(Long, Long, Long, Long)] =
    micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us * 1000L, us, us / 1000000L)
    }

  test("µs-timestamp (TIMESTAMP_NTZ) encoding normalizes to the bigint-ns contract") {
    val dir = tmp("us")
    writeFixture(dir, "timestamp_micros(us)") // Spark writes TimestampType; cast below makes NTZ variant too
    // force TIMESTAMP_NTZ physical encoding (timestamp[us], isAdjustedToUTC=false)
    val ntzDir = tmp("ntz")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(rows(ntzDir) == expected)
  }

  test("tz-adjusted timestamp[us] encoding normalizes identically") {
    val dir = tmp("tz")
    writeFixture(dir, "timestamp_micros(us)")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampType)
    assert(rows(dir) == expected)
  }

  test("bigint-ns (legacy nanosAsLong era) encoding passes through unchanged") {
    val dir = tmp("ns")
    writeFixture(dir, "us * 1000L") // plain int64 ns — what nanosAsLong yields post-read
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType)
    assert(rows(dir) == expected)
  }

  test("the live testdata reads under the contract with plausible instants") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == LongType)
    assert(df.schema("ts_us").dataType == TimestampType)
    assert(df.schema("ts_sec").dataType == LongType)
    val r = df.agg(min("ts_sec"), max("ts_sec"), count(lit(1))).head()
    assert(r.getLong(2) > 0)
    // sane epoch-seconds range: between 2000-01-01 and 2100-01-01
    assert(r.getLong(0) > 946684800L && r.getLong(1) < 4102444800L,
      s"ts_sec out of range: ${r.getLong(0)}..${r.getLong(1)} — encoding mis-normalized")
  }
}
