package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming window operators (SURVEY.md §2.B8, §5.2.4):
  * the same tumbling / sliding / session aggregations a Structured Streaming
  * job runs, expressed over the static events table so the DuckDB oracle can
  * check them. The genuinely-streaming variants (readStream, watermarks,
  * flatMapGroupsWithState) live in graft.streaming.StreamingOps and are
  * asserted equal to these twins in StreamingSpec.
  *
  * All outputs carry window starts as epoch *seconds* (bigint) — the events
  * table is ns-precision parquet, which neither Spark timestamps (µs) nor
  * stable cross-engine output can carry raw (SURVEY.md §1.2).
  */
object StreamingTwins {

  /** 1-hour tumbling window per event_type, via the native window()
    * generator — the same expression works unchanged under readStream.
    */
  def tumbling1h(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Relational.dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_sec"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("bucket_sec", "event_type")

  /** 1-hour window sliding every 15 minutes: each event lands in 4 windows
    * (the window() generator emits one row per covering window before the
    * hash-agg — generator + partial agg both map-side).
    */
  def sliding1h15m(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts_us"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Relational.dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_sec"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("bucket_sec", "event_type")

  /** 10-minute-gap session windows per user via the native session_window
    * generator (merge phase runs inside the aggregation; in streaming mode
    * the same plan maintains session state in the state store).
    */
  def sessions10m(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts_us"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Relational.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start_sec"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start_sec")
}
