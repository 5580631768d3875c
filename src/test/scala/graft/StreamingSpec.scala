package graft

import graft.operators.StreamingTwins
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming operators vs their oracle-checked batch twins: replay the
  * events table through a file stream (Trigger.AvailableNow → memory sink)
  * and assert result equality (SURVEY.md §5.2.4).
  */
class StreamingSpec extends SparkSpec {

  /** Events written once to a temp dir so readStream has a file source. */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventsStream: DataFrame =
    spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .parquet(streamDir)

  private def runToTable(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming tumbling window equals the batch twin") {
    val got = runToTable(StreamingOps.tumbling1h(eventsStream), "t_tumbling", "complete")
      .orderBy("bucket_sec", "event_type").collect().toSeq
    val want = StreamingTwins.tumbling1h(spark, sf)
      .select("bucket_sec", "event_type", "n_events")
      .orderBy("bucket_sec", "event_type").collect().toSeq
    assert(got == want)
  }

  test("watermarked tumbling agg emits only watermark-closed windows, all correct") {
    val got = runToTable(StreamingOps.tumblingWithWatermark(eventsStream),
      "t_wm", "append").orderBy("bucket_sec", "event_type")
    val want = StreamingTwins.tumbling1h(spark, sf)
      .select("bucket_sec", "event_type", "n_events")
    // append mode withholds windows newer than the final watermark; whatever
    // was emitted must match the batch result exactly
    val joined = got.join(want, Seq("bucket_sec", "event_type"), "left")
      .filter(got("n_events") =!= want("n_events"))
    assert(joined.count() == 0)
    assert(got.count() > 0)
  }

  test("streaming dedup within watermark keeps one row per event_id") {
    val got = runToTable(StreamingOps.dedupWithinWatermark(eventsStream),
      "t_dedup", "append")
    assert(got.count() == Tables.events(spark, sf).select("event_id").distinct().count())
  }

  test("stream-static join enriches every event exactly once") {
    val got = runToTable(
      StreamingOps.enrichWithCustomer(eventsStream, Tables.customer(spark, sf)),
      "t_enrich", "append")
    assert(got.count() == Tables.events(spark, sf).count())
  }

  test("stateful sessionization (one-shot) equals the session_window twin") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[StreamingOps.Ev]
    val got = StreamingOps.sessionizeOneShot(evs, 600)
      .toDF()
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id").collect().toSeq
    val want = StreamingTwins.sessions10m(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id").collect().toSeq
    assert(got == want)
  }

  test("flatMapGroupsWithState sessionization over the stream matches batch counts") {
    import spark.implicits._
    val evs = eventsStream
      .withWatermark("ts_us", "2 hours")
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[StreamingOps.Ev]
    val got = runToTable(StreamingOps.sessionize(evs, 600).toDF(), "t_sess", "append")
    val batch = StreamingTwins.sessions10m(spark, sf)
    // AvailableNow: all data arrives in one batch; only trailing sessions
    // (one per user at most) can be withheld in state
    val gotPerUser = got.groupBy("user_id").agg(count(lit(1)).as("n"))
    val wantPerUser = batch.groupBy("user_id").agg(count(lit(1)).as("n"))
    val bad = gotPerUser.join(wantPerUser, "user_id")
      .filter(gotPerUser("n") < wantPerUser("n") - 1 || gotPerUser("n") > wantPerUser("n"))
    assert(bad.count() == 0)
  }
}
