package graft

import graft.operators.StreamingTwins
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** One handcrafted fixture event (top-level so the Product encoder derives
  * cleanly): id + type + event time.
  */
case class FxEv(event_id: Long, event_type: String, ts_us: java.sql.Timestamp)

/** Streaming operators vs their oracle-checked batch twins: replay the
  * events table through a file stream (Trigger.AvailableNow → memory sink)
  * and assert result equality (SURVEY.md §5.2.4) — plus HANDCRAFTED
  * out-of-order fixtures whose expected outputs are computed by hand, so
  * watermark drop / state-eviction semantics are asserted against an
  * independent answer, not just twin-equality.
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

  test("streaming incremental dedup: stream-static anti join on the index") {
    // static index = fingerprints of the even-doc_id half (the "existing
    // corpus"); stream the whole documents table; only docs whose text
    // fingerprint is NOT indexed come out
    val docsDir = Files.createTempDirectory("graft-docstream").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(docsDir)
    val index = docs.filter(col("doc_id") % 2 === 0)
      .select(sha2(col("text"), 256).as("fp")).distinct()
    val stream = spark.readStream.schema(docs.schema).parquet(docsDir)
    val got = runToTable(
      StreamingOps.dedupAgainstIndex(stream, index), "inc_dedup", "append")
      .select("doc_id")
    val want = StreamingOps.dedupAgainstIndex(docs, index).select("doc_id")
    assert(got.count() == want.count())
    assert(got.join(want, Seq("doc_id"), "left_anti").count() == 0)
    // and it genuinely filtered: every even doc's text is indexed
    assert(got.join(docs.filter(col("doc_id") % 2 === 0), Seq("doc_id"), "left_semi").count() == 0)
  }

  test("streaming stratified sample equals the batch sample (stateless hash)") {
    val docsDir = Files.createTempDirectory("graft-samplestream").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    docs.write.mode("overwrite").parquet(docsDir)
    val stream = spark.readStream.schema(docs.schema).parquet(docsDir)
    val got = runToTable(
      StreamingOps.sampleStratified(stream), "sample_stream", "append")
      .select("doc_id")
    val want = operators.Sampling.stratifiedSample(spark, sf).select("doc_id")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.join(want, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("streaming curation equals the batch quality-floor + redaction pass") {
    val docsDir = Files.createTempDirectory("graft-curatestream").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(docsDir)
    val stream = spark.readStream.schema(docs.schema).parquet(docsDir)
    val got = runToTable(
      StreamingOps.curateDocs(stream), "curate_stream", "append")
    val want = StreamingOps.curateDocs(docs)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.join(want, Seq("doc_id", "text"), "left_anti").count() == 0)
    // the floor genuinely filtered something, and kept ids match the
    // batch quality operator's keep set exactly
    val wantIds = operators.TextAnalysis.qualityScore(spark, sf)
      .filter(col("quality") >= operators.Pipeline.QualityFloor).select("doc_id")
    assert(got.count() < docs.count())
    assert(got.select("doc_id").except(wantIds).count() == 0)
    assert(wantIds.except(got.select("doc_id")).count() == 0)
  }

  test("restart from checkpoint resumes exactly-once: batch 2 only, no re-emission") {
    // the operational property checkpoints exist for: a restarted query
    // must pick up at the committed offsets — never re-emit batch 1, never
    // skip batch 2. Memory sink is rebuilt per run, so the second run's
    // table contains exactly what the restarted query processed.
    // (memory sink cannot recover from a checkpoint; the parquet sink's
    // _spark_metadata commit log is the exactly-once mechanism)
    val srcDir = Files.createTempDirectory("graft-ckpt-src").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-loc").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val batch1 = docs.filter(col("doc_id") % 2 === 0)
    val batch2 = docs.filter(col("doc_id") % 2 =!= 0)
    batch1.write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val q = StreamingOps.sampleStratified(
          spark.readStream.schema(docs.schema).parquet(srcDir))
        .writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val want1 = batch1.filter(graft.operators.Sampling.stratifiedKeep)
    val after1 = spark.read.parquet(outDir)
    assert(after1.count() == want1.count() && after1.count() > 0)
    // new files arrive while the query is down; restart from the checkpoint
    batch2.write.mode("append").parquet(srcDir)
    runOnce()
    val want2 = batch2.filter(graft.operators.Sampling.stratifiedKeep)
    val after2 = spark.read.parquet(outDir)
    // exactly-once across the restart: batch 1 not re-emitted, batch 2 not
    // skipped, no duplicates anywhere
    assert(after2.count() == want1.count() + want2.count())
    assert(after2.select("doc_id").distinct().count() == after2.count())
    assert(want2.join(after2, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("composed streaming ingest: curate -> dedup-against-index -> chunk in one pass") {
    // the full streaming ingest shape a training pipeline runs per
    // micro-batch: quality-floor + redaction, then drop docs whose
    // fingerprint is already indexed, then chunk the survivors. All three
    // stages are stateless/stream-static, so the composition must equal
    // the same three batch operators applied in the same order.
    val docsDir = Files.createTempDirectory("graft-ingeststream").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(docsDir)
    val stream = spark.readStream.schema(docs.schema).parquet(docsDir)
    // standing index: fingerprints of every third doc's CURATED text (the
    // index stores what a prior ingest wrote, i.e. post-redaction bytes)
    val index = StreamingOps.curateDocs(docs)
      .filter(col("doc_id") % 3 === 0)
      .select(sha2(col("text"), 256).as("fp"))
    val composed = StreamingOps.chunkDocs(
      StreamingOps.dedupAgainstIndex(StreamingOps.curateDocs(stream), index))
    val got = runToTable(composed, "ingest_stream", "append")
    val want = operators.Curation.chunkDocs(
      StreamingOps.dedupAgainstIndex(StreamingOps.curateDocs(docs), index))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.join(want, Seq("doc_id", "chunk_id", "start", "n_chunk", "chunk"),
      "left_anti").count() == 0)
    // the dedup stage genuinely dropped the indexed docs
    assert(got.filter(col("doc_id") % 3 === 0).count() == 0)
  }

  test("streaming chunking equals the batch overlapping-chunk operator") {
    val docsDir = Files.createTempDirectory("graft-chunkstream").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(docsDir)
    val stream = spark.readStream.schema(docs.schema).parquet(docsDir)
    val got = runToTable(
      StreamingOps.chunkDocs(stream), "chunk_stream", "append")
    val want = operators.Curation.chunkOverlap(spark, sf)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.join(want, Seq("doc_id", "chunk_id", "start", "n_chunk", "chunk"),
      "left_anti").count() == 0)
  }

  // ------------------------------------------------- late-data fixtures

  /** 2024-01-01 00:00 UTC, the fixture day. */
  private val FxBase = 1704067200L
  private def at(h: Int, m: Int) =
    new java.sql.Timestamp((FxBase + h * 3600L + m * 60L) * 1000L)

  /** Write each batch as ONE parquet file with increasing mtimes so the
    * file stream (maxFilesPerTrigger=1) replays them as separate
    * micro-batches in order — the only way the watermark can advance
    * between arrivals and late rows can actually be dropped.
    */
  private def writeFixture(batches: Seq[Seq[FxEv]]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-latefix").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory("graft-latefix-tmp")
      rows.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(dir, f"b$i%02d.parquet")
      Files.move(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    dir
  }

  private def fixtureStream(dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(Seq.empty[FxEv].toDS().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
  }

  test("foreachBatch upsert sink: keep-latest merge equals the batch last-write-wins") {
    // the operational sink shape when the target is a keyed table and the
    // format has no native MERGE: foreachBatch applies an idempotent
    // upsert per micro-batch. Replay documents in doc_id-ordered batches
    // (maxFilesPerTrigger=1 over several files) and upsert (doc_id %
    // 100) -> (doc_id, fp): later batches overwrite earlier keys, so the
    // final table must equal the batch-computed max-doc_id-per-key state.
    import org.apache.spark.sql.expressions.Window
    val dir = Files.createTempDirectory("graft-upsert").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), (col("doc_id") % 100).as("k"), md5(col("text")).as("fp"))
    // 4 files = 4 micro-batches, each a contiguous doc_id range so
    // "later batch" aligns with "larger doc_id" deterministically
    docs.repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dir)
    val state = scala.collection.concurrent.TrieMap.empty[Long, (Long, String)]
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // within one batch, last-write-wins by doc_id (MERGE semantics);
        // the max-doc_id guard makes the upsert batch-order-independent
        batch.withColumn("rn", row_number().over(
            Window.partitionBy("k").orderBy(desc("doc_id"))))
          .filter(col("rn") === 1).drop("rn")
          .collect().foreach { r =>
            val (id, k, fp) = (r.getLong(0), r.getLong(1), r.getString(2))
            if (!state.get(k).exists(_._1 > id)) state(k) = (id, fp)
          }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val want = docs.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(desc("doc_id"))))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(1) -> ((r.getLong(0), r.getString(2)))).toMap
    assert(state.toMap == want)
    // upserts genuinely happened: more docs than keys
    assert(docs.count() > state.size)
  }

  test("watermark drops late rows: handcrafted fixture, hand-computed answer") {
    // 2h watermark, 1h tumbling windows. NOTE: Spark filters late records
    // with the watermark of the batch BEFORE the one that evicts state (the
    // filter watermark lags eviction by one micro-batch — verified
    // empirically), so the watermark-raising event sits two batches before
    // the late arrival.
    // b0 events 00:10, 00:20, 05:30  -> wm after b0 = 05:30-2h = 03:30
    // b1 event  06:30 (spacer: filter-wm for later batches is now 03:30)
    // b2 event  00:40 -> LATE (00:40 < 03:30): DROPPED
    // b3 event  08:00 (advances wm to 06:00; flushes closed windows)
    // Hand-computed append output: window [00:00,01:00) = 2 events (00:10,
    // 00:20 — NOT the late 00:40) and [05:00,06:00) = 1; the 06:30 and
    // 08:00 windows never pass the final watermark and stay withheld.
    val dir = writeFixture(Seq(
      Seq(FxEv(1, "click", at(0, 10)), FxEv(2, "click", at(0, 20)), FxEv(3, "click", at(5, 30))),
      Seq(FxEv(5, "click", at(6, 30))),
      Seq(FxEv(4, "click", at(0, 40))),
      Seq(FxEv(6, "click", at(8, 0)))))
    val got = runToTable(StreamingOps.tumblingWithWatermark(fixtureStream(dir)),
      "t_late_fix", "append")
      .select("bucket_sec", "event_type", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (FxBase, "click", 2L),
      (FxBase + 5 * 3600L, "click", 1L)), s"got $got")
  }

  test("dropDuplicatesWithinWatermark: handcrafted dup/eviction fixture") {
    // 2h dedup horizon; same one-batch filter lag as above.
    // b0: id1@00:00, id2@00:30, id9@05:30   -> eviction wm after b0 = 03:30
    //     (id2's state expires at 00:30+2h = 02:30 < 03:30 -> evicted in b1)
    // b1: id7@06:30 spacer                  -> emitted; filter wm now 03:30
    // b2: id1@00:40  late (< 03:30)                   -> dropped
    //     id9@05:45  dup, state alive (exp 07:30)     -> dropped
    //     id2@04:00  key re-seen AFTER state expiry   -> RE-emitted (the
    //                documented within-watermark guarantee bound)
    //     id4@06:00  new                              -> emitted
    // Hand-computed: id1 once, id2 TWICE, id9 once, id7 once, id4 once.
    val dir = writeFixture(Seq(
      Seq(FxEv(1, "a", at(0, 0)), FxEv(2, "a", at(0, 30)), FxEv(9, "a", at(5, 30))),
      Seq(FxEv(7, "a", at(6, 30))),
      Seq(FxEv(1, "a", at(0, 40)), FxEv(9, "a", at(5, 45)),
        FxEv(2, "a", at(4, 0)), FxEv(4, "a", at(6, 0)))))
    val got = runToTable(
      fixtureStream(dir).withWatermark("ts_us", "2 hours")
        .dropDuplicatesWithinWatermark("event_id"),
      "t_dedup_fix", "append")
      .groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 9L -> 1L, 7L -> 1L, 4L -> 1L), s"got $got")
  }

  /** Write each slice as ONE parquet file with increasing mtimes — the
    * generic (any-schema) sibling of [[writeFixture]] for slicing the
    * real corpus into chronological micro-batches. */
  private def writeSlices(slices: Seq[DataFrame]): String = {
    val dir = Files.createTempDirectory("graft-slices").toString
    slices.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory("graft-slices-tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(dir, f"b$i%02d.parquet")
      Files.move(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    dir
  }

  test("real recurring trigger: watermarked agg drops late rows across >=4 micro-batches") {
    // VERDICT r8 ask #9: the late-drop fixture above runs under
    // Trigger.AvailableNow; here the SAME fixture and hand-computed answer
    // run under a real recurring ProcessingTime trigger, so the watermark
    // advances between genuine trigger firings. maxFilesPerTrigger=1 over
    // four chronological files → four data-carrying micro-batches.
    val dir = writeFixture(Seq(
      Seq(FxEv(1, "click", at(0, 10)), FxEv(2, "click", at(0, 20)), FxEv(3, "click", at(5, 30))),
      Seq(FxEv(5, "click", at(6, 30))),
      Seq(FxEv(4, "click", at(0, 40))),
      Seq(FxEv(6, "click", at(8, 0)))))
    val q = StreamingOps.tumblingWithWatermark(fixtureStream(dir))
      .writeStream.format("memory").queryName("t_late_rt")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      q.processAllAvailable()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4,
        s"expected >=4 data-carrying micro-batches under the recurring trigger, got $dataBatches")
    } finally q.stop()
    val got = spark.table("t_late_rt")
      .select("bucket_sec", "event_type", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (FxBase, "click", 2L),
      (FxBase + 5 * 3600L, "click", 1L)), s"got $got")
  }

  test("real recurring trigger: funnel stream over 3 chronological corpus slices") {
    import spark.implicits._
    import graft.operators.Funnels
    // the full events corpus in three chronological slices (ts terciles),
    // one micro-batch each under a recurring trigger; chunk-ordered
    // per-user arrival, so GroupState folding across REAL trigger firings
    // must land on the oracle-checked batch funnel's stage counts
    val evs = Tables.events(spark, sf).select("user_id", "ts", "event_type")
    val Array(t1, t2) = evs.stat.approxQuantile("ts", Array(0.33, 0.66), 0.0)
    val slices = Seq(
      evs.filter(col("ts") <= t1),
      evs.filter(col("ts") > t1 && col("ts") <= t2),
      evs.filter(col("ts") > t2))
    slices.foreach(s => assert(s.count() > 0))
    val dir = writeSlices(slices)
    val state = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Boolean, Boolean)]
    val q = StreamingOps.funnelStates(
        spark.readStream.schema(evs.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .as[StreamingOps.FEv])
      .toDF()
      .writeStream
      .foreachBatch { (snap: DataFrame, _: Long) =>
        snap.collect().foreach { r =>
          state(r.getLong(0)) = (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
        }
        ()
      }
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      q.processAllAvailable()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"expected >=3 data-carrying micro-batches under the recurring trigger, got $dataBatches")
    } finally q.stop()
    val counts = (state.values.count(_._1).toLong,
      state.values.count(_._2).toLong, state.values.count(_._3).toLong)
    val want = Funnels.funnel(spark, sf)
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(counts == ((want("view"), want("click"), want("purchase"))))
  }

  test("streaming SCD2 keeps the batch build's current versions across 3 chronological slices") {
    import spark.implicits._
    import graft.operators.Relational
    // the change feed in three chronological micro-batches: GroupState
    // version-folding across real batch boundaries must land on the
    // oracle-checked batch q_scd2's is_current rows exactly
    val evs = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "ts_sec")
    val Array(t1, t2) = evs.stat.approxQuantile("ts", Array(0.33, 0.66), 0.0)
    val slices = Seq(
      evs.filter(col("ts") <= t1),
      evs.filter(col("ts") > t1 && col("ts") <= t2),
      evs.filter(col("ts") > t2))
    slices.foreach(s => assert(s.count() > 0))
    val dir = writeSlices(slices)
    val current = scala.collection.concurrent.TrieMap.empty[Long, (Long, String, Long, Long)]
    val q = StreamingOps.scd2Current(
        spark.readStream.schema(evs.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .as[StreamingOps.DEv])
      .toDF()
      .writeStream
      .foreachBatch { (snap: DataFrame, _: Long) =>
        snap.collect().foreach { r =>
          current(r.getLong(0)) = (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))
        }
        ()
      }
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val want = Relational.scd2Build(spark, sf)
      .filter(col("is_current"))
      .select("user_id", "version", "event_type", "valid_from_sec", "n_events")
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(current.toMap == want)
    assert(want.nonEmpty)
  }

  test("streaming ANN index ingest: foreachBatch appends signature segments, serving stays exact") {
    // the streaming face of q_ann_incremental: vector micro-batches
    // arrive on a file stream and each one appends its own bucket-
    // partitioned signature segment (per-row facts — zero serve-time
    // recompute, the property SCALE.md documents); after the stream
    // drains, serving from the accumulated index must equal the in-plan
    // ANN ranking over the same corpus. This is how a production vector
    // store absorbs a crawl feed: hash on arrival, land in buckets,
    // immediately servable.
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val idxDir = Files.createTempDirectory("graft-annstream-idx").toString
    val srcDir = writeSlices((0 until 3).map(i => emb.filter(col("vec_id") % 3 === i)))
    val q = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Similarity.appendAnnFrame(batch, idxDir, id)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val segments = spark.read.parquet(idxDir)
    assert(segments.select("batch").distinct().count() == 3,
      "expected one index segment per micro-batch")
    assert(segments.count() == emb.count())
    val served = Similarity.annServeFrom(spark, idxDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val inPlan = SparkEntry.queries("q_ann_topk")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(served == inPlan, "stream-ingested index ranking diverges from the in-plan ANN")
  }

  test("streaming SemDeDup index ingest: foreachBatch appends assigned segments, keep set stays exact (r16)") {
    // the streaming face of q_semdedup_incremental: embedding
    // micro-batches arrive on a file stream, each appending its own
    // map-side-assigned (vec_id, v, nn, cluster) segment under the FIXED
    // trained quantizer; after the stream drains, the cluster-local keep
    // rule over the accumulated store must equal the scan-time SemDeDup
    // verdict row-for-row. Per-row facts + a fixed model ⇒ the fold is
    // order-insensitive across any micro-batch slicing.
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val idxDir = Files.createTempDirectory("graft-semstream-idx").toString
    val srcDir = writeSlices((0 until 3).map(i => emb.filter(col("vec_id") % 3 === i)))
    val q = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Similarity.appendSemFrame(spark, sf, batch, idxDir, id)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val segments = spark.read.parquet(idxDir)
    assert(segments.select("batch").distinct().count() == 3,
      "expected one index segment per micro-batch")
    assert(segments.count() == emb.count())
    val served = Similarity.semDedupServeFrom(spark, idxDir)
      .as[(Long, Long, Boolean)].collect().toSeq
    val inPlan = Similarity.semDedup(spark, sf)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(served == inPlan, "stream-ingested keep set diverges from the scan-time SemDeDup")
  }

  test("streaming MV maintenance: foreachBatch appends cube partials, fold equals full rebuild") {
    // the streaming face of q_mv_incremental: fact micro-batches arrive
    // on a file stream and each appends its own cube-partial segment
    // (one map-combined hash-agg of the batch, ~cells rows written);
    // after the stream drains, the grain-keyed refold of the segments
    // must be BIT-IDENTICAL to the single-build cube — SUM/COUNT
    // self-maintainability under inserts, exercised on the real
    // micro-batch boundary rather than the registered query's two
    // deterministic halves.
    import graft.operators.MaterializedView
    val li = Tables.lineitem(spark, sf)
    val segDir = Files.createTempDirectory("graft-mvstream-seg").toString
    val srcDir = writeSlices((0 until 3).map(i => li.filter(col("l_orderkey") % 3 === i)))
    val q = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        MaterializedView.appendCubeFrame(batch, segDir, id)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val segments = spark.read.parquet(segDir)
    assert(segments.select("batch").distinct().count() == 3,
      "expected one cube segment per micro-batch")
    val served = MaterializedView.serveFrom(spark, segDir).collect().toSeq
    val full = MaterializedView.mvCube(spark, sf).collect().toSeq
    assert(served == full, "stream-maintained cube diverges from the full rebuild")
  }

  test("streaming DAU maintenance: foreachBatch appends day-partitioned activity, serve equals batch") {
    // the streaming face of q_rolling_dau_incremental: event micro-batches
    // append their (day, user) DISTINCT slice into the day-partitioned
    // activity artifact; after the stream drains, the DAU/WAU readout off
    // the artifact must equal the scan-time build. The batch-local
    // distinct is the honest micro-batch contract — duplicates ACROSS
    // batches survive in the append-only artifact, so the READER runs the
    // one cheap .distinct() below before dauOf (whose contract requires a
    // pre-distinct input — its fence only repartitions+persists).
    import graft.operators.Funnels
    val ev = Tables.events(spark, sf)
    val artDir = Files.createTempDirectory("graft-daustream-art").toString
    val srcDir = writeSlices((0 until 3).map(i => ev.filter(col("event_id") % 3 === i)))
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(expr("ts div 86400000000000").as("day"), col("user_id"))
          .distinct()
          .write.partitionBy("day").mode("append").parquet(artDir)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val served = Funnels.dauOf(
        spark.read.parquet(artDir)
          .select(col("day").cast("long").as("day"), col("user_id"))
          .distinct())
      .collect().toSeq
    val full = Funnels.rollingDau(spark, sf).collect().toSeq
    assert(served == full, "stream-maintained DAU artifact diverges from the batch build")
    // the artifact is genuinely day-partitioned on disk
    assert(new java.io.File(artDir).listFiles().count(_.getName.startsWith("day=")) > 1)
  }

  test("streaming IVF index ingest: foreachBatch appends assigned segments, serving equals the in-plan ranking") {
    // the IVF face of the ANN ingest test: vector micro-batches land
    // with their cluster assignment under the TRAINED coarse quantizer
    // (per-row facts — zero serve-time recompute); after the stream
    // drains, serving from the accumulated index must equal the in-plan
    // deterministic IVF ranking bit-for-bit.
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val idxDir = Files.createTempDirectory("graft-ivfstream-idx").toString
    val srcDir = writeSlices((0 until 3).map(i => emb.filter(col("vec_id") % 3 === i)))
    val q = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Similarity.appendIvfFrame(spark, sf, batch, idxDir, id)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val segments = spark.read.parquet(idxDir)
    assert(segments.select("batch").distinct().count() == 3,
      "expected one index segment per micro-batch")
    assert(segments.count() == emb.count())
    val served = Similarity.ivfServeFrom(spark, sf, idxDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val inPlan = Similarity.ivfTopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(served == inPlan, "stream-ingested IVF index diverges from the in-plan ranking")
  }

  test("streaming KMV maintenance: foreachBatch appends k-minima segments, serve equals batch cube") {
    // the streaming face of q_kmv_cube_incremental: event micro-batches
    // each land their own per-(type, day) k-minima segment (batch-local
    // distinct + bounded-heap top-k — k·cells rows written per batch);
    // after the stream drains, the union-truncate fold off the appended
    // segments must equal the single-build cube EXACTLY — the
    // ≤ k−1-smaller merge argument (Aggregates.appendKmvFrame) exercised
    // on real micro-batch boundaries.
    import graft.operators.Aggregates
    val ev = Tables.events(spark, sf)
    val artDir = Files.createTempDirectory("graft-kmvstream-art").toString
    val srcDir = writeSlices((0 until 3).map(i => ev.filter(col("event_id") % 3 === i)))
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Aggregates.appendKmvFrame(batch, artDir)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val served = Aggregates.serveKmvCube(spark, sf, artDir).collect().toSeq
    val full = Aggregates.kmvCubeServed(spark, sf).collect().toSeq
    assert(served.nonEmpty && served == full,
      "stream-maintained KMV cube diverges from the batch build")
  }

  test("ProcessingTime trigger with an ASYNC feeder: files landing mid-run curate to the batch result") {
    // VERDICT r9 ask #7: the other trigger tests pre-write every file
    // before start() — the trigger recurs but the source is static. Here
    // a feeder thread MOVES new slices into the source directory while
    // the query is already running under a timed trigger, so later
    // micro-batches discover data that did not exist when the query
    // started — the genuine asynchronous-ingest mode of a production
    // curation stream. The transform is the stateless curation pass, so
    // the final table must equal the batch operator over the union of
    // all slices regardless of arrival timing.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-async-src").toString
    def land(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      // write to the side, then an atomic move into the watched dir —
      // the file is never visible half-written
      val tmp = Files.createTempDirectory("graft-async-tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, java.nio.file.Paths.get(dir, f"s$i%02d.parquet"))
      ()
    }
    val slices = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    land(slices.head, 0) // exactly one slice exists at start()
    val q = StreamingOps.curateDocs(
        spark.readStream.schema(docs.schema).parquet(dir))
      .writeStream.format("memory").queryName("t_async_curate")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    try {
      // let the first batch fire on the initial file, then feed the rest
      // asynchronously with real gaps between arrivals
      q.processAllAvailable()
      val feeder = new Thread(() => (1 until 3).foreach { i =>
        Thread.sleep(500); land(slices(i), i)
      })
      feeder.start()
      feeder.join()
      q.processAllAvailable()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 2,
        s"expected async arrivals to produce extra data micro-batches, got $dataBatches")
    } finally q.stop()
    val got = spark.table("t_async_curate")
    val want = StreamingOps.curateDocs(docs)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.join(want, Seq("doc_id", "text"), "left_anti").count() == 0)
    assert(want.join(got, Seq("doc_id", "text"), "left_anti").count() == 0)
  }

  test("streaming tumbling window equals the batch twin") {
    val got = runToTable(StreamingOps.tumbling1h(eventsStream), "t_tumbling", "complete")
      .orderBy("bucket_sec", "event_type").collect().toSeq
    val want = StreamingTwins.tumbling1h(spark, sf)
      .select("bucket_sec", "event_type", "n_events")
      .orderBy("bucket_sec", "event_type").collect().toSeq
    assert(got == want)
  }

  test("streaming OHLC: struct min/max aggregates stream correctly, equals the batch bars") {
    // the q_ohlc_bars shape on the stream: open/close via struct min/max
    // are ORDERED aggregates (not just commutative counts), so this pins
    // that Spark's streaming state merges them associatively — partial
    // bars from different micro-batches must fold to the batch answer
    val streamed = eventsStream
      .select(col("event_type"),
        expr("ts div 3600000000000").as("hour"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "hour")
      .agg(min(struct(col("ts"), col("event_id"), col("cents"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("cents"))).as("c"),
        max(col("cents")).as("high_cents"), min(col("cents")).as("low_cents"),
        count(lit(1)).as("volume"))
      .select(col("event_type"), col("hour"), col("o.cents").as("open_cents"),
        col("high_cents"), col("low_cents"), col("c.cents").as("close_cents"),
        col("volume"))
    val got = runToTable(streamed, "t_ohlc", "complete")
      .orderBy("event_type", "hour").collect().toSeq
    val want = graft.operators.Windows.ohlcBars(spark, sf).collect().toSeq
    assert(got == want && got.nonEmpty)
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

  test("watermark replay (q_watermark_windows): late batch-2 rows dropped, horizon enforced (VERDICT r11 ask #3)") {
    import spark.implicits._
    val got = StreamingOps.watermarkedWindowsReplay(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(got.nonEmpty)
    // independent batch replay of the probed semantics: emitted rows are
    // the even-event_id (batch-1) rows in windows ending at or below the
    // terminal watermark (corpus max − 2h, ms-floored)
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts_us")).as("us"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)].collect()
    val finalWm = (ev.map(_._1).max / 1000L - 7200000L) * 1000L
    val want = ev
      .filter(e => e._2 % 2 == 0 && (e._1 / 3600000000L + 1) * 3600000000L <= finalWm)
      .groupBy(e => (e._1 / 3600000000L * 3600L, e._3))
      .map { case ((b, t), es) => (b, t, es.length.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    assert(got == want, "streamed watermark result diverged from the semantic replay")
    // the drop is real: the batch twin counts odd rows in these windows too
    val twinTotal = ev.count(e => (e._1 / 3600000000L + 1) * 3600000000L <= finalWm)
    assert(got.map(_._3).sum < twinTotal, "no late rows were actually dropped")
    // horizon: no emitted window may end past the terminal watermark
    assert(got.forall(r => (r._1 + 3600L) * 1000000L <= finalWm))
  }

  test("r12 replays: dedup emits each event once, enrich equals the batch join, funnel equals the batch machine") {
    import spark.implicits._
    // dedup: the fixture streams the corpus TWICE + the max row — output
    // must be every event exactly once
    val dd = StreamingOps.streamDedupReplay(spark, sf)
    assert(dd.count() == Tables.events(spark, sf).count())
    assert(dd.select("event_id").distinct().count() == dd.count())
    // enrich: stream-static join equals the plain batch join
    val en = StreamingOps.streamEnrichReplay(spark, sf)
      .as[(Long, Long, String, String)].collect().toSeq
    val want = Tables.events(spark, sf).alias("e")
      .join(Tables.customer(spark, sf).alias("c"),
        col("e.user_id") === col("c.c_custkey"), "left")
      .select(col("e.event_id"), col("e.user_id"), col("e.event_type"),
        col("c.c_mktsegment"))
      .as[(Long, Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(en == want)
    // stateful funnel over 3 chronological slices equals the batch funnel
    val sf3 = StreamingOps.streamFunnelReplay(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val batch = graft.operators.Funnels.funnel(spark, sf)
      .selectExpr("stage", "CAST(stage_ord AS BIGINT)", "n_users")
      .as[(String, Long, Long)].collect().toSeq
    assert(sf3.map(r => (r._1, r._3)) == batch.map(r => (r._1, r._3)))
  }

  test("r13 replay: stream-stream join over chronological slices equals the batch interval join") {
    import spark.implicits._
    val got = StreamingOps.streamStreamJoinReplay(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_us").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_us").as("purchase_ts"))
    val want = c.join(p,
      col("c_user") === col("p_user")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("c_user"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty, "fixture must produce matched pairs")
    assert(got == want,
      "streamed symmetric-hash join diverged from the batch interval join")
  }

  test("r13 replay: left-outer stream-stream join — matched = batch join, nulls = closed-form horizon") {
    import spark.implicits._
    val out = StreamingOps.streamStreamOuterReplay(spark, sf)
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        unix_micros(col("ts_us")).as("cus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        unix_micros(col("ts_us")).as("pus"))
    val joinCond = col("cu") === col("pu") &&
      col("pus") > col("cus") && col("pus") <= col("cus") + 3600000000L
    // matched pairs equal the batch inner join exactly
    val gotM = out.filter(col("purchase_id").isNotNull)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    val wantM = c.join(p, joinCond).select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(gotM == wantM, "outer replay's matched set diverged from the batch join")
    // null rows: exactly the unmatched clicks whose 1h window closed
    // below the probed two-sided-minimum terminal watermark
    val maxC = c.agg(max(col("cus"))).head.getLong(0)
    val maxP = p.agg(max(col("pus"))).head.getLong(0)
    val wm = math.min(maxC / 1000L * 1000L, maxP / 1000L * 1000L) - 7200000000L
    val gotN = out.filter(col("purchase_id").isNull)
      .select("click_id").as[Long].collect().toSet
    val wantN = c.join(p, joinCond, "left_anti")
      .filter(col("cus") + 3600000000L < wm)
      .select("click_id").as[Long].collect().toSet
    assert(gotN == wantN, "outer replay's null set diverged from the horizon closed form")
    assert(gotN.nonEmpty, "fixture must exercise null emission")
    assert(out.count() == gotM.size + gotN.size)
  }

  test("r13 replay: streamed session windows equal batch session_window over state rows at the horizon") {
    import spark.implicits._
    val got = StreamingOps.streamSessionsReplay(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // independent batch recompute: session_window in BATCH mode over the
    // stateful rows (even event_ids ∪ corpus-max pin), filtered to the
    // terminal-watermark emission horizon
    val ev = Tables.events(spark, sf).select(col("ts_us"), col("event_id"), col("user_id"))
    val maxUs = ev.agg(max(expr("unix_micros(ts_us)"))).first().getLong(0)
    val finalWm = (maxUs / 1000 - 7200000L) * 1000
    val state = ev.filter(pmod(col("event_id"), lit(2)) === 0
      || expr("unix_micros(ts_us)") === maxUs)
    val want = state
      .groupBy(col("user_id"), session_window(col("ts_us"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("min_eid"), max("event_id").as("max_eid"))
      .select(col("user_id"), expr("unix_micros(w.start)").as("start_us"),
        expr("unix_micros(w.end)").as("end_us"),
        col("n_events"), col("min_eid"), col("max_eid"))
      .filter(col("end_us") <= finalWm)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty, "fixture must emit sessions")
    assert(got == want, "streamed session merge diverged from batch session_window")
    // structural: per-user sessions disjoint and gap-closed
    got.groupBy(_._1).foreach { case (_, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(b._2 >= a._3, "overlapping emitted sessions")
        case _ => ()
      }
    }
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

  test("stream-stream join (click to purchase within 1h) equals the batch join") {
    val got = runToTable(
      StreamingOps.clickToPurchase(eventsStream, eventsStream), "t_ss_join", "append")
      .select("click_id", "purchase_id")
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts_us").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts_us").as("purchase_ts"))
    val want = c.join(p,
      col("c_user") === col("p_user")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("click_id", "purchase_id")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
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

  test("streaming funnel states reproduce the batch funnel stage counts") {
    import spark.implicits._
    import graft.operators.Funnels
    val evs = eventsStream
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[StreamingOps.FEv]
    val got = runToTable(StreamingOps.funnelStates(evs).toDF(), "t_funnel", "update")
    // AvailableNow: one batch → one snapshot per user; summing flags must
    // equal the oracle-checked batch funnel's stage counts exactly
    val counts = got.agg(
      sum(when(col("reached_view"), 1L).otherwise(0L)),
      sum(when(col("reached_click"), 1L).otherwise(0L)),
      sum(when(col("reached_purchase"), 1L).otherwise(0L)))
      .as[(Long, Long, Long)].head()
    val want = Funnels.funnel(spark, sf)
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(counts == ((want("view"), want("click"), want("purchase"))))
    // state carries across chunk boundaries: folding a split stream through
    // the shared kernel equals folding it whole (chunk-ordered arrival)
    val stream = Seq((10L, "view"), (20L, "click"), (30L, "purchase"), (40L, "view"))
    def fold(init: (Long, Long, Long), evs: Seq[(Long, String)]) =
      evs.foldLeft(init) { case ((v, c, p), (ts, et)) => Funnels.stepEvent(v, c, p, ts, et) }
    val whole = fold((Long.MaxValue, Long.MaxValue, Long.MaxValue), stream)
    val chunked = fold(fold((Long.MaxValue, Long.MaxValue, Long.MaxValue),
      stream.take(2)), stream.drop(2))
    assert(whole == chunked && whole == ((10L, 20L, 30L)))
  }

  test("stateful streaming funnel survives a restart across two chronological batches") {
    import spark.implicits._
    import graft.operators.Funnels
    // chunk-ordered arrival: batch 1 = first half of event time, batch 2 =
    // second half, with the query STOPPED in between — GroupState (the
    // three stage timestamps per user) must come back from the checkpoint
    // so the fold continues, not restarts
    val srcDir = Files.createTempDirectory("graft-funnel-src").toString
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    val evs = Tables.events(spark, sf).select("user_id", "ts", "event_type")
    val mid = evs.agg(expr("min(ts) + (max(ts) - min(ts)) div 2").as("m")).head.getLong(0)
    val b1 = evs.filter(col("ts") <= mid)
    val b2 = evs.filter(col("ts") > mid)
    assert(b1.count() > 0 && b2.count() > 0)
    // keep-latest upsert per user (the foreachBatch MERGE shape)
    val state = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Boolean, Boolean)]
    def runOnce(): Unit = {
      val q = StreamingOps.funnelStates(
          spark.readStream.schema(evs.schema).parquet(srcDir)
            .as[StreamingOps.FEv])
        .toDF()
        .writeStream
        .foreachBatch { (snap: DataFrame, _: Long) =>
          snap.collect().foreach { r =>
            state(r.getLong(0)) = (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
          }
          ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    b1.write.mode("append").parquet(srcDir)
    runOnce()
    val afterB1 = state.values.count(_._3) // purchases reached so far
    b2.write.mode("append").parquet(srcDir)
    runOnce()
    val counts = (state.values.count(_._1).toLong,
      state.values.count(_._2).toLong, state.values.count(_._3).toLong)
    val want = Funnels.funnel(spark, sf)
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(counts == ((want("view"), want("click"), want("purchase"))))
    // the restart genuinely continued: stage counts are monotone across
    // the restart (state never regressed) and every user's state survived
    // to the final snapshot
    assert(counts._3 >= afterB1)
    assert(state.keySet == evs.select("user_id").distinct()
      .as[Long].collect().toSet)
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
