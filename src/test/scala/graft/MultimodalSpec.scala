package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media features: checksum equals md5 of the text payload") {
    val f = Multimodal.mediaFeatures(spark, sf)
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("want"))
    assert(f.join(expected, "doc_id").filter(col("checksum") =!= col("want")).count() == 0)
  }

  test("media features: byte count equals n_chars (ASCII corpus)") {
    val f = Multimodal.mediaFeatures(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
    assert(f.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
  }

  test("decode stub is deterministic and bounded by byte range") {
    val payload = "abc".getBytes("UTF-8")
    assert(Multimodal.decodeStub(payload) == Multimodal.decodeStub(payload))
    assert(Multimodal.decodeStub(payload) >= 0.0 && Multimodal.decodeStub(payload) <= 127.0)
    assert(Multimodal.decodeStub(Array.emptyByteArray) == 0.0)
  }

  test("resize stub hits the target size and preserves small payloads") {
    val big = Array.tabulate(1000)(_.toByte)
    assert(Multimodal.resizeStub(big, 256).length == 256)
    val small = Array.tabulate(10)(_.toByte)
    assert(Multimodal.resizeStub(small, 256).toSeq == small.toSeq)
  }

  test("frame sampling keeps every k-th frame") {
    val payload = Array.tabulate(100)(_.toByte)
    val frames = Multimodal.frameSampleStub(payload, 10, 2)
    assert(frames.length == 5) // 10 frames, every 2nd
    assert(frames.head.toSeq == payload.take(10).toSeq)
  }

  test("multimodal join is 1:1 doc to embedding") {
    val j = Multimodal.multimodalJoin(spark, sf)
    assert(j.count() == j.select("doc_id").distinct().count())
  }
}
