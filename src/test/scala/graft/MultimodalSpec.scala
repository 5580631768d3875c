package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  /** Deterministic fixture image: w x h gradient where pixel (x, y) has
    * r = (x * 16 + y) & 0xff, g = (y * 16 + x) & 0xff, b = 7. Encoded with
    * the JDK's own ImageIO writer, so the bytes are reproducible in-test.
    */
  private def fixtureImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 16 + y) & 0xff
      val g = (y * 16 + x) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | 7)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  /** Independently computed expected mean luminance of the fixture. */
  private def fixtureMean(w: Int, h: Int): Double = {
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ((x * 16 + y) & 0xff) + ((y * 16 + x) & 0xff) + 7
    sum.toDouble / (3.0 * w * h)
  }

  test("decodeImage decodes real PNG pixels (lossless round-trip)") {
    val bytes = fixtureImage(8, 6, "png")
    val Some((w, h, mean)) = Multimodal.decodeImage(bytes)
    assert(w == 8 && h == 6)
    assert(mean == fixtureMean(8, 6)) // PNG is lossless: exact equality
  }

  test("decodeImage decodes real BMP pixels") {
    val bytes = fixtureImage(5, 9, "bmp")
    val Some((w, h, mean)) = Multimodal.decodeImage(bytes)
    assert(w == 5 && h == 9)
    assert(mean == fixtureMean(5, 9))
  }

  test("decodeImage rejects non-image payloads") {
    assert(Multimodal.decodeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures computes features from genuinely decoded pixels") {
    import spark.implicits._
    val png = fixtureImage(8, 6, "png")
    val bmp = fixtureImage(5, 9, "bmp")
    val txt = "not an image".getBytes("UTF-8")
    val media = Seq(
      MediaRecord(1L, "image/png", png, 8, 6),
      MediaRecord(2L, "image/bmp", bmp, 5, 9),
      MediaRecord(3L, "text/plain", txt, 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).feat_mean == fixtureMean(8, 6))
    assert(feats(2L).feat_mean == fixtureMean(5, 9))
    // text payload takes the deterministic fallback path
    val resized = Multimodal.resizeStub(txt, 256)
    val frames = Multimodal.frameSampleStub(resized, 32, 2)
    assert(feats(3L).feat_mean == frames.map(Multimodal.byteMean).sum / frames.length)
    assert(feats(1L).n_bytes == png.length.toLong)
  }

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

  test("byte-histogram fallback is deterministic and bounded by byte range") {
    val payload = "abc".getBytes("UTF-8")
    assert(Multimodal.byteMean(payload) == Multimodal.byteMean(payload))
    assert(Multimodal.byteMean(payload) >= 0.0 && Multimodal.byteMean(payload) <= 127.0)
    assert(Multimodal.byteMean(Array.emptyByteArray) == 0.0)
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

  test("language centroids: one row per lang x dim, cell re-derived exactly") {
    val got = Multimodal.langCentroids(spark, sf)
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(got.count() == nLangs * 64)
    // independent re-derivation of the (en, 0) cell with the same decimal
    // discipline
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), element_at(col("embedding"), 1).cast("double").as("e0"))
    val want = docs.join(vecs, col("doc_id") === col("vec_id"))
      .filter(col("lang") === "en")
      .agg(round(sum(col("e0").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6))
      .head.getDouble(0)
    val cell = got.filter(col("lang") === "en" && col("dim") === 0)
      .select("centroid").head.getDouble(0)
    assert(cell == want)
  }

  test("centroid classification covers every embedding exactly once") {
    val cm = Multimodal.centroidClassify(spark, sf)
    val total = cm.agg(sum("n")).head.getLong(0)
    assert(total == Tables.embeddings(spark, sf).count())
    // predictions come only from real languages
    val langs = Tables.documents(spark, sf).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(cm.select("pred_lang").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(langs))
  }
}
