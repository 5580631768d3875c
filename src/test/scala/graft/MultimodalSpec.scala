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

  /** Deterministic WAV fixture encoded by the JDK's own writer: the given
    * 16-bit signed samples (interleaved if stereo) at 8 kHz, little-endian.
    */
  private def fixtureWav(samples: Array[Short], channels: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, channels, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("extractFeatures computes features from genuinely decoded pixels and PCM") {
    import spark.implicits._
    val png = fixtureImage(8, 6, "png")
    val bmp = fixtureImage(5, 9, "bmp")
    val txt = "not an image".getBytes("UTF-8")
    // 1024 samples of a +/-8192 square wave: |sample| = 8192 everywhere, so
    // every frame's RMS = 8192/32768 = 0.25 exactly (power-of-two scaling)
    val wav = fixtureWav(Array.tabulate(1024)(i => if (i % 2 == 0) 8192 else -8192)
      .map(_.toShort), 1)
    val media = Seq(
      MediaRecord(1L, "image/png", png, 8, 6),
      MediaRecord(2L, "image/bmp", bmp, 5, 9),
      MediaRecord(3L, "text/plain", txt, 0, 0),
      MediaRecord(4L, "audio/wav", wav, 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).feat_mean == fixtureMean(8, 6))
    assert(feats(2L).feat_mean == fixtureMean(5, 9))
    // text payload takes the deterministic byte-histogram fallback
    assert(feats(3L).feat_mean == Multimodal.byteMean(txt))
    assert(feats(1L).n_bytes == png.length.toLong)
    // audio payload: REAL WAV decode → framed RMS, exactly 0.25
    assert(feats(4L).feat_mean == 0.25)
  }

  test("decodeWavSamples decodes real 16-bit PCM mono samples") {
    val samples = Array[Short](0, 8192, -8192, 16384, -32768, 32767)
    val got = Multimodal.decodeWavSamples(fixtureWav(samples, 1))
    assert(got.isDefined)
    val want = samples.map(_.toDouble / 32768.0)
    assert(got.get.toSeq == want.toSeq) // power-of-two scaling: exact
  }

  test("decodeWavSamples averages stereo channels to mono") {
    // interleaved L/R: (8192, -8192) -> 0.0; (16384, 16384) -> 0.5
    val samples = Array[Short](8192, -8192, 16384, 16384)
    val got = Multimodal.decodeWavSamples(fixtureWav(samples, 2))
    assert(got.get.toSeq == Seq(0.0, 0.5))
  }

  test("decodeWavSamples rejects non-audio payloads") {
    assert(Multimodal.decodeWavSamples("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWavSamples(Array.emptyByteArray).isEmpty)
    // an image is not audio either
    assert(Multimodal.decodeWavSamples(fixtureImage(4, 4, "png")).isEmpty)
  }

  test("audioFrameRms frames in stream order and keeps every k-th frame") {
    // 10 samples, frames of 4 -> frames [0..3], [4..7], [8..9]; keep 0th, 2nd
    val s = Array(1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5, 3.0, 4.0)
    val got = Multimodal.audioFrameRms(s, 4, 2)
    // frame 0: rms(1,1,1,1) = 1; frame 2 (trailing, len 2): rms(3,4) = sqrt(12.5)
    assert(got == Seq(1.0, math.sqrt(12.5)))
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

  test("resizeImage rescales real pixels (uniform image stays uniform)") {
    // a uniform-color image resists interpolation artifacts: every output
    // pixel of a bilinear downscale must be the same color
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, (40 << 16) | (80 << 8) | 120)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val resized = Multimodal.resizeImage(bos.toByteArray, 4, 5)
    assert(resized.isDefined)
    val Some((w, h, mean)) = Multimodal.decodeImage(resized.get)
    assert(w == 4 && h == 5)
    assert(mean == (40.0 + 80.0 + 120.0) / 3.0)
    // non-images don't resize
    assert(Multimodal.resizeImage("text".getBytes("UTF-8"), 4, 4).isEmpty)
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
