package graft

import java.awt.image.BufferedImage
import graft.multimodal.Multimodal.MediaCodec

/** The codec itself, driver-side: real `javax.imageio` encode/decode
  * round-trips with known-answer images (no Spark involved — the
  * cluster-side contract is covered by the mm_* oracle queries and
  * QueriesSpec). */
class MultimodalSpec extends SparkSpec {

  test("encode emits genuine PNG/BMP container bytes") {
    val png = MediaCodec.encode(4L)
    assert(png.kind === "image/png")
    // PNG signature: 89 50 4E 47
    assert((png.payload(0) & 0xFF) === 0x89)
    assert(new String(png.payload.slice(1, 4), "US-ASCII") === "PNG")
    val bmp = MediaCodec.encode(5L)
    assert(bmp.kind === "image/bmp")
    assert(new String(bmp.payload.take(2), "US-ASCII") === "BM")
  }

  test("decode round-trips the generator's dimensions and every pixel") {
    for (docId <- Seq(0L, 1L, 7L, 123L, 500L)) {
      val dec = MediaCodec.decode(MediaCodec.encode(docId))
      val (w, h) = MediaCodec.dims(docId)
      assert((dec.width, dec.height) === ((w, h)))
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield MediaCodec.grayAt(docId, x, y).toLong).sum
      assert(dec.px_sum === expected, s"pixel checksum for doc $docId")
    }
  }

  test("decode of a hand-built image returns its known pixels") {
    // 3×2 gray ramp: 10 20 30 / 40 50 60
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) {
      val g = 10 * (y * 3 + x + 1)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    for (fmt <- Seq("png", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val back = MediaCodec.decodeImage(bos.toByteArray)
      assert((back.getWidth, back.getHeight) === ((3, 2)), fmt)
      assert(MediaCodec.pxSum(back) === 210L, fmt)
      assert((back.getRGB(2, 1) & 0xFF) === 60, fmt)
    }
  }

  test("audio codec: genuine WAV container, decode recovers every sample") {
    import graft.multimodal.Multimodal.AudioCodec
    val payload = AudioCodec.encode(7L)
    assert(new String(payload.take(4), "US-ASCII") === "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") === "WAVE")
    val meta = AudioCodec.decode(7L, payload)
    val n = AudioCodec.nSamples(7L)
    val expected = (0 until n).map(i => math.abs(AudioCodec.sampleAt(7L, i).toLong)).sum
    assert(meta.sample_rate === 8000L)
    assert(meta.channels === 1L)
    assert(meta.n_samples === n.toLong)
    assert(meta.abs_sum === expected)
  }

  test("corrupt media payloads quarantine instead of failing the job") {
    import graft.multimodal.Multimodal
    import Multimodal.MediaRow
    import spark.implicits._
    val good = MediaCodec.encode(4L).payload
    val rows = Seq(
      MediaRow(4L, good, "image/png", 1),
      MediaRow(5L, good.take(7), "image/png", 1),                 // truncated header
      MediaRow(6L, "not an image at all".getBytes, "image/png", 1),
      MediaRow(7L, MediaCodec.encode(7L).payload, "image/bmp", 1)
    ).toDS()
    val out = Multimodal.decodedSafe(rows).collect().sortBy(_.doc_id)
    assert(out.length === 4, "every input row accounted for")
    val (ok, bad) = out.partition(_.error == null)
    assert(ok.map(_.doc_id).toSeq === Seq(4L, 7L))
    assert(bad.map(_.doc_id).toSeq === Seq(5L, 6L))
    assert(bad.forall(a => a.width === -1 && a.error.nonEmpty))
    assert(ok.forall(a => a.width > 0 && a.px_sum > 0))
  }

  test("video container: seek table lets the sampler decode only sampled frames") {
    import graft.multimodal.Multimodal.VideoCodec
    val id = 12L // 5 frames → step 2 → samples {0, 2, 4}
    val payload = VideoCodec.encode(id)
    assert(new String(payload.take(4), "US-ASCII") === "GVID")
    val n = VideoCodec.nFrames(id)
    assert(n === 5)
    val (gotN, frames, read) = VideoCodec.decodeSampled(payload, f => f % 2 == 0)
    assert(gotN === n)
    assert(frames.map(_._1) === Seq(0, 2, 4))
    // sampled sums equal direct decodes of the same frames
    frames.foreach { case (f, px) =>
      assert(px === MediaCodec.pxSum(VideoCodec.frameImage(id, f)), s"frame $f")
    }
    // the partial read provably skipped the unsampled frames' bytes
    val (_, _, readAll) = VideoCodec.decodeSampled(payload, _ => true)
    assert(read < readAll)
    assert(readAll < payload.length, "header bytes are not frame payload")
  }

  test("binaryFile ingest: image files on disk → binary rows → real decode") {
    // the front door: write genuine image files, read them back through
    // the binaryFile source, decode the content column with the same
    // codec the mm_* queries use
    val dir = tmpDir("media-in")
    val ids = Seq(0L, 1L, 7L)
    ids.foreach { id =>
      val row = MediaCodec.encode(id)
      val ext = if (row.kind == "image/png") "png" else "bmp"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"doc_$id%04d.$ext"), row.payload)
    }
    // a non-media dropping the glob filter must exclude
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "manifest.txt"), "not an image".getBytes)
    val rows = graft.sources.FileSources.binary(spark, dir, "*.{png,bmp}")
      .select("path", "length", "content").collect()
    assert(rows.length === ids.length, "glob must exclude manifest.txt")
    rows.foreach { r =>
      val path = r.getString(0)
      val id = "doc_(\\d+)".r.findFirstMatchIn(path).get.group(1).toLong
      val content = r.getAs[Array[Byte]]("content")
      assert(r.getLong(1) === content.length.toLong)
      val img = MediaCodec.decodeImage(content)
      assert((img.getWidth, img.getHeight) === MediaCodec.dims(id), path)
    }
  }

  test("nearest-neighbor resize uses the exact integer mapping") {
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) {
      val g = y * 4 + x // 0..15
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = MediaCodec.resizeNearest(img, 2, 2)
    // dst(i,j) = src((i*4) div 2, (j*4) div 2) = src(2i, 2j)
    assert((out.getRGB(0, 0) & 0xFF) === 0)
    assert((out.getRGB(1, 0) & 0xFF) === 2)
    assert((out.getRGB(0, 1) & 0xFF) === 8)
    assert((out.getRGB(1, 1) & 0xFF) === 10)
  }
}
