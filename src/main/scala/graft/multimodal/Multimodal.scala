package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryPack

/** Multimodal-column plumbing with a REAL codec: media as opaque
  * `BINARY` payloads (actual PNG/BMP images, encoded and decoded with
  * the JDK's `javax.imageio` — no external dependency), plus the
  * partition-level decode / feature-extract / resize stages an
  * image/video pipeline runs.
  *
  * The synthetic corpus carries no image files, so the payloads are
  * GENERATED — but generated as real compressed image bytes whose
  * ground truth is a closed-form function of `doc_id`: dimensions
  * `8 + (doc_id·7) mod 56 × 8 + (doc_id·13) mod 56`, gray pixel
  * `(x·7 + y·13 + doc_id) mod 256`, PNG for even ids / BMP for odd.
  * Every decoded value the queries emit (width, height, pixel sums —
  * including the sum over a real nearest-neighbor resize) is therefore
  * oracle-checkable in SQL while still having passed through an actual
  * encoder and decoder: a corrupted codec path cannot hash-match.
  *
  * Everything Spark-side is the shape a real deployment uses: binary
  * column + typed metadata, one `mapPartitions` pass per stage (codec
  * and model init amortized per partition — the Scala analog of a
  * Pandas-UDF batch), and at scale the sampler/seek stages plan over
  * metadata only, never payload bytes.
  */
object Multimodal extends QueryPack {

  /** One media row: real image payload + the container metadata a
    * pipeline carries alongside (`n_frames` plays the video frame
    * count; the still image stands in for one frame's plane). */
  case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String, n_frames: Int)

  /** Decode output: true dimensions + pixel checksum from the codec. */
  case class Decoded(doc_id: Long, kind: String, width: Int, height: Int,
      px_sum: Long, n_frames: Int)

  /** Real resize output: decoded dims, target dims, and the pixel sum
    * of the actually-resized raster. */
  case class Resized(doc_id: Long, width: Int, height: Int,
      new_w: Int, new_h: Int, new_px_sum: Long)

  /** Extracted features; `embedding` stands in for a model output but
    * is computed from real decoded pixels. */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, embedding: Array[Float])

  /** One decode attempt: populated on success, `error` holds the
    * exception class on failure (never both). */
  case class DecodeAttempt(doc_id: Long, kind: String, width: Int,
      height: Int, px_sum: Long, n_frames: Int, error: String)

  /** Audio metadata from a real WAV decode. */
  case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
      n_samples: Long, abs_sum: Long)

  /** The audio sibling of [[MediaCodec]]: genuine WAV containers via
    * the JDK's `javax.sound.sampled` — no external dependency, works
    * headless. Synthesis is deterministic per doc_id (the oracle
    * mirrors the closed form); decode goes through the JDK's real WAV
    * parser, so a corrupted header, wrong byte order, or truncated PCM
    * block breaks the oracle match.
    *
    * The parser is obtained as the `javax.sound.sampled.spi`
    * provider instance (one `ServiceLoader` lookup per partition, the
    * [[MediaCodec.encodeAll]] amortization pattern) rather than through
    * the `AudioSystem` facade: the facade re-scans its provider
    * registry under a GLOBAL lock on every call, which made 32 decode
    * threads 2.3× SLOWER than one (measured) — same codec classes, no
    * shared lock. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

    val SampleRate = 8000

    def nSamples(docId: Long): Int = (200 + docId % 500).toInt

    /** Deterministic 16-bit PCM sample: values in [-1001, 1001]. */
    def sampleAt(docId: Long, i: Int): Short =
      (((docId * 31 + i.toLong * 7) % 2003) - 1001).toShort

    /** The JDK's own WAV writer, selected by declared type support. */
    private[multimodal] def wavWriter(): AudioFileWriter = {
      val it = java.util.ServiceLoader.load(classOf[AudioFileWriter]).iterator()
      while (it.hasNext) {
        val w = it.next()
        if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) return w
      }
      sys.error("no WAVE AudioFileWriter provider on this JDK")
    }

    /** The JDK's own WAV reader, selected by probing a known payload
      * (the reader SPI exposes no type query; non-WAV readers reject
      * the probe with UnsupportedAudioFileException). Callers that
      * already hold the writer pass it in, skipping a second
      * ServiceLoader scan. */
    private[multimodal] def wavReader(
        writer: AudioFileWriter = wavWriter()): AudioFileReader = {
      val probe = encodeWith(writer, 0L)
      val it = java.util.ServiceLoader.load(classOf[AudioFileReader]).iterator()
      while (it.hasNext) {
        val r = it.next()
        try {
          r.getAudioInputStream(new ByteArrayInputStream(probe)).close()
          return r
        } catch { case _: Exception => () }
      }
      sys.error("no WAVE AudioFileReader provider on this JDK")
    }

    private def encodeWith(writer: AudioFileWriter, docId: Long): Array[Byte] = {
      val n = nSamples(docId)
      val bytes = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sampleAt(docId, i)
        bytes(2 * i) = (s & 0xFF).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      writer.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    private def decodeWith(reader: AudioFileReader, docId: Long,
        payload: Array[Byte]): AudioMeta = {
      val ais = reader.getAudioInputStream(new ByteArrayInputStream(payload))
      val f = ais.getFormat
      val data = ais.readAllBytes()
      val n = data.length / 2
      var sum = 0L
      var i = 0
      while (i < n) {
        val v = (((data(2 * i + 1) & 0xFF) << 8) | (data(2 * i) & 0xFF)).toShort
        sum += math.abs(v.toLong)
        i += 1
      }
      AudioMeta(docId, f.getSampleRate.toLong, f.getChannels.toLong, n.toLong, sum)
    }

    /** One real mono 16-bit little-endian WAV per doc (single-use
      * convenience; the query path amortizes via [[roundTripAll]]). */
    def encode(docId: Long): Array[Byte] = encodeWith(wavWriter(), docId)

    /** Real decode: container-parsed format + PCM scan. `abs_sum` is an
      * integer-exact amplitude checksum — one flipped sample bit
      * anywhere misses the oracle. */
    def decode(docId: Long, payload: Array[Byte]): AudioMeta =
      decodeWith(wavReader(), docId, payload)

    /** Partition-amortized encode→decode round trip: one provider
      * lookup serves every row. */
    def roundTripAll(ids: Iterator[Long]): Iterator[AudioMeta] = {
      val writer = wavWriter()
      val reader = wavReader(writer)
      ids.map(id => decodeWith(reader, id, encodeWith(writer, id)))
    }
  }

  object MediaCodec {
    /** Ground-truth dimensions for `doc_id` (the generator contract the
      * oracle mirrors): small enough that a 5000-doc corpus encodes in
      * milliseconds, wide enough that the resize box binds sometimes. */
    def dims(docId: Long): (Int, Int) =
      ((8 + (docId * 7) % 56).toInt, (8 + (docId * 13) % 56).toInt)

    /** Ground-truth gray value at (x, y). */
    def grayAt(docId: Long, x: Int, y: Int): Int =
      ((x * 7L + y * 13L + docId) % 256).toInt

    def formatOf(docId: Long): String = if (docId % 2 == 0) "png" else "bmp"

    /** Encode the ground-truth raster as real PNG/BMP bytes (one-off
      * convenience over [[encodeAll]], which amortizes writer setup). */
    def encode(docId: Long): MediaRow = encodeAll(Iterator(docId)).next()

    def decodeImage(payload: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(payload))

    /** Per-partition encoder: the `ImageWriter`s are looked up ONCE and
      * reused for every row (the registry scan + writer spin-up behind
      * each `ImageIO.write` call is exactly the per-row overhead the
      * mapPartitions batch contract exists to amortize). */
    def encodeAll(ids: Iterator[Long]): Iterator[MediaRow] = {
      val writers = Map(
        "png" -> ImageIO.getImageWritersByFormatName("png").next(),
        "bmp" -> ImageIO.getImageWritersByFormatName("bmp").next())
      ids.map { docId =>
        val (w, h) = dims(docId)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        // bulk raster write: one JNI-free array store per image instead
        // of w×h synchronized setRGB calls (the per-pixel path measured
        // ~6× slower across the mm_* fixture builds)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = grayAt(docId, x, y)
            px(y * w + x) = (g << 16) | (g << 8) | g
            x += 1
          }
          y += 1
        }
        img.setRGB(0, 0, w, h, px, 0, w)
        val fmt = formatOf(docId)
        val bos = new ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        val writer = writers(fmt)
        writer.setOutput(ios)
        writer.write(img)
        ios.close()
        MediaRow(docId, bos.toByteArray, s"image/$fmt", (1 + docId % 8).toInt)
      }
    }

    /** Per-partition decode loop with `ImageReader` reuse — the read
      * side of the same amortization. */
    def withImages[T](rows: Iterator[MediaRow])(
        f: (MediaRow, BufferedImage) => T): Iterator[T] = {
      val readers = Map(
        "image/png" -> ImageIO.getImageReadersByFormatName("png").next(),
        "image/bmp" -> ImageIO.getImageReadersByFormatName("bmp").next())
      rows.map { row =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(row.payload))
        val reader = readers(row.kind)
        reader.setInput(iis)
        val img = reader.read(0)
        iis.close()
        f(row, img)
      }
    }

    /** Sum of the gray (low) channel over a raster — both PNG and BMP
      * are lossless, so this must reproduce the generator's values. */
    def pxSum(img: BufferedImage): Long = {
      // bulk raster read (see encodeAll's write-side note)
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i) & 0xFF; i += 1 }
      s
    }

    def decode(row: MediaRow): Decoded = {
      val img = decodeImage(row.payload)
      Decoded(row.doc_id, row.kind, img.getWidth, img.getHeight,
        pxSum(img), row.n_frames)
    }

    /** Nearest-neighbor resize with the exact integer mapping
      * `src((i·w) div nw, (j·h) div nh)` — implementation-defined
      * Graphics2D sampling would not be oracle-checkable. */
    def resizeNearest(img: BufferedImage, nw: Int, nh: Int): BufferedImage = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      var j = 0
      while (j < nh) {
        var i = 0
        while (i < nw) {
          out.setRGB(i, j, img.getRGB(i * w / nw, j * h / nh))
          i += 1
        }
        j += 1
      }
      out
    }
  }

  /** The media column: one real encoded image per document. Generated
    * per partition (encoder state amortized), payload is genuine
    * compressed bytes — schema-identical to an ingested image column. */
  def mediaTable(spark: SparkSession, d: String): Dataset[MediaRow] = {
    val s = spark
    import s.implicits._
    // the documents table is one parquet file at test scale → one input
    // partition; spread the (CPU-bound) codec work across the cluster
    // before the mapPartitions stage, as an ingest job would arrive
    // already sharded
    // EXPLICIT partition count: a plain repartition(col) exchange is
    // fair game for AQE coalescing, and a frame of bare doc ids is so
    // small it collapses to ONE partition — serializing the codec work
    // that is the entire cost of this stage (measured 3.1 s → 0.6 s on
    // mm_video_sample at sf0.1). Pinning N disables coalescing for
    // exactly this exchange; the downstream cost is per-ROW CPU, not
    // bytes, which is the one thing AQE's size heuristic cannot see.
    Tables.documents(spark, d).select("doc_id").as[Long]
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions(MediaCodec.encodeAll)
  }

  /** The decode stage: one `mapPartitions` pass, real `ImageIO` reads. */
  def decodedTable(spark: SparkSession, d: String): Dataset[Decoded] = {
    val s = spark
    import s.implicits._
    mediaTable(spark, d).mapPartitions(MediaCodec.withImages(_) { (row, img) =>
      Decoded(row.doc_id, row.kind, img.getWidth, img.getHeight,
        MediaCodec.pxSum(img), row.n_frames)
    })
  }

  /** The decode / feature-extract stage: true byte length and decoded
    * dimensions; the embedding is the first image row's first 8 gray
    * values scaled to [0,1] (a stand-in model head over real pixels). */
  def extractFeatures(spark: SparkSession, d: String): Dataset[MediaFeatures] = {
    val s = spark
    import s.implicits._
    mediaTable(spark, d).mapPartitions(MediaCodec.withImages(_) { (row, img) =>
      val emb = Array.tabulate(8)(i =>
        (img.getRGB(i % img.getWidth, 0) & 0xFF) / 255.0f)
      MediaFeatures(row.doc_id, row.payload.length.toLong,
        img.getWidth, img.getHeight, row.n_frames, emb)
    })
  }

  /** Oracle-checked decode query: kind, codec-read dimensions, and the
    * decoded pixel checksum — if the encoder or decoder corrupted one
    * pixel anywhere, `px_sum` misses the oracle's closed form. */
  def mmMeta(spark: SparkSession, d: String): DataFrame =
    decodedTable(spark, d).toDF()
      .select("doc_id", "kind", "width", "height", "px_sum", "n_frames")
      .orderBy("doc_id")

  /** Real resize, oracle-checked end to end: decode, fit into a 32×32
    * box preserving aspect ratio (scale only when the longer edge
    * exceeds the box), nearest-neighbor resample the actual raster, and
    * emit the resized pixel sum alongside both geometries. */
  def mmResize(spark: SparkSession, d: String): DataFrame = {
    val s = spark
    import s.implicits._
    mediaTable(spark, d).mapPartitions(MediaCodec.withImages(_) { (row, img) =>
      val (w, h) = (img.getWidth, img.getHeight)
      val mx = math.max(w, h)
      val (nw, nh) = if (mx <= 32) (w, h) else (w * 32 / mx, h * 32 / mx)
      val out = if (nw == w && nh == h) img else MediaCodec.resizeNearest(img, nw, nh)
      Resized(row.doc_id, w, h, nw, nh, MediaCodec.pxSum(out))
    }).toDF().orderBy("doc_id")
  }

  /** The dims-only resize plan over an already-decoded feature frame —
    * same integer math as [[mmResize]], kept for pipelines that only
    * need target geometry (no pixel work, no payload reads). */
  def resizeFeatures(ds: Dataset[MediaFeatures], box: Int): Dataset[MediaFeatures] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.mapPartitions(_.map { f =>
      val mx = math.max(f.width, f.height)
      if (mx <= box) f
      else f.copy(width = f.width * box / mx, height = f.height * box / mx)
    })
  }

  /** Frame-sampling plumbing: ≤4 uniformly-spaced frame indices per
    * media row plus their plane offsets (`frame_idx · width · height`
    * pixels — the seek table a video sampler hands the decoder). The
    * geometry comes from the real decode; the sampling plan itself is
    * pure column math over metadata, so at scale the sampler reads only
    * sampled planes, never whole payloads. */
  def mmFrameSample(spark: SparkSession, d: String): DataFrame =
    decodedTable(spark, d).toDF()
      .withColumn("step", expr("(n_frames + 3) div 4"))
      .withColumn("frame_idx",
        explode(expr("filter(sequence(0, n_frames - 1), x -> x % step = 0)")))
      .select(
        col("doc_id"),
        col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx").cast("long") * col("width") * col("height")).as("frame_off"))
      .orderBy("doc_id", "frame_idx")

  /** One decoded sampled video frame. `bytes_read` / `bytes_total`
    * records the partial-read win: only sampled frames' payloads were
    * decoded. */
  case class VideoFrame(doc_id: Long, n_frames: Long, frame_idx: Long,
      px_sum: Long, bytes_read: Long, bytes_total: Long)

  /** A homemade multi-frame container that makes the frame-sampling
    * story REAL instead of planned: `GVID` magic, frame count, a length
    * table, then one genuine BMP per frame (BMP, not PNG: the synthetic
    * corpus pays the encoder ~22k times per bench run, and deflate
    * would dominate the measurement — in production the container
    * arrives already encoded and only the DECODE path below is the
    * operator). The length table is the seek index — a sampler reads
    * it, skips straight to the sampled frames' offsets, and
    * ImageIO-decodes ONLY those payloads (the unsampled frames' bytes
    * are never parsed), exactly how a video pipeline reads keyframes
    * out of a real container. */
  object VideoCodec {
    import java.io.ByteArrayOutputStream
    import java.nio.ByteBuffer

    /** Frame `f` of doc `docId`: the image family's gray formula
      * shifted by 31·f per frame (oracle mirrors it). */
    def frameImage(docId: Long, f: Int): BufferedImage = {
      val (w, h) = MediaCodec.dims(docId)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((x * 7 + y * 13 + docId + f * 31L) % 256).toInt
          px(y * w + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, w, h, px, 0, w)
      img
    }

    def nFrames(docId: Long): Int = (1 + docId % 8).toInt

    /** Single-use convenience (tests). The query path goes through the
      * partition-amortized [[encodeAll]]/[[decodeSampledAll]] — 22k
      * per-call `ImageIO.write` registry scans were the dominant cost
      * of the whole query before amortization. */
    def encode(docId: Long): Array[Byte] =
      encodeAll(Iterator(docId)).next()._2

    def encodeAll(ids: Iterator[Long]): Iterator[(Long, Array[Byte])] = {
      val writer = ImageIO.getImageWritersByFormatName("bmp").next()
      ids.map { docId =>
        val frames = (0 until nFrames(docId)).map { f =>
          val bos = new ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(frameImage(docId, f))
          ios.close()
          bos.toByteArray
        }
        val out = new ByteArrayOutputStream()
        out.write("GVID".getBytes("US-ASCII"))
        val head = ByteBuffer.allocate(4 + 4 * frames.size)
        head.putInt(frames.size)
        frames.foreach(fb => head.putInt(fb.length))
        out.write(head.array())
        frames.foreach(out.write)
        docId -> out.toByteArray
      }
    }

    /** Single-use convenience (tests); see [[decodeSampledAll]]. */
    def decodeSampled(payload: Array[Byte], sample: Int => Boolean):
        (Int, Seq[(Int, Long)], Long) = {
      val (_, n, fr, read) =
        decodeSampledAll(Iterator(((), payload, sample))).next()
      (n, fr, read)
    }

    /** Decode ONLY the frames each predicate samples; everything else is
      * skipped via the length table. One `ImageReader` serves the whole
      * partition; the `A` tag passes through untouched so callers can
      * keep the pipeline a lazy single pass. Each element yields
      * (tag, n_frames, decoded (frame, pixel sum) pairs, bytes parsed). */
    def decodeSampledAll[A](in: Iterator[(A, Array[Byte], Int => Boolean)]):
        Iterator[(A, Int, Seq[(Int, Long)], Long)] = {
      val reader = ImageIO.getImageReadersByFormatName("bmp").next()
      in.map { case (tag, payload, sample) =>
        val bb = ByteBuffer.wrap(payload)
        val magic = new Array[Byte](4); bb.get(magic)
        require(new String(magic, "US-ASCII") == "GVID", "bad container magic")
        val n = bb.getInt
        val lengths = Array.fill(n)(bb.getInt)
        var off = 4 + 4 + 4 * n
        var read = 0L
        val decoded = (0 until n).flatMap { f =>
          val len = lengths(f)
          val res = if (sample(f)) {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload, off, len))
            reader.setInput(iis)
            val img = reader.read(0)
            iis.close()
            read += len
            Some(f -> MediaCodec.pxSum(img))
          } else None
          off += len
          res
        }
        (tag, n, decoded, read)
      }
    }
  }

  /** Fail-soft decode — the media mirror of the ingest family's
    * broken-message skip (S4): corrupt payloads become quarantine rows
    * (`error` = exception class, geometry −1) instead of failing the
    * job, and every input row is accounted for exactly once. Split
    * with `.filter(col("error").isNull)` /
    * `.filter(col("error").isNotNull)` downstream, like
    * [[graft.sources.FileSources.quarantine]]. */
  def decodedSafe(media: Dataset[MediaRow]): Dataset[DecodeAttempt] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.map { row =>
      try {
        val img = MediaCodec.decodeImage(row.payload)
        if (img == null) throw new java.io.IOException("unreadable payload")
        DecodeAttempt(row.doc_id, row.kind, img.getWidth, img.getHeight,
          MediaCodec.pxSum(img), row.n_frames, null)
      } catch {
        case scala.util.control.NonFatal(e) =>
          DecodeAttempt(row.doc_id, row.kind, -1, -1, -1L, row.n_frames,
            e.getClass.getSimpleName)
      }
    })
  }

  /** Real frame sampling: build the container, read its seek table,
    * decode only the ≤4 uniformly-stepped frames (`x % step == 0`, the
    * same rule [[mmFrameSample]] plans), and emit each sampled frame's
    * REAL pixel checksum plus the bytes-read/bytes-total evidence of
    * the partial read. */
  def mmVideoSample(spark: SparkSession, d: String): DataFrame = {
    val s = spark
    import s.implicits._
    graft.Tables.documents(spark, d).select("doc_id").as[Long]
      // explicit N: see mediaTable's AQE-coalescing note
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { ids =>
        // one lazy pass: shared writer (encodeAll) feeds the shared
        // reader (decodeSampledAll) with the doc id riding the tag slot
        val in = VideoCodec.encodeAll(ids).map { case (id, payload) =>
          val step = (VideoCodec.nFrames(id) + 3) / 4
          ((id, payload.length.toLong), payload, (f: Int) => f % step == 0)
        }
        VideoCodec.decodeSampledAll(in).flatMap {
          case ((id, totalBytes), n, frames, read) =>
            frames.map { case (f, px) =>
              VideoFrame(id, n.toLong, f.toLong, px, read, totalBytes)
            }
        }
      }
      .toDF()
      .select("doc_id", "n_frames", "frame_idx", "px_sum")
      .orderBy("doc_id", "frame_idx")
  }

  /** Audio decode query: encode a real WAV per doc (partition-amortized,
    * like [[mediaTable]]), parse it back through the JDK's WAV SPI
    * provider (NOT the `AudioSystem` facade — see [[AudioCodec]]'s
    * lock note), emit container format + the exact amplitude
    * checksum. */
  def mmAudioMeta(spark: SparkSession, d: String): DataFrame = {
    val s = spark
    import s.implicits._
    graft.Tables.documents(spark, d).select("doc_id").as[Long]
      // explicit N: see mediaTable's AQE-coalescing note
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions(AudioCodec.roundTripAll)
      .toDF()
      .orderBy("doc_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "mm_meta" -> mmMeta,
    "mm_resize" -> mmResize,
    "mm_audio_meta" -> mmAudioMeta,
    "mm_video_sample" -> mmVideoSample,
    "mm_frame_sample" -> mmFrameSample)

  // ground-truth geometry shared by all three oracles
  private val dimsSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS kind,
      |  CAST(8 + (doc_id * 7) % 56 AS INTEGER) AS width,
      |  CAST(8 + (doc_id * 13) % 56 AS INTEGER) AS height,
      |  CAST(1 + doc_id % 8 AS INTEGER) AS n_frames
      |FROM documents""".stripMargin

  val oracles = Map(
    "mm_meta" ->
      s"""WITH m AS ($dimsSql),
         |xs AS (SELECT doc_id, height, unnest(generate_series(0, width - 1)) AS x FROM m),
         |xys AS (SELECT doc_id, x, unnest(generate_series(0, height - 1)) AS y FROM xs),
         |ps AS (SELECT doc_id, SUM((x * 7 + y * 13 + doc_id) % 256) AS px_sum
         |       FROM xys GROUP BY doc_id)
         |SELECT m.doc_id, m.kind, m.width, m.height,
         |       CAST(ps.px_sum AS BIGINT) AS px_sum, m.n_frames
         |FROM m JOIN ps USING (doc_id) ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      s"""WITH m AS ($dimsSql),
         |r AS (SELECT doc_id, width, height, greatest(width, height) AS mx FROM m),
         |rr AS (SELECT doc_id, width, height,
         |  CAST(CASE WHEN mx <= 32 THEN width ELSE (width * 32) // mx END AS INTEGER) AS new_w,
         |  CAST(CASE WHEN mx <= 32 THEN height ELSE (height * 32) // mx END AS INTEGER) AS new_h
         |  FROM r),
         |xs AS (SELECT doc_id, width, height, new_w, new_h,
         |       unnest(generate_series(0, new_w - 1)) AS i FROM rr),
         |xys AS (SELECT doc_id, width, height, new_w, new_h, i,
         |       unnest(generate_series(0, new_h - 1)) AS j FROM xs),
         |ps AS (SELECT doc_id,
         |       SUM((((i * width) // new_w) * 7 + ((j * height) // new_h) * 13 + doc_id) % 256) AS s
         |       FROM xys GROUP BY doc_id)
         |SELECT rr.doc_id, rr.width, rr.height, rr.new_w, rr.new_h,
         |       CAST(ps.s AS BIGINT) AS new_px_sum
         |FROM rr JOIN ps USING (doc_id) ORDER BY doc_id""".stripMargin,
    // per-frame pixel formula mirrored; the Spark side recovers it
    // through real BMP decodes of only the sampled container entries
    "mm_video_sample" ->
      s"""WITH m AS ($dimsSql),
         |s AS (SELECT *, (CAST(n_frames AS BIGINT) + 3) // 4 AS step FROM m),
         |fx AS (
         |  SELECT doc_id, n_frames, width, height,
         |    unnest(list_filter(generate_series(0, CAST(n_frames AS BIGINT) - 1),
         |                       x -> x % step = 0)) AS frame_idx
         |  FROM s),
         |xs AS (SELECT doc_id, n_frames, height, frame_idx,
         |       unnest(generate_series(0, width - 1)) AS x FROM fx),
         |xys AS (SELECT doc_id, n_frames, frame_idx, x,
         |       unnest(generate_series(0, height - 1)) AS y FROM xs),
         |ps AS (SELECT doc_id, n_frames, frame_idx,
         |       SUM((x * 7 + y * 13 + doc_id + frame_idx * 31) % 256) AS px_sum
         |       FROM xys GROUP BY doc_id, n_frames, frame_idx)
         |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
         |       CAST(frame_idx AS BIGINT) AS frame_idx,
         |       CAST(px_sum AS BIGINT) AS px_sum
         |FROM ps ORDER BY doc_id, frame_idx""".stripMargin,
    // closed-form mirror of the PCM synthesis; the Spark side must
    // recover the identical values through the real WAV round trip
    "mm_audio_meta" ->
      """WITH m AS (SELECT doc_id, 200 + doc_id % 500 AS n FROM documents),
        |xs AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS i FROM m),
        |s AS (SELECT doc_id,
        |        SUM(abs((doc_id * 31 + i * 7) % 2003 - 1001)) AS abs_sum
        |      FROM xs GROUP BY doc_id)
        |SELECT m.doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |       CAST(1 AS BIGINT) AS channels, CAST(m.n AS BIGINT) AS n_samples,
        |       CAST(s.abs_sum AS BIGINT) AS abs_sum
        |FROM m JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH m AS ($dimsSql),
         |s AS (SELECT *, (CAST(n_frames AS BIGINT) + 3) // 4 AS step FROM m),
         |fx AS (
         |  SELECT doc_id, n_frames, width, height,
         |    unnest(list_filter(generate_series(0, CAST(n_frames AS BIGINT) - 1),
         |                       x -> x % step = 0)) AS frame_idx
         |  FROM s)
         |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
         |       CAST(frame_idx AS BIGINT) AS frame_idx,
         |       CAST(frame_idx * width * height AS BIGINT) AS frame_off
         |FROM fx ORDER BY doc_id, frame_idx""".stripMargin)
}
