package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryPack

/** Multimodal-column plumbing: media as opaque `BINARY` payloads with a
  * typed metadata struct, plus the partition-level decode / feature-
  * extract stage a real image/audio pipeline would run.
  *
  * The decode itself is STUBBED (no codec libraries in this container —
  * see [[MediaCodec.decodeStub]]), but everything Spark-side is real and
  * tested: the schema contract, the binary column handling, the
  * `mapPartitions` batch shape (one iterator pass, constant memory, no
  * per-row task overhead — the Scala analog of `mapInPandas` batches),
  * and the deterministic metadata derivation.
  */
object Multimodal extends QueryPack {

  /** One media row: payload + the metadata a real pipeline would carry. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)

  /** Extracted features; `embedding` stands in for a model output. */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, embedding: Array[Float])

  object MediaCodec {
    /** STUB — deterministic fake decode. A real deployment links an
      * image/audio codec here (the batch/iterator contract is the part
      * under test; this container ships no codec libraries). Derives
      * plausible dimensions from the payload bytes so downstream logic
      * has real-shaped data to chew on. */
    def decodeStub(row: MediaRow): MediaFeatures = {
      val n = row.payload.length
      val w = 64 + (n % 192)
      val h = 64 + ((n * 31) % 192)
      val emb = Array.tabulate(8)(i =>
        ((row.payload(i % math.max(n, 1)) & 0xFF) / 255.0f))
      MediaFeatures(row.doc_id, n.toLong, w, h, 1 + n % 8, emb)
    }
  }

  /** documents.text encoded as a UTF-8 binary payload — the stand-in
    * media bytes column (schema-identical to a real image/audio column). */
  def mediaTable(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/utf-8").as("kind"))

  /** The decode / feature-extract stage: one `mapPartitions` pass so a
    * real codec could amortize model/codec init per partition (the
    * Spark-native analog of a Pandas-UDF batch). */
  def extractFeatures(spark: SparkSession, d: String): Dataset[MediaFeatures] = {
    val s = spark
    import s.implicits._
    mediaTable(spark, d).as[MediaRow]
      .mapPartitions(rows => rows.map(MediaCodec.decodeStub))
  }

  /** The deterministic metadata projection (byte length → fake
    * dimensions), unsorted — the building block both queries share. */
  private def metaProjection(spark: SparkSession, d: String): DataFrame =
    mediaTable(spark, d)
      .withColumn("n_bytes", expr("octet_length(payload)").cast("long"))
      .withColumn("width", (lit(64) + col("n_bytes") % 192).cast("int"))
      .withColumn("height", (lit(64) + (col("n_bytes") * 31) % 192).cast("int"))
      .withColumn("n_frames", (lit(1) + col("n_bytes") % 8).cast("int"))
      .select("doc_id", "kind", "n_bytes", "width", "height", "n_frames")

  /** Oracle-checked metadata query: the deterministic part of the decode
    * expressed as pure columns, so the binary plumbing is verifiable
    * end-to-end in SQL. */
  def mmMeta(spark: SparkSession, d: String): DataFrame =
    metaProjection(spark, d).orderBy("doc_id")

  /** Resize planning: fit each media row into a `box`×`box` target
    * preserving aspect ratio, in pure integer math (scale only when the
    * longer edge exceeds the box; `new = old * box div longer_edge`) —
    * the metadata half of a resize stage, oracle-checkable end to end.
    * The pixel half is [[resizeFeatures]]. */
  def mmResize(spark: SparkSession, d: String): DataFrame =
    metaProjection(spark, d)
      .withColumn("mx", greatest(col("width"), col("height")))
      .withColumn("new_w", when(col("mx") <= 128, col("width"))
        .otherwise(expr("(width * 128) div mx")).cast("int"))
      .withColumn("new_h", when(col("mx") <= 128, col("height"))
        .otherwise(expr("(height * 128) div mx")).cast("int"))
      .select("doc_id", "width", "height", "new_w", "new_h")
      .orderBy("doc_id")

  /** The decode-side resize stage: same `mapPartitions` batch contract
    * as [[extractFeatures]] (codec init amortized per partition), pixel
    * work stubbed, dimension math identical to [[mmResize]] — the spec
    * proves the Dataset stage and the column plan agree row for row. */
  def resizeFeatures(ds: Dataset[MediaFeatures], box: Int): Dataset[MediaFeatures] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.mapPartitions(_.map { f =>
      val mx = math.max(f.width, f.height)
      if (mx <= box) f
      else f.copy(width = f.width * box / mx, height = f.height * box / mx)
    })
  }

  /** Frame-sampling plumbing: ≤4 uniformly-spaced frame indices per media
    * row plus their byte offsets — the seek table a video frame-sampler
    * would hand the (stubbed) decoder before touching any frame bytes.
    * Pure integer column math over the metadata (no decode), so the whole
    * sampling plan is oracle-checkable end to end, and at scale the
    * sampler reads only the sampled offsets instead of whole payloads. */
  def mmFrameSample(spark: SparkSession, d: String): DataFrame =
    metaProjection(spark, d) // unsorted: the final orderBy is the only sort
      .withColumn("step", expr("(n_frames + 3) div 4"))
      .withColumn("frame_idx",
        explode(expr("filter(sequence(0, n_frames - 1), x -> x % step = 0)")))
      .select(
        col("doc_id"),
        col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx").cast("long") * expr("n_bytes div n_frames")).as("frame_off"))
      .orderBy("doc_id", "frame_idx")

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "mm_meta" -> mmMeta,
    "mm_resize" -> mmResize,
    "mm_frame_sample" -> mmFrameSample)

  val oracles = Map(
    "mm_meta" ->
      """SELECT doc_id, 'text/utf-8' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 192 AS INTEGER) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 192 AS INTEGER) AS height,
        |  CAST(1 + octet_length(encode(text)) % 8 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CAST(64 + octet_length(encode(text)) % 192 AS INTEGER) AS width,
        |    CAST(64 + (octet_length(encode(text)) * 31) % 192 AS INTEGER) AS height
        |  FROM documents),
        |m AS (SELECT *, greatest(width, height) AS mx FROM meta)
        |SELECT doc_id, width, height,
        |  CAST(CASE WHEN mx <= 128 THEN width ELSE (width * 128) // mx END AS INTEGER) AS new_w,
        |  CAST(CASE WHEN mx <= 128 THEN height ELSE (height * 128) // mx END AS INTEGER) AS new_h
        |FROM m ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST(1 + octet_length(encode(text)) % 8 AS BIGINT) AS n_frames
        |  FROM documents),
        |s AS (SELECT *, (n_frames + 3) // 4 AS step FROM meta),
        |fx AS (
        |  SELECT doc_id, n_frames, n_bytes,
        |    unnest(list_filter(generate_series(0, n_frames - 1),
        |                       x -> x % step = 0)) AS frame_idx
        |  FROM s)
        |SELECT doc_id, n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(frame_idx * (n_bytes // n_frames) AS BIGINT) AS frame_off
        |FROM fx ORDER BY doc_id, frame_idx""".stripMargin)
}
