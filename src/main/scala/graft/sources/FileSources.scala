package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file connectors beyond parquet — CSV / JSON-lines / ORC — with
  * the engine's ingest conventions applied uniformly: explicit schema
  * (never runtime inference in production paths — a schema drift then
  * fails loudly instead of silently re-typing a column), UTC timestamps,
  * and PERMISSIVE corrupt-record capture mirroring the Kafka path's
  * broken-message skip (S4).
  */
object FileSources {

  val CorruptCol = "_corrupt_record"

  private def reader(spark: SparkSession, schema: StructType): DataFrameReader =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)

  /** JSON-lines file(s) → typed rows + corrupt-row column. */
  def json(spark: SparkSession, schema: StructType, path: String): DataFrame =
    reader(spark, schema).json(path)

  /** CSV with header → typed rows + corrupt-row column. */
  def csv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    reader(spark, schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** ORC (schema enforced by the format itself). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw media ingest: a directory of image/audio/video files as binary
    * rows (`path`, `modificationTime`, `length`, `content`) — the
    * front door of the multimodal family
    * ([[graft.multimodal.Multimodal]] decodes the `content` column).
    * `pathGlobFilter` keeps non-media droppings (checksums, manifests)
    * out of the scan; `length` is available WITHOUT reading file bodies,
    * so size-based filtering prunes at the listing. Each file is one
    * row read in full — the right granularity for images; for large
    * video, pair with a manifest table and range reads instead. */
  def binary(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Split a permissively-read frame into (clean, corrupt) — the batch
    * mirror of `kafka_skip_broken_messages`: bad rows are quarantined,
    * never fatal, and stay inspectable. The parse is cached first —
    * Spark refuses corrupt-record-only projections over a raw file scan
    * (the column exists only while the row is being parsed). */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    val clean = parsed.filter(parsed(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(parsed(CorruptCol).isNotNull).select(CorruptCol)
    (clean, bad)
  }
}
