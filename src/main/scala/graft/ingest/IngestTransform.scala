package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.EventSchemas

/** The reference's materialized-view transforms, as pure batch
  * `DataFrame => DataFrame` functions (so they are testable without Kafka
  * and reusable verbatim under `readStream` — Structured Streaming executes
  * the same logical plan incrementally).
  *
  * Semantics replicated (SURVEY.md §2.2, §2.8):
  *  - JSONEachRow parse with broken-message skip
  *    (`kafka_skip_broken_messages=1`, reference generate_data.py:67):
  *    `from_json` yields a null struct on corrupt input; we drop those rows.
  *  - `parseDateTimeBestEffortOrNull(event_time)` (generate_data.py:215,236):
  *    lenient parse — NULL, not error, on garbage. The wire format is fixed
  *    `yyyy-MM-dd HH:mm:ss`, but we accept ISO-8601 variants too via
  *    coalesce of `try_to_timestamp` patterns.
  *  - `toDecimal32(x, 2)` (generate_data.py:220-222): cast to Decimal(9,2).
  *  - `WHERE price IS NOT NULL` (generate_data.py:227): drop unparsable
  *    prices — the ONLY row filter in the sales MV; the unparseable-
  *    event_time row is kept (event_time NULL), matching the reference.
  *  - `processing_time DateTime DEFAULT now()` (generate_data.py:169,190):
  *    stamped at ingest with `current_timestamp()`.
  *
  * Every expression here is a built-in `org.apache.spark.sql.functions`
  * call, so the whole transform stays inside whole-stage codegen and
  * pushes through Catalyst untouched — no UDFs, no RDDs.
  */
object IngestTransform {

  /** Lenient string→timestamp: NULL on failure, never an error.
    * Mirrors ClickHouse parseDateTimeBestEffortOrNull for the formats the
    * pipeline can see (fixed format first — it short-circuits). */
  def bestEffortTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd")))

  private val money = EventSchemas.money

  /** Raw JSON lines (column `value`: STRING) → typed sales rows.
    * Corrupt JSON rows are skipped (S4); null-price rows dropped (P3). */
  def salesFromJson(raw: DataFrame): DataFrame = {
    val parsed = raw
      .select(from_json(col("value"), EventSchemas.salesRaw).as("e"))
      .filter(col("e").isNotNull && col("e.event_id").isNotNull)
    typedSales(parsed.select(col("e.*")))
  }

  /** Raw JSON lines (column `value`: STRING) → typed stock movements. */
  def warehouseFromJson(raw: DataFrame): DataFrame = {
    val parsed = raw
      .select(from_json(col("value"), EventSchemas.warehouseRaw).as("e"))
      .filter(col("e").isNotNull && col("e.event_id").isNotNull)
    typedWarehouse(parsed.select(col("e.*")))
  }

  /** The sales MV SELECT (reference generate_data.py:211-227) over an
    * already-destructured raw frame. */
  def typedSales(raw: DataFrame): DataFrame = raw
    .select(
      col("event_id"), col("event_type"),
      bestEffortTimestamp(col("event_time")).as("event_time"),
      col("product_id"), col("product_name"), col("category"),
      col("quantity"),
      col("price").cast(money).as("price"),
      col("discount").cast(money).as("discount"),
      col("total").cast(money).as("total"),
      col("store_id"), col("cashier_id"), col("customer_id"))
    .filter(col("price").isNotNull)
    .withColumn("processing_time", current_timestamp())

  /** The warehouse MV SELECT (reference generate_data.py:232-245). */
  def typedWarehouse(raw: DataFrame): DataFrame = raw
    .select(
      col("event_id"), col("event_type"),
      bestEffortTimestamp(col("event_time")).as("event_time"),
      col("product_id"), col("product_name"), col("category"),
      col("warehouse"), col("quantity"), col("movement_type"),
      col("source"), col("responsible"))
    .withColumn("processing_time", current_timestamp())
}
