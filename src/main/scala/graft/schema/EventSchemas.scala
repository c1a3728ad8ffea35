package graft.schema

import org.apache.spark.sql.types._

/** Schemas for the two retail event streams of the reference pipeline.
  *
  * The reference declares these twice: once as the raw (pre-cast) schema on
  * its Kafka-engine tables (reference generate_data.py:96-139) and once as
  * the typed schema on its MergeTree targets (generate_data.py:154-195).
  * We mirror that two-layer design: `salesRaw`/`warehouseRaw` describe the
  * JSON wire format (JSONEachRow, one flat object per message); `salesTyped`/
  * `warehouseTyped` are the post-ingest storage schemas.
  *
  * Type mapping (SURVEY.md §1): ClickHouse UInt64→LongType, UInt32/Int32→
  * IntegerType, Float64→DoubleType, Decimal32(2)→DecimalType(9,2),
  * DateTime→TimestampType (session TZ pinned to UTC).
  */
object EventSchemas {

  /** Money type of the typed layer — CH Decimal32(2) (generate_data.py:163-165). */
  val money: DecimalType = DecimalType(9, 2)

  /** Raw `sales` topic message (reference generate_data.py:97-110).
    * event_time arrives as a string and is parsed leniently at ingest;
    * price/discount/total arrive as Float64 and are cast to Decimal(9,2). */
  val salesRaw: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_time", StringType),
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("quantity", IntegerType),
    StructField("price", DoubleType),
    StructField("discount", DoubleType),
    StructField("total", DoubleType),
    StructField("store_id", IntegerType),
    StructField("cashier_id", IntegerType),
    StructField("customer_id", StringType)))

  /** Raw `warehouse` topic message (reference generate_data.py:121-132).
    * quantity is signed here (CH Int32): movements can be negative-semantic. */
  val warehouseRaw: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_time", StringType),
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("warehouse", StringType),
    StructField("quantity", IntegerType),
    StructField("movement_type", StringType),
    StructField("source", StringType),
    StructField("responsible", StringType)))

  /** Typed `sales` table (reference generate_data.py:154-174): parsed
    * timestamp, Decimal(9,2) money columns, insert-time processing_time. */
  val salesTyped: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_time", TimestampType),
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("quantity", IntegerType),
    StructField("price", money),
    StructField("discount", money),
    StructField("total", money),
    StructField("store_id", IntegerType),
    StructField("cashier_id", IntegerType),
    StructField("customer_id", StringType),
    StructField("processing_time", TimestampType)))

  /** Typed `stock_movements` table (reference generate_data.py:177-195). */
  val warehouseTyped: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_time", TimestampType),
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("warehouse", StringType),
    StructField("quantity", IntegerType),
    StructField("movement_type", StringType),
    StructField("source", StringType),
    StructField("responsible", StringType),
    StructField("processing_time", TimestampType)))
}

/** Typed-layer case classes — `Dataset[SaleEvent]` / `Dataset[StockMovement]`
  * where compile-time field checks help (tests, stateful streaming). */
case class SaleEvent(
    event_id: String,
    event_type: String,
    event_time: java.sql.Timestamp,
    product_id: Long,
    product_name: String,
    category: String,
    quantity: Int,
    price: BigDecimal,
    discount: BigDecimal,
    total: BigDecimal,
    store_id: Int,
    cashier_id: Int,
    customer_id: String)

case class StockMovement(
    event_id: String,
    event_type: String,
    event_time: java.sql.Timestamp,
    product_id: Long,
    product_name: String,
    category: String,
    warehouse: String,
    quantity: Int,
    movement_type: String,
    source: String,
    responsible: String)
