package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's data generator + Kafka producer (S1/ST7/ST8), as a
  * Spark-native streaming source instead of a Python loop
  * (reference data-generator/generate_data.py:334-453):
  *
  *  - the `rate` source replaces the sleep-loop (rows/sec is the knob the
  *    reference sets with `time.sleep(random.uniform(0.5, 1.5))`);
  *  - each tick is synthesized deterministically from its offset value
  *    (same seed → same stream, replayable — unlike the reference's
  *    unseeded Faker);
  *  - the 70/30 sales/warehouse split (generate_data.py:436) becomes a
  *    per-row routing column — the Kafka sink writes each row to its
  *    `topic` column in one query instead of two producers;
  *  - JSON serialization (`json.dumps(...).encode('utf-8')`,
  *    generate_data.py:353) is `to_json(struct(...))`.
  */
object EventProducer {

  private val categories = Seq("Электроника", "Одежда", "Продукты", "Книги", "Игрушки")
  private val warehouses = Seq("Москва", "Санкт-Петербург", "Новосибирск",
    "Екатеринбург", "Казань", "Краснодар")
  private val movementTypes = Seq("supply", "relocation", "write_off")

  private def pick(options: Seq[String], h: org.apache.spark.sql.Column) =
    element_at(array(options.map(lit): _*), (pmod(h, lit(options.size)) + 1).cast("int"))

  /** Synthesize the event batch for a frame of tick values (column
    * `value`: LONG, from the rate source or a test range). Columns mirror
    * FIXTURES.md §1; `topic` carries the 70/30 route; `payload` is the
    * JSONEachRow wire bytes. */
  def synthesize(ticks: DataFrame): DataFrame = {
    val h = xxhash64(col("value"))                  // deterministic per tick
    def field(i: Int) = xxhash64(col("value"), lit(i))
    val isSale = pmod(h, lit(10)) < 7               // 70% sales (ST7)

    val sale = struct(
      concat(lit("sale-"), col("value")).as("event_id"),
      lit("sale").as("event_type"),
      date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
      (pmod(field(1), lit(50)) + 1).as("product_id"),
      concat(lit("товар "), pmod(field(1), lit(50)) + 1).as("product_name"),
      pick(categories, field(2)).as("category"),
      (pmod(field(3), lit(5)) + 1).cast("int").as("quantity"),
      round((pmod(field(4), lit(990000)) + lit(10000)) / 100.0, 2).as("price"),
      round(pmod(field(5), lit(31)) / 100.0, 2).as("discount"),
      round((pmod(field(4), lit(990000)) + lit(10000)) / 100.0 *
        (lit(1.0) - pmod(field(5), lit(31)) / 100.0), 2).as("total"),
      (pmod(field(6), lit(10)) + 1).cast("int").as("store_id"),
      (pmod(field(7), lit(20)) + 1).cast("int").as("cashier_id"),
      concat(lit("cust-"), pmod(field(8), lit(1000))).as("customer_id"))

    val movement = struct(
      concat(lit("mv-"), col("value")).as("event_id"),
      lit("stock_movement").as("event_type"),
      date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
      (pmod(field(1), lit(50)) + 1).as("product_id"),
      concat(lit("товар "), pmod(field(1), lit(50)) + 1).as("product_name"),
      pick(categories, field(2)).as("category"),
      pick(warehouses, field(9)).as("warehouse"),
      (pmod(field(3), lit(100)) + 1).cast("int").as("quantity"),
      pick(movementTypes, field(10)).as("movement_type"),
      concat(lit("ООО Поставщик-"), pmod(field(11), lit(100))).as("source"),
      concat(lit("сотрудник-"), pmod(field(12), lit(50))).as("responsible"))

    ticks.select(
      when(isSale, lit("sales")).otherwise(lit("warehouse")).as("topic"),
      when(isSale, to_json(sale)).otherwise(to_json(movement)).as("value"))
  }

  /** Streaming producer into Kafka: rate source → synthesize → kafka sink
    * with per-row topic routing. `rowsPerSecond` ≈ the reference's 1-2
    * msg/s default (README.md:83), but scales to any rate. */
  def start(
      spark: SparkSession,
      brokers: String,
      checkpointPath: String,
      rowsPerSecond: Int = 2): StreamingQuery =
    synthesize(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load())
      .writeStream
      .queryName("graft_producer")
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
