package graft

import org.apache.spark.sql.functions._
import graft.ingest.{EventSink, IngestTransform}

/** The MV-transform semantics from FIXTURES.md §1c: corrupt-JSON skip
  * (S4), null-price drop (P3), lenient timestamp parse (F1),
  * processing-time stamping (F12), decimal casts (F2). */
class IngestTransformSpec extends SparkSpec {
  import spark.implicits._

  private val goodSale =
    """{"event_id":"e1","event_type":"sale","event_time":"2026-08-12 10:00:00","product_id":17,"product_name":"система письмо","category":"Электроника","quantity":3,"price":4321.55,"discount":0.15,"total":3673.32,"store_id":7,"cashier_id":12,"customer_id":"c1"}"""
  private val nullPriceSale =
    """{"event_id":"e2","event_type":"sale","event_time":"2026-08-12 10:00:01","product_id":2,"product_name":"x","category":"y","quantity":1,"price":null,"discount":0.0,"total":1.0,"store_id":1,"cashier_id":1,"customer_id":"c2"}"""
  private val badTimeSale =
    """{"event_id":"e3","event_type":"sale","event_time":"garbage","product_id":3,"product_name":"x","category":"y","quantity":1,"price":5.00,"discount":0.0,"total":5.0,"store_id":1,"cashier_id":1,"customer_id":"c3"}"""
  private val corrupt = """{"event_id": "x", broken"""

  private def salesDf = Seq(goodSale, nullPriceSale, badTimeSale, corrupt).toDF("value")

  test("corrupt JSON rows are skipped, not fatal (S4)") {
    val out = IngestTransform.salesFromJson(salesDf)
    assert(!out.select("event_id").as[String].collect().contains("x"))
  }

  test("null-price rows are dropped (P3)") {
    val ids = IngestTransform.salesFromJson(salesDf)
      .select("event_id").as[String].collect().toSet
    assert(ids === Set("e1", "e3"))
  }

  test("unparseable event_time becomes NULL but the row survives (F1)") {
    val row = IngestTransform.salesFromJson(salesDf)
      .filter($"event_id" === "e3").collect().head
    assert(row.getAs[java.sql.Timestamp]("event_time") == null)
  }

  test("lenient parse accepts the fixed wire format and ISO-8601 (F1)") {
    val parsed = Seq("2026-08-12 10:00:00", "2026-08-12T10:00:00", "2026-08-12", "nope")
      .toDF("s").select(IngestTransform.bestEffortTimestamp($"s").as("t"))
      .as[Option[java.sql.Timestamp]].collect()
    assert(parsed(0).isDefined && parsed(1).isDefined && parsed(2).isDefined)
    assert(parsed(0) == parsed(1))
    assert(parsed(3).isEmpty)
  }

  test("money columns land as Decimal(9,2) and values survive (F2)") {
    val row = IngestTransform.salesFromJson(salesDf)
      .filter($"event_id" === "e1").collect().head
    val price = row.getAs[java.math.BigDecimal]("price")
    assert(price.compareTo(new java.math.BigDecimal("4321.55")) == 0)
    val dt = IngestTransform.salesFromJson(salesDf).schema("price").dataType
    assert(dt === org.apache.spark.sql.types.DecimalType(9, 2))
  }

  test("processing_time is stamped (F12) and non-ASCII strings survive") {
    val row = IngestTransform.salesFromJson(salesDf)
      .filter($"event_id" === "e1").collect().head
    assert(row.getAs[java.sql.Timestamp]("processing_time") != null)
    assert(row.getAs[String]("product_name") === "система письмо")
  }

  test("warehouse transform parses its 11-column shape (P2)") {
    val m = """{"event_id":"m1","event_type":"stock_movement","event_time":"2026-08-12 10:00:01","product_id":17,"product_name":"n","category":"c","warehouse":"Москва","quantity":42,"movement_type":"supply","source":"ООО Ромашка","responsible":"Иванов Иван"}"""
    val out = IngestTransform.warehouseFromJson(Seq(m, corrupt).toDF("value"))
    assert(out.count() === 1)
    val row = out.collect().head
    assert(row.getAs[String]("warehouse") === "Москва")
    assert(row.getAs[Int]("quantity") === 42)
  }

  test("EventSink writes month-partitioned, sorted parquet (S5)") {
    val dir = tmpDir("sink")
    val typed = IngestTransform.salesFromJson(salesDf)
    EventSink.append(typed, dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("event_month="))
    assert(dirs.contains("event_month=202608"))
    // NULL event_time lands in the Hive default partition, row preserved:
    val back = spark.read.parquet(dir)
    assert(back.count() === 2)
    assert(back.filter($"event_time".isNull).count() === 1)
  }
}
