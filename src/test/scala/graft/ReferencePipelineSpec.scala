package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.queries.ReferenceDashboard
import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.{Sales, Warehouse}

/** The whole reference pipeline end-to-end with FIXTURES.md §4 goldens:
  * fixture JSON events (including the negative fixtures) → streaming
  * ingest into partitioned typed tables → the reference's four dashboard
  * queries → hand-computed expected values. */
class ReferencePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val NOW = lit("2026-08-12 23:00:00").cast("timestamp")

  private def sale(id: String, t: String, qty: Int, price: String, total: String) =
    s"""{"event_id":"$id","event_type":"sale","event_time":"$t","product_id":${id.length},"product_name":"p$id","category":"c","quantity":$qty,"price":$price,"discount":0.1,"total":$total,"store_id":1,"cashier_id":1,"customer_id":"u"}"""
  private def move(id: String, t: String, pid: Int, qty: Int, mt: String) =
    s"""{"event_id":"$id","event_type":"stock_movement","event_time":"$t","product_id":$pid,"product_name":"prod$pid","category":"c","warehouse":"Москва","quantity":$qty,"movement_type":"$mt","source":"s","responsible":"r"}"""

  // FIXTURES.md §4: 3 sales in two hours incl. one null-price,
  // 3 movements incl. one of each movement_type (+ one corrupt line)
  private val salesFixture = Seq(
    sale("s1", "2026-08-12 10:10:00", 2, "100.00", "180.00"),
    sale("s2", "2026-08-12 10:40:00", 1, "50.00", "45.00"),
    sale("s3", "2026-08-12 11:05:00", 3, "null", "270.00"), // dropped (P3)
    sale("s4", "2026-08-12 11:20:00", 4, "25.00", "90.00"),
    """{"event_id":"zzz", corrupt""")
  private val movesFixture = Seq(
    move("m1", "2026-08-12 09:00:00", 7, 50, "supply"),
    move("m2", "2026-08-12 09:30:00", 7, 20, "relocation"),
    move("m3", "2026-08-12 10:00:00", 7, 5, "write_off"),
    move("m4", "2026-08-12 10:30:00", 8, 10, "supply"))

  private def ingest(topic: StreamingPipeline.Topic, lines: Seq[String]): String = {
    val in = tmpDir(s"ref-in-${topic.name}")
    val out = tmpDir(s"ref-out-${topic.name}")
    val ckpt = tmpDir(s"ref-ckpt-${topic.name}")
    Files.write(Paths.get(in, "events.json"), String.join("\n", lines: _*).getBytes("UTF-8"))
    val p = StreamingPipeline.textDir(spark, topic, in, out, ckpt)
    p.attach(); p.processAllAvailable(); p.detach()
    out
  }

  private lazy val salesTable = spark.read.parquet(ingest(Sales, salesFixture))
  private lazy val movesTable = spark.read.parquet(ingest(Warehouse, movesFixture))

  test("salesByHour: 2 hour buckets, null-price sale excluded, exact sums") {
    val rows = ReferenceDashboard.salesByHour(salesTable, NOW)
      .select($"hour".cast("string"), $"total_quantity".cast("long"), $"revenue".cast("string"))
      .as[(String, Long, String)].collect().toSeq
    assert(rows === Seq(
      ("2026-08-12 10:00:00", 3L, "225.00"),   // s1+s2
      ("2026-08-12 11:00:00", 4L, "90.00")))   // s4 only (s3 dropped)
  }

  test("topMovements: incoming=supply, outgoing=relocation+write_off, ordered by total desc") {
    val rows = ReferenceDashboard.topMovements(movesTable, NOW)
      .select($"product_id", $"incoming".cast("long"), $"outgoing".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows === Seq((7L, 50L, 25L), (8L, 10L, 0L)))
  }

  test("recentSales: descending event_time, <= 10 rows, served columns") {
    val rows = ReferenceDashboard.recentSales(salesTable)
      .select($"event_id").as[String].collect().toSeq
    assert(rows === Seq("s4", "s2", "s1")) // s3 dropped; newest first
  }

  test("status: counts post-filter rows and reports ready") {
    val r = ReferenceDashboard.status(salesTable, movesTable).collect().head
    assert(r.getAs[Long]("sales_count") === 3)       // 4 sales - null-price - corrupt
    assert(r.getAs[Long]("stock_movements_count") === 4)
    assert(r.getAs[String]("status") === "ready")
  }

  test("time-range predicates exclude old rows (P4/P5)") {
    val lateNow = lit("2026-08-15 00:00:00").cast("timestamp")
    assert(ReferenceDashboard.salesByHour(salesTable, lateNow).count() === 0)
    // 7-day window still catches the movements
    assert(ReferenceDashboard.topMovements(movesTable, lateNow).count() === 2)
  }
}
