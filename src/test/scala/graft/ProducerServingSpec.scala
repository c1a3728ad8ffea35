package graft

import org.apache.spark.sql.functions._
import graft.ingest.IngestTransform
import graft.serving.Serving
import graft.sources.EventProducer

/** Producer synthesis (S1/ST7), serving shapes (S8/F13/F14), catalog ops
  * (D1-D6). */
class ProducerServingSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(n: Int) = spark.range(n)
    .select(col("id").as("value"),
      (lit("2026-08-12 10:00:00").cast("timestamp") +
        expr("make_interval(0, 0, 0, 0, 0, 0, id)")).as("timestamp"))

  test("producer synthesizes valid JSON routed ~70/30 to sales/warehouse (ST7)") {
    val out = EventProducer.synthesize(ticks(2000)).cache()
    val byTopic = out.groupBy("topic").count().as[(String, Long)].collect().toMap
    assert(byTopic.keySet === Set("sales", "warehouse"))
    val frac = byTopic("sales").toDouble / 2000
    assert(frac > 0.62 && frac < 0.78, s"sales fraction $frac should be ~0.7")
    out.unpersist()
  }

  test("producer output round-trips through the ingest transforms (S1→S2)") {
    val out = EventProducer.synthesize(ticks(500)).cache()
    val sales = IngestTransform.salesFromJson(out.filter($"topic" === "sales").select("value"))
    val moves = IngestTransform.warehouseFromJson(out.filter($"topic" === "warehouse").select("value"))
    assert(sales.count() + moves.count() === 500)
    // typed invariants from the generator's domains (FIXTURES.md §1)
    assert(sales.filter($"product_id" < 1 || $"product_id" > 50).count() === 0)
    assert(sales.filter($"price".isNull || $"event_time".isNull).count() === 0)
    assert(moves.filter(!$"movement_type".isin("supply", "relocation", "write_off")).count() === 0)
    // determinism: same ticks → same payloads
    val again = EventProducer.synthesize(ticks(500))
    assert(out.select("value").except(again.select("value")).count() === 0)
    out.unpersist()
  }

  test("serving chart formats labels and rounds revenue (F13/F14)") {
    val rows = Serving.salesChart(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("label").matches("\\d{2}:\\d{2}"))
      val rev = BigDecimal(r.getAs[Double]("revenue"))
      assert((rev * 100).isWhole, s"revenue $rev not 2dp")
    }
  }

  test("status endpoint reports ready when sales exist (A3)") {
    val r = Serving.status(spark, sf0001).collect().head
    assert(r.getAs[Long]("sales_count") > 0)
    assert(r.getAs[String]("status") === "ready")
  }

  test("serving is fail-soft: bad query degrades to fallback, never throws") {
    val fallback = Seq(("empty", 0L)).toDF("label", "n")
    val served = Serving.failSoft(spark)(
      spark.read.parquet("/nonexistent/nope.parquet"), fallback)
    assert(served.collect().head.getString(0) === "empty")
  }

  test("catalog: create/exists/show/drop/liveness (D1/D3/D5/D6)") {
    val base = tmpDir("catalog")
    Catalog.dropTables(spark)
    assert(!Catalog.tableExists(spark, Catalog.SalesTable))
    Catalog.createTargetTables(spark, base)
    assert(Catalog.tableExists(spark, Catalog.SalesTable))
    assert(Catalog.tableExists(spark, Catalog.MovementsTable))
    assert(Catalog.showTables(spark).contains(Catalog.SalesTable))
    // idempotent (IF NOT EXISTS)
    Catalog.createTargetTables(spark, base)
    Catalog.dropTables(spark)
    assert(!Catalog.tableExists(spark, Catalog.SalesTable))
    assert(Catalog.isAlive(spark))
  }
}
