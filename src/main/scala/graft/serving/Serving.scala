package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.{Dashboard, QueryPack}

/** The serving edge (reference web-app app.py): result shaping that the
  * Flask routes did in Python — time-label formatting (F13
  * `strftime('%H:%M')` / `'%Y-%m-%d %H:%M:%S'`, app.py:70,143), 2-dp
  * rounding of revenue (F14, app.py:72,141), the `/api/status` readiness
  * shape (app.py:150-168), and fail-soft fallbacks (app.py:36-42,75-77) —
  * folded into the query's final `select` so the engine, not the client,
  * does the formatting.
  */
object Serving extends QueryPack {

  /** Hourly chart feed with presentation labels: `strftime('%H:%M')` →
    * `date_format(hour, 'HH:mm')`, revenue rounded at the edge.
    *
    * Row order is the underlying `hour` order: [[Dashboard.salesByHour]]
    * already ends in a total sort on the unique `hour` key, and the
    * label projection on top preserves it — HH:mm labels repeat across
    * days, so re-sorting on the label would need extra tie-break keys
    * (and a second full sort) to stay deterministic. */
  def salesChart(spark: SparkSession, d: String): DataFrame =
    Dashboard.salesByHour(spark, d)
      .select(
        date_format(col("hour"), "HH:mm").as("label"),
        round(col("revenue").cast("double"), 2).as("revenue"),
        col("n_sales"))

  /** Latest-events feed with full timestamp labels
    * (`'%Y-%m-%d %H:%M:%S'`). */
  def recentFeed(spark: SparkSession, d: String): DataFrame =
    Dashboard.recentEvents(spark, d)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_label"),
        col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy(desc("ts_label"), desc("event_id"))

  /** Per-category latest-events feed — the `/api/recent` shape sliced
    * per event_type (every dashboard "latest N per tab" endpoint),
    * running through the custom [[graft.plans.TopKPerKey]] physical
    * operator instead of the window formulation: bounded per-key heaps
    * (k=3 rows live per key per partition), one hash exchange, NO
    * per-partition full sort — the plan a serving query wants when the
    * key count is small but each key's history is long (at 100 TB the
    * window form sorts every partition's full event history; the heap
    * form keeps 3 rows per key). PlanShapeSpec asserts the exec node
    * replaces Sort+Window; the oracle is the equivalent window SQL.
    *
    * Label ordering note: ts_label ('yyyy-MM-dd HH:mm:ss') sorts
    * lexicographically = chronologically, and event_id desc breaks
    * same-second ties — the [[recentFeed]] determinism recipe. */
  def topPerTypeFeed(spark: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerKey(
      Tables.events(spark, d).select("event_type", "event_id", "ts", "value"),
      Seq("event_type"),
      Seq(col("ts").desc, col("event_id").desc),
      k = 3)
      .select(
        col("event_type"),
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_label"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_type"), desc("ts_label"), desc("event_id"))

  /** `/api/status` shape: per-stream counts + overall readiness (the
    * reference reports `ready` once sales_count > 0, app.py:167). */
  def status(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .agg(
        count(when(col("event_type") === "purchase", 1)).as("sales_count"),
        count(when(col("event_type") =!= "purchase", 1)).as("other_count"))
      .select(col("sales_count"), col("other_count"),
        when(col("sales_count") > 0, "ready").otherwise("waiting").as("status"))

  /** Fail-soft execution (app.py:36-42): a serving query must never
    * throw — on any error return the given fallback frame, like the
    * dashboard's empty chart. */
  def failSoft(spark: SparkSession)(q: => DataFrame, fallback: => DataFrame): DataFrame =
    try {
      val df = q
      df.queryExecution.assertAnalyzed() // surface analysis errors eagerly
      df
    } catch { case _: Throwable => fallback }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "serve_sales_chart" -> salesChart,
    "serve_recent_feed" -> recentFeed,
    "serve_top_per_type" -> topPerTypeFeed,
    "serve_status" -> status)

  val oracles = Map(
    "serve_sales_chart" ->
      """SELECT strftime(hour, '%H:%M') AS label,
        |       round(CAST(revenue AS DOUBLE), 2) AS revenue, n_sales
        |FROM (
        |  SELECT date_trunc('hour', ts) AS hour,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue,
        |         COUNT(*) AS n_sales
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1) t
        |ORDER BY hour""".stripMargin,
    "serve_recent_feed" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_label,
        |       event_type, round(value, 2) AS value
        |FROM (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 10) t
        |ORDER BY ts_label DESC, event_id DESC""".stripMargin,
    "serve_status" ->
      """SELECT COUNT(*) FILTER (WHERE event_type = 'purchase') AS sales_count,
        |       COUNT(*) FILTER (WHERE event_type <> 'purchase') AS other_count,
        |       CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase') > 0
        |            THEN 'ready' ELSE 'waiting' END AS status
        |FROM events""".stripMargin,
    // the window formulation IS the oracle — the custom heap operator
    // must be semantically indistinguishable from it
    "serve_top_per_type" ->
      """SELECT event_type, event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_label,
        |       round(value, 2) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |                                   ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn <= 3
        |ORDER BY event_type, ts_label DESC, event_id DESC""".stripMargin)
}
