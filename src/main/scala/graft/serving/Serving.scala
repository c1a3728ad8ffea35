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
        |FROM events""".stripMargin)
}
