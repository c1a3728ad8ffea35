package graft

/** SQL-surface parity: the oracle statements are ANSI SQL — the portable
  * subset must run unchanged on Spark's own SQL API (over registered
  * views) and produce exactly what the DataFrame-API query produces.
  * This is the "a user can bring their SQL text" guarantee, checked
  * against both engines' dialects at once. */
class SqlParitySpec extends SparkSpec {

  // oracle statements using DuckDB-only functions (strftime, list_*,
  // epoch_us, string_split, ASOF) are excluded; everything else must run
  private val portable = Seq(
    "q1_agg", "q3_topk", "q5_region", "topk_orders", "semi_join",
    "anti_join", "window_rank", "window_running", "set_intersect",
    "set_except", "set_union", "distinct_users", "status_counts",
    "outer_join_agg", "union_all", "sales_by_hour", "sales_last_day",
    "top_movers", "recent_events", "dedup_exact_stats",
    "dedup_exact_survivors", "topk_per_key", "pivot_daily",
    "time_buckets", "serve_status", "enrich_broadcast", "stats_agg",
    "grouping_sets", "window_frames", "above_avg_orders", "sample_det",
    "full_outer_join", "q6_forecast",
    "q2_min_cost", "q4_priority", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "q10_returned", "q11_important_value",
    "q12_shipmode", "q13_distribution", "q14_promo", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_qty", "q18_large_orders",
    "q19_disjunctive", "q20_promo_supplier", "q21_waiting_supplier",
    "q22_idle_capital", "freq_items_verified", "assign_ids",
    "corpus_shuffle")

  test("portable oracle SQL runs on Spark and matches the DataFrame-API result") {
    Tables.registerViews(spark, sf0001)
    portable.foreach { name =>
      val sql = SparkEntry.oracleSql(name)
      val viaSql = spark.sql(sql).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      val viaApi = SparkEntry.queries(name)(spark, sf0001).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      assert(viaSql === viaApi, s"SQL/API divergence in $name")
    }
  }
}
