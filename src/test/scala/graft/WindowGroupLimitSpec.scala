package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-first check: the built-in `InferWindowGroupLimit` rewrite must
  * turn the declarative rank-filter pattern into `WindowGroupLimit`
  * (per-partition bounded top-k maintenance before the full window sort)
  * — this is why the engine does NOT ship a custom optimizer rule for
  * the pattern: Catalyst already plans the operator we would want, and
  * the custom [[graft.plans.TopKPerKey]] physical path exists only for
  * the cases the built-in cannot see (pre-aggregated per-key heaps over
  * a non-window API). If this pin ever fails on a Spark upgrade, THAT
  * is the moment a custom rule earns its keep. */
class WindowGroupLimitSpec extends SparkSpec {

  test("rank-filter pattern plans a WindowGroupLimit below the window") {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_extendedprice").desc)
    val df = Tables.lineitem(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"built-in rank-filter pushdown must fire:\n$plan")
  }

  test("the registered window_rank query gets the same treatment") {
    val plan = queries.Relational.windowRank(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"window_rank must keep the group-limit shape:\n$plan")
  }
}
