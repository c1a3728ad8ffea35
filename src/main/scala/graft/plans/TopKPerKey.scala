package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.execution.graft.{GraftPlanBridge, TopKPerKeyPlan, TopKPerKeyStrategy}

/** Public API for the group-wise top-k operator (see
  * [[org.apache.spark.sql.execution.graft.TopKPerKeyExec]]): bounded
  * per-key heaps instead of the window-function's per-partition full
  * sort.
  *
  * {{{
  * TopKPerKey(orders, Seq("o_custkey"), Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
  * }}}
  */
object TopKPerKey {

  /** Idempotently register the planner strategy on the session. */
  def install(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = strategies :+ TopKPerKeyStrategy
    }
  }

  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    install(spark)
    val keys = keyCols.map(c => GraftPlanBridge.expr(df(c)))
    val order = orderCols.map(c => GraftPlanBridge.expr(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    GraftPlanBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKeyPlan(keys, order, k, df.queryExecution.analyzed))
  }
}
