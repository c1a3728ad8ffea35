package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

/** The custom group-wise top-k operator: physical plan shape and exact
  * equivalence with the window-function formulation. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("plans as TopKPerKeyExec over a hash exchange, no Sort operator") {
    val df = TopKPerKey(Tables.orders(spark, sf0001), Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(plan.contains("Exchange hashpartitioning(o_custkey"))
    assert(!plan.contains("Sort ["), s"no per-partition full sort expected:\n$plan")
  }

  test("result set == window row_number formulation, all keys covered") {
    val custom = TopKPerKey(Tables.orders(spark, sf0001), Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    val windowed = queries.Relational.windowRank(spark, sf0001)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    assert(custom === windowed)
    assert(custom.nonEmpty)
  }

  test("k larger than any group returns every row; duplicate order values kept") {
    val df = Seq((1L, 10.0), (1L, 10.0), (2L, 5.0)).toDF("key", "v")
    val out = TopKPerKey(df, Seq("key"), Seq($"v".desc), k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(out.sorted === Seq((1L, 10.0), (1L, 10.0), (2L, 5.0)).sorted)
  }

  test("ties at the k boundary resolve by the full sort order deterministically") {
    val df = Seq((1L, 10.0, "a"), (1L, 10.0, "b"), (1L, 10.0, "c")).toDF("key", "v", "id")
    val out = TopKPerKey(df, Seq("key"), Seq($"v".desc, $"id"), k = 2)
      .select("id").as[String].collect().toSet
    assert(out === Set("a", "b"))
  }
}
