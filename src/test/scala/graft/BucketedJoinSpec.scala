package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both join sides bucketed on the key
  * must let the sort-merge join run with zero shuffle exchanges — the
  * write-time layout replaces the per-query shuffle (Catalog.createBucketed
  * scaladoc; the 100 TB rationale in SCALE.md).
  */
class BucketedJoinSpec extends SparkSpec {

  test("equi-join on the bucket key plans without a shuffle exchange") {
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment")
    Catalog.createBucketed(orders, "orders_bkt", "o_custkey", 8, Seq("o_custkey"))
    Catalog.createBucketed(customer, "customer_bkt", "c_custkey", 8, Seq("c_custkey"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // join AND aggregate both keyed on the bucket column → the whole
        // plan (scan → join → agg) runs without a single shuffle
        val joined = spark.table("orders_bkt")
          .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
          .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")

        // and it computes the same thing as the plain (shuffling) join
        val expect = orders.join(customer, col("o_custkey") === col("c_custkey"))
          .groupBy("o_custkey").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === expect)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
