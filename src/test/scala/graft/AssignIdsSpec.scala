package graft

import org.apache.spark.sql.functions._
import graft.operators.AssignIds

/** The distributed global row_number: correct ranks, invariance to the
  * partition count, and the plan never collapses to one partition. */
class AssignIdsSpec extends SparkSpec {
  import spark.implicits._

  test("contiguous ids equal the global rank for any partition count") {
    val docs = Tables.documents(spark, sf0001)
    val expected = docs.select(col("doc_id"), col("source"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .sorted
      .zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }
      .toMap
    for (parts <- Seq(3, 7, 32)) {
      val got = AssignIds.withContiguousIds(docs,
          Seq(col("source"), col("doc_id")), partitions = parts)
        .select("doc_id", "new_id").as[(Long, Long)].collect().toMap
      assert(got === expected, s"ranks diverge at partitions=$parts")
    }
  }

  test("ids are dense 1..N with no gaps or duplicates") {
    val ids = AssignIds.withContiguousIds(Tables.documents(spark, sf0001),
        Seq(col("source"), col("doc_id")), partitions = 5)
      .select("new_id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to ids.length).toSeq)
  }

  test("the plan never funnels data through a single partition") {
    val df = AssignIds.withContiguousIds(Tables.documents(spark, sf0001),
      Seq(col("source"), col("doc_id")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
    // the window must key on the physical partition id, not the empty key
    assert(plan.contains("Window") && plan.contains("__pid"),
      s"expected a __pid-partitioned window:\n$plan")
  }
}
