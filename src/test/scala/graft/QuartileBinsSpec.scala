package graft

import graft.queries.Extended

/** Distributed per-key NTILE: the closed-form integer reproduction of
  * SQL NTILE's leading-bucket remainder rule, computed from
  * range-partitioned ranks instead of a per-key single-partition
  * window. */
class QuartileBinsSpec extends SparkSpec {
  import spark.implicits._

  private def bins(rows: Seq[(Long, String, Long)], k: Int)
      : Map[Long, Long] =
    Extended.quartileBinsOf(rows.toDF("doc_id", "source", "n_chars"), k)
      .select("doc_id", "quartile").as[(Long, Long)].collect().toMap

  test("even split: 8 rows into 4 buckets of 2") {
    val rows = (1L to 8L).map(i => (i, "s", i * 10))
    assert(bins(rows, 4) === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("remainder goes to the LEADING buckets (NTILE rule)") {
    // 10 rows, 4 buckets: sizes 3,3,2,2 — not 2,2,3,3
    val rows = (1L to 10L).map(i => (i, "s", i * 10))
    assert(bins(rows, 4) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L,
      9L -> 4L, 10L -> 4L))
  }

  test("fewer rows than buckets: each row its own leading bucket") {
    val rows = Seq((1L, "s", 10L), (2L, "s", 20L), (3L, "s", 30L))
    assert(bins(rows, 4) === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("sources bin independently; ties break by doc_id") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 10L), // tie -> doc 1 ranks first
      (3L, "b", 99L), (4L, "b", 1L))
    assert(bins(rows, 2) ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("the plan never funnels a source through one partition") {
    val docs = (1L to 200L).map(i => (i, "s" + i % 2, i * 3))
      .toDF("doc_id", "source", "n_chars")
    val plan = Extended.quartileBinsOf(docs, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
    // the window must key on (value bucket, source), never source alone
    assert(plan.contains("Window") && plan.contains("__b"),
      s"expected a (__b, source)-partitioned window:\n$plan")
  }

  test("invariant to input partitioning and matches a window NTILE") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 403L).map(i =>
      (i, "src" + rnd.nextInt(3), rnd.nextInt(50).toLong))
    def run(parts: Int) =
      Extended.quartileBinsOf(
        rows.toDF("doc_id", "source", "n_chars").repartition(parts), 4)
        .select("doc_id", "quartile").as[(Long, Long)].collect().toMap
    // independent reference: the naive per-key window NTILE
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val naive = rows.toDF("doc_id", "source", "n_chars")
      .withColumn("quartile", ntile(4).over(
        Window.partitionBy("source").orderBy("n_chars", "doc_id")).cast("long"))
      .select("doc_id", "quartile").as[(Long, Long)].collect().toMap
    assert(run(1) === naive)
    assert(run(11) === naive)
  }
}
