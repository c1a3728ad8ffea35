package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Ordering semantics of the funnel and the cohort week matrix, on
  * hand-built event streams. */
class FunnelCohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts only strictly-ordered view -> click -> purchase") {
    val ev = Seq(
      // user 1 converts fully, in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2 purchases BEFORE clicking → must not count at step 3
      (2L, "view", ts("2024-01-01 11:00:00")),
      (2L, "purchase", ts("2024-01-01 11:01:00")),
      (2L, "click", ts("2024-01-01 11:02:00")),
      // user 3 clicks without ever viewing → not in the funnel at all
      (3L, "click", ts("2024-01-01 12:00:00")),
      // user 4 only views
      (4L, "view", ts("2024-01-01 13:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.funnelOf(ev)
      .select("step", "users").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("funnel step entry uses the EARLIEST qualifying event") {
    // the user's second view is later than the click; the first view is
    // what admits the click
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")),
      (1L, "view", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.funnelOf(ev)
      .select("step", "users").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("cohort retention builds the (cohort, offset) triangle") {
    val ev = Seq(
      // user 1: first week of 2024-01-01 (Mon), active weeks 0 and 2
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-15 10:00:00")),
      // user 2: same cohort, active week 0 only (two events, one week)
      (2L, "view", ts("2024-01-03 10:00:00")),
      (2L, "click", ts("2024-01-04 10:00:00")),
      // user 3: cohort of 2024-01-08, active weeks 0 and 1
      (3L, "view", ts("2024-01-08 10:00:00")),
      (3L, "view", ts("2024-01-16 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.cohortRetentionOf(ev)
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01 00:00:00", 0L, 2L),
      ("2024-01-01 00:00:00", 2L, 1L),
      ("2024-01-08 00:00:00", 0L, 1L),
      ("2024-01-08 00:00:00", 1L, 1L)))
  }
}
