package graft

import graft.queries.Extended

/** Synchronous label propagation over constructed graphs: the
  * hand-traced clique/bridge rounds, the min-label tie rule, and
  * partitioning invariance against an in-test sequential reference.
  * Inputs are the `pa < pb` half frame [[Extended.lpaOf]] consumes. */
class LpaSpec extends SparkSpec {
  import spark.implicits._

  private def lpa(half: Seq[(Long, Long)], rounds: Int = 4)
      : Map[Long, (Long, Long)] =
    Extended.lpaOf(half.toDF("pa", "pb"), rounds)
      .as[(Long, Long, Long)].collect()
      .map { case (n, c, s) => n -> (c, s) }.toMap

  /** The identical vote rule run sequentially: mode of neighbor
    * labels, ties to the smallest label, all nodes updated at once. */
  private def reference(half: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val nbrs = (half ++ half.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nbrs.map { case (n, ns) =>
        val votes = ns.groupBy(lab).view.mapValues(_.size)
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("two triangles over a bridge settle into two communities") {
    // hand-traced 4 rounds: {1,2,3} converge on label 1; {10,11,12}
    // on label 3 (the bridge 3-10 leaks node 3's label in round 1 and
    // the far triangle keeps it — community ids are just labels, not
    // members)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    assert(lpa(g) === Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      10L -> (3L, 3L), 11L -> (3L, 3L), 12L -> (3L, 3L)))
  }

  test("tie votes go to the smallest label") {
    // path 1-2-3 after one round: node 2 sees labels {1, 3}, one vote
    // each -> 1; the endpoints adopt 2
    assert(lpa(Seq((1L, 2L), (2L, 3L)), rounds = 1) ===
      Map(1L -> (2L, 2L), 2L -> (1L, 1L), 3L -> (2L, 2L)))
  }

  test("declared rounds, not convergence: a 4-cycle oscillates") {
    // bipartite C4 {1,3} vs {2,4}: labels swap sides every round, so
    // round parity decides the answer — both engines run EXACTLY the
    // declared count, which is why the contract is a round count
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(lpa(c4, rounds = 1) !== lpa(c4, rounds = 2))
    assert(lpa(c4, rounds = 1).view.mapValues(_._1).toMap ===
      reference(c4, 1))
  }

  test("a vote round plans ZERO shuffles over the cached edge frame") {
    import org.apache.spark.sql.functions._
    // the lpaOf layout: symmetric edges hash-partitioned on the
    // voting node and persisted — InMemoryRelation must carry that
    // partitioning through both round aggregations
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("a", "b").repartition(col("a")).persist()
    edges.count()
    try {
      val labels = edges.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      val plan = Extended.lpaRound(edges, labels)
        .queryExecution.executedPlan.toString
      // the cached frame's own REPARTITION_BY_COL prints inside the
      // InMemoryRelation; what must NOT appear is an exchange the
      // planner had to insert for the round's aggregations
      assert(!plan.contains("ENSURE_REQUIREMENTS"),
        s"a vote round must reuse the cached partitioning:\n$plan")
    } finally edges.unpersist()
  }

  test("matches the sequential reference and ignores partitioning") {
    val rnd = new scala.util.Random(23)
    val half = (1 to 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val want = reference(half, 4)
    def run(parts: Int) =
      Extended.lpaOf(half.toDF("pa", "pb").repartition(parts), 4)
        .select("node", "community").as[(Long, Long)].collect().toMap
    assert(run(1) === want)
    assert(run(13) === want)
  }
}
