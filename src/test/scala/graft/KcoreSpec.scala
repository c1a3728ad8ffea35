package graft

import graft.queries.Extended

/** Fixed-cap k-core peeling over constructed graphs: hand-traceable
  * cascades, the round cap's declared semantics, and partitioning
  * invariance. Inputs are the `pa < pb` half frame [[Extended.kcoreOf]]
  * consumes. */
class KcoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(half: Seq[(Long, Long)], k: Int, rounds: Int = 8)
      : Map[Long, Long] =
    Extended.kcoreOf(half.toDF("pa", "pb"), k, rounds)
      .as[(Long, Long)].collect().toMap

  private val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))

  test("K4 is its own 3-core; k=4 unravels it") {
    assert(core(k4, 3) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(core(k4, 4) === Map.empty)
  }

  test("pendant peels off and the core degree reflects the SUBGRAPH") {
    // node 5 hangs off node 1: deg(1) = 4 in the full graph but 3 in
    // the 3-core — the survivor's degree must be recomputed inside it
    assert(core(k4 :+ (1L, 5L), 3) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("chain cascade: a tail peels one node per round") {
    // triangle {1,2,3} with tail 3-4, 4-5, 5-6; k=2 drops 6, then 5,
    // then 4 — three dependent rounds before the triangle-only fixpoint
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // the cap is the declared semantics: 2 rounds in, the tail still
    // has node 4 (6 and 5 peeled; 4 keeps its 3-edge until round 3)
    assert(core(g, 2, rounds = 2) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("disconnected components peel independently") {
    // K4 plus a separate path 10-11-12: k=2 keeps K4, drops the path
    val g = k4 ++ Seq((10L, 11L), (11L, 12L))
    assert(core(g, 2) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("result is invariant to edge-frame partitioning") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    def run(parts: Int) =
      Extended.kcoreOf(g.toDF("pa", "pb").repartition(parts), 2, 8)
        .as[(Long, Long)].collect().toMap
    assert(run(1) === run(7))
  }
}
