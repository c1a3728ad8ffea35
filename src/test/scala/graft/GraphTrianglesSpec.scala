package graft

import org.apache.spark.sql.functions._
import graft.queries.Extended

/** Degree-oriented triangle counting: hand-countable constructed
  * graphs, an independent brute-force reference on a random graph, and
  * the partitioning invariance that distributed counting must keep.
  * All inputs are the `pa < pb` half-edge frame [[Extended.trianglesOf]]
  * consumes. */
class GraphTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(half: Seq[(Long, Long)]): Map[Long, Long] =
    Extended.trianglesOf(half.toDF("pa", "pb"))
      .as[(Long, Long)].collect().toMap

  test("K4: every vertex sits on C(3,2) = 3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle-free graphs produce no rows") {
    // a path and a star — wedges everywhere, no closing edge
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) === Map.empty)
  }

  test("two triangles sharing an edge: shared vertices count both") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(bowtie) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("matches brute force on a random graph (incl. skewed hub)") {
    val rnd = new scala.util.Random(31)
    val base = (1 to 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    // a hub adjacent to everything — the skew case orientation exists for
    val hub = (0 until 25).map(i => (99L, i.toLong))
    val half = (base ++ hub).collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.distinct
    val adj = half.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).toSet }
    val brute = half.flatMap { case (a, b) =>
      (adj(a) & adj(b)).toSeq.collect { case c if c > b => Seq(a, b, c) }
    }.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    // brute iterates a<b and closes with c>b: since half has a<b, the
    // intersection with c>b enumerates each {a<b<c} exactly once
    assert(count(half) === brute)
  }

  test("result is invariant to edge-frame partitioning") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    def run(parts: Int) =
      Extended.trianglesOf(k4.toDF("pa", "pb").repartition(parts))
        .as[(Long, Long)].collect().toMap
    assert(run(1) === run(7))
  }
}
