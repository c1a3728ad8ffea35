package graft

import org.apache.spark.sql.functions._
import graft.queries.Extended

/** Fixed-point PageRank: hand-computed golden on a 3-node path graph,
  * plus the invariants that survive any iteration count. */
class PagerankSpec extends SparkSpec {
  import spark.implicits._

  // path 1 — 2 — 3, symmetric edges
  private def pathEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("pa", "pb")

  test("one iteration matches the hand computation exactly") {
    // n=3 → base = 1e12/3 = 333333333333
    // r1(1) = (15·b + 85·(b div 2)) div 100 = 191666666666
    // r1(2) = (15·b + 85·(b + b))   div 100 = 616666666666
    val got = Extended.pagerankOf(pathEdges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 191666666666L, 2L -> 616666666666L, 3L -> 191666666666L))
  }

  test("five iterations keep symmetry, center dominance, bounded mass") {
    val got = Extended.pagerankOf(pathEdges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(3L), "symmetric nodes must rank equally")
    assert(got(2L) > got(1L), "the center of the path must dominate")
    // floor divisions only ever LOSE mass relative to the 1e12 total
    assert(got.values.sum <= Extended.PagerankScale)
    assert(got.values.forall(_ > 0L))
  }

  test("matches an independent reference implementation on a random graph") {
    val rnd = new scala.util.Random(47)
    val undirected = (1 to 80).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = (undirected ++ undirected.map(_.swap)).distinct
    // reference: same fixed-point arithmetic, plain Scala maps
    val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val n = deg.size
    val base = Extended.PagerankScale / n
    var rank = deg.keys.map(_ -> base).toMap
    for (_ <- 1 to 4) {
      val contrib = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = contrib.map { case (node, s) => node -> (15 * base + 85 * s) / 100 }
    }
    val got = Extended.pagerankOf(sym.toDF("pa", "pb"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === rank)
  }

  test("result is invariant to edge-frame partitioning") {
    def run(parts: Int) = Extended.pagerankOf(pathEdges.repartition(parts), 3)
      .as[(Long, Long)].collect().toMap
    assert(run(1) === run(7))
  }
}
