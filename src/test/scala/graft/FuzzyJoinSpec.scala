package graft

import org.apache.spark.sql.functions._
import graft.queries.Extended

/** FastSS fuzzy join: the deletion-neighborhood blocking must find every
  * edit-distance-1 pair flavor and nothing past the verify. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds substitution, insertion, and deletion pairs; rejects ED 2") {
    val names = Seq(
      (1L, "abcdef"),  // base
      (2L, "abcdeX"),  // substitution at the end  → dist 1
      (3L, "abcdefg"), // insertion at the end     → dist 1
      (4L, "abcde"),   // deletion of the last char → dist 1
      (5L, "abXdeX"),  // two substitutions from 1 (dist 2) but ONE from 2
      (6L, "zzzzzz")   // unrelated
    ).toDF("id", "name")
    val got = Extended.fuzzyJoinOf(names)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // absent by ED 2: (2,3) "abcdeX"/"abcdefg", (3,4) "abcdefg"/"abcde",
    // (1,5) two substitutions — blocking may surface some as candidates
    // (shared variants ⇒ ED ≤ 2) but the verify must drop them
    assert(got === Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 4L, 1L),  // "abcdeX" vs "abcde": one trailing deletion
      (2L, 5L, 1L))) // "abcdeX" vs "abXdeX": one mid substitution
  }

  test("identical names pair at distance 0") {
    val names = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "name")
    val got = Extended.fuzzyJoinOf(names)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 0L)))
  }

  test("adjacent duplicate characters don't produce duplicate pair rows") {
    // deleting either '0' of "a00b" yields the same variant — the result
    // must still be one row per pair
    val names = Seq((1L, "a00b"), (2L, "a0b")).toDF("id", "name")
    val got = Extended.fuzzyJoinOf(names)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L)))
  }

  test("blocking is complete: equals brute force on a random corpus") {
    // short strings over a 3-letter alphabet → dense ED-1 neighborhoods,
    // the adversarial case for blocking recall
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(13)
    val strs = (1 to 120).map { i =>
      i.toLong -> (1 to (3 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val expected = (for {
      (ia, na) <- strs; (ib, nb) <- strs
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    val got = Extended.fuzzyJoinOf(strs.toDF("id", "name"))
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(expected.nonEmpty, "the random corpus must actually produce pairs")
  }

  test("plan blocks on the hashed variant: equi-join, no cartesian") {
    val p = Extended.fuzzyJoin(spark, sf0001).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be an equi-join on the variant hash:\n$p")
  }
}
