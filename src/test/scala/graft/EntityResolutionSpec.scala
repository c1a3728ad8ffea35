package graft

import graft.queries.Extended

/** Entity resolution = blocked fuzzy match + connected components +
  * canonical election. Constructed records pin the three behaviors the
  * composition adds over its parts: blocking attributes VETO a name
  * match, transitive chains fold into one entity, and the canonical
  * record is the min-id member. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(recs: Seq[(Long, String, Int, String)])
      : Map[Long, (Long, String, Long)] =
    Extended.entityResolutionOf(recs.toDF("id", "name", "nk", "seg"))
      .as[(Long, Long, String, Long)].collect()
      .map { case (id, cid, canon, n) => id -> ((cid, canon, n)) }.toMap

  test("typo pair in the same block resolves to one entity") {
    val recs = Seq(
      (1L, "acme corp", 7, "BUILDING"),
      (2L, "acme c0rp", 7, "BUILDING"), // substitution, ED 1
      (3L, "unrelated", 7, "BUILDING"))
    assert(resolve(recs) === Map(
      1L -> ((1L, "acme corp", 2L)),
      2L -> ((1L, "acme corp", 2L)),
      3L -> ((3L, "unrelated", 1L))))
  }

  test("identical names in different blocks stay different entities") {
    // same name, but nation / segment disagree -> the blocking veto
    val recs = Seq(
      (1L, "acme corp", 7, "BUILDING"),
      (2L, "acme corp", 8, "BUILDING"),
      (3L, "acme corp", 7, "MACHINERY"))
    assert(resolve(recs).values.map(_._3).toSeq === Seq(1L, 1L, 1L))
    assert(resolve(recs).map { case (id, (cid, _, _)) => id -> cid } ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("transitive typo chain folds into one entity with min-id canon") {
    // 10-11 and 11-12 are ED 1; 10-12 is ED 2 — only transitivity
    // (the CC stage) links them
    val recs = Seq(
      (12L, "acme xorp", 1, "AUTOMOBILE"),
      (11L, "acme xorq", 1, "AUTOMOBILE"),
      (10L, "acme corq", 1, "AUTOMOBILE"))
    assert(resolve(recs) === Map(
      10L -> ((10L, "acme corq", 3L)),
      11L -> ((10L, "acme corq", 3L)),
      12L -> ((10L, "acme corq", 3L)))) // canonical name follows min id
  }

  test("insertion / deletion variants match, distance-2 names do not") {
    val recs = Seq(
      (1L, "smith", 3, "HOUSEHOLD"),
      (2L, "smiths", 3, "HOUSEHOLD"),  // insertion, ED 1
      (3L, "smi", 3, "HOUSEHOLD"))     // ED 2 from smith — no edge
    val r = resolve(recs)
    assert(r(1L) === ((1L, "smith", 2L)) && r(2L) === ((1L, "smith", 2L)))
    assert(r(3L) === ((3L, "smi", 1L)))
  }
}
