package graft.tools

/** Shared amplification geometry for the Scale tools.
  *
  * Every octave sweep grows a base table by disjoint id-shifted copies
  * (`id + copy · IdShift`); the shift MUST clear the base id range or
  * copies collide and every keyed-vs-reference id join silently
  * explodes (ADVICE r11). One constant + one guard here, so a future
  * shift change cannot drift apart from the places that derive the
  * copy index back out of an amplified id (the shingle sweep's copy
  * suffix — where drift would silently re-create the quadratic-pairs
  * disk fill ScaleR13 documents). */
private[tools] object Amplify {

  /** Copy stride: copies land at `id + copy · IdShift`. */
  val IdShift = 10000000L

  /** Loud pre-flight: the base table's max id must sit under the
    * stride. */
  def assertClears(maxId: Long, what: String): Unit =
    require(maxId < IdShift,
      s"amplification shift $IdShift must exceed max $what $maxId")
}
