package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Driver-local Lloyd iterations over a BOUNDED training sample — the
  * r18 optimization round's cut of the per-iteration distributed
  * training passes (guide §1.2 "the distributed algorithm", §5 "the
  * driver should do almost no data work" — and the carve-out the
  * repo's model-sized collects already live under).
  *
  * What it replaces: every quantizer trainer ([[Similarity
  * .trainCentroids]], [[ProductQuantizer]]'s `trainFrom`, the
  * [[HierQuantizer]] sub level) ran each Lloyd iteration as a
  * distributed pass — assign (map-only since r17), per-dimension
  * decimal sums, collect — over its training frame. The centroid model
  * was ALREADY driver-held between iterations (collected and
  * re-broadcast per round, the MLlib structure), and since the
  * train-on-sample caps (VERDICT r10 #5 / r16 #4: [[Similarity
  * .IvfTrainCap]], [[HierQuantizer.SubTrainCap]], the FAISS
  * discipline) the training DATA is bounded too on every registered
  * scale path. So the per-iteration distributed passes buy nothing:
  * collecting the sample ONCE (a single `take`-style job that
  * early-terminates on corpora above the cap) and iterating locally
  * produces the identical model with ZERO distributed work per
  * iteration. At 100 TB the capped paths stop re-deriving the
  * Lehmer-filtered sample from the corpus once per iteration — the
  * old shape paid `iters` corpus scans, the new one pays the one
  * bounded take.
  *
  * BIT-IDENTITY, the load-bearing property (the driver re-hashes every
  * query): each local step replicates the distributed arithmetic
  * exactly —
  *
  *  - assignment calls the SAME compiled kernels the distributed plan
  *    calls ([[graft.functions.NearestCellsExpr.bestCells]],
  *    [[graft.functions.PqNearestCodeExpr.nearestCode]], and for the
  *    hier sub level the `cosine_sim` loop + min-struct order
  *    replicated below), so every winner and tie-break is the same
  *    code path, not a re-implementation;
  *  - the per-dimension mean replicates
  *    `CAST(x AS DECIMAL(28,12))` (Spark casts a double through its
  *    `toString` decimal form, then `setScale(12, HALF_UP)`), the
  *    exact decimal SUM (associative and order-independent — the very
  *    property the repo's never-sum-doubles policy bought, which is
  *    what makes a local re-ordering of the sum legal at all),
  *    `CAST(sum AS DOUBLE)` (`BigDecimal.doubleValue`, correctly
  *    rounded), and the final double division by the count;
  *  - seeds are the same first-k-by-id rows, and a cluster that loses
  *    every member drops out exactly as the distributed groupBy did.
  *
  * LocalTrainSpec pins the equality model-for-model against the
  * distributed trainers on the real corpus; the full-registry
  * row-exact diff (tools/diff_verify_out.py) pins it end to end.
  */
private[graft] object LocalTrain {

  /** Row cap for the one-shot sample collect: 4× [[Similarity
    * .IvfTrainCap]] (the Lehmer bucket filter overshoots the target by
    * up to 2× — `n / (n/cap)` buckets — and the PQ trainer's frame
    * carries M sub-rows per vector; 2¹⁷ rows of ≤ 64 doubles ≈ 70 MB
    * of driver arrays, the same order as the model broadcasts the
    * trainers already collect). Above the cap `collect*` returns None
    * after an early-terminating take and the caller keeps its
    * distributed plan — corpora past the cap see one cheap probe job,
    * bounded-sample paths see the one collect that replaces every
    * per-iteration pass. */
  val RowCap: Int = (Similarity.IvfTrainCap << 2).toInt

  /** `CAST(x AS DECIMAL(28,12))` exactly as Spark's Cast evaluates it:
    * double → its decimal string form (`BigDecimal.valueOf`) →
    * `setScale(12, HALF_UP)`. */
  @inline private def dec12(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP)

  /** Per-dimension decimal-exact mean of a group's vectors — the local
    * form of `posexplode → sum(cast(x as decimal(28,12))) / n` with
    * `CAST(sx AS DOUBLE) / n` per position. Ragged inputs keep the
    * distributed semantics: position p averages over the members long
    * enough to have it. */
  private def decimalMean(vs: scala.collection.Seq[Array[Double]]): Seq[Double] = {
    val dims = vs.iterator.map(_.length).max
    val sums = Array.fill(dims)(java.math.BigDecimal.ZERO)
    val cnts = new Array[Long](dims)
    vs.foreach { v =>
      var i = 0
      while (i < v.length) {
        sums(i) = sums(i).add(dec12(v(i)))
        cnts(i) += 1
        i += 1
      }
    }
    (0 until dims).iterator.filter(cnts(_) > 0)
      .map(i => sums(i).doubleValue() / cnts(i).toDouble).toSeq
  }

  private val dummyArr = Literal(null, ArrayType(DoubleType))

  // ---------- flat coarse quantizer (Similarity.trainCentroids) ----------

  /** The (vec_id, v) sample, sorted by vec_id, or None past the cap or
    * on any null id/vector (nulls would need the distributed plans'
    * null-group semantics — no corpus has them; fall back rather than
    * replicate). One early-terminating take job. */
  def collectFlat(df: DataFrame): Option[Array[(Long, Array[Double])]] = {
    val rows = df.select(col("vec_id").cast("long"), col("v"))
      .limit(RowCap + 1).collect()
    if (rows.length > RowCap || rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) None
    else Some(rows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1))
  }

  /** Lloyd over a sorted bounded sample: seed = first `nlist` rows by
    * vec_id (cid = vec_id); per iteration assign through
    * [[graft.functions.NearestCellsExpr.bestCells]] (k = 1) against
    * the cid-sorted model and recompute decimal-exact means. Returns
    * the (cid, cv) model rows sorted by cid. */
  def lloydFlat(sample: Array[(Long, Array[Double])], nlist: Int,
      iters: Int): Seq[(Long, Seq[Double])] = {
    var model: Seq[(Long, Seq[Double])] =
      sample.take(math.max(0, nlist)).map { case (id, v) => (id, v.toSeq) }.toSeq
    var it = 0
    while (it < iters && model.nonEmpty) {
      val kernel = graft.functions.NearestCellsExpr(dummyArr,
        model.map(_._1).toArray, model.map(_._2.toArray).toArray, 1)
      val groups = scala.collection.mutable.TreeMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Array[Double]]]
      sample.foreach { case (_, v) =>
        val cid = kernel.bestCells(new GenericArrayData(v)).getLong(0)
        groups.getOrElseUpdate(cid,
          scala.collection.mutable.ArrayBuffer.empty[Array[Double]]) += v
      }
      model = groups.iterator.map { case (cid, vs) => (cid, decimalMean(vs)) }.toSeq
      it += 1
    }
    model
  }

  // ---------- product quantizer (ProductQuantizer.trainFrom) ----------

  /** The (vec_id, m, sv) sub-vector sample or None past the cap. */
  def collectPq(sub: DataFrame): Option[Array[(Long, Int, Array[Double])]] = {
    val rows = sub.select(col("vec_id").cast("long"), col("m").cast("int"), col("sv"))
      .limit(RowCap + 1).collect()
    if (rows.length > RowCap ||
        rows.exists(r => r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))) None
    else Some(rows.map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray)))
  }

  /** Lloyd over the exploded sub-vector sample: seed cid = rank of the
    * vector's vec_id among the first `k` distinct vec_ids; assignment
    * through [[graft.functions.PqNearestCodeExpr.nearestCode]] against
    * the per-subspace cid-sorted codebook. Returns (m, cid, cv) sorted
    * by (m, cid). */
  def lloydPq(sample: Array[(Long, Int, Array[Double])], k: Int,
      iters: Int): Seq[(Int, Int, Seq[Double])] = {
    val seedRank = sample.iterator.map(_._1).toArray.distinct.sorted
      .take(math.max(0, k)).zipWithIndex.toMap
    var model: Seq[(Int, Int, Seq[Double])] = sample.iterator
      .filter(r => seedRank.contains(r._1))
      .map(r => (r._2, seedRank(r._1), r._3.toSeq)).toSeq
      .sortBy(r => (r._1, r._2))
    var it = 0
    while (it < iters && model.nonEmpty) {
      val mTot = model.iterator.map(_._1).max + 1
      val byM = model.groupBy(_._1)
      val ids = Array.tabulate(mTot)(m =>
        byM.getOrElse(m, Seq.empty).map(_._2).toArray)
      val book = Array.tabulate(mTot)(m =>
        byM.getOrElse(m, Seq.empty).map(_._3.toArray).toArray)
      val kernel = graft.functions.PqNearestCodeExpr(
        Literal(0), dummyArr, ids, book)
      val groups = scala.collection.mutable.TreeMap
        .empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Array[Double]]]
      sample.foreach { case (_, m, sv) =>
        // the SAME kernel call the distributed assignment makes — its
        // semantics (including the defensive empty-codebook-row case)
        // are inherited, not re-implemented; a subspace past the
        // model's range cannot occur (the seed covers every subspace
        // in the sample)
        val cid = kernel.nearestCode(m, new GenericArrayData(sv))
        groups.getOrElseUpdate((m, cid),
          scala.collection.mutable.ArrayBuffer.empty[Array[Double]]) += sv
      }
      model = groups.iterator.map { case ((m, cid), vs) =>
        (m, cid, decimalMean(vs)) }.toSeq
      it += 1
    }
    model
  }

  // ---------- hier sub level (HierQuantizer.train) ----------

  /** The (sup, vec_id, v) super-assigned sample or None past the cap. */
  def collectHier(df: DataFrame): Option[Array[(Long, Long, Array[Double])]] = {
    val rows = df.select(col("sup").cast("long"), col("vec_id").cast("long"), col("v"))
      .limit(RowCap + 1).collect()
    if (rows.length > RowCap ||
        rows.exists(r => r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))) None
    else Some(rows.map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray)))
  }

  /** `cosine_sim`'s exact sequential loop
    * ([[graft.functions.CosineSimilarity]]). */
  @inline private def cosine(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i); val yi = y(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark's struct-min double ordering on the negated similarity:
    * `==` first (±0.0 equated), then `java.lang.Double.compare` (NaN
    * greatest — never wins a min unless all candidates are NaN, and
    * the zero-norm guard keeps cosine finite anyway). */
  @inline private def nsLess(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** The sub-level Lloyd rounds of [[HierQuantizer.train]] over a
    * bounded super-assigned sample: seed = first k2 sample vectors per
    * super by vec_id (scid = rank − 1); per round each sample vector
    * joins its super's sub-centroids and takes the
    * `min(struct(-cos, sup, scid, v))` winner — within one vector's
    * candidates `sup` is fixed, so the order is (-cos asc, scid asc),
    * replicated through [[nsLess]]. Returns (sup, scid, cv) sorted. */
  def lloydHier(sample: Array[(Long, Long, Array[Double])], k2: Int,
      iters: Int): Seq[(Long, Long, Seq[Double])] = {
    val sorted = sample.sortBy(r => (r._1, r._2))
    val seed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Double])]
    var curSup = Long.MinValue
    var rank = 0
    sorted.foreach { case (sup, _, v) =>
      if (sup != curSup) { curSup = sup; rank = 0 }
      if (rank < k2) seed += ((sup, rank.toLong, v))
      rank += 1
    }
    var model: Seq[(Long, Long, Seq[Double])] =
      seed.iterator.map { case (s, c, v) => (s, c, v.toSeq) }.toSeq
    var it = 0
    while (it < iters && model.nonEmpty) {
      val byS = model.groupBy(_._1).map { case (s, rows) =>
        (s, rows.sortBy(_._2).map(r => (r._2, r._3.toArray)).toArray)
      }
      val groups = scala.collection.mutable.TreeMap
        .empty[(Long, Long), scala.collection.mutable.ArrayBuffer[Array[Double]]]
      sample.foreach { case (sup, _, v) =>
        byS.get(sup).foreach { cands =>
          var bestNs = 0.0; var bestScid = 0L; var first = true
          cands.foreach { case (scid, cv) =>
            val ns = -cosine(v, cv)
            val cmp = if (first) -1 else nsLess(ns, bestNs)
            if (cmp < 0 || (cmp == 0 && scid < bestScid)) {
              bestNs = ns; bestScid = scid
            }
            first = false
          }
          groups.getOrElseUpdate((sup, bestScid),
            scala.collection.mutable.ArrayBuffer.empty[Array[Double]]) += v
        }
      }
      model = groups.iterator.map { case ((s, c), vs) =>
        (s, c, decimalMean(vs)) }.toSeq
      it += 1
    }
    model
  }
}
