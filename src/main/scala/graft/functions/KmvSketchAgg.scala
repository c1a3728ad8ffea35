package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV / Theta-style distinct sketch: the `k` smallest DISTINCT 64-bit
  * hashes of the input, in UNSIGNED order (the Bar-Yossef et al. 2002
  * k-minimum-values estimator; the same retained-sample shape as the
  * Apache DataSketches Theta family). Unlike HLL registers, the
  * retained hashes are a uniform SAMPLE of the distinct set below a
  * per-sketch threshold θ — which is exactly what makes cross-sketch
  * SET ALGEBRA possible: the intersection of two sketches' samples
  * below min(θ_a, θ_b) is a uniform sample of the intersection, so
  * |A ∩ B| ≈ |sample ∩| / θ — the estimate HLL structurally cannot
  * give (unions only). Fully deterministic for a given input SET: the
  * k smallest distinct values do not depend on partition or merge
  * order, so queries built on it are stable under any layout.
  *
  * Convention (Theta-sketch standard): when the sketch saturates, the
  * k-th smallest retained value IS θ and is excluded from estimation —
  * `est = (k−1)/θ` with θ normalized to (0,1); when it holds fewer
  * than `k` values it is in EXACT mode (θ = 1, the sample is the whole
  * distinct set). Downstream estimators live in DataFrame-land over
  * the evaluated ARRAY<LONG> (see [[graft.dedup.Dedup.distinctOverlap]]):
  * per-source sketches are model-sized (k longs), so source-pair set
  * algebra over S sources costs S·k rows — independent of corpus size.
  *
  * Input must already be a 64-bit hash (`xxhash64(...)` or the shingle
  * kernel's chained hashes) — the aggregate ingests the hash as-is
  * rather than re-hashing, so callers can key the sketch on the same
  * 8-byte shingle hashes every other dedup join uses. Error: relative
  * std ≈ 1/√(k−2) for the distinct estimate (Beyer et al. 2007);
  * intersection estimates carry std ≈ √(|I|·(1/θ−1)) absolute.
  */
final class KmvState(val k: Int) {
  /** Retained hashes in unsigned ascending order. `java.lang.Long`
    * boxing is confined to the bounded TreeSet (≤ k entries). */
  val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0 &&
        !set.contains(h)) {
      set.add(h)
      set.remove(set.last())
      ()
    }
  }

  def mergeIn(other: KmvState): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** `kmv_sketch(hash64)` aggregate → ARRAY<BIGINT>: the k smallest
  * distinct input hashes in unsigned ascending order (length < k means
  * exact mode). Deterministic, so sketch-derived queries hash-check
  * when the downstream estimator is deterministic too. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 8, s"kmv_sketch needs k >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT (a 64-bit hash), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvState, b: KmvState): KmvState = { a.mergeIn(b); a }

  override def eval(buf: KmvState): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.set.size * 8)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvState(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.set.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  /** Register `kmv_sketch(hash)` bound to a fixed k. */
  def register(spark: SparkSession, k: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      exprs => KmvSketchAgg(exprs.head, k).toAggregateExpression(), "scala_udf")
}
