package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed within-group ranking — `row_number() OVER (PARTITION BY
  * group ORDER BY order)` WITHOUT one window partition per group.
  *
  * The grouped sibling of [[AssignIds]]: a plain grouped window puts
  * every row of a group through ONE task, so low-cardinality strata
  * (languages, sources — 5-ish groups over 100 TB) serialize the whole
  * corpus through a handful of executors. The distributed formulation
  * reuses the range-partition + offsets recipe, with the group columns
  * leading the range key:
  *
  *  1. `repartitionByRange(group ++ order)` — range-disjoint
  *     partitions; a group spans a contiguous RUN of partitions, each
  *     internally ordered, so `offset + local position` is the global
  *     in-group rank;
  *  2. per-(partition, group) row counts — a frame of at most
  *     `partitions + groups` rows (each partition holds whole groups
  *     plus at most a leading/trailing fragment);
  *  3. running-sum offsets per group across partition ids — a window
  *     over that model-sized counts frame (never collected: unlike
  *     [[AssignIds]]' single global scan-left, the per-group running
  *     sum is itself expressible as a tiny window), broadcast-joined
  *     back;
  *  4. within-partition `row_number` windowed by (partition, group) —
  *     every window partition is one data partition's slice of one
  *     group.
  *
  * The ranked frame is durably pinned ([[Materialize]]) between the
  * counts pass and the rank pass so both see one placement. On a
  * cluster the durable pin writes the FULL ranked input to temp
  * parquet once — accepted deliberately (ADVICE r10): the counts pass
  * and the rank pass MUST observe one physical placement (range-
  * partition boundaries come from a row sample, so a recompute may
  * split differently and corrupt every offset), and one columnar
  * temp write is the same order of I/O any global sort spills; the
  * dir is deleted on JVM exit. (Order keys must be made unique per
  * group by a tie-break column — same contract as [[AssignIds]].)
  */
object GroupRank {

  /** `df` plus a dense 1-based `out` rank within each `groupCols`
    * stratum following `orderCols`; with `totalOut` set, also each
    * row's group size (free — it is the same counts frame's full-
    * window sum, and rank-based cuts almost always need it).
    * `partitions <= 0` (the default) sizes the range shuffle from the
    * session's CURRENT `spark.sql.shuffle.partitions` — which
    * Bench/Verify tune bytes-proportionally
    * ([[graft.GraftSession.tuneShufflePartitions]]) — instead of a
    * constant parallelism ceiling (VERDICT r10 #1). */
  def withGroupRank(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], out: String = "rk",
      partitions: Int = 0, totalOut: Option[String] = None): DataFrame = {
    val parts = AssignIds.sizedPartitions(df, partitions)
    val rangeKey = groupCols.map(col) ++ orderCols
    val ranged = Materialize(
      df.repartitionByRange(parts, rangeKey: _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy("__pid", groupCols: _*)
      .agg(count(lit(1)).as("__n"))
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .withColumns(totalOut.map(t => t -> sum(col("__n")).over(wTot)).toMap)
      .drop("__n")
    val wLocal = Window.partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(orderCols: _*)
    ranged
      .join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(out, row_number().over(wLocal).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }
}
