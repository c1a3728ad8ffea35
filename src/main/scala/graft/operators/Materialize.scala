package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Fault-tolerant materialization for reused gate-critical frames
  * (VERDICT r9 #2).
  *
  * `localCheckpoint()` stores the frame's blocks on executors WITHOUT
  * replication and severs lineage — on a real cluster one executor
  * loss makes the frame unrecomputable and fails the job. That is the
  * wrong durability class for exactly the frames the long-running
  * audit gates reuse across several downstream plans
  * ([[graft.similarity.Similarity]]'s probe frame, recall-gate exact
  * top-k, served-vs-in-query exceptAll sides). This helper picks the
  * storage by execution mode:
  *
  *  - **local master** (one JVM, no executor to lose): `localCheckpoint`
  *    — the fast path, and exactly as durable as the driver itself.
  *  - **cluster master**: write the frame ONCE to a temp parquet
  *    directory under the durable materialization root and read it
  *    back — the same recompute-from-stable-storage property a
  *    reliable RDD checkpoint gives, but through the parquet
  *    writer/reader (columnar, predicate-pushdown-capable on re-read)
  *    and without requiring `sparkContext.setCheckpointDir`. The dir
  *    is registered for delete-on-exit; a crashed job leaves at most
  *    one bounded temp directory (these frames are model-sized by
  *    construction — probe sets, top-k lists — never corpus-sized).
  *
  * The root resolves from `spark.graft.materialize.dir` if set, else
  * `spark.sql.warehouse.dir` — a filesystem every executor can reach,
  * which `/tmp` on the driver is not.
  */
object Materialize {

  def apply(df: DataFrame): DataFrame =
    materialize(df, durable = !df.sparkSession.sparkContext.isLocal)

  /** A fresh per-call directory under the SHARED materialization root
    * (`spark.graft.materialize.dir`, else `spark.sql.warehouse.dir`),
    * registered for delete-on-exit — the cluster-correct home for any
    * temp table an operator writes and reads back through executors.
    * Driver-local `createTempDirectory` paths are NOT this: off-local,
    * executors would write/read their own `/tmp` (ADVICE r10 on
    * `snapshot_time_travel`). */
  def tempDir(spark: org.apache.spark.sql.SparkSession,
      prefix: String): String = {
    val root = spark.conf.getOption("spark.graft.materialize.dir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new Path(new Path(root, "graft-materialize"),
      s"$prefix-${java.util.UUID.randomUUID()}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    fs.deleteOnExit(dir)
    dir.toString
  }

  /** `durable = true` forces the temp-parquet path (spec hook; also the
    * right call when a local session wants restart-safe gates). */
  private[graft] def materialize(df: DataFrame, durable: Boolean): DataFrame =
    if (!durable) df.localCheckpoint()
    else {
      // one copy of the root-resolution/cleanup policy: the durable
      // branch writes into a tempDir-allocated directory (fresh UUID —
      // SaveMode.ErrorIfExists makes an accidental collision loud
      // instead of silently merging frames)
      val spark = df.sparkSession
      val dir = new Path(tempDir(spark, "mat"), "frame")
      df.write.parquet(dir.toString)
      spark.read.parquet(dir.toString)
    }
}
