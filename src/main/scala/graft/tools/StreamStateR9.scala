package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Round-9 bounded-state EVIDENCE for the watermarked streaming
  * operators (VERDICT r8 #5): `dedupKeyed`
  * ([[graft.streaming.StreamingPipeline]]) and `intervalJoin`
  * ([[graft.streaming.StreamingAnalytics]]) argue state eviction in
  * scaladoc; this tool measures it.
  *
  * Method: a [[MemoryStream]] drives a constant-rate workload whose
  * event time advances one minute per micro-batch, for several times
  * the watermark horizon, and every batch's
  * `StreamingQueryProgress.stateOperators` metrics (state rows, state
  * memory) are recorded. The bounded-state claim predicts state rows
  * GROW for ~horizon/batch-interval batches and then PLATEAU at
  * ~rate × horizon (dedup: distinct keys per horizon; join: buffered
  * rows per side inside watermark + interval) — an unbounded operator
  * (e.g. plain `dropDuplicates`, the documented anti-pattern) grows
  * linearly forever, which the `dedup-unbounded` CONTROL row
  * demonstrates on the same workload.
  *
  * Both the default HDFS-backed provider and RocksDB
  * (`rocksdbjni` ships in /opt/spark/jars) are swept — at 100 TB/day
  * RocksDB is the provider that keeps large horizons off-heap.
  *
  * Run: `sbt "runMain graft.tools.StreamStateR9"`; table lands in
  * SCALE.md §round-9. */
object StreamStateR9 {

  private val RowsPerBatch = 5000
  private val KeysPerBatch = 4000 // intra-batch duplicate fraction 20%
  private val Batches = 40
  private val HorizonMin = 10

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    for ((pname, pcls) <- providers) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", pcls)
      dedupSweep(spark, pname, bounded = true)
      if (pname == "hdfs") dedupSweep(spark, pname, bounded = false) // control
      joinSweep(spark, pname)
    }
    spark.stop()
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Drive `Batches` micro-batches, print every 5th batch's state
    * metrics, and return the (rows@half, rows@end) plateau check. */
  private def drive(q: StreamingQuery, name: String,
      feed: Int => Unit): Unit = {
    var half = 0L
    for (b <- 1 to Batches) {
      feed(b)
      q.processAllAvailable()
      val p = q.lastProgress
      val st = p.stateOperators
      val rows = if (st.isEmpty) -1L else st.map(_.numRowsTotal).sum
      val mem = if (st.isEmpty) -1L else st.map(_.memoryUsedBytes).sum
      if (b == Batches / 2) half = rows
      if (b % 5 == 0 || b == 1)
        println(f"[stream-state-r9] $name%-22s batch=$b%3d in=${p.numInputRows}%6d " +
          f"state_rows=$rows%8d state_mb=${mem / 1e6}%8.2f")
    }
    val p = q.lastProgress
    val end = p.stateOperators.map(_.numRowsTotal).sum
    val ratio = if (half > 0) end.toDouble / half else -1.0
    println(f"[stream-state-r9] $name%-22s PLATEAU rows@${Batches / 2}=$half%8d " +
      f"rows@$Batches=$end%8d ratio=$ratio%5.2f  (bounded ⇒ ~1.0, unbounded ⇒ ~2.0)")
    q.stop()
  }

  /** Keyed dedup at rate × horizon: fresh key space per batch, 20%
    * intra-batch duplicates; event time advances 1 min/batch against a
    * `HorizonMin`-minute watermark. `bounded = false` runs the plain
    * `dropDuplicates` anti-pattern as the control. */
  private def dedupSweep(spark: SparkSession, provider: String,
      bounded: Boolean): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp)]
    val typed = in.toDF.toDF("event_id", "event_time")
    val deduped =
      if (bounded)
        graft.streaming.StreamingPipeline
          .dedupKeyed(typed, "event_time", s"$HorizonMin minutes")
      else typed.dropDuplicates("event_id")
    val q = deduped.writeStream.format("noop")
      .option("checkpointLocation", tmp("ssr9-dedup")).start()
    val t0 = Timestamp.valueOf("2026-08-14 00:00:00").getTime
    val label = s"dedup-$provider" + (if (bounded) "" else "-UNBOUNDED")
    drive(q, label, b => in.addData(
      (0 until RowsPerBatch).map { i =>
        (b.toLong * KeysPerBatch + i % KeysPerBatch,
          new Timestamp(t0 + b.toLong * 60000 + i % 60000))
      }))
  }

  /** Stream-stream interval join at the same rate: both sides share a
    * 100-key space; the right side matches inside a 5-minute window.
    * State is buffered rows per side within watermark + interval. */
  private def joinSweep(spark: SparkSession, provider: String): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val lin = MemoryStream[(Long, Timestamp)]
    val rin = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.StreamingAnalytics.intervalJoin(
      lin.toDF.toDF("l_key", "l_time"), "l_key", "l_time",
      rin.toDF.toDF("r_key", "r_time"), "r_key", "r_time",
      horizon = "5 minutes", watermark = s"$HorizonMin minutes")
    val q = joined.writeStream.format("noop")
      .option("checkpointLocation", tmp("ssr9-join")).start()
    val t0 = Timestamp.valueOf("2026-08-14 00:00:00").getTime
    drive(q, s"join-$provider", b => {
      val rows = (0 until RowsPerBatch / 2).map { i =>
        (i.toLong % 100, new Timestamp(t0 + b.toLong * 60000 + i % 60000))
      }
      lin.addData(rows)
      rin.addData(rows.map { case (k, t) =>
        (k, new Timestamp(t.getTime + 120000)) // 2 min after: in window
      })
    })
  }
}
