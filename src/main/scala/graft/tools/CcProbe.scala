package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway r18 probe: per-stage names + run times for one query, to
  * attribute an exec-time regression. Not part of the driver contract. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = args.lift(1).getOrElse("semantic_dedup")
    val spark = SparkSession.builder()
      .appName("cc-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tuneShufflePartitions(spark, d)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val rt = if (m == null) -1L else m.executorRunTime
        val in = if (m == null) -1L else m.inputMetrics.bytesRead
        val sr = if (m == null) -1L else m.shuffleReadMetrics.recordsRead
        val sw = if (m == null) -1L else m.shuffleWriteMetrics.recordsWritten
        val gc = if (m == null) -1L else m.jvmGCTime
        val cpu = if (m == null) -1L else m.executorCpuTime / 1000000L
        val des = if (m == null) -1L else m.executorDeserializeTime
        rows.add(f"stage=${si.stageId}%4d tasks=${si.numTasks}%4d runMs=$rt%7d cpuMs=$cpu%7d gcMs=$gc%6d desMs=$des%6d inMB=${in / 1e6}%8.2f srRec=$sr%8d swRec=$sw%8d  ${si.name.take(80)}")
      }
    })
    val fn = graft.SparkEntry.queries(q)
    fn(spark, d).write.format("noop").mode("overwrite").save()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    Thread.sleep(1500)
    rows.clear()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    Thread.sleep(1500)
    rows.forEach(r => println(r))
    spark.stop()
  }
}
