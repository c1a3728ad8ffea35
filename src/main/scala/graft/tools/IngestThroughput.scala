package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-throughput smoke (manual; not a driver gate): synthesize N
  * sales events as JSON lines, run them through the full streaming
  * ingest path (text source → from_json → typed transform → partitioned
  * sorted parquet sink, exactly the pipeline the reference's Kafka→MV→
  * MergeTree path maps to) and report rows/second end to end.
  *
  * The reference generator produces ~0.67–2 msg/s by design
  * (BASELINE.md); this measures what the same pipeline shape sustains
  * when the source isn't sleeping. `INGEST_N=500000 sbt "runMain
  * graft.tools.IngestThroughput"` */
object IngestThroughput {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("INGEST_N", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val in = tmp("ingest-in"); val out = tmp("ingest-out"); val ckpt = tmp("ingest-ckpt")

    val ticks = spark.range(n).select(col("id").as("value"),
      timestamp_millis(lit(1735689600000L) + col("id")).as("timestamp"))
    graft.sources.EventProducer.synthesize(ticks)
      .filter(col("topic") === "sales").select("value")
      .write.mode("overwrite").text(in)

    val pipeline = graft.streaming.StreamingPipeline.textDir(
      spark, graft.streaming.StreamingPipeline.Sales, in, out, ckpt)
    val t0 = System.nanoTime()
    pipeline.attach()
    pipeline.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(out).count()
    println(f"[ingest-throughput] rows=$rows secs=$secs%.2f rows_per_sec=${rows / secs}%.0f")
    pipeline.detach()
    spark.stop()
  }
}
