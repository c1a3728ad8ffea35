package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join — the streaming mirror of the batch
  * `range_join` query: purchases joined to errors of the same user
  * within 5 minutes after, both sides watermarked so Spark bounds the
  * join state (each side buffers only rows inside watermark + interval).
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, u: Long, et: String, t: String) =
    s"""{"event_id":$id,"user_id":$u,"event_type":"$et","ts":"$t"}"""

  test("watermarked interval join emits exactly the in-window pairs") {
    val in = tmpDir("ssj-in"); val ckpt = tmpDir("ssj-ckpt")
    Files.write(Paths.get(in, "b.json"), Seq(
      ev(1, 7, "purchase", "2026-08-12 10:00:00"),
      ev(2, 7, "error",    "2026-08-12 10:03:00"), // in window (3 min after)
      ev(3, 7, "error",    "2026-08-12 10:09:00"), // out of window (9 min)
      ev(4, 8, "error",    "2026-08-12 10:02:00"), // wrong user
      ev(5, 7, "purchase", "2026-08-12 11:00:00"),
      ev(6, 7, "error",    "2026-08-12 11:04:00"), // in window
      ev(7, 9, "purchase", "2026-08-12 13:00:00")) // watermark sentinel
      .mkString("\n").getBytes)

    val schema = "event_id LONG, user_id LONG, event_type STRING, ts STRING"
    val src = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(schema.replace("ts STRING", "ts STRING")))
      .json(in)
      .withColumn("ts", to_timestamp(col("ts")))

    // watermarks applied inside intervalJoin
    val purchases = src.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("t_p"))
    val errors = src.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("error_id"), $"ts".as("t_e"))

    val joined = graft.streaming.StreamingAnalytics.intervalJoin(
      purchases, "user_id", "t_p",
      errors, "e_user", "t_e",
      horizon = "5 minutes", watermark = "10 minutes")
      .select($"user_id", $"purchase_id", $"error_id")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ssj_out").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 1L, 2L), (7L, 5L, 6L)))
  }
}
