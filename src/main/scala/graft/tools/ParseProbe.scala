package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scratch harness: times candidate implementations of the parse_props
  * field extraction inside one JVM (min over repeats), to pick the scan
  * that goes in the query. Not part of the driver contract. */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("AB_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.Tables.events(spark, d)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "from_json" -> (() => ev.select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k")).orderBy("event_id")),
      "get_json_object" -> (() => ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k")).orderBy("event_id")),
      "regexp_extract" -> (() => ev.select(col("event_id"),
        regexp_extract(col("props"), "\"k\": *(-?[0-9]+)", 1).cast("int").as("k"))
        .orderBy("event_id")),
      "no_parse" -> (() => ev.select(col("event_id"),
        length(col("props")).as("k")).orderBy("event_id")))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    variants.foreach { case (n, f) => time(f); () } // warm all
    val mins = variants.map { case (n, f) =>
      n -> (1 to reps).map(_ => time(f)).min
    }
    mins.foreach { case (n, t) => println(f"  $n%-18s ${t}%.3f s") }
    spark.stop()
  }
}
