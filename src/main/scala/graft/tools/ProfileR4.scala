package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 stage profile: where do dedup_simhash_verified and the mm_*
  * family actually spend their time. Not part of the driver contract. */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-r4").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[profile] $name%-28s min=${ts.map(_._1).min}%6.2fs  rows=${ts.head._2}")
    }

    val docs = graft.Tables.documents(spark, d)
    time("simhash_fingerprints") {
      graft.dedup.Dedup.simhashFingerprints(docs).count()
    }
    time("exhaustive_jaccard") {
      graft.dedup.Dedup.ngramJaccardOf(docs).count()
    }
    time("simhash_verified_full") {
      graft.dedup.Dedup.simhashVerified(spark, d).count()
    }
    time("band_candidates_8x8") {
      val fp = graft.dedup.Dedup.simhashFingerprints(docs).localCheckpoint()
      val banded = fp.select(col("doc_id"),
        explode(org.apache.spark.sql.functions.array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            expr(s"(simhash >> ${b * 8}) & 255").as("bkey"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      banded.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
        .join(banded.select(col("doc_id").as("doc_b"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b")).count()
    }
    time("media_encode_only") {
      graft.multimodal.Multimodal.mediaTable(spark, d).count()
    }
    time("media_decode") {
      graft.multimodal.Multimodal.decodedTable(spark, d).count()
    }
    time("mm_meta_full") {
      graft.multimodal.Multimodal.mmMeta(spark, d).count()
    }
    println(s"[profile] documents input partitions = " +
      docs.rdd.getNumPartitions)
    spark.stop()
  }
}
