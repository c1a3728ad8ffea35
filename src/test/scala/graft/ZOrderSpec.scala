package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order clustering: the key is a correct bit interleave, and writing
  * files along the Z-curve gives per-file locality in BOTH dimensions —
  * measured here as "how many files must a single-product predicate
  * touch", z-ordered vs time-sorted layout. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkey column matches the reference interleave on random pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 30).toLong, rnd.nextInt(1 << 30).toLong))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zkey(col("a"), col("b")).as("z"), col("a"), col("b"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (z, a, b) => assert(z === ZOrder.zkeyRef(a, b)) }
  }

  test("zkey stays non-negative for bit-31-set and negative inputs") {
    // bit 31 of the second dimension would land in the long's sign bit
    // if inputs were truncated to 32 bits; the 31-bit mask prevents it
    val hot = Seq(
      (0x80000000L, 0x80000000L), (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0L),
      (-1L, -1L), (Long.MaxValue, Long.MaxValue), (-42L, 7L))
    val got = hot.toDF("a", "b")
      .select(ZOrder.zkey(col("a"), col("b")).as("z"), col("a"), col("b"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (z, a, b) =>
      assert(z >= 0L, s"zkey($a,$b)=$z must be non-negative")
      assert(z === ZOrder.zkeyRef(a, b))
    }
  }

  test("compactMonthZOrdered preserves the partition's rows exactly") {
    val dir = tmpDir("zcompact")
    val rows = (1 to 500).map(i =>
      (s"e$i", f"2026-03-${1 + i % 28}%02d 10:${i % 60}%02d:00", (i % 50).toLong))
    val df = rows.toDF("event_id", "event_time_s", "product_id")
      .select(col("event_id"), col("event_time_s").cast("timestamp").as("event_time"),
        col("product_id"))
    graft.ingest.EventSink.append(df, dir)
    val before = spark.read.parquet(dir).select("event_id").as[String].collect().toSet
    graft.ingest.EventSink.compactMonthZOrdered(spark, dir, "202603", targetFiles = 2)
    val after = spark.read.parquet(dir).select("event_id").as[String].collect().toSet
    assert(after === before)
  }

  test("z-ordered files bound both dimensions; time-sorted files only one") {
    // 64 time buckets × 64 products, one row each
    val grid = spark.range(64L * 64)
      .select((col("id") / 64).cast("long").as("t"),
        (col("id") % 64).cast("long").as("product_id"))
    def filesPerProduct(sorted: org.apache.spark.sql.DataFrame): Double = {
      val dir = tmpDir("zorder")
      sorted.write.mode("overwrite").parquet(dir)
      // materialize the (non-deterministic) file name before aggregating
      val withFile = spark.read.parquet(dir)
        .select(col("product_id"), input_file_name().as("f"))
      withFile.distinct()
        .groupBy("product_id").agg(count(lit(1)).as("nf"))
        .agg(avg("nf")).as[Double].head()
    }
    // 16 output files each; repartitionByRange makes file = key range
    val byTime = filesPerProduct(grid.repartitionByRange(16, col("t"), col("product_id")))
    val byZ = filesPerProduct(
      grid.repartitionByRange(16, ZOrder.zkey(col("t"), col("product_id"))))
    // time-range files contain every product (~16 files each); Z-curve
    // tiles bound the product range too (~4 of 16 files per product)
    assert(byZ < byTime / 2,
      s"z-order should at least halve files-per-product: z=$byZ time=$byTime")
    assert(byZ <= 6.0, s"64x64 grid in 16 z-tiles => ~4 files per product, got $byZ")
  }
}
