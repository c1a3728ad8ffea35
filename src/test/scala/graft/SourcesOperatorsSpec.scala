package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.schema.EventSchemas
import graft.sources.FileSources

/** File connectors (CSV/JSON/ORC + quarantine) and the skew-join
  * operator, plus session-extension function injection. */
class SourcesOperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("json source: corrupt rows quarantined, clean rows typed (S4 batch mirror)") {
    val dir = tmpDir("fs-json")
    Files.write(Paths.get(dir, "a.json"), Seq(
      """{"event_id":"e1","event_type":"sale","event_time":"2026-08-12 10:00:00","product_id":1,"product_name":"p","category":"c","quantity":1,"price":5.0,"discount":0.0,"total":5.0,"store_id":1,"cashier_id":1,"customer_id":"x"}""",
      """{"event_id":"e2", busted""").mkString("\n").getBytes)
    val (clean, bad) = FileSources.quarantine(
      FileSources.json(spark, EventSchemas.salesRaw, dir))
    assert(clean.count() === 1 && bad.count() === 1)
    assert(clean.select("event_id").as[String].head() === "e1")
  }

  test("csv source: header + typed schema + timestamp format") {
    val dir = tmpDir("fs-csv")
    Files.write(Paths.get(dir, "a.csv"), Seq(
      "event_id,event_type,event_time,product_id,product_name,category,quantity,price,discount,total,store_id,cashier_id,customer_id",
      "e1,sale,2026-08-12 10:00:00,1,p,c,1,5.0,0.0,5.0,1,1,x").mkString("\n").getBytes)
    val df = FileSources.csv(spark, EventSchemas.salesRaw, dir)
    assert(df.count() === 1)
    assert(df.schema("product_id").dataType === org.apache.spark.sql.types.LongType)
  }

  test("orc round-trip preserves the typed schema") {
    val dir = tmpDir("fs-orc") + "/t"
    val events = Tables.events(spark, sf0001).limit(100)
    events.write.orc(dir)
    val back = FileSources.orc(spark, dir)
    assert(back.count() === 100)
    assert(back.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
  }

  test("salted join result == plain join result (semantics preserved)") {
    val events = Tables.events(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    val plain = events.join(customer, $"user_id" === $"c_custkey")
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedEquiJoin(
        events, customer.withColumnRenamed("c_custkey", "user_id"),
        "user_id", $"event_id", salts = 8)
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted count == plain count per key") {
    val events = Tables.events(spark, sf0001)
    val plain = events.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val salted = SkewJoin.saltedCount(events, "user_id", $"event_id", salts = 8)
      .as[(Long, Long)].collect().toMap
    assert(salted === plain)
  }

  test("GraftExtensions injects cosine_sim/rolling_hash/sketch aggs at session build") {
    val prev = spark // keep the shared session's context alive
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = GraftSession.builder("ext-test", "local[2]", shufflePartitions = 2).getOrCreate()
      val r = s2.sql(
        """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       rolling_hash('abc') AS rh""".stripMargin).collect().head
      assert(r.getDouble(0) === 1.0)
      assert(r.getLong(1) === ((((0L * 31 + 97) % 1000000007L) * 31 + 98) % 1000000007L * 31 + 99) % 1000000007L)
      val agg = s2.sql(
        "SELECT simhash_agg(h) AS f, minhash_agg(h & 4294967295) AS m FROM VALUES (1L),(2L),(3L) AS t(h)")
        .collect().head
      assert(agg.getSeq[Long](1).length === 128)
      // round-5 kernels: positional grams and the per-row LSH bands
      val k = s2.sql(
        """SELECT shingle_hashes('a b c d', 3) AS sh,
          |       gram_hashes('a b c d', 3) AS gh,
          |       minhash_bands_row('a b c d e f') AS mb""".stripMargin)
        .collect().head
      assert(k.getSeq[Long](0) === k.getSeq[Long](1),
        "distinct trigrams of a repeat-free string equal the positional grams")
      assert(k.getSeq[Long](2).length === 32)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
}
