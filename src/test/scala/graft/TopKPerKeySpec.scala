package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

/** The custom group-wise top-k operator: physical plan shape and exact
  * equivalence with the window-function formulation. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("plans as TopKPerKeyExec over a hash exchange, no Sort operator") {
    val df = TopKPerKey(Tables.orders(spark, sf0001), Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(plan.contains("Exchange hashpartitioning(o_custkey"))
    assert(!plan.contains("Sort ["), s"no per-partition full sort expected:\n$plan")
  }

  test("two-phase: partial heaps below the exchange bound shuffled rows to keys×k×maps") {
    val df = spark.range(100000)
      .select(($"id" % 7).as("key"), ($"id" * 2654435761L % 100000).as("v"))
    val q = TopKPerKey(df.toDF(), Seq("key"), Seq($"v".asc), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val iFinal = plan.indexOf("TopKPerKey [")
    val iEx = plan.indexOf("Exchange hashpartitioning")
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iFinal >= 0 && iEx > iFinal && iPartial > iEx,
      s"expected final > exchange > partial layering:\n$plan")
    // the exchange carried the partial's output (≤ 7 keys × 3 × maps),
    // not the 100k input rows
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def findShuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => findShuffles(a.executedPlan)
      case s: QueryStageExec => findShuffles(s.plan)
      case e: ShuffleExchangeLike => e +: e.children.flatMap(findShuffles)
      case other => other.children.flatMap(findShuffles)
    }
    val shuffles = findShuffles(q.queryExecution.executedPlan)
    assert(shuffles.nonEmpty)
    val written = shuffles.head.metrics
      .collectFirst { case (name, m) if name.toLowerCase.contains("recordswritten") => m.value }
    written.foreach(w =>
      assert(w <= 7L * 3 * 64, s"exchange carried $w rows — partial heap not engaged?"))
    assert(written.nonEmpty, "no records-written metric found on the exchange")
  }

  test("result set == window row_number formulation, all keys covered") {
    val custom = TopKPerKey(Tables.orders(spark, sf0001), Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), k = 3)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    val windowed = queries.Relational.windowRank(spark, sf0001)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    assert(custom === windowed)
    assert(custom.nonEmpty)
  }

  test("source_quota: hard cap binds per source, heap plan, window-equivalent") {
    import org.apache.spark.sql.expressions.Window
    val q = graft.text.TextAnalysis.sourceQuota(spark, sf0001)
    // the cap binds: every source holds EXACTLY the quota here (25 docs
    // per source in the corpus, quota 10)
    val per = q.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(per.nonEmpty)
    assert(per.values.forall(_ == graft.text.TextAnalysis.SourceQuotaDocs.toLong))
    // plan is the bounded heap, not Sort+Window
    val plan = graft.plans.TopKPerKey(
        Tables.documents(spark, sf0001).select($"doc_id", $"source"),
        Seq("source"),
        Seq(graft.functions.DetMix.lehmerMix($"doc_id").asc, $"doc_id".asc),
        k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"))
    // equals the window formulation doc-for-doc
    val w = Window.partitionBy($"source")
      .orderBy(graft.functions.DetMix.lehmerMix($"doc_id").asc, $"doc_id".asc)
    val windowed = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(q.select($"doc_id").as[Long].collect().toSet === windowed)
    // non-binding branch: a source under quota keeps every doc
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val kept = TopKPerKey(tiny, Seq("source"),
      Seq(graft.functions.DetMix.lehmerMix($"doc_id").asc, $"doc_id".asc), k = 10)
    assert(kept.count() === 3L)
  }

  test("k larger than any group returns every row; duplicate order values kept") {
    val df = Seq((1L, 10.0), (1L, 10.0), (2L, 5.0)).toDF("key", "v")
    val out = TopKPerKey(df, Seq("key"), Seq($"v".desc), k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(out.sorted === Seq((1L, 10.0), (1L, 10.0), (2L, 5.0)).sorted)
  }

  test("ties at the k boundary resolve by the full sort order deterministically") {
    val df = Seq((1L, 10.0, "a"), (1L, 10.0, "b"), (1L, 10.0, "c")).toDF("key", "v", "id")
    val out = TopKPerKey(df, Seq("key"), Seq($"v".desc, $"id"), k = 2)
      .select("id").as[String].collect().toSet
    assert(out === Set("a", "b"))
  }

  test("heap budget (VERDICT r9 #4): a skewed high-cardinality key space past " +
    "the budget falls back to the spilling sort, result unchanged") {
    // ~50k distinct keys land in 4 partitions — per-partition key
    // cardinality far beyond a 64-row retained budget — plus one hot
    // key with 10k rows (the skew the heap path has no escape from)
    val wide = spark.range(50000)
      .select(($"id" % 50000).as("key"), ($"id" * 2654435761L % 1000).as("v"))
    val hot = spark.range(10000)
      .select(lit(999999L).as("key"), $"id".as("v")) // distinct v: set compare stays exact
    val df = wide.unionAll(hot)
    def run(): Set[(Long, Long)] = {
      val q = TopKPerKey(df, Seq("key"), Seq($"v".asc, $"key".asc), k = 2)
      // collect() on q ITSELF: .as[...] would wrap a fresh QueryExecution
      // whose metrics are not the ones read below
      val out = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // read the fallback metric off the executed plan; query stages are
      // traversal LEAVES, so descend through the AQE wrapper and each
      // QueryStageExec explicitly
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.graft.TopKPerKeyExec
      def findTopK(p: SparkPlan): Seq[TopKPerKeyExec] = p match {
        case a: AdaptiveSparkPlanExec => findTopK(a.executedPlan)
        case s: QueryStageExec => findTopK(s.plan)
        case e: TopKPerKeyExec => e +: e.children.flatMap(findTopK)
        case other => other.children.flatMap(findTopK)
      }
      val execs = findTopK(q.queryExecution.executedPlan)
      assert(execs.nonEmpty)
      val fellBack = execs.head.metrics("fallbackPartitions").value
      if (spark.conf.getOption("spark.graft.topKPerKey.maxRetainedRows").contains("64"))
        assert(fellBack > 0, "tiny budget must engage the sort fallback")
      else
        assert(fellBack === 0, "default budget must stay on the heap path")
      out
    }
    val onHeap = run()
    spark.conf.set("spark.graft.topKPerKey.maxRetainedRows", "64")
    try {
      val onSort = run()
      assert(onSort === onHeap, "fallback path must be value-identical")
      // sanity: the hot key kept exactly k rows, smallest v first
      assert(onSort.count(_._1 == 999999L) === 2)
    } finally spark.conf.unset("spark.graft.topKPerKey.maxRetainedRows")
  }
}
