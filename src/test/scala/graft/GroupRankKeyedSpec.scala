package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AssignIds, GroupRank}
import graft.functions.RangeBucketExpr

/** The keyed (deterministic value-bucketed) GroupRank/AssignIds paths:
  * rank/prefix-sum equivalence against the window formulation, tie
  * robustness (a tied primary must never straddle a bucket), recompute
  * determinism without any pin, and the plan law the variant exists
  * for — no checkpoint scan, no durable corpus write. */
class GroupRankKeyedSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int) =
    (1 to n).map(i => (s"g${i % 3}", i.toLong, (i * 37 % 19).toDouble))
      .toDF("g", "id", "score")

  // Parquet-backed frames auto-derive a trusted under-envelope byte
  // estimate since r15 and would take the WINDOW arm; the tests below
  // that assert keyed-machinery behavior force the keyed form with an
  // explicit 100 TB-shaped estimate (local frames stay keyed under the
  // default — autoInputBytes distrusts LocalRelation by design).
  private val forceKeyed = BigInt(1L) << 40

  test("RangeBucketExpr.bucket is lower_bound: strict-< search, ties low") {
    val bs = Array(1.0, 3.0, 3.5)
    assert(RangeBucketExpr.bucket(0.5, bs) === 0)
    assert(RangeBucketExpr.bucket(1.0, bs) === 0) // equal → lower bucket
    assert(RangeBucketExpr.bucket(1.1, bs) === 1)
    assert(RangeBucketExpr.bucket(3.0, bs) === 1)
    assert(RangeBucketExpr.bucket(3.2, bs) === 2)
    assert(RangeBucketExpr.bucket(9.9, bs) === 3)
    assert(RangeBucketExpr.bucket(9.9, Array.empty[Double]) === 0)
  }

  test("withGroupRankBy matches the window row_number, asc and desc, " +
    "with heavy primary ties, across partition counts") {
    val df = mk(97)
    for (parts <- Seq(1, 4, 9); desc <- Seq(true, false)) {
      val ord = if (desc) $"score".desc else $"score".asc
      val w = Window.partitionBy($"g").orderBy(ord, $"id")
      val want = df.withColumn("rk", row_number().over(w).cast("long"))
        .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
      val got = GroupRank.withGroupRankBy(df, Seq("g"), $"score", desc,
          $"id", "rk", partitions = parts)
        .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
      assert(got === want, s"parts=$parts desc=$desc")
    }
  }

  test("withGroupRankBy totalOut rides along as the group size") {
    val df = mk(50)
    val got = GroupRank.withGroupRankBy(df, Seq("g"), $"score", false,
        $"id", "rk", totalOut = Some("n"))
      .select($"g", $"n").distinct().as[(String, Long)].collect().toMap
    val want = df.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("withRunningSumBy matches the window prefix sum (current row " +
    "inclusive) and emits the group total") {
    val df = mk(83).withColumn("tok", ($"id" % 7 + 1).cast("long"))
    val w = Window.partitionBy($"g").orderBy($"score", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum", sum($"tok").over(w))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val got = GroupRank.withRunningSumBy(df, Seq("g"), $"score", false,
        $"id", $"tok", "cum", partitions = 5, totalOut = Some("tot"))
    val gotCum = got.select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(gotCum === want)
    val gotTot = got.select($"g", $"tot").distinct()
      .as[(String, Long)].collect().toMap
    val wantTot = df.groupBy($"g").agg(sum($"tok")).as[(String, Long)]
      .collect().toMap
    assert(gotTot === wantTot)
  }

  test("MULTI-COLUMN group axis: rank and running sum match the window " +
    "forms when PARTITION BY carries two columns") {
    val df = (1 to 120).map { i =>
      (s"g${i % 4}", (i % 3).toLong, i.toLong, (i * 31 % 23).toDouble,
        (i % 7 + 1).toLong)
    }.toDF("g", "h", "id", "score", "tok")
    val wr = Window.partitionBy($"g", $"h").orderBy($"score", $"id")
    val wantRk = df.withColumn("rk", row_number().over(wr).cast("long"))
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val gotRk = GroupRank.withGroupRankBy(df, Seq("g", "h"), $"score",
        false, $"id", "rk", partitions = 5, groupBound = 16)
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert(gotRk === wantRk)
    val ws = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantCum = df.withColumn("cum", sum($"tok").over(ws))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val gotCum = GroupRank.withRunningSumBy(df, Seq("g", "h"), $"score",
        false, $"id", $"tok", "cum", partitions = 5, groupBound = 16)
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(gotCum === wantCum)
  }

  test("withContiguousIdsBy = global row_number; grouped variant = " +
    "(group asc, primary, tie) total order") {
    val df = mk(60)
    val flat = AssignIds.withContiguousIdsBy(df, $"score", $"id")
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    val wantFlat = df.withColumn("new_id",
        row_number().over(Window.orderBy($"score", $"id")).cast("long"))
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    assert(flat === wantFlat)
    val grouped = AssignIds.withContiguousIdsGrouped(df, Seq("g"),
        $"score", $"id")
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    val wantGrouped = df.withColumn("new_id",
        row_number().over(Window.orderBy($"g", $"score", $"id")).cast("long"))
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    assert(grouped === wantGrouped)
  }

  test("keyed path is recompute-deterministic with no pin: two runs of " +
    "the same frame agree bit-for-bit") {
    val df = mk(90)
    val build = () => GroupRank.withGroupRankBy(df, Seq("g"), $"score",
        true, $"id", "rk", partitions = 6)
      .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
    assert(build() === build())
  }

  test("plan law: no checkpoint scan, no temp-parquet scan — the pin is " +
    "gone; offsets come back broadcast; the bucket is the codegen'd " +
    "binary search") {
    // a parquet-backed frame: a tiny local one is constant-folded into
    // a LocalTableScan, which hides the bucket expression from the plan
    val df = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"n_chars")
    // groupBound: the registered-caller shape — with a promised enum
    // bound the offsets frame is hint-broadcast; without one the hint
    // is dropped and AQE decides (asserted separately below)
    val ranked = GroupRank.withGroupRankBy(df, Seq("source"), $"n_chars",
      false, $"doc_id", "rk", partitions = 5, groupBound = 32,
      inputBytes = forceKeyed)
    val p = ranked.queryExecution.executedPlan.toString
    assert(!p.contains("Scan ExistingRDD"),
      s"keyed path must not localCheckpoint:\n$p")
    assert(!p.toLowerCase.contains("graft-mat"),
      s"keyed path must not durable-materialize:\n$p")
    assert(p.contains("BroadcastExchange"), s"offsets must broadcast:\n$p")
    assert(p.contains("range_bucket"), s"bucket must be the expression:\n$p")
  }

  test("token_budget: kept set is the exact mix-order prefix under the " +
    "60% token ceiling, per source") {
    import graft.text.TextAnalysis
    val got = TextAnalysis.tokenBudget(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    // never exceeds the integer budget, and cum is the true prefix sum
    got.foreach { case (_, _, _, cum, tot) => assert(cum * 5 <= tot * 3) }
    // independent reference: the naive per-source window prefix sum
    val mix = graft.functions.DetMix.lehmerMix(col("doc_id"))
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        mix.as("sk"))
    val w = Window.partitionBy($"source").orderBy($"sk", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy($"source")
    val want = docs.withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("tot", sum($"n_tokens").over(wt))
      .filter($"cum" * 5 <= $"tot" * 3)
      .select($"source", $"doc_id", $"n_tokens", $"cum", $"tot")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got.toSet === want)
  }

  test("curriculum_order: positions are dense 1..n, phases are the " +
    "global length NTILE(4), and within a phase the order is the mix") {
    import graft.text.TextAnalysis
    val got = TextAnalysis.curriculumOrder(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val n = got.length
    assert(got.map(_._3).sorted.toSeq === (1L to n).toSeq, "dense positions")
    // independent reference: naive global windows
    val mix = graft.functions.DetMix.lehmerMix(col("doc_id"))
    val want = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"), mix.as("sk"))
      .withColumn("phase", ntile(4).over(
        Window.orderBy($"n_chars", $"doc_id")).cast("long"))
      .withColumn("pos", row_number().over(
        Window.orderBy($"phase", $"sk", $"doc_id")).cast("long"))
      .select($"doc_id", $"phase", $"pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.toSet === want)
  }

  test("mixture_schedule: geometric source shares hold in EVERY prefix, " +
    "not just in expectation") {
    import graft.text.TextAnalysis
    // equal-size constructed corpus so no source exhausts inside the
    // tested prefixes; weights are 2^-idx → 8:4:2:1 over 4 sources
    val docs = (0 until 1024).map(i =>
      (i.toLong, s"s${i % 4}", "w " * (i % 7 + 1)))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", length($"text"))
    val dir = java.nio.file.Files.createTempDirectory("mixsched").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sched = TextAnalysis.mixtureSchedule(spark, dir)
      .select($"pos", $"source").as[(Long, String)].collect().sortBy(_._1)
    // stride law: after any prefix, source i (stride 2^i) has emitted
    // floor(V / 2^i) ± ties — so counts track prefix·w_i/15 within 2
    for (prefix <- Seq(60, 150, 300, 420)) {
      val counts = sched.take(prefix).groupBy(_._2).view.mapValues(_.length)
      val w = Map("s0" -> 8, "s1" -> 4, "s2" -> 2, "s3" -> 1)
      w.foreach { case (s, wi) =>
        val ideal = prefix * wi / 15.0
        val got = counts.getOrElse(s, 0)
        assert(math.abs(got - ideal) <= 2.0,
          s"prefix=$prefix source=$s got=$got ideal=$ideal")
      }
    }
  }

  test("boundary sketch resolves the requested bucket count: adjacent " +
    "quantiles must not collapse once parts outruns a fixed error") {
    val df = spark.range(0, 100000).toDF("id")
      .withColumn("__k", $"id".cast("double"))
    // 200 parts on 100k distinct uniform values: a fixed 0.02 error
    // could legally return ~25 distinct boundaries; the scaled error
    // must keep nearly all 199
    val bs = GroupRank.boundarySketch(df, "__k", 200)
    assert(bs.size >= 180, s"sketch collapsed to ${bs.size} boundaries")
    assert(bs == bs.distinct.sorted)
  }

  test("NULL group columns are ranked partitions, not dropped rows — " +
    "window PARTITION BY semantics survive the offsets join") {
    val df = Seq((1L, "a", 3.0), (2L, null, 1.0), (3L, "a", 2.0),
      (4L, null, 5.0), (5L, "b", 4.0)).toDF("id", "g", "score")
    val got = GroupRank.withGroupRankBy(df, Seq("g"), $"score", false,
        $"id", "rk", partitions = 3)
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"score", $"id")).cast("long"))
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert(got === want) // both NULL-group rows present and ranked 1, 2
    assert(got.size === 5)
    val grouped = AssignIds.withContiguousIdsGrouped(df, Seq("g"),
        $"score", $"id")
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    assert(grouped.size === 5, "grouped ids must keep NULL-group rows")
  }

  test("NULL or NaN primary fails loud instead of silently misranking") {
    val withNull = Seq((1L, "a", Some(1.0)), (2L, "a", None))
      .toDF("id", "g", "score")
    intercept[Exception] {
      GroupRank.withGroupRankBy(withNull, Seq("g"), $"score", false,
        $"id", "rk").collect()
    }
    val withNaN = Seq((1L, "a", 1.0), (2L, "a", Double.NaN))
      .toDF("id", "g", "score")
    intercept[Exception] {
      GroupRank.withGroupRankBy(withNaN, Seq("g"), $"score", false,
        $"id", "rk").collect()
    }
    // ±∞ (an upstream double division) must raise like NaN does, not
    // silently bucket to an extreme (ADVICE r11: the documented
    // contract is "non-null and FINITE")
    for (inf <- Seq(Double.PositiveInfinity, Double.NegativeInfinity)) {
      val withInf = Seq((1L, "a", 1.0), (2L, "a", inf))
        .toDF("id", "g", "score")
      intercept[Exception] {
        GroupRank.withGroupRankBy(withInf, Seq("g"), $"score", false,
          $"id", "rk").collect()
      }
    }
  }

  test("a violated groupBound promise fails LOUD in the broadcast " +
    "build, never a silent oversized driver broadcast") {
    val df = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"n_chars")
    // 20 sources in the data; promise 4 — the per-bucket guard must
    // raise during execution
    val lied = GroupRank.withGroupRankBy(df, Seq("source"), $"n_chars",
      false, $"doc_id", "rk", partitions = 5, groupBound = 4,
      inputBytes = forceKeyed)
    val e = intercept[Exception] { lied.count() }
    assert(e.getMessage.contains("groupBound") ||
      Option(e.getCause).exists(_.getMessage.contains("groupBound")),
      s"expected the groupBound guard, got: $e")
  }

  test("no group-count bound => no broadcast HINT on the offsets join " +
    "(a generic high-cardinality group axis must not be able to force " +
    "an unbounded driver broadcast; AQE may still broadcast at runtime)") {
    val df = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"n_chars")
    val unhinted = GroupRank.withGroupRankBy(df, Seq("source"), $"n_chars",
      false, $"doc_id", "rk", partitions = 5, inputBytes = forceKeyed)
    // the logical plan must carry no ResolvedHint/UnresolvedHint on the
    // offsets side — the initial physical plan then has no forced
    // BroadcastExchange (AQE's runtime conversion is allowed and good)
    val lp = unhinted.queryExecution.optimizedPlan.toString
    assert(!lp.contains("ResolvedHint") && !lp.contains("broadcast"),
      s"offsets join must not be hint-forced without a bound:\n$lp")
    // and correctness is unchanged on the unhinted path
    val want = GroupRank.withGroupRankBy(df, Seq("source"), $"n_chars",
        false, $"doc_id", "rk", partitions = 5, groupBound = 32)
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    val got = unhinted.select($"doc_id", $"rk")
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("an overflow-sized groupBound cannot trick the gate into a forced " +
    "broadcast: the parts × bound budget is checked by division, so a " +
    "negative product can never read as under-budget (ADVICE r12)") {
    val df = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"n_chars")
    // parts=2 × (2^62 − 1) overflows Long to −2 ≤ 2^20 — the pre-fix
    // gate passed and hint-forced the join with an untrippable guard
    val huge = GroupRank.withGroupRankBy(df, Seq("source"), $"n_chars",
      false, $"doc_id", "rk", partitions = 2,
      groupBound = Long.MaxValue / 2, inputBytes = forceKeyed)
    val lp = huge.queryExecution.optimizedPlan.toString
    assert(!lp.contains("ResolvedHint") && !lp.contains("broadcast"),
      s"an over-budget bound must drop the hint, not overflow past it:\n$lp")
    // and the unhinted plan still ranks correctly
    val want = GroupRank.withGroupRankBy(df, Seq("source"), $"n_chars",
        false, $"doc_id", "rk", partitions = 2, groupBound = 32)
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    val got = huge.select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("primary longs past 2^53 rank EXACTLY with a plain tiebreak: the " +
    "window orders by the original primary, the double only buckets") {
    val base = (1L << 53)
    val df = Seq(
      (1L, base + 1), (2L, base), (3L, base + 2), (4L, 7L), (5L, base - 1))
      .toDF("id", "v")
    val got = AssignIds.withContiguousIdsBy(df, $"v", $"id", partitions = 3)
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    val want = df.withColumn("new_id",
        row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("primary keys past 2^53: double rounding collides but the exact " +
    "struct tiebreak restores the long order (no silent misorder)") {
    // 2^53 and 2^53+1 round to the SAME double; +2 is distinct again.
    // An exact-long window is the reference; the keyed path must match
    // it when the tiebreak refines by the exact long.
    val base = (1L << 53)
    val df = Seq(
      (1L, base + 1), (2L, base), (3L, base + 2), (4L, 7L), (5L, base - 1))
      .toDF("id", "v")
    val got = AssignIds.withContiguousIdsBy(df, $"v",
        struct($"v", $"id"), partitions = 3)
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    val want = df.withColumn("new_id",
        row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .select($"id", $"new_id").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("sketch sample cap adapts past 2^16 parts: >= 2^5 expected " +
    "samples per bucket at any requested resolution (VERDICT r13 #5)") {
    assert(GroupRank.sketchSampleCap(1024) === (1L << 21)) // floor holds
    assert(GroupRank.sketchSampleCap(1 << 16) === (1L << 21)) // the edge
    assert(GroupRank.sketchSampleCap(1 << 17) === (1L << 22)) // cap rises
    assert(GroupRank.sketchSampleCap(100000) === 3200000L)
  }

  test("a row-count stat UNDER-reporting the true count cannot skip the " +
    "sample: the no-sample decision is verified by the exact key-only " +
    "count (VERDICT r13 #4 — the uncapped-GK cliff stays closed)") {
    val big = spark.range(3000000L)
      .select(($"id" % 99991).cast("double").as("k"))
    // the stub stat claims 100 rows (<= cap); the true count is 3M
    // (> cap) — trusting the stat would sketch 3M rows uncapped
    val (bs, trace) = GroupRank.boundarySketchTraced(
      big, "k", parts = 300, statN = Some(100L))
    assert(trace.exactCounts === 1, "the no-sample decision must be " +
      "verified by the exact column-pruned count")
    assert(trace.sampledFraction.isDefined &&
      trace.sampledFraction.get < 1.0,
      s"the sketch must still sample, got $trace")
    assert(!trace.resketched)
    assert(bs.size > 149, s"boundaries must resolve, got ${bs.size}")
  }

  test("an honest at-or-below-cap stat costs exactly one verifying " +
    "count and sketches unsampled") {
    val small = spark.range(5000L).select($"id".cast("double").as("k"))
    val (bs, trace) = GroupRank.boundarySketchTraced(
      small, "k", parts = 300, statN = Some(5000L))
    assert(trace === GroupRank.SketchTrace(None, 1, resketched = false))
    assert(bs.size > 149)
  }

  test("a row-count stat OVER-reporting the true count (the LIMIT " +
    "shape) cannot collapse the keyed path to one bucket: the boundary " +
    "shortfall triggers one exact count and a re-sketch (ADVICE r13)") {
    val small = spark.range(50000L).select($"id".cast("double").as("k"))
    // the stub stat claims 4G rows — fraction ~5e-4 of the true 50k
    // leaves a ~26-row sample whose sketch resolves almost nothing
    val (bs, trace) = GroupRank.boundarySketchTraced(
      small, "k", parts = 300, statN = Some(4000000000L))
    assert(trace.resketched, s"shortfall must re-sketch, got $trace")
    assert(trace.exactCounts === 1)
    assert(trace.sampledFraction.isEmpty, "the corrected count is " +
      "under the cap, so the re-sketch runs unsampled")
    assert(bs.size > 149, s"boundaries must resolve, got ${bs.size}")
  }

  test("end-to-end LIMIT shape: a GlobalLimit's stat IS the limit " +
    "value; the shortfall recovery still resolves the boundaries") {
    // parquet relations carry no rowCount, so limit() is the one plan
    // shape whose stat over-reports without CBO — the documented case
    val df = Tables.documents(spark, sf0001)
      .select($"doc_id".cast("double").as("k"))
      .limit(2000000000)
    val statN = df.queryExecution.optimizedPlan.stats.rowCount
    assert(statN.exists(_.longValue == 2000000000L),
      s"precondition: the limit must reach the stat, got $statN")
    val (bs, trace) = GroupRank.boundarySketchTraced(df, "k", parts = 300)
    assert(trace.resketched && bs.size > 149,
      s"got ${bs.size} boundaries, $trace")
  }

  test("under CBO the sizing never trusts plan stats: ANALYZE-derived " +
    "estimates can UNDER-report inside the above-cap regime, an " +
    "invisible over-sample cliff the shortfall recovery cannot see " +
    "(r14 review)") {
    // the same LIMIT shape that over-reports without CBO; with CBO on
    // the stat must be IGNORED and the exact pruned count pays instead
    val df = Tables.documents(spark, sf0001)
      .select($"doc_id".cast("double").as("k"))
      .limit(2000000000)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val (bs, trace) = GroupRank.boundarySketchTraced(df, "k", parts = 300)
      assert(trace.exactCounts === 1 && !trace.resketched,
        s"CBO stats must not size the sample, got $trace")
      assert(bs.size > 149)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("window-vs-keyed gate (VERDICT r13 #1, unified r14): an " +
    "under-envelope inputBytes plans the plain grouped window with " +
    "identical ranks, sums, and totals; above-envelope or no estimate " +
    "keeps the keyed bucket form; empty groupCols never gate") {
    val df = mk(97).withColumn("tok", ($"id" % 7 + 1).cast("long"))
    def plan(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.executedPlan.toString
    // rank + total: window arm == keyed arm, row for row
    // the keyed form's tell in a plan string is its offsets join
    // (__off) — range_bucket itself constant-folds away over LOCAL
    // relations (ConvertToLocalRelation evaluates the projection)
    val gated = GroupRank.withGroupRankBy(df, Seq("g"), $"score", false,
      $"id", "rk", totalOut = Some("n"), inputBytes = BigInt(4096))
    val keyed = GroupRank.withGroupRankBy(df, Seq("g"), $"score", false,
      $"id", "rk", totalOut = Some("n"), partitions = 7)
    assert(!plan(gated).contains("__off") &&
      plan(gated).contains("Window"),
      s"under the envelope the gate must plan the window:\n${plan(gated)}")
    assert(plan(keyed).contains("__off"))
    assert(gated.select($"id", $"rk", $"n").as[(Long, Long, Long)]
      .collect().toSet ===
      keyed.select($"id", $"rk", $"n").as[(Long, Long, Long)]
        .collect().toSet)
    // running sum + total: same law
    val gsum = GroupRank.withRunningSumBy(df, Seq("g"), $"score", false,
      $"id", $"tok", "cum", totalOut = Some("t"), inputBytes = BigInt(4096))
    val ksum = GroupRank.withRunningSumBy(df, Seq("g"), $"score", false,
      $"id", $"tok", "cum", totalOut = Some("t"), partitions = 7)
    assert(!plan(gsum).contains("__off"))
    assert(gsum.select($"id", $"cum", $"t").as[(Long, Long, Long)]
      .collect().toSet ===
      ksum.select($"id", $"cum", $"t").as[(Long, Long, Long)]
        .collect().toSet)
    // above the envelope the estimate must NOT window
    val big = GroupRank.withGroupRankBy(df, Seq("g"), $"score", false,
      $"id", "rk", partitions = 7, inputBytes = BigInt(1L) << 40)
    assert(plan(big).contains("__off"),
      "an above-envelope estimate must keep the keyed form")
    // empty groupCols: a global single-partition window is never the
    // gate's business, tiny estimate or not
    val flat = GroupRank.withGroupRankBy(df, Seq.empty, $"score", false,
      $"id", "rk", partitions = 3, inputBytes = BigInt(4096))
    assert(plan(flat).contains("__off"),
      "empty groupCols must never take the window arm")
  }

  test("empty frame and single-partition degenerate cleanly") {
    val empty = mk(5).filter($"id" > 100)
    assert(GroupRank.withGroupRankBy(empty, Seq("g"), $"score", false,
      $"id", "rk").count() === 0L)
    val one = mk(7)
    val got = GroupRank.withGroupRankBy(one, Seq("g"), $"score", false,
        $"id", "rk", partitions = 1)
      .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"score", $"id")
    val want = one.withColumn("rk", row_number().over(w).cast("long"))
      .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
    assert(got === want)
  }
}
