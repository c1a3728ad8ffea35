package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Extended

/** Round-8 diagnosis of the 64× LPA/ER constant-factor erosion
  * (VERDICT r7 "What's missing" #3 / "Next round" #3).
  *
  * ScaleR7 measured the graph suite sublinear to 16× but found LPA
  * reading ×5.6 and entity resolution ×7.3 on the 16×→64× step, and
  * SCALE.md §r7 could only *attribute* that to single-JVM memory
  * pressure ("plausible but unproven" — the verdict's words). The
  * missing evidence is per-round/per-phase task metrics: if the vote
  * rounds' EXCHANGE ROWS stay flat while JVM GC time and spill grow
  * with the multiplier, the erosion is provably a one-JVM residency
  * artifact (a 100-node cluster divides the same label frame by its
  * executor count); if exchange rows grow round-over-round, the plans
  * themselves degrade and need fixing.
  *
  * Instrumentation: a [[SparkListener]] that sums completed stages'
  * aggregated task metrics (executor run time, JVM GC time,
  * memory/disk spill, shuffle read/write records+bytes). Snapshots
  * bracket each LPA vote round (the loop here mirrors
  * [[Extended.lpaOf]] exactly — same `a`-partitioned persisted edge
  * frame, same [[Extended.lpaRound]], same per-round
  * `localCheckpoint`) and each ER phase (candidate generation /
  * verify / connected components / canonical assembly, the phases of
  * [[Extended.entityResolutionOf]]).
  *
  * Run: `SPARK_DRIVER_MEM=96g SCALE_R8_MULTS=1,4,16,64
  * sbt "runMain graft.tools.ScaleR8 [lpa|er|all]"`. Results land in
  * SCALE.md §round-8.
  */
object ScaleR8 {

  /** Sums of per-stage aggregated task metrics since construction.
    * Stage-completion events arrive on the listener bus slightly after
    * the action returns, so [[snapshot]] waits for the bus to drain. */
  final class StageMetrics(spark: SparkSession) extends SparkListener {
    val runTimeMs = new AtomicLong
    val gcTimeMs = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val shufReadRec = new AtomicLong
    val shufReadBytes = new AtomicLong
    val shufWriteRec = new AtomicLong
    val shufWriteBytes = new AtomicLong
    val peakExecMem = new AtomicLong
    spark.sparkContext.addSparkListener(this)

    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        runTimeMs.addAndGet(m.executorRunTime)
        gcTimeMs.addAndGet(m.jvmGCTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shufReadRec.addAndGet(m.shuffleReadMetrics.recordsRead)
        shufReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        shufWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peakExecMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }

    case class Snap(runTimeMs: Long, gcTimeMs: Long, memSpill: Long,
        diskSpill: Long, shufReadRec: Long, shufReadBytes: Long,
        shufWriteRec: Long, shufWriteBytes: Long) {
      def -(o: Snap): Snap = Snap(runTimeMs - o.runTimeMs,
        gcTimeMs - o.gcTimeMs, memSpill - o.memSpill,
        diskSpill - o.diskSpill, shufReadRec - o.shufReadRec,
        shufReadBytes - o.shufReadBytes, shufWriteRec - o.shufWriteRec,
        shufWriteBytes - o.shufWriteBytes)
    }

    private def read(): Snap =
      Snap(runTimeMs.get, gcTimeMs.get, memSpill.get, diskSpill.get,
        shufReadRec.get, shufReadBytes.get, shufWriteRec.get,
        shufWriteBytes.get)

    /** Listener events are async (the bus drain API is private[spark]);
      * poll until two consecutive reads agree. Rounds run seconds, so
      * ≤1 s of settle time cannot blur which round a stage belongs to. */
    def snapshot(): Snap = {
      var prev = read()
      var i = 0
      while (i < 10) {
        Thread.sleep(100)
        val cur = read()
        if (cur == prev) i = 10 else { prev = cur; i += 1 }
      }
      prev
    }
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def mb(b: Long): Double = b / 1e6

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALE_R8_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = args.headOption.getOrElse("all")
    val mults = sys.env.get("SCALE_R8_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16, 64))
    for (mult <- mults) {
      if (which == "lpa" || which == "all") lpaDiagnose(spark, d, mult)
      if (which == "er" || which == "all") erDiagnose(spark, d, mult)
      if (which == "lpa-ab") lpaProbeOrderAb(spark, d, mult)
    }
    spark.stop()
  }

  /** The same disjoint-copy amplification ScaleR7 used (shifted keys;
    * identical per-copy degree distribution). */
  private def amplifiedHalf(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    val li = (0 until mult).map { i =>
      Tables.lineitem(spark, d)
        .select((col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i.toLong * 100000000L)).as("l_partkey"))
    }.reduce(_ unionByName _)
    li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok")
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"""
          .stripMargin)).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .distinct()
  }

  private def header(): Unit =
    println(f"${"phase"}%-12s ${"wall_s"}%7s ${"run_s"}%7s ${"gc_s"}%6s " +
      f"${"spill_mb"}%9s ${"dspill_mb"}%9s ${"shW_rec"}%10s ${"shR_rec"}%10s " +
      f"${"shW_mb"}%8s")

  private def row(m: StageMetrics, name: String, wall: Double,
      delta: StageMetrics#Snap): Unit =
    println(f"$name%-12s $wall%7.2f ${delta.runTimeMs / 1e3}%7.1f " +
      f"${delta.gcTimeMs / 1e3}%6.1f ${mb(delta.memSpill)}%9.0f " +
      f"${mb(delta.diskSpill)}%9.0f ${delta.shufWriteRec}%10d " +
      f"${delta.shufReadRec}%10d ${mb(delta.shufWriteBytes)}%8.1f")

  /** LPA with the production loop shape, each vote round bracketed by
    * metric snapshots. The zero-exchange claim predicts shW_rec ≈ 0
    * for every vote round (edges cached `a`-partitioned; both aggs
    * partition-local; the label join broadcast). */
  private[tools] def lpaDiagnose(spark: SparkSession, d: String, mult: Int): Unit = {
    println(s"\n[scale-r8] lpa mult=$mult (dir=$d)")
    val m = new StageMetrics(spark)
    header()
    var s0 = m.snapshot()
    val half = amplifiedHalf(spark, d, mult).cache()
    val (nEdges, tBuild) = timed(half.count())
    var s1 = m.snapshot(); row(m, "build", tBuild, s1 - s0); s0 = s1

    val edges = half.select(col("pa").as("a"), col("pb").as("b"))
      .union(half.select(col("pb").as("a"), col("pa").as("b")))
      .repartition(col("a"))
      .sortWithinPartitions("b") // mirrors lpaOf (probe-order fix, r8)
      .persist()
    val (_, tSym) = timed(edges.count())
    s1 = m.snapshot(); row(m, "symmetrize", tSym, s1 - s0); s0 = s1

    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    val nNodes = labels.count()
    s1 = m.snapshot(); row(m, "init-labels", 0.0, s1 - s0); s0 = s1

    for (r <- 1 to Extended.LpaRounds) {
      val (next, tR) = timed {
        val n = Extended.lpaRound(edges, labels).localCheckpoint()
        labels.unpersist()
        n
      }
      labels = next
      s1 = m.snapshot(); row(m, s"round-$r", tR, s1 - s0); s0 = s1
    }
    val (nComm, tSz) = timed(labels
      .join(broadcast(labels.groupBy(col("label"))
        .agg(count(lit(1)).as("csize"))), "label").count())
    s1 = m.snapshot(); row(m, "sizes", tSz, s1 - s0)
    println(s"[scale-r8] lpa mult=$mult edges=$nEdges nodes=$nNodes rows=$nComm")
    edges.unpersist(); half.unpersist(); labels.unpersist()
    spark.sparkContext.removeSparkListener(m)
  }

  /** A/B: does sorting the static edge frame by the PROBE key cut the
    * vote rounds' per-edge CPU at large |V|? The diagnosis run showed
    * rounds with zero exchange/spill and ≤3% GC still paying ×1.55
    * per-edge CPU on the 16×→64× step — the signature of random DRAM
    * probes into a broadcast label map that outgrew cache (320k →
    * 1.28M entries). `sortWithinPartitions(b)` on the cached frame
    * makes each round's probes walk the map in near-sorted key order
    * (one extra sort paid ONCE at materialize; `HashPartitioning(a)`
    * survives the sort, so both vote aggregations stay
    * partition-local). */
  private def lpaProbeOrderAb(spark: SparkSession, d: String, mult: Int): Unit = {
    val half = amplifiedHalf(spark, d, mult).cache()
    half.count()
    for (sorted <- Seq(false, true)) {
      val sym = half.select(col("pa").as("a"), col("pb").as("b"))
        .union(half.select(col("pb").as("a"), col("pa").as("b")))
        .repartition(col("a"))
      val edges = (if (sorted) sym.sortWithinPartitions("b") else sym).persist()
      val (_, tMat) = timed(edges.count())
      var labels = edges.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint()
      val walls = (1 to Extended.LpaRounds).map { _ =>
        val (next, tR) = timed {
          val n = Extended.lpaRound(edges, labels).localCheckpoint()
          labels.unpersist()
          n
        }
        labels = next
        tR
      }
      val chk = labels.agg(sum(col("label"))).collect()(0).getLong(0)
      println(f"[scale-r8] lpa-ab mult=$mult%2d sorted=$sorted%-5s " +
        f"mat=$tMat%6.2f rounds=${walls.map(w => f"$w%.2f").mkString(",")} " +
        f"sum=${walls.sum}%6.2f chk=$chk")
      edges.unpersist(); labels.unpersist()
    }
    half.unpersist()
  }

  /** ER with each phase bracketed: FastSS candidate generation,
    * attribute+levenshtein verify, connected components, canonical
    * assembly — the stages of [[Extended.entityResolutionOf]]. */
  private[tools] def erDiagnose(spark: SparkSession, d: String, mult: Int): Unit = {
    println(s"\n[scale-r8] er mult=$mult (dir=$d)")
    val m = new StageMetrics(spark)
    header()
    var s0 = m.snapshot()
    val records = (0 until mult).map { i =>
      Tables.customer(spark, d).select(
        (col("c_custkey") + lit(i.toLong * 100000000L)).as("id"),
        concat(col("c_name"), lit(s" v$i$i")).as("name"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
    }.reduce(_ unionByName _).cache()
    val (nRec, tRec) = timed(records.count())
    var s1 = m.snapshot(); row(m, "records", tRec, s1 - s0); s0 = s1

    val cand = Extended.fuzzyCandidatesOf(records.select("id", "name")).cache()
    val (nCand, tCand) = timed(cand.count())
    s1 = m.snapshot(); row(m, "candidates", tCand, s1 - s0); s0 = s1

    val pairs = cand
      .join(records.select(col("id").as("id_a"), col("name").as("name_a"),
        col("nk").as("nk_a"), col("seg").as("seg_a")), "id_a")
      .join(records.select(col("id").as("id_b"), col("name").as("name_b"),
        col("nk").as("nk_b"), col("seg").as("seg_b")), "id_b")
      .filter(col("nk_a") === col("nk_b") && col("seg_a") === col("seg_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")).cache()
    val (nPairs, tVer) = timed(pairs.count())
    s1 = m.snapshot(); row(m, "verify", tVer, s1 - s0); s0 = s1

    val labels = graft.dedup.Dedup.clusterLabels(
      records.select(col("id").as("doc_id")), pairs).cache()
    val (_, tCc) = timed(labels.count())
    s1 = m.snapshot(); row(m, "components", tCc, s1 - s0); s0 = s1

    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    val (nOut, tAsm) = timed(labels
      .join(sizes, "cluster_id")
      .join(records.select(col("id").as("cluster_id"),
        col("name").as("canonical_name")), "cluster_id")
      .count())
    s1 = m.snapshot(); row(m, "assemble", tAsm, s1 - s0)
    println(s"[scale-r8] er mult=$mult records=$nRec cand=$nCand " +
      s"pairs=$nPairs rows=$nOut")
    records.unpersist(); cand.unpersist(); pairs.unpersist(); labels.unpersist()
    spark.sparkContext.removeSparkListener(m)
  }
}
