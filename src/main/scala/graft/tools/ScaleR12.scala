package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AssignIds, GroupRank, Materialize}

/** Round-11 scale measurement: the keyed (value-bucketed, pin-free)
  * GroupRank vs the generic (range-sampled, pinned) form, across
  * corpus octaves — the evidence for retiring the durable pin.
  *
  * Three numbers per octave over the amplified documents frame
  * (groups = sources, order = (n_chars, doc_id)):
  *
  *  1. `pinned_s` — the r10 generic path as it runs on LOCAL master
  *     (its pin is a localCheckpoint: an in-memory corpus copy);
  *  2. `keyed_s` — the keyed path (quantile sketch + frozen-boundary
  *     binary-search bucket, no pin of any kind);
  *  3. `pin_write_s` / `pin_gb` — what the generic path's pin costs
  *     OFF-local, measured directly: the range-shuffled frame written
  *     once through [[Materialize]]'s durable branch (temp parquet
  *     under the warehouse root) — the per-invocation write
  *     amplification ADVICE r10 flagged and r11 removes.
  *
  * Equality of the two rank outputs is asserted per octave (count of
  * disagreeing (doc_id, rank) pairs must be 0) so the speed table
  * can't drift from a correctness regression.
  *
  * `sbt "runMain graft.tools.ScaleR12"`, mults via SCALE_R12_MULTS
  * (default 4,16,64,256). Results land in SCALE.md §round-11.
  */
object ScaleR12 {

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mults = sys.env.get("SCALE_R12_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(4, 16, 64, 256, 1024))
    val baseRows = Tables.documents(spark, d).count()
    // JIT/codegen warmup outside the measured octaves
    GroupRank.withGroupRankBy(amplified(spark, d, 1), Seq("source"),
      col("n_chars"), primaryDesc = false, col("doc_id"), "rk",
      groupBound = 64)
      .agg(sum(col("rk"))).collect()
    GroupRank.withGroupRank(amplified(spark, d, 1), Seq("source"),
      Seq(col("n_chars"), col("doc_id")), "rk")
      .agg(sum(col("rk"))).collect()
    val baseBytes = Tables.documents(spark, d)
      .agg(sum(col("n_chars"))).collect()(0).getLong(0) + baseRows * 24L
    for (mult <- mults) {
      // bytes policy over the full frame (text + 24 B of keys per
      // row), floor at the core count like GraftSession
      val parts = graft.GraftSession.shufflePartitionsForBytes(
        mult * baseBytes)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val docs = amplified(spark, d, mult)
      docs.persist()  // both paths read the same input; charge neither
      val n = docs.count()

      val (pinned, tPinned) = timed(GroupRank.withGroupRank(
        docs, Seq("source"), Seq(col("n_chars"), col("doc_id")), "rk"))
      val (_, tPinnedRun) = timed(pinned.agg(sum(col("rk"))).collect())

      val (keyed, tKeyed) = timed(GroupRank.withGroupRankBy(
        docs, Seq("source"), col("n_chars"), primaryDesc = false,
        col("doc_id"), "rk", groupBound = 64))
      val (_, tKeyedRun) = timed(keyed.agg(sum(col("rk"))).collect())

      val mismatches = keyed.select(col("doc_id"), col("rk"))
        .join(pinned.select(col("doc_id"), col("rk").as("rk2")), "doc_id")
        .filter(col("rk") =!= col("rk2")).count()

      // the off-local pin, measured: one durable write of the
      // range-shuffled corpus (what EVERY generic invocation pays on a
      // cluster, and the keyed path never does)
      val ranged = docs.repartitionByRange(parts,
        col("source"), col("n_chars"), col("doc_id"))
      val (mat, tWrite) = timed(
        Materialize.materialize(ranged, durable = true))
      val bytes = mat.inputFiles.map(f =>
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
          .getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum

      println(f"[scale-r12] mult=$mult%4d rows=$n%9d parts=$parts%4d " +
        f"pinned_s=${tPinned + tPinnedRun}%7.2f " +
        f"keyed_s=${tKeyed + tKeyedRun}%7.2f " +
        f"pin_write_s=$tWrite%6.2f pin_gb=${bytes / 1e9}%6.3f " +
        f"mismatches=$mismatches")
      require(mismatches == 0L, "keyed and pinned ranks must agree")
      docs.unpersist()
    }
    spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Disjoint id-shifted copies through one scan (the ScaleR11 shape);
    * repartitioned so the single-file base doesn't serialize the
    * narrow stages. */
  private def amplified(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // the shift must clear the base id range or copies collide and the
    // keyed-vs-pinned doc_id join silently explodes (ADVICE r11)
    val maxId = Tables.documents(spark, d)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    Amplify.assertClears(maxId, "doc_id")
    // text rides along: a curation pass ranks full document frames,
    // and the payload is exactly what the pinned path's durable write
    // re-materializes (and the keyed path never touches)
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * lit(Amplify.IdShift)).as("doc_id"),
        col("source"), col("n_chars"), col("text"))
      .repartition(parts)
  }

}
