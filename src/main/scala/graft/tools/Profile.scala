package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: times labeled sub-pipelines of the hot bench
  * queries inside one JVM (3 repeats, min) so host-contention noise
  * doesn't masquerade as a regression. Not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.tools.Profile /root/testdata/sf0.1"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile").master("local[32]")
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
    time("lsh_pairs") {
      graft.dedup.Dedup.minhashLshOf(docs).select("doc_a", "doc_b").count()
    }
    time("lsh_pairs_row_kernel") {
      graft.dedup.Dedup.minhashLshRowOf(docs).select("doc_a", "doc_b").count()
    }
    time("cluster_labels_only") {
      val pairs = graft.dedup.Dedup.minhashLshOf(docs)
        .select("doc_a", "doc_b").localCheckpoint()
      graft.dedup.Dedup.clusterLabels(docs.select("doc_id"), pairs).count()
    }
    time("dedup_clusters_full") {
      graft.dedup.Dedup.dedupClusters(spark, d).count()
    }
    time("dedup_corpus_full") {
      graft.dedup.Dedup.dedupCorpus(docs).count()
    }

    import org.apache.spark.sql.functions.col
    graft.functions.VectorFunctions.register(spark)
    val vecs = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    time("pq_train_only") {
      graft.similarity.ProductQuantizer.train(spark, vecs, 8, 8, 16, 2).count()
    }
    time("ann_pq_full") {
      graft.similarity.Similarity.annPq(spark, d).count()
    }
    time("ivf_train_only") {
      graft.similarity.Similarity.trainCentroids(spark, vecs, 16, 2).count()
    }
    time("ann_ivf_full") {
      graft.similarity.Similarity.annIvf(spark, d).count()
    }

    // A/B: the zero-shuffle sorted-array fold behind text_gopher vs the
    // textbook explode + two-GROUP-BY formulation of the same counts.
    // A bare count() would prune the expensive columns away, so force
    // them through an aggregate.
    import org.apache.spark.sql.functions.{sum => fsum, col => fcol}
    time("gopher_native") {
      graft.text.TextAnalysis.gopherGatesOf(docs)
        .agg(fsum(fcol("dup_tri_frac")), fsum(fcol("top_bigram_frac")))
        .collect(); 1L
    }
    time("gopher_hof_fold") {
      graft.text.TextAnalysis.gopherGatesHofOf(docs)
        .agg(fsum(fcol("dup_tri_frac")), fsum(fcol("top_bigram_frac")))
        .collect(); 1L
    }
    time("gopher_groupby") {
      import org.apache.spark.sql.functions._
      val toks = docs.select(fcol("doc_id"), split(fcol("text"), " ").as("toks"))
      val tri = toks.filter(size(fcol("toks")) >= 3)
        .select(fcol("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(fsum(fcol("c")).as("n_tri"),
          fsum(when(fcol("c") > 1, fcol("c")).otherwise(lit(0L))).as("dup_tri"))
      val bi = toks.filter(size(fcol("toks")) >= 2)
        .select(fcol("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2)))")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(fcol("c")).as("top_bi"))
      tri.join(bi, "doc_id")
        .agg(fsum(fcol("dup_tri").cast("double") / fcol("n_tri")),
          fsum(fcol("top_bi")))
        .collect(); 1L
    }
    spark.stop()
  }
}
