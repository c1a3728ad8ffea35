package graft

import org.apache.spark.sql.functions._
import graft.ingest.SnapshotStore

/** Manifest-pointer snapshots: version bookkeeping, the changelog
  * compactor re-expressed over it, and — the reason the store exists —
  * a reader RACING a publisher never observes a torn or absent table
  * (VERDICT r8 #4: "a reader racing the swap sees exactly the old or
  * the new snapshot, never a mix"). */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("publish/read round-trip; versions advance; vacuum is separate and keeps the horizon") {
    val dir = tmpDir("snapstore")
    assert(SnapshotStore.current(spark, dir).isEmpty)
    assert(SnapshotStore.publish(spark, dir,
      Seq((1L, "a")).toDF("id", "s")) === 0L)
    assert(SnapshotStore.publish(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")) === 1L)
    assert(SnapshotStore.publish(spark, dir,
      Seq((3L, "c")).toDF("id", "s")) === 2L)
    assert(SnapshotStore.current(spark, dir).map(_._1) === Some(2L))
    assert(SnapshotStore.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq((3L, "c")))
    def snaps() = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("snap-")).sorted.toSeq
    // publish never deletes (readers hold no lock) ...
    assert(snaps() === Seq("snap-00000000", "snap-00000001", "snap-00000002"))
    // ... reclamation is the deliberate vacuum, keepLast-bounded
    SnapshotStore.vacuum(spark, dir, keepLast = 2)
    assert(snaps() === Seq("snap-00000001", "snap-00000002"))
    assert(SnapshotStore.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq((3L, "c")))
  }

  test("compactChanges over the store: fold, truncate, no-op replay and no-op on empty") {
    val dir = tmpDir("snapcompact")
    val changes = tmpDir("snapchanges") + "/log"
    SnapshotStore.publish(spark, dir,
      Seq((1L, "s1", "keep"), (2L, "s1", "old"), (3L, "s2", "drop"))
        .toDF("doc_id", "source", "text"))
    val log = Seq(
      (2L, 1L, "upsert", "s1", "new"),
      (3L, 1L, "delete", null, null),
      (7L, 1L, "upsert", "s3", "insert"))
      .toDF("doc_id", "seq", "op", "source", "text")
    log.write.parquet(changes)
    val v = SnapshotStore.compactChanges(spark, dir, changes)
    def state() = SnapshotStore.read(spark, dir)
      .as[(String, String, Long)]
      .collect().toSeq.map(t => t).sortBy(_._3)
    val merged = SnapshotStore.read(spark, dir)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(merged === Seq((1L, "s1", "keep"), (2L, "s1", "new"), (7L, "s3", "insert")))
    assert(!new java.io.File(changes).exists(),
      "changelog must be truncated once folded")
    // crash window A: changelog survived the publish — replay must no-op
    log.write.parquet(changes)
    val v2 = SnapshotStore.compactChanges(spark, dir, changes)
    assert(v2 === v + 1)
    assert(SnapshotStore.read(spark, dir)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1) === merged)
    // crash window B: changelog already deleted — rerun is a version-
    // preserving no-op
    assert(SnapshotStore.compactChanges(spark, dir, changes) === v2)
  }

  test("time travel: readVersion pins past snapshots; vacuum retires them loudly") {
    val dir = tmpDir("snaptravel")
    SnapshotStore.publish(spark, dir, Seq((1L, "v0")).toDF("id", "s"))
    SnapshotStore.publish(spark, dir, Seq((1L, "v1"), (2L, "v1")).toDF("id", "s"))
    SnapshotStore.publish(spark, dir, Seq((3L, "v2")).toDF("id", "s"))
    assert(SnapshotStore.versions(spark, dir) === Seq(0L, 1L, 2L))
    assert(SnapshotStore.readVersion(spark, dir, 0L)
      .as[(Long, String)].collect().toSeq === Seq((1L, "v0")))
    assert(SnapshotStore.readVersion(spark, dir, 1L).count() === 2L)
    // diffing two releases composes on two pinned reads
    val diff = SnapshotStore.readVersion(spark, dir, 2L)
      .exceptAll(SnapshotStore.readVersion(spark, dir, 1L)).count()
    assert(diff === 1L)
    SnapshotStore.vacuum(spark, dir, keepLast = 1)
    assert(SnapshotStore.versions(spark, dir) === Seq(2L))
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readVersion(spark, dir, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("a reader racing publishes sees exactly one complete version, never a mix") {
    val dir = tmpDir("snaprace")
    // each version v: exactly 64 rows, every row carrying v — a torn
    // read (mixed versions, partial directory, missing manifest target)
    // breaks one of the invariants below
    def frame(v: Long) = spark.range(64)
      .select(col("id"), lit(v).as("version"))
    SnapshotStore.publish(spark, dir, frame(0))
    val versions = 12
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val rows = SnapshotStore.read(spark, dir)
            .groupBy("version").agg(count(lit(1)).as("n"))
            .collect()
          if (rows.length != 1)
            failures.add(s"mixed versions in one read: ${rows.mkString(",")}")
          else {
            if (rows(0).getLong(1) != 64L)
              failures.add(s"partial snapshot: ${rows(0)}")
            seen.add(rows(0).getLong(0))
          }
        } catch {
          case e: Throwable => failures.add(s"read failed mid-publish: $e")
        }
      }
    })
    reader.start()
    try (1 to versions).foreach(v => SnapshotStore.publish(spark, dir, frame(v)))
    finally { stop.set(true); reader.join(30000) }
    assert(failures.isEmpty, s"racing reader observed: ${failures.toArray.mkString("; ")}")
    val vs = seen.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
    assert(vs.nonEmpty, "the reader must have completed reads during the publishes")
    // reads are monotone non-decreasing in version: the pointer never
    // goes backwards under concurrency
    assert(vs === vs.sorted, s"versions went backwards: $vs")
  }

  test("hardening (ADVICE r9): vacuum guards keepLast; foreign files are invisible; " +
    "compactChanges on a never-published table fails loudly") {
    val dir = tmpDir("snaphard")
    SnapshotStore.publish(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    // keepLast <= 0 would delete the CURRENT version — refused up front
    val g = intercept[IllegalArgumentException] {
      SnapshotStore.vacuum(spark, dir, keepLast = 0)
    }
    assert(g.getMessage.contains("keepLast"))
    assert(SnapshotStore.read(spark, dir).count() === 1L)
    // a foreign file sharing the manifest prefix must not crash reads
    // (previously: NumberFormatException from toLong on "backup")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "manifest-backup"), "junk")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "snap-old.bak"), "junk")
    assert(SnapshotStore.current(spark, dir).map(_._1) === Some(0L))
    assert(SnapshotStore.read(spark, dir).count() === 1L)
    SnapshotStore.vacuum(spark, dir, keepLast = 1) // must skip the foreign names too
    assert(new java.io.File(dir, "manifest-backup").exists())
    // compactChanges with no published snapshot and an empty changelog:
    // read()'s FileNotFoundException contract, not a bare NoSuchElement
    val e = intercept[java.io.FileNotFoundException] {
      SnapshotStore.compactChanges(spark, tmpDir("snapempty"), tmpDir("chempty"))
    }
    assert(e.getMessage.contains("no published snapshot"))
  }
}
