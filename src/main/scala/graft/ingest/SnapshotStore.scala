package graft.ingest

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer snapshot store — the concurrent-reader-safe form
  * of the write-aside-then-swap recipe ([[EventSink]]'s month rewrite,
  * [[graft.dedup.Dedup.compactChanges]]).
  *
  * The directory-swap recipe is crash-safe but has a LIST race: a
  * reader that enumerates the table directory in the window between
  * `rename(base, aside)` and `rename(tmp, base)` sees no directory at
  * all, and one that lists while an object-store "rename" copies sees
  * a partial one. This store removes the race by never moving — and
  * never OVERWRITING — anything: every publish writes a NEW immutable
  * snapshot directory (`snap-<v>`) and then makes it visible by
  * renaming a NEW `manifest-<v>` file into place; readers resolve the
  * highest manifest, then read the immutable directory it names — so
  * any read observes exactly one complete published version, never a
  * mix, no matter how it interleaves with a publish
  * (SnapshotStoreSpec races them).
  *
  * Filesystem contract, explicitly: atomicity rests only on
  * SINGLE-FILE rename TO A FRESH NAME, which POSIX and HDFS
  * guarantee — a far weaker ask than the directory-rename atomicity
  * the swap recipe needs, and deliberately weaker than
  * rename-with-OVERWRITE too: the first cut of this store used an
  * overwritten single MANIFEST and the racing-reader spec caught
  * readers seeing no manifest at all — the generic Hadoop
  * `rename(…, OVERWRITE)` is delete-then-rename on the local
  * filesystem, a two-step with a missing-destination window. On an
  * object store, versioned manifests need only atomic single-object
  * PUT + listing (which stores provide); the layout is unchanged.
  *
  * Retention: [[publish]] NEVER deletes — old snapshots stay readable
  * for in-flight scans — and reclamation is the separate, deliberate
  * [[vacuum]] (the Delta VACUUM separation, for the same reason: only
  * the operator knows the longest-reader horizon). At 100 TB this is
  * the familiar table-format story (a manifest pointer over immutable
  * files — the mechanism Iceberg/Delta scale to petabytes); this
  * implementation is the minimal single-pointer form of it, sized for
  * one table per directory.
  */
object SnapshotStore {

  private val ManifestPrefix = "manifest-"

  private def fc(spark: SparkSession, p: Path): FileContext =
    FileContext.getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `name` minus `pfx` as a version number, or None for any foreign
    * file that merely shares the prefix (`manifest-backup`, editor
    * droppings) — a non-numeric suffix must be invisible to the store,
    * not crash every read with NumberFormatException (ADVICE r9). */
  private def versionOf(name: String, pfx: String): Option[Long] = {
    val sfx = name.stripPrefix(pfx)
    if (name.startsWith(pfx) && sfx.nonEmpty && sfx.forall(_.isDigit))
      Some(sfx.toLong)
    else None
  }

  /** Live manifest versions, ascending (empty if none published). */
  private def manifestVersions(spark: SparkSession, dir: Path): Seq[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .flatMap(versionOf(_, ManifestPrefix)).sorted.toSeq
  }

  /** Current (version, snapshot path): the HIGHEST versioned manifest
    * file. Versioned manifests instead of one overwritten pointer —
    * the first cut swapped a single MANIFEST with
    * `FileContext.rename(…, OVERWRITE)` and the racing-reader spec
    * caught readers seeing NO manifest at all: on the local
    * filesystem (and any AbstractFileSystem that inherits the generic
    * implementation) rename-with-overwrite is delete-then-rename, a
    * two-step with a missing-destination window. Creating a FRESH
    * `manifest-<v>` per publish needs only plain rename-to-new-name —
    * atomic on POSIX and HDFS — and a reader's list always observes a
    * prefix of completed publishes (the Iceberg versioned-metadata
    * pattern). */
  def current(spark: SparkSession, tableDir: String): Option[(Long, Path)] = {
    val dir = new Path(tableDir)
    manifestVersions(spark, dir).lastOption.map { v =>
      (v, new Path(dir, f"snap-$v%08d"))
    }
  }

  /** Publish `df` as the next version: write the immutable snapshot
    * directory, then make it visible with ONE atomic
    * rename-to-fresh-name of its manifest file. Returns the new
    * version. Single-writer by contract (a compaction schedule), like
    * every swap recipe here. */
  def publish(spark: SparkSession, tableDir: String, df: DataFrame): Long = {
    val dir = new Path(tableDir)
    val ctx = fc(spark, dir)
    val v = current(spark, tableDir).map(_._1 + 1).getOrElse(0L)
    val name = f"snap-$v%08d"
    df.write.mode("overwrite").parquet(new Path(dir, name).toString)
    // fresh-name pointer: write aside, rename into place (no overwrite
    // anywhere — see [[current]] for why that distinction is load-bearing)
    val tmp = new Path(dir, s".$ManifestPrefix$v.tmp")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(name.getBytes("UTF-8")) finally out.close()
    ctx.rename(tmp, new Path(dir, f"$ManifestPrefix$v%08d"))
    v
  }

  /** Delete snapshots older than the `keepLast` most recent — a
    * SEPARATE, deliberate operation, never part of [[publish]]: a
    * reader holds no lock, so only the operator knows when no scan
    * older than the horizon can still be running (the first cut of
    * this store vacuumed inside publish and the racing-reader spec
    * caught a reader mid-scan of a deleted snapshot within
    * milliseconds — the exact failure Delta's VACUUM retention-period
    * warning exists for). Run it on the compaction schedule with
    * `keepLast` sized to the longest reader. */
  def vacuum(spark: SparkSession, tableDir: String, keepLast: Int = 2): Unit = {
    // keepLast <= 0 would make `n <= v - keepLast` include the CURRENT
    // version — deleting the live manifest and snapshot and leaving the
    // table unreadable until the next publish (ADVICE r9)
    require(keepLast >= 1, s"keepLast must keep at least the current version, got $keepLast")
    val dir = new Path(tableDir)
    val v = current(spark, tableDir).map(_._1).getOrElse(return)
    val f = fs(spark, dir)
    if (f.exists(dir)) f.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      val old = (pfx: String) =>
        versionOf(n, pfx).exists(_ <= v - keepLast)
      if (old(ManifestPrefix) || old("snap-")) f.delete(st.getPath, true)
    }
  }

  /** Read the current snapshot through the manifest. A publish racing
    * this call is harmless: whichever pointer value the open sees
    * names a COMPLETE immutable directory (retention keeps the
    * previous version alive for in-flight readers). */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val (_, snap) = current(spark, tableDir).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no published snapshot in $tableDir"))
    spark.read.parquet(snap.toString)
  }

  /** Time travel: read a SPECIFIC published version (must not have
    * been vacuumed). Snapshots are immutable, so this is exactly the
    * table-format `VERSION AS OF` read — diffing two corpus releases
    * ([[graft.dedup.Dedup.snapshotDiffOf]]) composes directly on two
    * of these. */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val dir = new Path(tableDir)
    val snap = new Path(dir, f"snap-$version%08d")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(snap),
      s"version $version of $tableDir does not exist (published and not vacuumed?)")
    spark.read.parquet(snap.toString)
  }

  /** All live (not yet vacuumed) versions, ascending. */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] =
    manifestVersions(spark, new Path(tableDir))

  /** [[graft.dedup.Dedup.compactChanges]] re-expressed over the
    * manifest store: fold the changelog into the current snapshot,
    * publish the merge as a new version (one atomic pointer swap — a
    * racing reader sees old or new, never nothing), then truncate the
    * changelog. Crash-safety is strictly better than the swap recipe:
    * a crash before the pointer rename leaves the old version current
    * (the half-written snapshot dir is unreferenced garbage, replaced
    * by the retry's same-version rewrite); a crash after it re-applies
    * the changelog to the already-merged base on the next run — a
    * no-op by the upsert/delete idempotence the DedupSpec replay pins. */
  def compactChanges(spark: SparkSession, tableDir: String,
      changesPath: String): Long = {
    val fs = new Path(changesPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasChanges = fs.exists(new Path(changesPath)) &&
      fs.listStatus(new Path(changesPath)).exists { f =>
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
    if (!hasChanges)
      // nothing to fold: no-op — but match read()'s error contract on a
      // never-published table instead of a bare NoSuchElementException
      // (ADVICE r9)
      return current(spark, tableDir).map(_._1).getOrElse(
        throw new java.io.FileNotFoundException(
          s"no published snapshot in $tableDir"))
    // the merge plan reads the CURRENT snapshot's files; they survive
    // the publish untouched (snapshots are immutable, retention keeps
    // the previous version), so no checkpoint barrier is needed
    val merged = graft.dedup.Dedup
      .applyChangesOf(read(spark, tableDir), spark.read.parquet(changesPath))
    val v = publish(spark, tableDir, merged)
    fs.delete(new Path(changesPath), true)
    v
  }
}
