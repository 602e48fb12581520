package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic commit protocol for the persisted index families (gram digest
  * log, LSH bands/sigs, PQ codes, BM25 postings) — the piece that turns
  * "a directory of parquet files a job happens to append to" into an
  * index a 100 TB deployment can serve WHILE ingest and compaction run.
  *
  * Layout under an index root:
  * {{{
  *   <root>/_manifests/m-000000001.txt   versioned pointer files
  *   <root>/seg/<table>/s-<uuid>/        immutable parquet segments
  * }}}
  *
  * A manifest is a tiny text file listing, per logical table, the exact
  * segment directories that make up that version of the index. The
  * protocol:
  *
  *  - WRITERS stage data as brand-new segment directories (never touching
  *    an existing one), then publish with [[commit]]: the manifest body is
  *    written to a hidden temp file and RENAMED to `m-<v+1>.txt` — one
  *    atomic filesystem op is the entire visibility switch.
  *  - READERS resolve the highest committed manifest first ([[snapshot]])
  *    and read ONLY the segments it lists. Staged-but-uncommitted segments
  *    are invisible, so a probe racing an append/compact/refresh sees
  *    either the old index or the new one — never a torn mix. A resolved
  *    [[Snapshot]] stays valid for the life of the query even if newer
  *    versions land, because segments are immutable and [[vacuum]] is the
  *    only thing that deletes them.
  *  - Maintenance (compact/refresh) is an atomic POINTER SWAP: stage the
  *    rewritten segment, commit a manifest that lists only it. No reader
  *    ever observes a half-rewritten table, and the swap is no longer the
  *    caller's problem.
  *  - Concurrent WRITERS are serialized optimistically: a lifecycle reads
  *    a snapshot, derives its delta from it, and commits with
  *    `expect = Some(snapshot.version)`; if another writer landed first
  *    the commit fails with [[java.util.ConcurrentModificationException]]
  *    instead of silently publishing a delta computed against a stale
  *    base (the lost-update guard). Blind commits (fresh builds) retry
  *    onto the next free version, so two racing builds land as two
  *    versions — later one wins, neither is torn.
  *
  * Rename-as-commit relies on the filesystem's atomic rename (HDFS, POSIX
  * local; on object stores front this root with a rename-capable layer).
  * The manifest itself is O(segments) bytes — compaction keeps that
  * bounded, and a 100 TB index's pointer file is still a few KB read once
  * per query, not a scaling surface.
  */
object IndexManifest {

  private val ManifestDir = "_manifests"
  private val Magic = "graft-index-manifest"

  /** An immutable resolved view of the index: `tables` maps logical table
    * name → root-relative segment directories, in commit order. */
  final case class Snapshot(version: Long, tables: Map[String, Seq[String]])

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fresh root-relative segment path for `table` — globally unique, so
    * staged segments can never collide with committed ones. */
  def newSegment(table: String): String =
    s"seg/$table/s-${java.util.UUID.randomUUID().toString}"

  private def manifestPath(root: String, version: Long): Path =
    new Path(new Path(root, ManifestDir), f"m-$version%09d.txt")

  private def listVersions(fs: FileSystem, root: String): Seq[Long] = {
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) Seq.empty
    else
      fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("m-") && n.endsWith(".txt"))
        .flatMap(n => scala.util.Try(n.stripPrefix("m-").stripSuffix(".txt").toLong).toOption)
  }

  /** Highest committed version, 0 when the root has no manifest yet. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val vs = listVersions(fsFor(spark, root), root)
    if (vs.isEmpty) 0L else vs.max
  }

  def exists(spark: SparkSession, root: String): Boolean =
    currentVersion(spark, root) > 0L

  /** Modification time of the current manifest file — the "when was this
    * index last published" signal build-if-stale serving uses. */
  def lastModified(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val vs = listVersions(fs, root)
    if (vs.isEmpty) None
    else Some(fs.getFileStatus(manifestPath(root, vs.max)).getModificationTime)
  }

  /** Resolve the current committed snapshot. Fails loudly on an
    * uninitialized root — there is no meaningful empty index to serve. */
  def snapshot(spark: SparkSession, root: String): Snapshot = {
    val v = currentVersion(spark, root)
    require(v > 0L, s"no committed index manifest under $root")
    snapshotAt(spark, root, v)
  }

  /** Resolve a specific committed version (time travel for pinned
    * readers / the concurrency specs). */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Snapshot = {
    val fs = fsFor(spark, root)
    val p = manifestPath(root, version)
    val in = fs.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    require(body.nonEmpty && body.head.startsWith(Magic),
      s"$p is not a graft index manifest")
    val entries = body.tail.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"malformed manifest line in $p: $line")
      (line.substring(0, i), line.substring(i + 1))
    }
    Snapshot(version,
      entries.groupBy(_._1).map { case (t, es) => (t, es.map(_._2)) })
  }

  /** Read one logical table at a resolved snapshot — the reader half of
    * the isolation contract (only listed segments are scanned). */
  def readAt(spark: SparkSession, root: String, snap: Snapshot, table: String): DataFrame = {
    val segs = snap.tables.getOrElse(table,
      throw new IllegalStateException(
        s"index at $root v${snap.version} has no table '$table' " +
          s"(tables: ${snap.tables.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.parquet(segs.map(s => s"$root/$s"): _*)
  }

  /** Read one logical table at the current version. */
  def read(spark: SparkSession, root: String, table: String): DataFrame =
    readAt(spark, root, snapshot(spark, root), table)

  private def lockPath(root: String, version: Long): Path =
    new Path(new Path(root, ManifestDir), f"m-$version%09d.txt.lock")

  /** Atomically claim a lock file — created EXCLUSIVELY or not at all.
    * Hadoop's local `create(path, overwrite = false)` is check-then-
    * create (no O_EXCL), so two in-process racers can both pass the
    * exists check; on local filesystems the claim goes through NIO's
    * `Files.createFile`, which maps to O_CREAT|O_EXCL. HDFS `create`
    * is namespace-atomic already. */
  private def claimLock(fs: FileSystem, p: Path): Boolean =
    if (fs.getScheme == "file")
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath)); true
      } catch { case _: java.io.IOException => false }
    else
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }

  /** Publish a new version whose live segment set is exactly `tables`.
    * With `expect = Some(v)` the commit only succeeds if v is still the
    * current version (optimistic concurrency for read-modify-write
    * lifecycles); `None` retries onto the next free version (fresh
    * builds). Returns the committed version.
    *
    * Version claim is an EXCLUSIVE create of a `.lock` file
    * (`fs.create(overwrite = false)` — atomic on HDFS and POSIX alike),
    * not a bare rename: Hadoop's local-filesystem rename delegates to
    * POSIX rename(2), which silently REPLACES an existing destination,
    * so check-then-rename would let two racing committers both "win"
    * one version and lose a manifest. Only the lock winner writes
    * `m-<v>.txt` (staged to a temp file, renamed into place so readers
    * never see a partial body); losers re-resolve and either retry the
    * next version or fail the expect guard. A writer that crashes
    * after claiming leaves an orphan lock — later commits skip past it
    * (version gaps are fine everywhere: readers and history iterate
    * `listVersions`), and [[vacuum]] reclaims it. */
  def commit(
      spark: SparkSession, root: String,
      tables: Map[String, Seq[String]],
      expect: Option[Long] = None): Long = {
    val fs = fsFor(spark, root)
    val mdir = new Path(root, ManifestDir)
    fs.mkdirs(mdir)
    val body = new StringBuilder(s"$Magic\t1\n")
    for ((t, segs) <- tables.toSeq.sortBy(_._1); s <- segs)
      body.append(t).append('\t').append(s).append('\n')
    val bytes = body.toString.getBytes(StandardCharsets.UTF_8)
    var attempt = 0
    var candidate = 0L
    while (attempt < 64) {
      val cur = currentVersion(spark, root)
      expect.foreach { e =>
        if (cur != e) throw new java.util.ConcurrentModificationException(
          s"index at $root is at v$cur, not the expected v$e: a concurrent " +
            "writer committed first; recompute against the current snapshot")
      }
      candidate = math.max(cur + 1, candidate + 1)
      val claimed = claimLock(fs, lockPath(root, candidate))
      // an expect-guarded writer may NOT skip past a contended version:
      // the lock holder is publishing v(cur+1) derived from the same
      // snapshot, and landing our delta at cur+2 would silently drop
      // theirs — the exact lost update the guard exists to prevent. (A
      // crashed claimant's orphan lock also lands here: conservative —
      // vacuum reclaims stale locks and unblocks the lifecycle.)
      if (!claimed && expect.isDefined)
        throw new java.util.ConcurrentModificationException(
          s"index at $root has a concurrent commit in flight for " +
            s"v$candidate; recompute against the snapshot it publishes " +
            "(or vacuum if this is a crashed writer's stale lock)")
      if (claimed) {
        val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        val dst = manifestPath(root, candidate)
        // we own this version (lock held), so the rename cannot race
        // another writer; overwrite-on-rename is harmless here
        if (!fs.rename(tmp, dst)) {
          fs.delete(tmp, false)
          fs.delete(lockPath(root, candidate), false)
          throw new IllegalStateException(s"rename to $dst failed")
        }
        // the lock stays behind as the version's claim TOMBSTONE: a
        // racer that resolved currentVersion before our rename landed
        // could otherwise re-claim this version the instant we freed
        // the lock and collide on the manifest file. No future writer
        // can ever target a version <= current, so vacuum reclaims
        // tombstones at or below the current version safely.
        return candidate
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"could not commit a manifest under $root after $attempt attempts")
  }

  /** Garbage-collect manifests and segment directories that no RETAINED
    * version references. `keepFrom` is the oldest version to retain
    * (default: current only); a deployment that has published releases
    * pinned to version v passes `keepFrom = v`, and every retained
    * version stays fully re-resolvable ([[snapshotAt]]) after the
    * vacuum — the time-travel contract. Runs only after in-flight
    * UNpinned readers drain — a snapshot resolved before vacuum against
    * a version below `keepFrom` may list deleted segments.
    *
    * Two classes of garbage, treated differently so vacuum is safe to
    * run WHILE writers are staging:
    *  - SUPERSEDED segments (referenced by some still-existing manifest
    *    but by no retained one) are dead by construction — deleted
    *    immediately;
    *  - NEVER-REFERENCED paths (staged segment dirs, hidden `.tmp-`
    *    manifest bodies, claim locks above the current version) are
    *    indistinguishable from a LIVE writer's in-flight work, so they
    *    are deleted only when older than `orphanGraceMs` (default 20
    *    minutes — far longer than any stage-to-commit window; pass 0
    *    for the old collect-everything behavior when no writer can be
    *    live, e.g. single-process tests). Claim locks at or below the
    *    current version protect nothing and go immediately.
    *
    * Returns the number of paths removed. */
  def vacuum(
      spark: SparkSession, root: String, keepFrom: Long = -1L,
      orphanGraceMs: Long = 20L * 60L * 1000L): Int = {
    val fs = fsFor(spark, root)
    val cur = snapshot(spark, root).version
    val oldest = if (keepFrom < 0) cur else math.min(keepFrom, cur)
    // resolve only versions whose manifest still exists — a keepFrom
    // below an earlier vacuum's boundary must not chase deleted files
    val versions = listVersions(fs, root)
    val retained = versions.filter(_ >= oldest)
      .flatMap(v => snapshotAt(spark, root, v).tables.values.flatten).toSet
    // everything ANY existing manifest references — used to tell a
    // superseded segment (dead) from a staged one (possibly in flight)
    val everCommitted = versions
      .flatMap(v => snapshotAt(spark, root, v).tables.values.flatten).toSet
    val cutoff = java.lang.System.currentTimeMillis() - orphanGraceMs
    var removed = 0
    val segRoot = new Path(root, "seg")
    if (fs.exists(segRoot)) {
      for (tdir <- fs.listStatus(segRoot); seg <- fs.listStatus(tdir.getPath)) {
        val rel = s"seg/${tdir.getPath.getName}/${seg.getPath.getName}"
        if (!retained.contains(rel)) {
          val dead = everCommitted.contains(rel) ||
            seg.getModificationTime < cutoff
          if (dead) { fs.delete(seg.getPath, true); removed += 1 }
        }
      }
    }
    for (v <- versions; if v < oldest) {
      fs.delete(manifestPath(root, v), false); removed += 1
    }
    val mdir = new Path(root, ManifestDir)
    if (fs.exists(mdir)) {
      for (f <- fs.listStatus(mdir)) {
        val name = f.getPath.getName
        val staleTmp = name.startsWith(".tmp-") && f.getModificationTime < cutoff
        val lockV =
          if (name.startsWith("m-") && name.endsWith(".txt.lock"))
            scala.util.Try(
              name.stripPrefix("m-").stripSuffix(".txt.lock").toLong).toOption
          else None
        val staleLock = lockV.exists(v =>
          v <= cur || f.getModificationTime < cutoff)
        if (staleTmp || staleLock) { fs.delete(f.getPath, false); removed += 1 }
      }
    }
    removed
  }

  /** Ops view of an index root: one row per (version, table, segment)
    * across every still-resolvable version, with the segment's file
    * count and bytes — what a maintenance dashboard reads to decide
    * compaction/vacuum cadence. Driver-side metadata only (manifest +
    * file listings), no Spark jobs. */
  def describe(spark: SparkSession, root: String): DataFrame = {
    val fs = fsFor(spark, root)
    val rows = for {
      v <- listVersions(fs, root).sorted
      snap = snapshotAt(spark, root, v)
      (table, segs) <- snap.tables.toSeq.sortBy(_._1)
      seg <- segs
    } yield {
      val p = new Path(root, seg)
      val files =
        if (fs.exists(p)) fs.listStatus(p).filter(_.isFile).toSeq else Seq.empty
      (v, table, seg, files.size, files.map(_.getLen).sum)
    }
    import spark.implicits._
    rows.toDF("version", "table", "segment", "n_files", "bytes")
  }
}
