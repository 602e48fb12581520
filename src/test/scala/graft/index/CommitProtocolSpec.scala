package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** A test object store with ADVERSARIAL unconditional primitives — the
  * semantics the manifest protocol must survive on S3/GCS:
  *  - `putLww` is last-writer-wins: it silently replaces whatever is at
  *    the key (a bare object-store PUT);
  *  - `renameReplace` is copy+delete that silently replaces an existing
  *    destination (what "rename" degrades to on an object store, and
  *    what POSIX rename(2) does natively);
  *  - the ONLY safe operation is `putIfAbsent`, modeling the store's
  *    server-side conditional PUT (`If-None-Match: *` / generation-match
  *    0): one atomic request that creates the whole object or fails.
  *
  * Objects are materialized as real files under a local directory so
  * Spark/Hadoop readers resolve them exactly like production manifests.
  * The store-wide monitor stands in for the store's server-side
  * serialization of conditional requests; the atomic tmp+move inside it
  * models "an object is visible only once fully written".
  */
final class SimulatedObjectStore {
  private val monitor = new Object

  private def nioPath(p: Path) = Paths.get(p.toUri.getPath)

  /** Bare PUT: last writer wins, silently replacing. Unsafe by design. */
  def putLww(p: Path, body: Array[Byte]): Unit = {
    Files.createDirectories(nioPath(p).getParent)
    val tmp = Files.createTempFile(nioPath(p).getParent, ".lww", ".tmp")
    Files.write(tmp, body)
    Files.move(tmp, nioPath(p), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  def exists(p: Path): Boolean = Files.exists(nioPath(p))

  /** "Rename": copy+delete that replaces any existing destination. */
  def renameReplace(src: Path, dst: Path): Unit = {
    Files.createDirectories(nioPath(dst).getParent)
    Files.move(nioPath(src), nioPath(dst), StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Conditional PUT — the store's one atomic create-iff-absent. */
  def putIfAbsent(p: Path, body: Array[Byte]): Boolean = monitor.synchronized {
    if (Files.exists(nioPath(p))) false
    else { putLww(p, body); true }
  }

  def ops: CommitOps = new CommitOps.ConditionalPut(putIfAbsent)
}

/** The commit protocol on hostile storage: the [[CommitOps]] SPI must
  * make commits FAIL rather than tear or lose one, on every backend —
  * including an object store whose rename replaces and whose bare put
  * is last-writer-wins. Plus the round-13 liveness additions: lease
  * reclaim of crashed writers' claim locks, tombstone grace in vacuum,
  * and reader leases that make the vacuum drain contract checkable. */
class CommitProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new java.io.File(
      java.lang.System.getProperty("java.io.tmpdir"),
      s"graft_cproto_${tag}_${java.util.UUID.randomUUID().toString.take(8)}").toString

  private def rows(xs: (Long, String)*) = xs.toDF("id", "v")

  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ageFile(root: String, name: String, ageMs: Long): Unit = {
    val p = Paths.get(root, "_manifests", name)
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
      java.lang.System.currentTimeMillis() - ageMs))
    ()
  }

  // ---- the adversarial store is genuinely adversarial -----------------

  test("control: check-then-rename on the store loses a committed manifest") {
    // the naive protocol (what a POSIX-rename port would do): each
    // writer checks the destination is absent, then renames its body in.
    // Interleave the checks before either rename: both "succeed", one
    // manifest is silently gone. This is the disease; the protocol
    // tests below are the cure.
    val store = new SimulatedObjectStore
    val root = freshRoot("naive")
    val dst = new Path(s"$root/_manifests/m-000000001.txt")
    def stage(body: String): Path = {
      val t = new Path(s"$root/_manifests/.tmp-${java.util.UUID.randomUUID()}")
      store.putLww(t, body.getBytes(StandardCharsets.UTF_8)); t
    }
    val a = stage("writer-A manifest")
    val b = stage("writer-B manifest")
    val aSaw = !store.exists(dst) // A: destination free, safe to publish
    val bSaw = !store.exists(dst) // B: destination free, safe to publish
    store.renameReplace(a, dst)   // A publishes
    store.renameReplace(b, dst)   // B publishes over it — no error anywhere
    assert(aSaw && bSaw)
    val survived = new String(
      Files.readAllBytes(Paths.get(dst.toUri.getPath)), StandardCharsets.UTF_8)
    assert(survived == "writer-B manifest", "expected B to clobber A")
    // A's manifest is gone although A observed only successes — QED the
    // store is hostile enough to make the next tests meaningful.
  }

  test("conditional put refuses to replace; existing body is untouched") {
    val store = new SimulatedObjectStore
    val root = freshRoot("condput")
    val dst = new Path(s"$root/_manifests/m-000000001.txt")
    assert(store.putIfAbsent(dst, "first".getBytes(StandardCharsets.UTF_8)))
    assert(!store.putIfAbsent(dst, "usurper".getBytes(StandardCharsets.UTF_8)))
    assert(new String(Files.readAllBytes(Paths.get(dst.toUri.getPath)),
      StandardCharsets.UTF_8) == "first")
    // same contract from the local (hard-link) implementation
    val fs = hfs(root)
    val dst2 = new Path(s"$root/_manifests/m-000000002.txt")
    assert(CommitOps.Local.putIfAbsent(fs, dst2, "first".getBytes))
    assert(!CommitOps.Local.putIfAbsent(fs, dst2, "usurper".getBytes))
    assert(new String(Files.readAllBytes(Paths.get(dst2.toUri.getPath)),
      StandardCharsets.UTF_8) == "first")
    // and no .tmp- litter is left behind on either path
    val litter = Files.list(Paths.get(root, "_manifests")).toArray
      .map(_.toString).filter(_.contains(".tmp-"))
    assert(litter.isEmpty, s"tmp litter: ${litter.mkString(", ")}")
  }

  // ---- full protocol on the adversarial store -------------------------

  test("racing blind committers through the conditional-put ops: every version lands intact") {
    val store = new SimulatedObjectStore
    val root = freshRoot("storerace")
    val seg0 = IndexManifest.newSegment("t")
    rows(0L -> "base").write.parquet(s"$root/$seg0")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg0)), ops = store.ops)

    val n = 6
    val results = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to n).map(i => new Thread(() => {
      try {
        val seg = IndexManifest.newSegment("t")
        rows(i.toLong -> s"w$i").write.parquet(s"$root/$seg")
        val v = IndexManifest.commit(spark, root, Map("t" -> Seq(seg)),
          ops = store.ops)
        val prev = results.putIfAbsent(v, seg)
        if (prev != null) bad.add(s"version $v claimed twice")
      } catch { case e: Throwable => bad.add(s"writer$i: $e") }
    }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(bad.isEmpty, s"${bad.toArray.mkString("; ")}")
    assert(results.size == n)
    results.forEach { (v, seg) =>
      val snap = IndexManifest.snapshotAt(spark, root, v)
      assert(snap.tables("t") == Seq(seg), s"v$v lost its manifest")
    }
  }

  test("a resurrected writer whose claim was reclaimed fails its publish; nothing is lost") {
    val store = new SimulatedObjectStore
    val root = freshRoot("resurrect")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)), ops = store.ops)

    // writer A claims v2 then stalls past the lease (simulated: stale lock)
    val lockName = "m-000000002.txt.lock"
    assert(store.putIfAbsent(new Path(s"$root/_manifests/$lockName"),
      "claimant\t0\n".getBytes(StandardCharsets.UTF_8)))
    ageFile(root, lockName, ageMs = 60000)

    // writer B's expect-guarded refresh reclaims the orphan and commits —
    // no manual vacuum needed (the round-12 wedge is gone)
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    val v2 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)),
      expect = Some(1L), ops = store.ops, lockLeaseMs = 1000L)
    assert(v2 == 2L)

    // writer A resurrects inside the old race window and tries to publish
    // the version it still believes it owns: the conditional put refuses,
    // and B's committed manifest is byte-identical afterwards
    val mPath = new Path(s"$root/_manifests/m-000000002.txt")
    val before = Files.readAllBytes(Paths.get(mPath.toUri.getPath))
    assert(!store.putIfAbsent(mPath, "stale manifest from A".getBytes))
    assert(Files.readAllBytes(Paths.get(mPath.toUri.getPath)).sameElements(before))
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(2L))
  }

  // ---- lease reclaim in the commit path (local backend) ---------------

  test("expect-guarded commit reclaims a crashed writer's stale lock without vacuum") {
    val root = freshRoot("lease")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))

    // crashed writer: claimed v2, died before publishing
    val lockName = "m-000000002.txt.lock"
    hfs(root).create(new Path(s"$root/_manifests/$lockName"), false).close()
    ageFile(root, lockName, ageMs = 60000)

    // a FRESH lock (inside the lease) still blocks — conservative first
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    intercept[java.util.ConcurrentModificationException] {
      IndexManifest.commit(spark, root, Map("t" -> Seq(seg1, seg2)),
        expect = Some(1L), lockLeaseMs = 10L * 60L * 1000L)
    }
    // past the lease it is reclaimed in place and the lifecycle proceeds
    val v2 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg1, seg2)),
      expect = Some(1L), lockLeaseMs = 1000L)
    assert(v2 == 2L)
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  // ---- vacuum: tombstone grace + reader leases ------------------------

  test("fresh claim tombstones survive a default-grace vacuum; aged ones go") {
    val root = freshRoot("tombgrace")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1, seg2)),
      expect = Some(1L))
    val fs = hfs(root)
    val lock2 = new Path(s"$root/_manifests/m-000000002.txt.lock")
    assert(fs.exists(lock2))
    // default grace: the warm tombstone stays — a racer that resolved
    // currentVersion=1 a moment ago must still find v2's claim taken
    IndexManifest.vacuum(spark, root, keepFrom = 1L)
    assert(fs.exists(lock2), "warm tombstone vacuumed inside the grace window")
    // once aged past the grace it is garbage like any other
    ageFile(root, "m-000000001.txt.lock", ageMs = 60000)
    ageFile(root, "m-000000002.txt.lock", ageMs = 60000)
    IndexManifest.vacuum(spark, root, keepFrom = 1L, orphanGraceMs = 1000L)
    assert(!fs.exists(lock2))
  }

  test("vacuum retains a leased old version until release; reclaims after") {
    val root = freshRoot("rlease")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    val v1 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    // compact-style swap: v2 references only a new segment
    val seg2 = IndexManifest.newSegment("t")
    rows(1L -> "a", 2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)), expect = Some(v1))

    // a long-running reader registers its pinned snapshot
    val lease = IndexManifest.acquireReaderLease(spark, root, v1)
    IndexManifest.vacuum(spark, root, orphanGraceMs = 0)
    assert(new java.io.File(s"$root/$seg1").exists,
      "vacuum deleted a leased reader's segments")
    // the leased version stays fully re-resolvable mid-read
    assert(IndexManifest.readAt(spark, root,
      IndexManifest.snapshotAt(spark, root, v1), "t")
      .select("id").as[Long].collect().toSet == Set(1L))

    IndexManifest.releaseReaderLease(spark, root, lease)
    IndexManifest.vacuum(spark, root, orphanGraceMs = 0)
    assert(!new java.io.File(s"$root/$seg1").exists,
      "released version's segments must be reclaimable")
    assert(IndexManifest.read(spark, root, "t").count() == 2)
  }

  test("a lease landing inside vacuum's destructive window keeps segments") {
    // The resolve-then-lease race, driven deterministically through the
    // vacuumHooked seam: a reader resolves v1, vacuum lists leases (none)
    // and deletes v1's manifest, THEN the reader's lease lands (in real
    // time: the lease landed and its manifest-exists check passed just
    // before the delete). The re-list between the delete and the segment
    // phase must see the lease and retain v1's SEGMENTS, so the reader's
    // already-parsed snapshot stays readable even though the manifest
    // file is gone.
    val root = freshRoot("rlate")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    val v1 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    val snapV1 = IndexManifest.snapshotAt(spark, root, v1) // reader's parse
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)), expect = Some(v1))
    IndexManifest.vacuumHooked(spark, root, keepFrom = -1L, orphanGraceMs = 0L,
      afterManifestDeletes =
        () => { IndexManifest.acquireReaderLease(spark, root, v1); () })
    assert(!hfs(root).exists(new Path(s"$root/_manifests/m-000000001.txt")),
      "v1's manifest should be gone (the delete raced ahead of the lease)")
    assert(new java.io.File(s"$root/$seg1").exists,
      "late-leased version's segments were deleted out from under a reader")
    // the reader's in-memory snapshot still reads
    assert(IndexManifest.readAt(spark, root, snapV1, "t")
      .select("id").as[Long].collect().toSet == Set(1L))
  }

  test("an expired lease no longer protects; vacuum sweeps the lease file") {
    val root = freshRoot("rexpire")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    val v1 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)), expect = Some(v1))

    val lease = IndexManifest.acquireReaderLease(spark, root, v1, ttlMs = 30L)
    Thread.sleep(80L) // crashed reader: never releases; the TTL does it
    IndexManifest.vacuum(spark, root, orphanGraceMs = 0)
    assert(!new java.io.File(s"$root/$seg1").exists,
      "expired lease kept protecting its version")
    assert(!hfs(root).exists(lease), "expired lease file not swept")
  }

  test("withReaderLease releases on every exit path") {
    val root = freshRoot("rwith")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    def liveLeases(): Int =
      Files.list(Paths.get(root, "_manifests")).toArray
        .map(_.toString).count(_.endsWith(".lease"))

    val n = IndexManifest.withReaderLease(spark, root) { snap =>
      assert(liveLeases() == 1)
      IndexManifest.readAt(spark, root, snap, "t").count()
    }
    assert(n == 1L && liveLeases() == 0)
    intercept[RuntimeException] {
      IndexManifest.withReaderLease(spark, root) { _ =>
        throw new RuntimeException("reader failed")
      }
    }
    assert(liveLeases() == 0, "lease leaked on the failure path")
  }

  // ---- Auto routing refusal matrix (r14 ADVICE: object-store schemes
  // must not silently fall through to last-writer-wins rename) ---------

  test("Auto routes rename-safe schemes and REFUSES object stores") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    assert(CommitOps.route("file", conf) eq CommitOps.Local)
    assert(CommitOps.route("local", conf) eq CommitOps.Local)
    for (s <- Seq("hdfs", "webhdfs", "swebhdfs"))
      assert(CommitOps.route(s, conf) eq CommitOps.Hadoop, s)
    // every object-store or unknown scheme throws instead of degrading —
    // INCLUDING viewfs (r15): a mount table's rename contract is its
    // TARGET's, which can be an object store; the refusal message
    // points at committing against the resolved target
    for (s <- Seq("s3a", "s3", "gs", "abfs", "abfss", "wasb", "oss",
        "viewfs", "bogus")) {
      val e = intercept[UnsupportedOperationException](CommitOps.route(s, conf))
      assert(e.getMessage.contains("ConditionalPut"), s)
    }
    assert(intercept[UnsupportedOperationException](
      CommitOps.route("viewfs", conf)).getMessage.contains("RESOLVED"))
    // the sanctioned escape hatches are per-scheme opt-in flags: s3a +
    // the conditional-create flag (Hadoop 3.4.2 If-None-Match binding)
    // routes to S3AConditional, gs + its flag (connector generation-
    // match-0 create) to GcsConditional
    val flagged = new org.apache.hadoop.conf.Configuration(false)
    flagged.setBoolean(CommitOps.S3AConditionalKey, true)
    assert(CommitOps.route("s3a", flagged) eq CommitOps.S3AConditional)
    // ... and each flag is scheme-scoped: gs stays refused under s3a's
    intercept[UnsupportedOperationException](CommitOps.route("gs", flagged))
    val gsFlagged = new org.apache.hadoop.conf.Configuration(false)
    gsFlagged.setBoolean(CommitOps.GcsConditionalKey, true)
    assert(CommitOps.route("gs", gsFlagged) eq CommitOps.GcsConditional)
    intercept[UnsupportedOperationException](CommitOps.route("s3a", gsFlagged))
    // abfs stays refused under the OTHER schemes' flags...
    val e2 = intercept[UnsupportedOperationException](
      CommitOps.route("abfs", gsFlagged))
    assert(e2.getMessage.contains("ConditionalPut"))
    // ... and routes (both scheme spellings) only under its own opt-in,
    // which asserts the account is hierarchical-namespace
    val abfsFlagged = new org.apache.hadoop.conf.Configuration(false)
    abfsFlagged.setBoolean(CommitOps.AbfsConditionalKey, true)
    assert(CommitOps.route("abfs", abfsFlagged) eq CommitOps.AbfsConditional)
    assert(CommitOps.route("abfss", abfsFlagged) eq CommitOps.AbfsConditional)
    intercept[UnsupportedOperationException](CommitOps.route("s3a", abfsFlagged))
    intercept[UnsupportedOperationException](CommitOps.route("gs", abfsFlagged))
    // wasb (flat blob endpoint) has NO sanctioned flag: refused even
    // with every in-tree flag set — flat-account Azure genuinely has no
    // safe namespace-atomic create to bind to
    val all = new org.apache.hadoop.conf.Configuration(false)
    all.setBoolean(CommitOps.S3AConditionalKey, true)
    all.setBoolean(CommitOps.GcsConditionalKey, true)
    all.setBoolean(CommitOps.AbfsConditionalKey, true)
    intercept[UnsupportedOperationException](CommitOps.route("wasb", all))
  }

  test("close-failure adjudication: own landed PUT wins, rival's loses") {
    // ownPutLanded is the shared close-time tiebreak of both
    // object-store bindings: an IOException at close with the
    // destination holding OUR bytes is a response-lost success (true);
    // holding DIFFERENT bytes is a genuinely lost race (false); holding
    // nothing re-throws the original failure.
    val root = freshRoot("ownput")
    val fs = hfs(root)
    val boom = new java.io.IOException("simulated close-time 412")
    val mine = "graft-index-manifest\t1\nclaimant\tnonce-A\n"
      .getBytes(StandardCharsets.UTF_8)
    val p = new Path(s"$root/_manifests/m-000000001.txt")
    // missing destination: not a race at all — the failure propagates
    assert(intercept[java.io.IOException](
      CommitOps.ownPutLanded(fs, p, mine, boom)) eq boom)
    // destination holds our exact bytes: the PUT landed, response lost
    Files.createDirectories(Paths.get(root, "_manifests"))
    Files.write(Paths.get(root, "_manifests", "m-000000001.txt"), mine)
    assert(CommitOps.ownPutLanded(fs, p, mine, boom))
    // destination holds a rival's bytes (same length and differing
    // length both): lost race
    val rivalSameLen = mine.clone(); rivalSameLen(mine.length - 2) = 'B'
    Files.write(Paths.get(root, "_manifests", "m-000000001.txt"), rivalSameLen)
    assert(!CommitOps.ownPutLanded(fs, p, mine, boom))
    Files.write(Paths.get(root, "_manifests", "m-000000001.txt"),
      "short".getBytes(StandardCharsets.UTF_8))
    assert(!CommitOps.ownPutLanded(fs, p, mine, boom))
  }

  // ---- retry-tolerant manifest reads (r13 What's-wrong #2): the
  // no-hardlink local fallback makes the manifest file visible for one
  // write() before its body lands; snapshotAt must absorb that window --

  test("snapshotAt retries past a concurrently-landing manifest body") {
    val root = freshRoot("retry")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    val good = Files.readAllBytes(
      Paths.get(root, "_manifests", "m-000000001.txt"))
    // fallback-writer shape for v2: the file exists EMPTY first, the
    // body lands a beat later — a reader arriving in between must wait
    // it out, not crash
    val p2 = Paths.get(root, "_manifests", "m-000000002.txt")
    Files.write(p2, Array.emptyByteArray)
    val writer = new Thread(() => {
      Thread.sleep(200)
      Files.write(p2, good)
    })
    writer.start()
    try {
      val snap = IndexManifest.snapshotAt(spark, root, 2L)
      assert(snap.tables("t") == Seq(seg))
    } finally writer.join()
    // a manifest that NEVER becomes parseable still fails loudly after
    // the bounded retry window
    val p3 = Paths.get(root, "_manifests", "m-000000003.txt")
    Files.write(p3, "not a manifest".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException](
      IndexManifest.snapshotAt(spark, root, 3L))
    // ... and a MISSING manifest fails immediately (vacuumed version),
    // no pointless retry stall
    val t0 = java.lang.System.nanoTime()
    intercept[java.io.FileNotFoundException](
      IndexManifest.snapshotAt(spark, root, 9L))
    assert((java.lang.System.nanoTime() - t0) / 1e9 < 0.4,
      "missing manifest should not burn the retry budget")
  }

  test("manifest metadata round-trips and inherits down the version chain") {
    val root = freshRoot("meta")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)),
      meta = Map("family" -> "gram", "note" -> "v1"))
    assert(IndexManifest.snapshot(spark, root).meta ==
      Map("family" -> "gram", "note" -> "v1"))
    // a metadata-less commit inherits; an explicit key overrides
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg, seg2)),
      expect = Some(1L))
    assert(IndexManifest.snapshot(spark, root).meta ==
      Map("family" -> "gram", "note" -> "v1"))
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg, seg2)),
      expect = Some(2L), meta = Map("note" -> "v3"))
    val snap = IndexManifest.snapshot(spark, root)
    assert(snap.meta == Map("family" -> "gram", "note" -> "v3"))
    // older versions keep their own metadata (time travel reads the
    // version's stamp, not HEAD's)
    assert(IndexManifest.snapshotAt(spark, root, 1L).meta("note") == "v1")
    // tab/newline-hostile values are rejected up front
    intercept[IllegalArgumentException](
      IndexManifest.commit(spark, root, Map("t" -> Seq(seg)),
        meta = Map("bad" -> "a\tb")))
    // ... as is an EMPTY meta key (would serialize to a line every
    // subsequent parse rejects — a committed one bricks the root)
    intercept[IllegalArgumentException](
      IndexManifest.commit(spark, root, Map("t" -> Seq(seg)),
        meta = Map("" -> "x")))
    // ... and a COMMA meta key (the __explicit marker joins explicit
    // keys with ',': "x,stream_batch" would round-trip as a phantom
    // stream_batch explicit key on a version that never stamped one)
    intercept[IllegalArgumentException](
      IndexManifest.commit(spark, root, Map("t" -> Seq(seg)),
        meta = Map("x,stream_batch" -> "1")))
    // ... and a table name colliding with the reserved '!' meta prefix
    intercept[IllegalArgumentException](
      IndexManifest.commit(spark, root, Map("!meta" -> Seq(seg))))
    intercept[IllegalArgumentException](
      IndexManifest.commit(spark, root, Map("" -> Seq(seg))))
    // the failed attempts committed nothing: HEAD still parses
    assert(IndexManifest.snapshot(spark, root).version == 3L)
  }
}
