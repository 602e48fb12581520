package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The atomic commit protocol itself: version resolution, staged-segment
  * invisibility, pinned-snapshot stability, the optimistic lost-update
  * guard, and vacuum. Family-level lifecycles are proven in
  * [[IndexConcurrencySpec]]. */
class IndexManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = new java.io.File(
      java.lang.System.getProperty("java.io.tmpdir"),
      s"graft_manifest_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    f.toString
  }

  private def rows(xs: (Long, String)*) = xs.toDF("id", "v")

  test("commit then read round-trips; versions increment from 1") {
    val root = freshRoot("roundtrip")
    assert(!IndexManifest.exists(spark, root))
    assert(IndexManifest.currentVersion(spark, root) == 0L)

    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a", 2L -> "b").write.parquet(s"$root/$seg")
    val v1 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    assert(v1 == 1L)
    assert(IndexManifest.exists(spark, root))
    assert(IndexManifest.lastModified(spark, root).nonEmpty)
    assert(IndexManifest.read(spark, root, "t").count() == 2)

    val seg2 = IndexManifest.newSegment("t")
    rows(3L -> "c").write.parquet(s"$root/$seg2")
    val v2 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg, seg2)),
      expect = Some(v1))
    assert(v2 == 2L)
    assert(IndexManifest.read(spark, root, "t").count() == 3)
  }

  test("staged-but-uncommitted segments are invisible to readers") {
    val root = freshRoot("torn")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    // a writer crashes here: segment files on disk, no manifest commit
    val orphan = IndexManifest.newSegment("t")
    rows(99L -> "torn").write.parquet(s"$root/$orphan")
    val seen = IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet
    assert(seen == Set(1L), "uncommitted segment leaked into a read")
  }

  test("a pinned snapshot keeps reading its own version after newer commits") {
    val root = freshRoot("pinned")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    val pinned = IndexManifest.snapshot(spark, root)

    // compact-style swap: new segment replaces the old one entirely
    val seg2 = IndexManifest.newSegment("t")
    rows(1L -> "a", 2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)),
      expect = Some(pinned.version))

    assert(IndexManifest.read(spark, root, "t").count() == 2)
    val old = IndexManifest.readAt(spark, root, pinned, "t")
      .select("id").as[Long].collect().toSet
    assert(old == Set(1L), "pinned reader must see its resolved version")
    // and time travel re-resolves it identically
    val rt = IndexManifest.snapshotAt(spark, root, pinned.version)
    assert(rt == pinned)
  }

  test("expect-guarded commit fails when a concurrent writer landed first") {
    val root = freshRoot("conflict")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    val v1 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))

    // writer A resolves v1, then writer B commits v2 under A
    val segB = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$segB")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg, segB)),
      expect = Some(v1))

    val segA = IndexManifest.newSegment("t")
    rows(3L -> "stale").write.parquet(s"$root/$segA")
    intercept[java.util.ConcurrentModificationException] {
      IndexManifest.commit(spark, root, Map("t" -> Seq(seg, segA)),
        expect = Some(v1))
    }
    // B's commit is intact — the stale writer changed nothing
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("a held claim lock blocks expect-guarded commits; blind commits skip past it") {
    val root = freshRoot("lock")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    // a concurrent writer mid-commit: v2's claim lock held, manifest
    // not yet published
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/m-000000002.txt.lock"), false).close()

    // an expect-guarded writer must NOT skip to v3 — landing its delta
    // above the in-flight commit would silently drop it
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    intercept[java.util.ConcurrentModificationException] {
      IndexManifest.commit(spark, root, Map("t" -> Seq(seg, seg2)),
        expect = Some(1L))
    }
    // a blind build-style commit is self-contained and may skip
    val seg3 = IndexManifest.newSegment("t")
    rows(3L -> "c").write.parquet(s"$root/$seg3")
    assert(IndexManifest.commit(spark, root, Map("t" -> Seq(seg3))) == 3L)
    // vacuum reclaims the stale lock (v2 <= current) and unblocks the
    // expect-guarded lifecycle
    IndexManifest.vacuum(spark, root, orphanGraceMs = 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/m-000000002.txt.lock")))
    val seg4 = IndexManifest.newSegment("t")
    rows(4L -> "d").write.parquet(s"$root/$seg4")
    assert(IndexManifest.commit(spark, root, Map("t" -> Seq(seg3, seg4)),
      expect = Some(3L)) == 4L)
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("unguarded commits serialize: both land, neither is lost or torn") {
    val root = freshRoot("blind")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    val seg2 = IndexManifest.newSegment("t")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)))
    assert(IndexManifest.currentVersion(spark, root) == 2L)
    // both versions fully readable
    assert(IndexManifest.readAt(spark, root,
      IndexManifest.snapshotAt(spark, root, 1L), "t").count() == 1)
    assert(IndexManifest.read(spark, root, "t").count() == 1)
  }

  test("vacuum removes orphaned segments and old manifests, keeps the live set") {
    val root = freshRoot("vacuum")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    // superseding swap + a crashed writer's orphan
    val seg2 = IndexManifest.newSegment("t")
    rows(1L -> "a", 2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)), expect = Some(1L))
    val orphan = IndexManifest.newSegment("t")
    rows(9L -> "junk").write.parquet(s"$root/$orphan")

    // grace 0: this single-process test KNOWS no writer is in flight;
    // the default grace would (correctly) spare the fresh orphan
    IndexManifest.vacuum(spark, root)
    assert(!new java.io.File(s"$root/$seg").exists,
      "superseded segment must be reclaimed immediately")
    assert(new java.io.File(s"$root/$orphan").exists,
      "default grace must spare the fresh (possibly in-flight) orphan")
    val removed = IndexManifest.vacuum(spark, root, orphanGraceMs = 0)
    assert(removed >= 1, s"expected at least the orphan, got $removed")
    assert(!new java.io.File(s"$root/$orphan").exists)
    assert(IndexManifest.read(spark, root, "t").count() == 2)
  }

  test("vacuum ages orphans by their newest CONTENT stamp, not the dir mtime") {
    val root = freshRoot("vacuum_mtime")
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    // a LONG in-flight stage: the staged dir was created two grace
    // windows ago, but its newest file landed just now — the dir-mtime
    // heuristic would reclaim it mid-write (the S3A/HDFS long-stage
    // shape); the content stamp must protect it
    val staged = IndexManifest.newSegment("t")
    rows(7L -> "inflight").write.parquet(s"$root/$staged")
    val dir = java.nio.file.Paths.get(s"$root/$staged")
    java.nio.file.Files.setLastModifiedTime(dir,
      java.nio.file.attribute.FileTime.fromMillis(
        java.lang.System.currentTimeMillis() - 120000))
    IndexManifest.vacuum(spark, root, orphanGraceMs = 60000)
    assert(new java.io.File(s"$root/$staged").exists,
      "fresh-content segment under an old dir stamp must survive")
    // an abandoned EMPTY staged dir (no files ever landed) still
    // reclaims once ITS stamp ages past the grace, on filesystems
    // whose dir mtimes are real
    val empty = IndexManifest.newSegment("t")
    val edir = java.nio.file.Paths.get(s"$root/$empty")
    java.nio.file.Files.createDirectories(edir)
    java.nio.file.Files.setLastModifiedTime(edir,
      java.nio.file.attribute.FileTime.fromMillis(
        java.lang.System.currentTimeMillis() - 120000))
    IndexManifest.vacuum(spark, root, orphanGraceMs = 60000)
    assert(!new java.io.File(s"$root/$empty").exists,
      "aged empty orphan must reclaim via its (real) dir stamp")
  }

  test("vacuum with keepFrom retains pinned versions fully re-resolvable") {
    val root = freshRoot("retain")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    val v1 = IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    // two compact-style swaps on top of the pinned release version
    val seg2 = IndexManifest.newSegment("t")
    rows(1L -> "a", 2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg2)), expect = Some(1L))
    val seg3 = IndexManifest.newSegment("t")
    rows(3L -> "c").write.parquet(s"$root/$seg3")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg3)), expect = Some(2L))

    // retain the pinned release (v1) and everything after it
    IndexManifest.vacuum(spark, root, keepFrom = v1)
    assert(new java.io.File(s"$root/$seg1").exists, "pinned segment reclaimed")
    val pinned = IndexManifest.snapshotAt(spark, root, v1)
    assert(IndexManifest.readAt(spark, root, pinned, "t")
      .select("id").as[Long].collect().toSet == Set(1L))
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(3L))

    // dropping the retention then reclaims v1/v2's segments
    val removed = IndexManifest.vacuum(spark, root)
    assert(removed >= 2)
    assert(!new java.io.File(s"$root/$seg1").exists)
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(3L))
    // a keepFrom below the earlier vacuum's boundary must not chase the
    // already-deleted manifests — it degrades to what still exists
    assert(IndexManifest.vacuum(spark, root, keepFrom = v1) == 0)
    assert(IndexManifest.read(spark, root, "t")
      .select("id").as[Long].collect().toSet == Set(3L))
  }

  test("threaded: racing blind committers all land on distinct, fully-readable versions") {
    // the lost-manifest scenario the lock-claim protocol exists to
    // prevent: on POSIX, check-then-rename let two writers both "win"
    // one version and silently drop a manifest. With the exclusive
    // lock create, every committer must land on its own version and
    // every returned version must re-resolve to that committer's exact
    // table set.
    val root = freshRoot("blindrace")
    val seg0 = IndexManifest.newSegment("t")
    rows(0L -> "base").write.parquet(s"$root/$seg0")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg0)))

    val n = 6
    val results = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to n).map(i => new Thread(() => {
      try {
        val seg = IndexManifest.newSegment("t")
        rows(i.toLong -> s"w$i").write.parquet(s"$root/$seg")
        val v = IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
        val prev = results.putIfAbsent(v, seg)
        if (prev != null) bad.add(s"version $v claimed twice")
      } catch { case e: Throwable => bad.add(s"writer$i: $e") }
    }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(bad.isEmpty, s"${bad.toArray.mkString("; ")}")
    assert(results.size == n, s"expected $n distinct versions, got ${results.size}")
    // every committed version re-resolves to exactly its writer's segment
    results.forEach { (v, seg) =>
      val snap = IndexManifest.snapshotAt(spark, root, v)
      assert(snap.tables("t") == Seq(seg),
        s"v$v lost its manifest: ${snap.tables("t")} != $seg")
    }
  }

  test("threaded: probes racing a live appender always resolve a committed prefix") {
    // invariant under test: version v's committed table is EXACTLY the
    // ids 1..v, so any reader that ever observes a set that is not a
    // {1..v} prefix has seen a torn or phantom state
    val root = freshRoot("race")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "v1").write.parquet(s"$root/$seg1")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))

    val targetV = 10L
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writer = new Thread(() => {
      try {
        var v = 1L
        while (v < targetV) {
          val snap = IndexManifest.snapshot(spark, root)
          val seg = IndexManifest.newSegment("t")
          rows((snap.version + 1) -> s"v${snap.version + 1}")
            .write.parquet(s"$root/$seg")
          v = IndexManifest.commit(spark, root,
            snap.tables.updated("t", snap.tables("t") :+ seg),
            expect = Some(snap.version))
        }
      } catch { case e: Throwable => bad.add(s"writer: $e") }
      finally done.set(true)
    })
    val readers = (1 to 2).map(i => new Thread(() => {
      try {
        while (!done.get()) {
          val snap = IndexManifest.snapshot(spark, root)
          val ids = IndexManifest.readAt(spark, root, snap, "t")
            .select("id").as[Long].collect().toSet
          if (ids != (1L to snap.version).toSet)
            bad.add(s"reader$i saw $ids at v${snap.version}")
        }
      } catch { case e: Throwable => bad.add(s"reader$i: $e") }
    }))
    (writer +: readers).foreach(_.start())
    (writer +: readers).foreach(_.join(120000))
    assert(bad.isEmpty, s"torn/phantom reads: ${bad.toArray.mkString("; ")}")
    assert(IndexManifest.currentVersion(spark, root) == targetV)
  }

  test("describe lists every resolvable version's segments with file stats") {
    val root = freshRoot("describe")
    val seg1 = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg1")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg1)))
    val seg2 = IndexManifest.newSegment("u")
    rows(2L -> "b").write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root,
      Map("t" -> Seq(seg1), "u" -> Seq(seg2)), expect = Some(1L))
    val d = IndexManifest.describe(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getLong(4)))
    assert(d.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, "t"), (2L, "t"), (2L, "u")))
    assert(d.forall { case (_, _, nFiles, bytes) => nFiles > 0 && bytes > 0 })
    // vacuum reclaims a crashed writer's hidden .tmp manifest too
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_manifests/.tmp-crashed")
    val out = fs.create(tmp, true); out.write("junk".getBytes); out.close()
    IndexManifest.vacuum(spark, root, orphanGraceMs = 0)
    assert(!fs.exists(tmp), "stale .tmp manifest survived vacuum")
  }

  test("missing table and uninitialized root fail loudly") {
    val root = freshRoot("missing")
    intercept[IllegalArgumentException] { IndexManifest.snapshot(spark, root) }
    val seg = IndexManifest.newSegment("t")
    rows(1L -> "a").write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("t" -> Seq(seg)))
    intercept[IllegalStateException] { IndexManifest.read(spark, root, "nope") }
  }
}
