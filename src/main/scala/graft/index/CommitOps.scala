package graft.index

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single storage primitive the [[IndexManifest]] commit protocol
  * needs: an ATOMIC create-iff-absent whose body is never observable
  * half-written. Everything else in the protocol (version claim,
  * manifest publish, reader leases) is expressed through it, so porting
  * the index to a new storage backend means implementing exactly one
  * method with that backend's native atomicity — not re-auditing the
  * protocol.
  *
  * Why the primitive differs per backend:
  *  - POSIX local filesystems: `rename(2)` silently REPLACES an existing
  *    destination and Hadoop's `RawLocalFileSystem.create(overwrite =
  *    false)` is check-then-create, so neither is usable alone. The
  *    atomic create-iff-absent here is `link(2)`: write the body to a
  *    hidden temp file, hard-link it to the destination (`link` fails
  *    with EEXIST atomically), unlink the temp.
  *  - HDFS: `create(overwrite = false)` is namespace-atomic but a
  *    reader can open the file before the writer closes it, so the body
  *    goes to a temp file first and the visibility switch is `rename`,
  *    which on HDFS (unlike POSIX) FAILS when the destination exists.
  *  - Object stores (S3/GCS): bare PUT is last-writer-wins and "rename"
  *    is copy+delete — both unsafe. The safe primitive is a conditional
  *    PUT (`If-None-Match: *` on S3, `x-goog-if-generation-match: 0` on
  *    GCS): one request that atomically creates the whole object or
  *    fails. [[CommitOps.ConditionalPut]] adapts any store exposing
  *    that; [[graft.index.SimulatedObjectStore]] (test scope) proves
  *    the protocol on a store whose unconditional primitives are
  *    actively adversarial.
  *
  * The protocol's degradation contract, regardless of backend: a commit
  * either lands completely or FAILS — it never tears a manifest and
  * never silently replaces one that another writer committed.
  */
trait CommitOps {

  /** Atomically create `path` with `body` iff it does not already
    * exist. Returns true iff THIS caller created it; false when the
    * path already exists (or came to exist concurrently). Readers must
    * never observe a partially-written body. */
  def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean
}

object CommitOps {

  /** Schemes whose Hadoop `rename` contract FAILS on an existing
    * destination (namespace-atomic), making [[Hadoop]]'s temp+rename a
    * true create-iff-absent: HDFS and its protocol-compatible fronts.
    * Everything else must be routed explicitly — routing an unknown
    * scheme to rename would silently run last-writer-wins on exactly
    * the stores (S3, GCS, non-HNS Azure) where rename is copy+delete.
    * `viewfs` is deliberately NOT here: it is a client-side mount
    * table whose targets can be object stores, so its rename contract
    * is whatever the mount target's is — trusting the front would run
    * last-writer-wins on exactly the backends this matrix refuses.
    * Route the RESOLVED target path instead (or wire ConditionalPut). */
  private val RenameSafeSchemes = Set("hdfs", "webhdfs", "swebhdfs")

  /** Hadoop conf key (boolean, default false) that opts an `s3a://`
    * index root into [[S3AConditional]] — Hadoop 3.4.2+'s native
    * conditional-create (HADOOP-19256: `If-None-Match: *` on the final
    * PUT). Off by default because it also requires the S3A connector
    * side to be new enough; a deployment flips it on once. */
  val S3AConditionalKey = "graft.index.commit.s3a.conditional"

  /** Hadoop conf key (boolean, default false) that opts a `gs://` index
    * root into [[GcsConditional]]. The GCS connector's
    * `create(overwrite = false)` maps to a generation-match-0
    * conditional insert (`x-goog-if-generation-match: 0`) — one request
    * that atomically creates the object or fails — PROVIDED the
    * connector's conflict check (`fs.gs.create.items.conflict.check`,
    * its default) has not been disabled. Off by default so a deployment
    * consciously asserts its connector config before the commit
    * protocol trusts it. */
  val GcsConditionalKey = "graft.index.commit.gs.conditional"

  /** Hadoop conf key (boolean, default false) that opts an `abfs://` /
    * `abfss://` index root into [[AbfsConditional]]. On an ADLS Gen2
    * account WITH hierarchical namespace, the ABFS driver's
    * `create(overwrite = false)` maps to the Create Path REST operation
    * with an `If-None-Match: *` precondition — a single server-side
    * create-or-fail against the directory namespace. On a FLAT (blob)
    * account that atomicity does not hold, which is exactly why this is
    * an explicit opt-in: the deployment asserts its account type, the
    * code cannot detect it. */
  val AbfsConditionalKey = "graft.index.commit.abfs.conditional"

  /** Dispatches to the right implementation for the path's filesystem:
    * NIO hard-link on `file://`, no-overwrite rename on the HDFS-rename
    * allowlist, [[S3AConditional]] on `s3a://` when
    * [[S3AConditionalKey]] is set. Every OTHER scheme throws: an object
    * store routed to rename would silently run the last-writer-wins
    * protocol this class exists to prevent, so unknown schemes must be
    * wired explicitly ([[ConditionalPut]] over the store's conditional
    * PUT) rather than degraded implicitly. */
  object Auto extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      route(fs.getScheme, fs.getConf).putIfAbsent(fs, path, body)
  }

  /** [[Auto]]'s routing decision, factored out so the refusal matrix is
    * unit-testable without instantiating cloud filesystems. */
  private[index] def route(
      scheme: String, conf: org.apache.hadoop.conf.Configuration): CommitOps =
    scheme match {
      case "file" | "local" => Local
      case s if RenameSafeSchemes.contains(s) => Hadoop
      case "s3a" if conf.getBoolean(S3AConditionalKey, false) => S3AConditional
      case "gs" if conf.getBoolean(GcsConditionalKey, false) => GcsConditional
      case "abfs" | "abfss" if conf.getBoolean(AbfsConditionalKey, false) =>
        AbfsConditional
      case s => throw new UnsupportedOperationException(
        s"no safe atomic create-iff-absent for scheme '$s': rename on " +
          "object stores silently replaces, so the commit protocol " +
          "refuses to run last-writer-wins implicitly. For s3a:// set " +
          s"$S3AConditionalKey=true (Hadoop 3.4.2+ conditional create); " +
          s"for gs:// set $GcsConditionalKey=true (connector " +
          "generation-match-0 create, keep fs.gs.create.items.conflict" +
          s".check on); for abfs(s):// set $AbfsConditionalKey=true " +
          "(hierarchical-namespace account REQUIRED — Create Path with " +
          "If-None-Match); for viewfs:// commit against the RESOLVED " +
          "mount target (the mount table's rename contract is its " +
          "target's, which may be an object store); for other stores " +
          "(wasb://, oss://, ...) pass ops = new CommitOps" +
          ".ConditionalPut(...) wired to the store's conditional PUT.")
    }

  /** POSIX local filesystems: write temp, `link(2)` to destination
    * (atomic create-iff-absent), unlink temp. The temp lives in the
    * same directory (hard links cannot cross filesystems) under the
    * `.tmp-` prefix [[IndexManifest.vacuum]] already reclaims, so a
    * crash between write and link leaves only vacuumable garbage. */
  object Local extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean = {
      fs.mkdirs(path.getParent)
      val dst = Paths.get(path.toUri.getPath)
      val tmp = dst.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, body)
      try { Files.createLink(dst, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          // filesystem without hard links (rare for file://): fall back
          // to ONE channel opened O_CREAT|O_EXCL that writes the whole
          // body before close. The create is atomic; the body follows
          // within the same syscall sequence, so the visible-but-empty
          // window is the single write() — and IndexManifest.snapshotAt
          // retries an empty/truncated parse precisely to absorb it.
          // Keep hard links available in production local deployments.
          try {
            val ch = Files.newByteChannel(dst,
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            var wrote = false
            try {
              try {
                val buf = java.nio.ByteBuffer.wrap(body)
                while (buf.hasRemaining) ch.write(buf)
                wrote = true
              } finally ch.close()
            } catch {
              case we: java.io.IOException if !wrote =>
                // the create SUCCEEDED but the body didn't land (ENOSPC,
                // EIO): a committed-looking, forever-unparseable file
                // would brick the root — we own the claim, so remove the
                // partial before failing. Residual window: a JVM death
                // between create and this cleanup still leaves the
                // partial (inherent to a no-hardlink local fs; the
                // bounded parse retry absorbs only the in-flight case) —
                // which is why production local deployments should keep
                // hard links available.
                Files.deleteIfExists(dst)
                we.addSuppressed(e)
                throw we
            }
            true
          }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
      }
      finally Files.deleteIfExists(tmp)
    }
  }

  /** HDFS-like filesystems: write temp, rename to destination. The
    * Hadoop rename contract on HDFS fails (returns false) when the
    * destination exists, making it a create-iff-absent; the temp write
    * keeps partially-flushed bodies invisible. NOT safe on `file://`
    * (Hadoop's local rename delegates to POSIX rename, which replaces)
    * — [[Auto]] routes local paths to [[Local]] instead. */
  object Hadoop extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean = {
      fs.mkdirs(path.getParent)
      if (fs.exists(path)) return false // cheap pre-check; rename is the guard
      val tmp = new Path(path.getParent, s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      if (fs.rename(tmp, path)) true
      else {
        fs.delete(tmp, false)
        if (fs.exists(path)) false
        else throw new java.io.IOException(s"rename to $path failed")
      }
    }
  }

  /** S3A binding for Hadoop 3.4.2+ conditional creates (HADOOP-19256):
    * the `createFile` builder is opened with `overwrite(false)` and the
    * public `fs.option.create.conditional.overwrite = false` option,
    * which makes the FINAL object PUT carry `If-None-Match: *` — one
    * atomic server-side create-or-fail, closing the list-then-PUT race
    * that makes plain S3A `create(overwrite = false)` unsafe. The store
    * decides at `close()` (S3 commits multipart/put on complete), so a
    * lost race surfaces as the close throwing; it is mapped to `false`
    * only when the destination verifiably exists — any other failure
    * propagates rather than being mistaken for "someone else won".
    *
    * Environment note: no S3 endpoint exists in this sandbox, so this
    * binding is exercised for ROUTING (Auto + [[S3AConditionalKey]])
    * and compiled against the public builder API; the conditional-PUT
    * protocol itself is proven against the adversarial simulated store
    * in CommitProtocolSpec via [[ConditionalPut]]. */
  /** Adjudicate a close-time IOException from a conditional-PUT create:
    * `false` (lost the race) only when the destination holds someone
    * ELSE'S object. An existing object whose bytes equal `body` is this
    * writer's own PUT that succeeded server-side while the response was
    * lost (retried-request 412s, connection drops at commit time) —
    * claiming a lost race there would make an expect-guarded append
    * throw ConcurrentModificationException despite having landed, so it
    * counts as a win. Byte-equality is a sound tiebreak for the commit
    * protocol's payloads: claim locks embed a per-claimant UUID nonce
    * (equal bytes ⇒ same claimant), and two manifests with identical
    * bytes publish identical versions — either writer may own it. A
    * read that itself fails, or a mismatched body, re-throws / loses as
    * before. */
  private[index] def ownPutLanded(
      fs: FileSystem, path: Path, body: Array[Byte], cause: java.io.IOException): Boolean = {
    val status =
      try fs.getFileStatus(path)
      catch { case _: java.io.FileNotFoundException => throw cause }
    if (status.getLen != body.length) return false
    val in = fs.open(path)
    val got = new Array[Byte](body.length)
    try in.readFully(0L, got) finally in.close()
    java.util.Arrays.equals(got, body)
  }

  /** Shared create-iff-absent body of the three object-store bindings:
    * no-overwrite createFile (each store's driver maps it to its native
    * conditional create), with the close-time adjudication in ONE place
    * — a store may not commit the upload until `close()`, so an
    * IOException there is a lost race only when the winning object is
    * verifiably someone else's ([[ownPutLanded]]); a fix to this
    * contract lands in every binding at once. `s3aConditionalMust`
    * additionally asserts S3A's conditional-overwrite capability via
    * the builder's must-option (the one binding-specific knob; a new
    * binding needing its own option adds a flag here, keeping the
    * adjudication path single-bodied). */
  private def conditionalCreate(
      fs: FileSystem, path: Path, body: Array[Byte],
      s3aConditionalMust: Boolean = false): Boolean = {
    fs.mkdirs(path.getParent)
    try {
      val out: org.apache.hadoop.fs.FSDataOutputStream =
        if (s3aConditionalMust)
          fs.createFile(path).overwrite(false)
            .must(org.apache.hadoop.fs.Options.CreateFileOptionKeys
              .FS_OPTION_CREATE_CONDITIONAL_OVERWRITE, false)
            .build()
        else fs.createFile(path).overwrite(false).build()
      try out.write(body) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException => ownPutLanded(fs, path, body, e)
    }
  }

  object S3AConditional extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      conditionalCreate(fs, path, body, s3aConditionalMust = true)
  }

  /** GCS binding: the connector's `create(overwrite = false)` performs a
    * generation-match-0 conditional insert — the object either comes
    * into existence whole or the request fails with a precondition
    * error; there is no list-then-PUT window. Requires the connector's
    * conflict check left at its default (see [[GcsConditionalKey]]).
    * Same close-time adjudication as [[S3AConditional]]: the store
    * decides when the upload commits, so a lost race surfaces at
    * `close()` and is mapped to `false` only when the winning object is
    * verifiably someone else's.
    *
    * Environment note: no GCS endpoint exists in this sandbox, so this
    * binding is exercised for ROUTING (Auto + [[GcsConditionalKey]]) and
    * for the close-time adjudication path (driven through a local
    * FileSystem shim in CommitProtocolSpec); the conditional-PUT
    * protocol itself is proven against the adversarial simulated store
    * via [[ConditionalPut]]. */
  object GcsConditional extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      conditionalCreate(fs, path, body)
  }

  /** ABFS (ADLS Gen2) binding for HIERARCHICAL-NAMESPACE accounts: the
    * driver's `create(overwrite = false)` issues the Create Path REST
    * operation with an `If-None-Match: *` precondition against the
    * directory namespace — the path either comes into existence for
    * this writer or the request fails with 409/412; no list-then-PUT
    * window. NOT valid on flat blob accounts (see [[AbfsConditionalKey]]
    * — that is why routing is opt-in). Same close-time adjudication as
    * the other object-store bindings: the store may commit the upload
    * at `close()`, so a failure there is mapped to `false` only when
    * the winning object is verifiably someone else's.
    *
    * Environment note: no Azure endpoint exists in this sandbox, so
    * this binding is exercised for ROUTING (Auto + [[AbfsConditionalKey]])
    * and for the close-time adjudication path; the conditional-PUT
    * protocol itself is proven against the adversarial simulated store
    * via [[ConditionalPut]]. */
  object AbfsConditional extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      conditionalCreate(fs, path, body)
  }

  /** Adapter for object stores exposing a conditional PUT. `put` must
    * be the store's native atomic create-iff-absent (S3 `If-None-Match:
    * *`, GCS generation-match 0) — a single request, no read-check. */
  final class ConditionalPut(put: (Path, Array[Byte]) => Boolean) extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      put(path, body)
  }
}
