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

  /** Dispatches to the right implementation for the path's filesystem:
    * NIO hard-link on `file://`, no-overwrite rename elsewhere. Object
    * stores must be wired explicitly ([[ConditionalPut]]) — there is no
    * safe generic fallback for a scheme whose rename replaces. */
  object Auto extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      (if (fs.getScheme == "file") Local else Hadoop).putIfAbsent(fs, path, body)
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
          // to NIO's O_CREAT|O_EXCL create; the body lands after the
          // atomic create, which is fine for empty/lock files but means
          // manifest readers must tolerate retry-on-parse — keep hard
          // links available in production local deployments.
          try { Files.createFile(dst); Files.write(dst, body); true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: java.io.IOException => throw e
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

  /** Adapter for object stores exposing a conditional PUT. `put` must
    * be the store's native atomic create-iff-absent (S3 `If-None-Match:
    * *`, GCS generation-match 0) — a single request, no read-check. */
  final class ConditionalPut(put: (Path, Array[Byte]) => Boolean) extends CommitOps {
    def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean =
      put(path, body)
  }
}
