package graft.engine

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** Catalog storage over the Hadoop `FileSystem` API: every metadata
  * path — configs, manifests, split directories — resolves through the
  * scheme of the catalog root, so the same catalog runs on `file://`
  * today and `hdfs://` / `s3a://` on a cluster without touching the
  * engine (split data was always read/written through this layer by
  * Spark; this makes the metadata side match). Reference capability:
  * `/root/reference/src/commands/mod.rs:70-99` (OpenDAL operator
  * selecting S3 vs local FS by URL prefix, env-var credentials — here
  * the Hadoop `Configuration` plays that role).
  */
final class ManifestStore(rootUri: String, conf: Configuration) {
  val root = new HPath(rootUri)
  val fs: FileSystem = root.getFileSystem(conf)

  def exists(p: HPath): Boolean = fs.exists(p)
  def mkdirs(p: HPath): Unit = fs.mkdirs(p)

  /** Open-and-catch, not exists-then-open: the check-then-act window
    * would turn a concurrent drop into a FileNotFoundException instead of
    * the expected None, and costs a second metadata RPC per read on an
    * object store. */
  def readString(p: HPath): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Exclusive create — fails if the path already exists (the
    * create-verb guard against clobbering an existing index config). */
  def writeStringExclusive(p: HPath, s: String): Unit = {
    val out = fs.create(p, false)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Delete a metadata file. IO failures PROPAGATE: a drop() that cannot
    * remove the index config must fail loudly — swallowing the error left
    * the index still exists() while drop reported success, and the next
    * create() died with an unexplained 'already exists'. A missing file is
    * a no-op (`FileSystem.delete` returns false, no throw). */
  def deleteIfExists(p: HPath): Unit = { fs.delete(p, false); () }

  /** Best-effort recursive delete — leaked files are tolerated
    * everywhere in the engine: without a manifest entry they are
    * invisible (same policy as the reference's drop/merge). */
  def deleteDirBestEffort(p: HPath): Unit =
    try { if (fs.exists(p)) fs.delete(p, true); () }
    catch { case _: Exception => () }

  /** The commit-point implementation for this store's scheme. Schemes
    * whose rename is not atomic (S3-family flat object stores: rename is
    * client-side copy+delete) fail FAST here rather than silently losing
    * concurrent commits — the correct implementation for them is a
    * conditional PUT (see [[RenameCommitPoint]] docs), which needs the
    * store SDK, not a filesystem rename. */
  def commitPoint(manifest: HPath): ManifestCommitPoint = fs.getScheme match {
    case "file" => new LocalFsCommitPoint(this, manifest)
    case s if ManifestStore.NonAtomicRenameSchemes(s) =>
      throw new UnsupportedOperationException(
        s"scheme '$s' has no atomic rename; manifest commits need a " +
          "conditional-PUT ManifestCommitPoint (see RenameCommitPoint docs)")
    case _ => new RenameCommitPoint(this, manifest)
  }

  /** Stored manifest generation (0 = no manifest). */
  private[graft] def readGen(manifest: HPath): Long =
    readString(manifest).map { s =>
      val node = graft.exprs.JsonSupport.parse(s)
      Option(node.get("gen")).filter(!_.isNull).map(_.asLong()).getOrElse(0L)
    }.getOrElse(0L)
}

object ManifestStore {
  /** Flat object stores where "rename" is copy+delete — not a safe
    * manifest publish primitive. */
  private val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "swift")
}

/** The one strongly consistent operation in the engine: publish the
  * manifest at generation `gen` if and only if the stored manifest is
  * still at `gen - 1`. Everything else the engine writes is immutable
  * split data, invisible until a manifest entry points at it, so this
  * single compare-and-swap is the entire consistency story (the
  * reference gets it from a Postgres INSERT,
  * `/root/reference/src/commands/mod.rs:178-187`). Callers run an
  * optimistic read-modify-write loop: read (gen, splits), apply the
  * change, `commit(gen + 1, bytes)`, and on `false` re-read and retry —
  * the shape that maps 1:1 onto every real metadata store.
  */
trait ManifestCommitPoint {
  /** Atomically: if the stored generation is `gen - 1`, publish `bytes`
    * as generation `gen` and return true; otherwise change nothing and
    * return false. */
  def commit(gen: Long, bytes: Array[Byte]): Boolean
}

/** `file://` implementation: an OS advisory lock (`FileChannel.tryLock`
  * on a dedicated lock file) makes check-and-publish mutually exclusive
  * across instances AND processes — the kernel releases the lock when a
  * holder crashes, so there is no stale-lock state — and the publish is
  * a POSIX atomic rename, so readers see either the old or the new
  * manifest, never a partial one. The lock file is never deleted:
  * deleting would let a new writer lock a fresh inode while an old
  * holder still holds the unlinked one. */
final class LocalFsCommitPoint(store: ManifestStore, manifest: HPath)
    extends ManifestCommitPoint {
  def commit(gen: Long, bytes: Array[Byte]): Boolean = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val local = Paths.get(manifest.toUri.getPath)
    Files.createDirectories(local.getParent)
    val lock = local.resolveSibling("manifest.lock")
    val deadline = System.nanoTime() + Catalog.LockTimeoutMs * 1000000L
    val ch = java.nio.channels.FileChannel.open(lock,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      var fl: java.nio.channels.FileLock = null
      while (fl == null) {
        fl = try ch.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException => null }
        if (fl == null) {
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"timed out acquiring manifest lock at $lock")
          Thread.sleep(5)
        }
      }
      try {
        if (store.readGen(manifest) != gen - 1L) false
        else {
          val tmp = local.resolveSibling(s"manifest.json.tmp-${System.nanoTime()}")
          Files.write(tmp, bytes)
          Files.move(tmp, local, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          true
        }
      } finally fl.release()
    } finally ch.close()
  }
}

/** Generic implementation for remote schemes with atomic rename (HDFS,
  * ABFS): temp write + `FileContext` OVERWRITE rename. The generation
  * check runs without a cross-process lock, so concurrent writers can
  * lose updates — deploy single-writer per index, or use a store with a
  * native conditional write: on S3 the correct implementation of this
  * trait is a conditional PUT of the manifest object (`If-Match` on the
  * gen-1 object's ETag, `If-None-Match: *` for the first generation),
  * mapping a 412 Precondition Failed response to `false` — exactly the
  * compare-and-swap this interface models, with no lock file at all. */
final class RenameCommitPoint(store: ManifestStore, manifest: HPath)
    extends ManifestCommitPoint {
  def commit(gen: Long, bytes: Array[Byte]): Boolean = {
    if (store.readGen(manifest) != gen - 1L) return false
    store.mkdirs(manifest.getParent)
    val tmp = new HPath(manifest.getParent,
      s"manifest.json.tmp-${java.util.UUID.randomUUID()}")
    val out = store.fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = FileContext.getFileContext(manifest.toUri, store.fs.getConf)
    fc.rename(tmp, manifest, Options.Rename.OVERWRITE)
    true
  }
}
