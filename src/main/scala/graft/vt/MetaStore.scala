package graft.vt

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The atomic-metadata contract the versioning layer needs from its storage —
  * stated in OBJECT-STORE terms so the crash-safety guarantees (ChaosSpec /
  * PropertySpec) transfer beyond a POSIX filesystem. The reference deploys its
  * versioning on S3-compatible MinIO through lakeFS
  * (`docker-compose.yml:92-102`, `README.md:159-176`); S3 has NO atomic
  * rename, so a layer whose correctness is phrased in terms of `rename(2)`
  * cannot claim those guarantees there. This trait is the translation: every
  * requirement below is satisfiable by a modern object store.
  *
  * Required primitives and their object-store realizations:
  *
  *  - [[putIfAbsent]] — atomic create-if-not-exists WITH content. This is the
  *    ONLY conditional primitive the whole versioning layer needs (the
  *    version-slot CAS): S3 conditional PUT (`If-None-Match: *`, GA since
  *    2024), GCS `x-goog-if-generation-match: 0`, Azure Blob
  *    `If-None-Match: *`, HDFS atomic `create(overwrite=false)`. On a POSIX
  *    filesystem: write a temp file, then `link(2)` it to the target — hard
  *    linking is atomic and fails if the target exists, so the claim and its
  *    content land as one indivisible operation.
  *  - [[put]] — full-object overwrite where readers see the OLD or the NEW
  *    content, never a torn mix. Every object store's plain PUT already
  *    behaves this way (objects are immutable; a PUT replaces the whole
  *    object); on POSIX it is tmp-file + `ATOMIC_MOVE` rename.
  *  - [[read]] / [[exists]] / [[delete]] / [[lastModified]] — plain object
  *    GET / HEAD / DELETE.
  *  - [[list]] — prefix listing (one paginated LIST call). Listings may be
  *    eventually consistent on some stores; the layer only uses them for
  *    vacuum/sweep (conservative: an unlisted fresh slot is simply skipped
  *    until the next sweep) and for branch enumeration, never to decide a
  *    commit's winner — that is always the [[putIfAbsent]] CAS.
  *
  * Keys are [[java.nio.file.Path]]s (the local layout's natural key); an
  * object-store impl treats them as opaque key strings under a bucket prefix.
  * The DATA plane (immutable parquet under `data/`) is NOT behind this trait:
  * Spark's own committers handle bulk data on any Hadoop-compatible store;
  * this trait carries only the small-metadata control plane (refs, commit
  * JSON, version-slot locks, staged markers) where atomicity decides
  * correctness.
  */
trait MetaStore {

  /** Atomically create `key` with `content` iff it does not exist.
    * @return true if this call created it; false if `key` already existed
    *         (the CAS loss case — the caller must re-read and retry). */
  def putIfAbsent(key: Path, content: String): Boolean

  /** Overwrite `key` with `content`; concurrent readers observe the old or
    * the new content in full, never a torn prefix. */
  def put(key: Path, content: String): Unit

  /** Read `key`'s full content; throws if absent. */
  def read(key: Path): String

  def exists(key: Path): Boolean

  /** Delete `key` if present; returns whether anything was deleted. */
  def delete(key: Path): Boolean

  /** Immediate children under prefix `dir` (empty when the prefix is empty or
    * absent — object stores have no "missing directory" state). */
  def list(dir: Path): Vector[Path]

  /** Last-modified epoch millis of `key` (object stores report this on every
    * object; used only for the stale-slot AGE gate, which tolerates clock
    * slop far smaller than the 1 h staleness threshold). */
  def lastModified(key: Path): Long

  /** Prepare a prefix for writes — `mkdir -p` on a filesystem, a no-op on a
    * keyed object store (prefixes need no creation). */
  def ensurePrefix(dir: Path): Unit
}

/** POSIX-filesystem [[MetaStore]]: the local/NFS/HDFS-mount realization.
  * `putIfAbsent` is tmp-write + `link(2)` (atomic, content-complete CAS;
  * falls back to `O_CREAT|O_EXCL` + write on filesystems without hard links,
  * where a crash between the two steps leaves an empty slot — exactly the
  * crashed-claim state the stale-slot sweep already reclaims). */
object LocalFsMetaStore extends MetaStore {

  def putIfAbsent(key: Path, content: String): Boolean = {
    ensurePrefix(key.getParent)
    val tmp = Files.createTempFile(key.getParent, "." + key.getFileName.toString, ".cas")
    try {
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(key, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        // No hard links: the JDK surfaces unsupported link(2) either as
        // UnsupportedOperationException or (on real mounts — FUSE, SMB,
        // vboxsf, where the syscall returns EPERM/EOPNOTSUPP) as a plain
        // FileSystemException. Fall back to atomic create-empty + content —
        // the pre-r13 two-step shape, still CAS-correct. If the key already
        // exists the CAS is simply lost; any other cause resurfaces from
        // createFile below.
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          if (Files.exists(key)) false
          else
            try {
              val p = Files.createFile(key)
              if (content.nonEmpty) Files.write(p, content.getBytes(StandardCharsets.UTF_8))
              true
            } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    } finally Files.deleteIfExists(tmp)
  }

  def put(key: Path, content: String): Unit = {
    ensurePrefix(key.getParent)
    val tmp = Files.createTempFile(key.getParent, "." + key.getFileName.toString, ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, key, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read(key: Path): String =
    new String(Files.readAllBytes(key), StandardCharsets.UTF_8)

  def exists(key: Path): Boolean = Files.exists(key)

  def delete(key: Path): Boolean = Files.deleteIfExists(key)

  def list(dir: Path): Vector[Path] = {
    if (!Files.isDirectory(dir)) return Vector.empty
    val st = Files.list(dir)
    try st.iterator().asScala.toVector finally st.close()
  }

  def lastModified(key: Path): Long = Files.getLastModifiedTime(key).toMillis

  def ensurePrefix(dir: Path): Unit = { Files.createDirectories(dir); () }
}

/** Pure in-memory [[MetaStore]] — proves the versioning layer's control plane
  * runs entirely through the trait (a spec runs a whole table lifecycle on it
  * and asserts NO metadata ever touches the filesystem), and doubles as the
  * model of a consistent object store for contention tests. `putIfAbsent`
  * rides on [[java.util.concurrent.ConcurrentHashMap.putIfAbsent]] — the same
  * linearizable compare-and-set an object store's conditional PUT provides. */
final class InMemoryMetaStore extends MetaStore {
  private val objects = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  private def k(p: Path): String = p.toAbsolutePath.normalize.toString

  def putIfAbsent(key: Path, content: String): Boolean =
    objects.putIfAbsent(k(key), (content, System.currentTimeMillis())) == null

  def put(key: Path, content: String): Unit = {
    objects.put(k(key), (content, System.currentTimeMillis())); ()
  }

  def read(key: Path): String = {
    val v = objects.get(k(key))
    if (v == null) throw new java.nio.file.NoSuchFileException(k(key))
    v._1
  }

  def exists(key: Path): Boolean = objects.containsKey(k(key))

  def delete(key: Path): Boolean = objects.remove(k(key)) != null

  def list(dir: Path): Vector[Path] = {
    val prefix = k(dir) + "/"
    objects.keySet().asScala.iterator
      .filter(_.startsWith(prefix))
      .map(s => java.nio.file.Paths.get(prefix + s.stripPrefix(prefix).takeWhile(_ != '/')))
      .toVector.distinct.sortBy(_.toString)
  }

  def lastModified(key: Path): Long = {
    val v = objects.get(k(key))
    if (v == null) throw new java.nio.file.NoSuchFileException(k(key))
    v._2
  }

  def ensurePrefix(dir: Path): Unit = ()

  /** Test hook: age an object backwards so stale-slot sweeps can be exercised
    * without real waiting. */
  def backdate(key: Path, toMs: Long): Unit = {
    val cur = objects.get(k(key))
    if (cur != null) objects.put(k(key), (cur._1, toMs))
    ()
  }

  def size: Int = objects.size
}
