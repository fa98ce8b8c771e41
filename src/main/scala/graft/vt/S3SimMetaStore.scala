package graft.vt

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Object-store [[MetaStore]] with S3 semantics, simulated on local disk so
  * REAL kill-9 processes can share it (ChaosSpec) — the reference's actual
  * deployment plane: lakeFS keeps its metadata on S3-compatible MinIO
  * (`docker-compose.yml:92-102`), where there is NO atomic rename and NO
  * directory, only:
  *
  *  - conditional PUT (`If-None-Match: *`) — create-if-absent with content;
  *  - plain PUT — atomic whole-object replace;
  *  - GET / HEAD / DELETE per object;
  *  - paginated prefix LIST over one FLAT keyspace.
  *
  * This simulator is deliberately RENAME-FREE: every object mutation is a
  * create-exclusive of a new immutable file (`link(2)`-backed, the same
  * content-complete CAS [[LocalFsMetaStore.putIfAbsent]] uses) — never a
  * `rename(2)`/`ATOMIC_MOVE`. Plain PUT, which S3 provides natively as an
  * atomic replace, is realized as a GENERATION CHAIN: `put` creates
  * `<key>.g<N+1>` exclusively and then prunes older generations
  * (best-effort); `read`/`lastModified` resolve the newest generation,
  * retrying once if a concurrent prune deletes it mid-read — readers
  * observe the old or the new content in full, never a torn mix. So the
  * whole control plane runs on exactly the primitives a conditional-PUT
  * object store offers, and the VersionedTableSpec/ChaosSpec matrix run
  * against this backend carries the crash-safety claims to that topology.
  *
  * Keyspace: FLAT. Each object lives directly in `bucketDir` under
  * `URLEncoder(absolute key)` + generation suffix — no directories are ever
  * created for key prefixes, [[ensurePrefix]] is a no-op, and [[list]] is a
  * client-side prefix filter over the bucket that synthesizes immediate
  * children (what S3 LIST with `delimiter=/` returns). A "directory" never
  * exists or not-exists, exactly the object-store model the trait documents.
  *
  * [[putIfAbsent]] approximates conditional PUT as check-then-create-
  * exclusive: atomic against rival `putIfAbsent` calls on the same key (the
  * exclusive create arbitrates), unguarded only against a concurrent plain
  * `put` of the SAME key — a combination the versioning layer never issues
  * (CAS keys — version slots, cursor markers, tags — are create-once /
  * delete-only; overwritten keys — refs, checkpoints, rules — are never
  * CAS'd). The data plane (immutable parquet under `data/`) stays on the
  * real filesystem, as the trait prescribes.
  *
  * EVENTUALLY-CONSISTENT LISTINGS (`listDelayMs` > 0): classic-S3 LIST lag
  * injected for the chaos matrix — a NEWLY CREATED key (still at generation
  * 0) stays invisible to [[list]] until it is `listDelayMs` old, while
  * single-key GET/HEAD ([[read]]/[[exists]]) remain strongly consistent and
  * a key that has ever been OVERWRITTEN (generation > 0) is always listed
  * (LIST lag hides new objects; it does not un-list live, long-existing
  * ones — a constantly-advanced branch ref never vanishes from LIST). The
  * versioning layer's claim under this injection — pinned by MetaStoreSpec
  * and the ChaosSpec kill-9 run on a delayed store — is that EC listings
  * only DELAY repairs that consume them (stale-slot sweeps pick a young
  * wedged slot up one cycle later), never corrupt: no commit/merge decision
  * ever reads a listing, and branch enumeration — which PRICES VACUUM
  * RETENTION — reads the single-key branch index
  * ([[VersionedTable.branches]]) in union with the listing, so a fresh
  * unlisted branch's files are never swept.
  */
final class S3SimMetaStore(val bucketDir: Path,
                           val listDelayMs: Long = 0) extends MetaStore {

  Files.createDirectories(bucketDir)

  private val GenRe = """^(.+)\.g(\d{8,})$""".r

  private def enc(key: Path): String =
    URLEncoder.encode(key.toAbsolutePath.normalize.toString, StandardCharsets.UTF_8)
  /** Decoded key of a bucket filename, None for non-objects (tmp uploads). */
  private def dec(name: String): Option[String] = name match {
    case GenRe(base, _) => Some(URLDecoder.decode(base, StandardCharsets.UTF_8))
    case _ => None
  }
  private def genOf(name: String): Long =
    name match { case GenRe(_, d) => d.toLong case _ => -1L }

  /** All generation files of `key`, any order. */
  private def gens(key: Path): Vector[Path] = {
    val e = enc(key)
    val st = Files.list(bucketDir)
    try st.iterator().asScala.filter { p =>
      p.getFileName.toString match {
        case GenRe(base, _) => base == e
        case _ => false
      }
    }.toVector
    finally st.close()
  }

  private def newest(key: Path): Option[Path] =
    gens(key).maxByOption(p => genOf(p.getFileName.toString))

  /** Create-exclusive with content: tmp + hard link, the content-complete
    * CAS — the file appears with its full content or not at all. */
  private def createExclusive(target: Path, content: String): Boolean = {
    val tmp = Files.createTempFile(bucketDir, ".up_", ".tmp")
    try {
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  def putIfAbsent(key: Path, content: String): Boolean =
    if (gens(key).nonEmpty) false
    else createExclusive(bucketDir.resolve(enc(key) + ".g00000000"), content)

  def put(key: Path, content: String): Unit = {
    var n = newest(key).map(p => genOf(p.getFileName.toString)).getOrElse(-1L) + 1
    while (!createExclusive(bucketDir.resolve(enc(key) + f".g$n%08d"), content))
      n += 1 // a rival PUT took this generation: ours lands as a newer one
    // prune superseded generations (best-effort: a missed prune is retried
    // by the next put; readers resolve the max generation regardless)
    gens(key).filter(p => genOf(p.getFileName.toString) < n)
      .foreach(Files.deleteIfExists(_))
  }

  @annotation.tailrec
  def read(key: Path): String = newest(key) match {
    case None => throw new java.nio.file.NoSuchFileException(key.toString)
    case Some(p) =>
      try new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      catch { case _: java.nio.file.NoSuchFileException => read(key) } // pruned mid-read
  }

  def exists(key: Path): Boolean = gens(key).nonEmpty

  def delete(key: Path): Boolean =
    gens(key).map(Files.deleteIfExists(_)).exists(identity)

  def list(dir: Path): Vector[Path] = {
    val prefix = dir.toAbsolutePath.normalize.toString + "/"
    val st = Files.list(bucketDir)
    val entries = // (decoded key, generation, bucket file)
      try st.iterator().asScala.flatMap { p =>
        val name = p.getFileName.toString
        dec(name).map(k => (k, genOf(name), p))
      }.toVector
      finally st.close()
    val cutoff = System.currentTimeMillis() - listDelayMs
    val keys = entries.groupBy(_._1).collect {
      case (k, gs) if listDelayMs == 0 ||
        gs.exists(_._2 > 0) || // ever overwritten → long-existing, always listed
        gs.exists { case (_, _, p) => // create-once: listed only once aged
          (try Files.getLastModifiedTime(p).toMillis
           catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }) <= cutoff
        } => k
    }.toVector
    keys.filter(_.startsWith(prefix))
      .map(k => Paths.get(prefix + k.stripPrefix(prefix).takeWhile(_ != '/')))
      .distinct.sortBy(_.toString)
  }

  @annotation.tailrec
  def lastModified(key: Path): Long = newest(key) match {
    case None => throw new java.nio.file.NoSuchFileException(key.toString)
    case Some(p) =>
      try Files.getLastModifiedTime(p).toMillis
      catch { case _: java.nio.file.NoSuchFileException => lastModified(key) }
  }

  def ensurePrefix(dir: Path): Unit = () // a flat keyspace has no directories

  /** Test hook (mirrors [[InMemoryMetaStore.backdate]]): age an object so
    * stale-slot sweeps can run without real waiting. */
  def backdate(key: Path, toMs: Long): Unit =
    newest(key).foreach(p =>
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(toMs)))
}

object S3SimMetaStore {
  /** The bucket shared by every process opening the table at `root`. Kept
    * INSIDE the root (data walks are confined to `data/`, so bucket objects
    * are never mistaken for parquet) so scratch-dir cleanup removes table
    * and bucket together. */
  def forTable(root: String): S3SimMetaStore = forTable(root, 0L)

  /** Same bucket with eventually-consistent listings (see class doc). */
  def forTable(root: String, listDelayMs: Long): S3SimMetaStore =
    new S3SimMetaStore(
      Paths.get(root).toAbsolutePath.normalize.resolve("s3bucket"), listDelayMs)
}
