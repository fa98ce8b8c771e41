package graft.vt

import java.nio.file.{Files, Path}

/** Bloom index SIDECAR codec (r19). Per-file bloom bitsets used to live
  * inline in the commit JSON (`Commit.bloomStats`, base64) — ~2.7 KB per
  * file per column, which turns a 10⁶-file commit record into gigabytes
  * parsed on every `open()`. Delta keeps bloom indexes in sidecar index
  * files for exactly this reason; so does this engine now: each write
  * that computes blooms emits ONE `.bloom` sidecar under the commit's
  * data directory holding `(file, column, bitset)` entries for the files
  * it created, the commit JSON records only the sidecar PATHS
  * ([[Commit.bloomFiles]]) plus the indexed column names
  * ([[Commit.bloomCols]]), and the sidecar is loaded lazily on the first
  * bloom probe ([[VersionedTable.bloomLookup]]) through a bounded
  * process-wide cache. Sidecars are data-plane artifacts: vacuum retains
  * them through [[Commit.allFiles]] and sweeps orphans like any data
  * file.
  *
  * Format (little machinery on purpose — the file is write-once and
  * driver-read): int32 magic "GBLM", int32 version (1), int32 entry
  * count, then per entry `writeUTF(file) writeUTF(col) int32 len bytes`.
  */
object BloomIndex {

  private val Magic = 0x47424c4d // "GBLM"

  def write(path: Path, entries: Seq[(String, String, Array[Byte])]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(1)
    out.writeInt(entries.size)
    entries.foreach { case (file, col, bits) =>
      out.writeUTF(file); out.writeUTF(col)
      out.writeInt(bits.length); out.write(bits)
    }
    out.flush()
    Files.write(path, bos.toByteArray)
  }

  def read(path: Path): Vector[((String, String), Array[Byte])] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(Files.readAllBytes(path)))
    require(in.readInt() == Magic, s"$path is not a graft bloom sidecar")
    val ver = in.readInt()
    require(ver == 1, s"unsupported bloom sidecar version $ver in $path")
    val n = in.readInt()
    Vector.fill(n) {
      val file = in.readUTF(); val col = in.readUTF()
      val bits = new Array[Byte](in.readInt())
      in.readFully(bits)
      ((file, col), bits)
    }
  }

  // Bounded process-wide cache keyed by absolute sidecar path: sidecars are
  // immutable once published, and the same sidecar is referenced by every
  // descendant commit, so scans across versions share one parsed copy.
  // LRU-bounded so a driver hosting many tables holds at most
  // `256 × (batch files × cols × 2 KB)` of bitsets.
  private val cache = new BoundedCache[String, Map[(String, String), Array[Byte]]](256)

  def cached(path: Path): Map[(String, String), Array[Byte]] =
    cache.get(path.toAbsolutePath.toString)(read(path).toMap)
}
