package graft.vt

import java.nio.file.Path

/** A small set of strings stored as ONE logical object with REAL
  * compare-and-set edits, on nothing but the [[MetaStore]] primitives — the
  * mechanism behind branch-protection rules ([[ProtectionRules]]) and the
  * branch index.
  *
  * Layout: a chain of IMMUTABLE GENERATIONS `<name>.gen<N>`, each holding
  * the complete newline-joined set as of edit N, claimed with
  * [[MetaStore.putIfAbsent]] — the store's one conditional primitive. An
  * edit reads generation N, computes the new set, and claims N+1; a rival
  * edit that claimed N+1 first makes the claim fail and the loser RETRIES
  * ON TOP OF THE WINNER'S SET, so concurrent edits from different processes
  * all land (a plain read-modify-put would be last-writer-wins and silently
  * drop one).
  *
  * `<name>.head` is a plain-put HINT naming the newest known generation.
  * Readers start at the hint and walk FORWARD with single-key
  * [[MetaStore.exists]] probes (generations are create-once, so the first
  * absent key is exact) — a stale hint costs a probe or two, never a wrong
  * answer, and NO LISTING is ever consulted (listings may be eventually
  * consistent; single-key reads are not). Superseded generations are never
  * deleted: edits are rare, each is bytes, and the immutable history is
  * what makes the forward walk sound.
  */
private[vt] final class CasStringSet(store: MetaStore, dir: Path, name: String) {

  private def genKey(g: Long): Path = dir.resolve(f"$name%s.gen$g%08d")
  private def headKey: Path = dir.resolve(s"$name.head")

  /** Newest generation number (−1 when never written). */
  private def currentGen: Long = {
    var g =
      if (store.exists(headKey))
        try store.read(headKey).trim.toLong catch { case _: Exception => -1L }
      else -1L
    while (store.exists(genKey(g + 1))) g += 1
    g
  }

  private def parse(content: String): Seq[String] =
    content.split('\n').toSeq.filter(_.nonEmpty)

  /** CAS update loop; returns false (writing nothing) when `f` leaves the
    * set unchanged. */
  def update(f: Seq[String] => Seq[String]): Boolean = {
    store.ensurePrefix(dir)
    var g = currentGen
    while (true) {
      val cur = if (g < 0) Seq.empty[String] else parse(store.read(genKey(g)))
      val next = f(cur)
      if (next == cur) return false
      if (store.putIfAbsent(genKey(g + 1), next.mkString("\n"))) {
        store.put(headKey, (g + 1).toString) // hint only; staleness is safe
        return true
      }
      g += 1 // lost the CAS — the winner's generation is the new base
    }
    false // unreachable
  }

  def add(value: String): Boolean = {
    require(value.nonEmpty && !value.contains('\n'), s"bad set element: $value")
    update(cur => (cur :+ value).distinct.sorted)
  }

  def remove(value: String): Boolean = update(_.filterNot(_ == value))

  def all: Seq[String] = {
    val g = currentGen
    if (g < 0) Seq.empty else parse(store.read(genKey(g))).sorted
  }
}
