package graft.vt

import java.nio.file.Path

/** Shared branch-protection mechanics for [[VersionedTable]] and [[Repo]]
  * (lakeFS protection rules are repo configuration; the table layer mirrors
  * them).
  *
  * The rule SET is one logical object, stored as a chain of IMMUTABLE
  * GENERATIONS: `protected/rules.gen<N>` holds the complete newline-joined
  * pattern set as of edit N, claimed with [[MetaStore.putIfAbsent]] — the
  * store's one conditional primitive. An edit is therefore a real
  * compare-and-set: read generation N, compute the new set, claim N+1; a
  * rival edit that claimed N+1 first makes the claim fail, and the loser
  * RETRIES ON TOP OF THE WINNER'S SET — two processes adding different rules
  * concurrently both land (the pre-r15 single-object read-modify-put was
  * last-writer-wins: one admin's rule silently vanished, leaving a branch
  * they believed protected actually unprotected).
  *
  * `protected/rules.head` is a plain-put HINT naming the newest known
  * generation. Readers start at the hint and walk FORWARD with single-key
  * [[MetaStore.exists]] probes (generations are create-once, so the first
  * absent key is exact) — stale hints cost a probe or two, never a wrong
  * answer, and NO LISTING is ever consulted to admit or reject a commit
  * (listings may be eventually consistent; single-key reads are not).
  * Superseded generations are never deleted: edits are admin-rare, each is
  * bytes, and an immutable history is what makes the forward walk sound.
  */
private[vt] object ProtectionRules {

  private def genKey(dir: Path, g: Long): Path = dir.resolve(f"rules.gen$g%08d")
  private def headKey(dir: Path): Path = dir.resolve("rules.head")

  /** Newest generation number (−1 when no rules were ever written): head
    * hint, then forward exists-probes past any concurrent edits the hint
    * missed. */
  private def currentGen(store: MetaStore, dir: Path): Long = {
    var g =
      if (store.exists(headKey(dir)))
        try store.read(headKey(dir)).trim.toLong catch { case _: Exception => -1L }
      else -1L
    while (store.exists(genKey(dir, g + 1))) g += 1
    g
  }

  private def parse(content: String): Seq[String] =
    content.split('\n').toSeq.filter(_.nonEmpty)

  /** CAS update loop: apply `f` to the current set and claim the next
    * generation; on a lost claim, rebase on the winner's set and retry.
    * Returns false (writing nothing) when `f` leaves the set unchanged. */
  private def update(store: MetaStore, dir: Path)(f: Seq[String] => Seq[String]): Boolean = {
    store.ensurePrefix(dir)
    var g = currentGen(store, dir)
    while (true) {
      val cur = if (g < 0) Seq.empty[String] else parse(store.read(genKey(dir, g)))
      val next = f(cur)
      if (next == cur) return false
      if (store.putIfAbsent(genKey(dir, g + 1), next.mkString("\n"))) {
        store.put(headKey(dir), (g + 1).toString) // hint only; staleness is safe
        return true
      }
      g += 1 // lost the CAS — the winner's generation is the new base
    }
    false // unreachable
  }

  def add(store: MetaStore, dir: Path, pattern: String): Unit = {
    require(pattern.nonEmpty && !pattern.contains('\n'), s"bad protection pattern: $pattern")
    update(store, dir)(cur => (cur :+ pattern).distinct.sorted)
    ()
  }

  /** Remove one rule (exact pattern, not a matching branch name). */
  def remove(store: MetaStore, dir: Path, pattern: String): Boolean =
    update(store, dir)(_.filterNot(_ == pattern))

  def all(store: MetaStore, dir: Path): Seq[String] = {
    val g = currentGen(store, dir)
    if (g < 0) Seq.empty else parse(store.read(genKey(dir, g))).sorted
  }

  def isProtected(store: MetaStore, dir: Path, branch: String): Boolean =
    all(store, dir).exists(p => VersionedTable.globMatches(p, branch))

  /** Throws unless `branch` accepts direct mutation. */
  def guard(store: MetaStore, dir: Path, branch: String): Unit =
    if (isProtected(store, dir, branch)) throw new IllegalStateException(
      s"branch '$branch' is protected: direct changes are rejected; " +
        "merge from a side branch instead (lakeFS branch-protection semantics)")
}
