package graft.vt

import java.nio.file.Path

/** Shared branch-protection mechanics for [[VersionedTable]] and [[Repo]]
  * (lakeFS protection rules are repo configuration; the table layer mirrors
  * them).
  *
  * All rules live in ONE metadata object (`protected/rules`, newline-joined
  * glob patterns) rather than one object per rule, for two reasons both
  * rooted in the [[MetaStore]] contract:
  *  - enforcement is a SINGLE atomic-object read per guarded operation — no
  *    listing is ever consulted to admit or reject a commit (listings may be
  *    eventually consistent; [[MetaStore.read]] of a single key is not), and
  *    no list-then-read window exists for a concurrent rule removal to crash
  *    an unrelated write;
  *  - a rule change is one atomic full-object put: readers see the old rule
  *    set or the new one, never a partial set.
  *
  * Rule EDITS are admin-rare; concurrent edits from different processes are
  * last-writer-wins on the whole set (lakeFS protection is likewise repo
  * config, not a transactional object). Within one JVM, callers hold the
  * table/repo lock.
  */
private[vt] object ProtectionRules {

  private def rulesKey(dir: Path): Path = dir.resolve("rules")

  def add(store: MetaStore, dir: Path, pattern: String): Unit = {
    require(pattern.nonEmpty && !pattern.contains('\n'), s"bad protection pattern: $pattern")
    store.ensurePrefix(dir)
    val next = (all(store, dir) :+ pattern).distinct.sorted
    store.put(rulesKey(dir), next.mkString("\n"))
  }

  /** Remove one rule (exact pattern, not a matching branch name). */
  def remove(store: MetaStore, dir: Path, pattern: String): Boolean = {
    val cur = all(store, dir)
    val next = cur.filterNot(_ == pattern)
    if (next.size == cur.size) false
    else {
      if (next.isEmpty) store.delete(rulesKey(dir))
      else store.put(rulesKey(dir), next.mkString("\n"))
      true
    }
  }

  def all(store: MetaStore, dir: Path): Seq[String] = {
    val k = rulesKey(dir)
    if (!store.exists(k)) Seq.empty
    else store.read(k).split('\n').toSeq.filter(_.nonEmpty).sorted
  }

  def isProtected(store: MetaStore, dir: Path, branch: String): Boolean =
    all(store, dir).exists(p => VersionedTable.globMatches(p, branch))

  /** Throws unless `branch` accepts direct mutation. */
  def guard(store: MetaStore, dir: Path, branch: String): Unit =
    if (isProtected(store, dir, branch)) throw new IllegalStateException(
      s"branch '$branch' is protected: direct changes are rejected; " +
        "merge from a side branch instead (lakeFS branch-protection semantics)")
}
