package graft.vt

import java.nio.file.Path

/** Shared branch-protection mechanics for [[VersionedTable]] and [[Repo]]
  * (lakeFS protection rules are repo configuration; the table layer mirrors
  * them).
  *
  * The rule set is one logical object with REAL compare-and-set edits — a
  * [[CasStringSet]] at `protected/rules` — so two admins adding different
  * rules concurrently BOTH land (the pre-r15 single-object read-modify-put
  * was last-writer-wins: one rule silently vanished, leaving a branch its
  * admin believed protected actually unprotected). Enforcement reads are
  * single-key (head hint + exists probes + one generation read): no listing
  * is ever consulted to admit or reject a commit. Patterns must not contain
  * newlines (the set is newline-joined per generation).
  */
private[vt] object ProtectionRules {

  private def rules(store: MetaStore, dir: Path) = new CasStringSet(store, dir, "rules")

  def add(store: MetaStore, dir: Path, pattern: String): Unit = {
    require(pattern.nonEmpty && !pattern.contains('\n'), s"bad protection pattern: $pattern")
    rules(store, dir).add(pattern)
    ()
  }

  /** Remove one rule (exact pattern, not a matching branch name). */
  def remove(store: MetaStore, dir: Path, pattern: String): Boolean =
    rules(store, dir).remove(pattern)

  def all(store: MetaStore, dir: Path): Seq[String] = rules(store, dir).all

  def isProtected(store: MetaStore, dir: Path, branch: String): Boolean =
    all(store, dir).exists(p => VersionedTable.globMatches(p, branch))

  /** Throws unless `branch` accepts direct mutation. */
  def guard(store: MetaStore, dir: Path, branch: String): Unit =
    if (isProtected(store, dir, branch)) throw new IllegalStateException(
      s"branch '$branch' is protected: direct changes are rejected; " +
        "merge from a side branch instead (lakeFS branch-protection semantics)")
}
