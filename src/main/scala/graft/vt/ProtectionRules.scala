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
  *
  * BACK-COMPAT: the pre-CAS format stored the whole set as ONE plain object
  * at `protected/rules` — a distinct key from the generation chain
  * (`rules.gen<N>`/`rules.head`), so a table protected under the old format
  * would silently read as UNPROTECTED if only the chain were consulted.
  * Every read unions the legacy object in, and the first CAS edit folds its
  * contents into generation 0 before applying — the same
  * listing-union-the-index posture the branch index takes for pre-index
  * tables. */
private[vt] object ProtectionRules {

  private def rules(store: MetaStore, dir: Path) = new CasStringSet(store, dir, "rules")

  /** Rules persisted by the pre-CAS single-object format, if any. Read
    * without an exists-then-read window: a concurrent first edit's
    * [[migrate]] deletes the object, and an in-flight enforcement read
    * racing that delete must see "absent" (the content is already folded
    * into an immutable generation), never crash. */
  private def legacy(store: MetaStore, dir: Path): Seq[String] =
    try store.read(dir.resolve("rules")).split('\n').toSeq.filter(_.nonEmpty)
    catch {
      // ONLY absence (every MetaStore's read signals it with
      // NoSuchFileException) — any other failure must propagate: enforcement
      // that swallows a transient store error fails OPEN on a branch the
      // admin believes protected
      case _: java.nio.file.NoSuchFileException => Seq.empty
    }

  /** Fold the legacy object into the chain, then retire it. Runs before any
    * EDIT (reads union instead): folding first means a crash at any point
    * leaves the legacy rules readable — either still in the object or
    * already in an immutable generation — never dropped. The legacy content
    * is RE-READ inside the CAS closure: a rival that already folded,
    * retired the object, AND removed one of its rules forces this updater
    * to retry on the lost claim, at which point the re-read sees no legacy
    * object and the update becomes a no-op — a stale capture taken before
    * the rival's edits would CAS the removed rule straight back in.
    * Idempotent (re-folding dedupes). */
  private def migrate(store: MetaStore, dir: Path): Unit =
    if (legacy(store, dir).nonEmpty) {
      rules(store, dir).update(cur => (cur ++ legacy(store, dir)).distinct.sorted)
      store.delete(dir.resolve("rules"))
      ()
    }

  def add(store: MetaStore, dir: Path, pattern: String): Unit = {
    require(pattern.nonEmpty && !pattern.contains('\n'), s"bad protection pattern: $pattern")
    migrate(store, dir)
    rules(store, dir).add(pattern)
    ()
  }

  /** Remove one rule (exact pattern, not a matching branch name). */
  def remove(store: MetaStore, dir: Path, pattern: String): Boolean = {
    migrate(store, dir)
    rules(store, dir).remove(pattern)
  }

  def all(store: MetaStore, dir: Path): Seq[String] =
    (rules(store, dir).all ++ legacy(store, dir)).distinct.sorted

  def isProtected(store: MetaStore, dir: Path, branch: String): Boolean =
    all(store, dir).exists(p => VersionedTable.globMatches(p, branch))

  /** Throws unless `branch` accepts direct mutation. */
  def guard(store: MetaStore, dir: Path, branch: String): Unit =
    if (isProtected(store, dir, branch)) throw new IllegalStateException(
      s"branch '$branch' is protected: direct changes are rejected; " +
        "merge from a side branch instead (lakeFS branch-protection semantics)")
}
