package graft.vt

import java.nio.file.Path

/** Shared tag mechanics for [[VersionedTable]] (table scope) and [[Repo]]
  * (lakeFS-native repo scope): a tag is one immutable metadata object
  * `tags/<name>` whose content is the pinned commit id. Kept in one place so
  * the invariants — name validation (a slashed name would corrupt the flat
  * `tags/` listing and wedge every subsequent `tags()`/vacuum), put-if-absent
  * creation (two racing creates resolve atomically on any conforming
  * [[MetaStore]]), immutability — cannot drift between the two scopes. */
private[vt] object TagStore {

  /** Reject names that cannot serve as a single flat object key. */
  def validateName(name: String): Unit =
    require(name.nonEmpty && !name.contains('/') && !name.contains('\\'),
      s"bad tag name: $name")

  /** Atomically create `name` → `commitId`; throws if the tag exists. */
  def create(store: MetaStore, tagsDir: Path, name: String, commitId: String): Unit = {
    validateName(name)
    store.ensurePrefix(tagsDir)
    if (!store.putIfAbsent(tagsDir.resolve(name), commitId))
      throw new IllegalArgumentException(s"tag exists: $name (tags are immutable)")
  }

  /** (tag name, commit id) pairs, name-sorted. */
  def all(store: MetaStore, tagsDir: Path): Seq[(String, String)] =
    store.list(tagsDir).map(p => p.getFileName.toString -> store.read(p).trim).sortBy(_._1)

  def commitIdOf(store: MetaStore, tagsDir: Path, name: String): String = {
    val p = tagsDir.resolve(name)
    require(store.exists(p), s"no such tag: $name")
    store.read(p).trim
  }

  /** Deleting a missing tag is a no-op returning false. */
  def delete(store: MetaStore, tagsDir: Path, name: String): Boolean =
    store.delete(tagsDir.resolve(name))
}

