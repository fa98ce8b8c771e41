package graft

import java.nio.file.{Files, Paths}

import graft.vt.{CommitLog, InMemoryMetaStore, LocalFsMetaStore, MetaStore, Repo, S3SimMetaStore, VersionedTable}

/** The pluggable atomic-commit primitive (r12 verdict #1): the versioning
  * layer's crash-safety story is stated against [[MetaStore]]'s two atomic
  * operations (put-if-absent, full-object put), so the guarantees transfer to
  * object stores with conditional PUT. These specs pin:
  *  - the local-FS CAS is content-complete and loser-safe;
  *  - a whole table/repo lifecycle runs on a NON-filesystem store with zero
  *    control-plane files on disk (no metadata op escapes the interface);
  *  - simulated contention (a rival claiming every slot first) surfaces as
  *    the documented ConcurrentModificationException and a retry lands;
  *  - dry-run vacuum equals the subsequent real vacuum even in a
  *    crashed-writer state (r12 advice: plan-mode slot sweep).
  */
class MetaStoreSpec extends SparkSpec {
  import spark.implicits._

  private def df(xs: Int*) = xs.toDF("x")

  test("LocalFsMetaStore.putIfAbsent is a content-complete CAS: one winner, content intact") {
    val dir = Paths.get(Tables.scratch("test_cas"))
    Files.createDirectories(dir)
    val key = dir.resolve("slot")
    assert(LocalFsMetaStore.putIfAbsent(key, "winner-payload"))
    assert(!LocalFsMetaStore.putIfAbsent(key, "loser-payload"))
    assert(LocalFsMetaStore.read(key) === "winner-payload")
    // no temp residue: the tmp file of both attempts must be gone
    assert(LocalFsMetaStore.list(dir).map(_.getFileName.toString) === Vector("slot"))
  }

  test("full table lifecycle on an in-memory store leaves zero metadata on disk") {
    val store = new InMemoryMetaStore
    val rootStr = Tables.scratch("test_memstore")
    val vt = VersionedTable.create(rootStr, store)
    vt.write(df(1, 2, 3), "main", "v0")
    vt.write(df(4, 5), "main", "v1 append", mode = "append")
    vt.createBranch("dev", "main")
    vt.write(df(9), "dev", "dev overwrite")
    vt.write(df(6), "main", "main append", mode = "append")
    intercept[IllegalStateException](vt.merge("dev", "main")) // overwrite vs append conflict
    vt.revert("main", 0)
    assert(vt.read(spark, "main").as[Int].collect().sorted === Array(1, 2, 3))
    assert(vt.readVersion(spark, "main", 1).as[Int].collect().sorted === Array(1, 2, 3, 4, 5))
    assert(vt.branches === Seq("dev", "main"))
    assert(vt.vacuum(retainLast = 10) === 0)
    // the control plane never touched the filesystem: only data/ exists
    val root = Paths.get(rootStr)
    assert(!Files.exists(root.resolve("commits")), "commit JSON leaked to disk")
    assert(!Files.exists(root.resolve("refs")), "refs leaked to disk")
    assert(!Files.exists(root.resolve("locks")), "slots leaked to disk")
    assert(Files.isDirectory(root.resolve("data")), "data plane must stay on the filesystem")
    // reopening through the same store sees the same history
    val vt2 = VersionedTable.open(rootStr, store)
    assert(vt2.lineage("main").map(_.version) === List(3, 2, 1, 0))
  }

  test("repo lifecycle (atomic multi-table commit + merge) runs on the in-memory store") {
    val store = new InMemoryMetaStore
    val rootStr = Tables.scratch("test_memrepo")
    val repo = Repo.create(rootStr, store)
    repo.stageWrite(df(1), "main", "a")
    repo.stageWrite(df(2), "main", "b")
    repo.commit("main", "v0 both tables")
    repo.createBranch("dev", "main")
    repo.stageWrite(df(3), "dev", "a")
    repo.commit("dev", "dev changes a")
    repo.merge("dev", "main") // fast-forward across tables
    assert(repo.readTable(spark, "main", "a").as[Int].collect() === Array(3))
    assert(repo.readTable(spark, "main", "b").as[Int].collect() === Array(2))
    val root = Paths.get(rootStr)
    assert(!Files.exists(root.resolve("commits")) && !Files.exists(root.resolve("refs")))
  }

  /** A store where every slot claim is beaten by a rival writer `beatFirst`
    * times — the contention schedule an object store's conditional PUT would
    * produce under concurrent committers. */
  private final class ContendedStore(beatFirst: Int) extends MetaStore {
    private val inner = new InMemoryMetaStore
    private var beaten = 0
    var contested = 0
    def putIfAbsent(key: java.nio.file.Path, content: String): Boolean = {
      val isSlot = key.getParent != null && key.getParent.getFileName.toString == "locks"
      if (isSlot && beaten < beatFirst) {
        beaten += 1; contested += 1
        inner.putIfAbsent(key, "rival") // the rival's claim lands first
      }
      inner.putIfAbsent(key, content)
    }
    def put(key: java.nio.file.Path, content: String): Unit = inner.put(key, content)
    def read(key: java.nio.file.Path): String = inner.read(key)
    def exists(key: java.nio.file.Path): Boolean = inner.exists(key)
    def delete(key: java.nio.file.Path): Boolean = inner.delete(key)
    def list(dir: java.nio.file.Path): Vector[java.nio.file.Path] = inner.list(dir)
    def lastModified(key: java.nio.file.Path): Long = inner.lastModified(key)
    def ensurePrefix(dir: java.nio.file.Path): Unit = inner.ensurePrefix(dir)
    def backdate(key: java.nio.file.Path, toMs: Long): Unit = inner.backdate(key, toMs)
  }

  test("slot contention surfaces as ConcurrentModificationException, never a silent fork") {
    val store = new ContendedStore(beatFirst = 1)
    val vt = VersionedTable.create(Tables.scratch("test_contend"), store)
    intercept[java.util.ConcurrentModificationException](vt.write(df(1), "main", "v0"))
    assert(store.contested === 1)
    assert(vt.head("main").isEmpty, "the losing writer must not have advanced any ref")
  }

  test("after a lost CAS the caller's documented retry (re-read head, write again) succeeds") {
    val store = new ContendedStore(beatFirst = 1)
    val rootStr = Tables.scratch("test_retry")
    val vt = VersionedTable.create(rootStr, store)
    val attempt = try { vt.write(df(1), "main", "v0"); None }
    catch { case e: java.util.ConcurrentModificationException => Some(e) }
    assert(attempt.isDefined, "the contested claim must lose the CAS")
    // the rival crashed without publishing: age its slot past staleness and
    // let the sweep (run by vacuum) reclaim it, then retry — the lakeFS/Delta
    // recovery story end to end on a non-FS store
    val slot = Paths.get(rootStr).resolve("locks").resolve("main-v0")
    store.backdate(slot, System.currentTimeMillis() - 2 * VersionedTable.DefaultStaleSlotMs)
    vt.vacuum()
    vt.write(df(1), "main", "v0 retry")
    assert(vt.head("main").get.version === 0)
    assert(vt.read(spark, "main").as[Int].collect() === Array(1))
  }

  /** A store whose LIST is eventually consistent: while frozen, list() serves
    * the snapshot observed before the freeze (a fresh object exists, reads
    * fine, wins CAS races — but does not appear in listings). Models the
    * pre-2020 S3 behavior the MetaStore contract documents as tolerable. */
  private final class StaleListStore extends MetaStore {
    private val inner = new InMemoryMetaStore
    private var frozen = false
    private val seen = scala.collection.mutable.Map.empty[String, Vector[java.nio.file.Path]]
    def freeze(): Unit = frozen = true
    def thaw(): Unit = frozen = false
    def list(dir: java.nio.file.Path): Vector[java.nio.file.Path] =
      if (frozen) seen.getOrElse(dir.toString, Vector.empty)
      else { val v = inner.list(dir); seen(dir.toString) = v; v }
    def putIfAbsent(key: java.nio.file.Path, content: String): Boolean =
      inner.putIfAbsent(key, content)
    def put(key: java.nio.file.Path, content: String): Unit = inner.put(key, content)
    def read(key: java.nio.file.Path): String = inner.read(key)
    def exists(key: java.nio.file.Path): Boolean = inner.exists(key)
    def delete(key: java.nio.file.Path): Boolean = inner.delete(key)
    def lastModified(key: java.nio.file.Path): Long = inner.lastModified(key)
    def ensurePrefix(dir: java.nio.file.Path): Unit = inner.ensurePrefix(dir)
    def backdate(key: java.nio.file.Path, toMs: Long): Unit = inner.backdate(key, toMs)
  }

  test("eventually-consistent listings: CAS still decides winners; slot repair waits for a fresh listing") {
    val store = new StaleListStore
    val rootStr = Tables.scratch("test_stale_list")
    val root = Paths.get(rootStr)
    val vt = VersionedTable.create(rootStr, store)
    vt.write(df(1), "main", "v0")
    vt.write(df(2), "main", "v1")
    vt.createBranch("dev", "main")
    vt.vacuum(retainLast = 10) // warm every control-plane listing
    store.freeze()
    // a rival claimed main's next slot and crashed; the claim is stale but
    // INVISIBLE to listings until they catch up
    CommitLog.claimVersionSlot(root.resolve("locks"), "main", 2L, store = store)
    store.backdate(root.resolve("locks").resolve("main-v2"),
      System.currentTimeMillis() - 2 * VersionedTable.DefaultStaleSlotMs)
    // commits never consult listings: the CAS alone rejects the writer...
    intercept[java.util.ConcurrentModificationException](vt.write(df(3), "main", "blocked"))
    // ...and a sweep fed the stale listing conservatively repairs NOTHING —
    // the documented skip-until-next-sweep behavior, never a wrong repair
    vt.vacuum(retainLast = 10)
    intercept[java.util.ConcurrentModificationException](vt.write(df(3), "main", "still blocked"))
    // unrelated branches advance freely: their CAS needs no listing either
    vt.write(df(9), "dev", "dev advances")
    assert(vt.read(spark, "dev").as[Int].collect() === Array(9))
    assert(vt.head("main").get.version === 1, "no corruption while the listing is stale")
    // the listing catches up: the next sweep reclaims, the writer lands
    store.thaw()
    vt.vacuum(retainLast = 10)
    vt.write(df(3), "main", "v2")
    assert(vt.head("main").get.version === 2)
    assert(vt.read(spark, "main").as[Int].collect() === Array(3))
  }

  test("S3Sim delayed listings: young create-once keys lag out of LIST; reads stay strong; overwritten keys always listed") {
    val rootStr = Tables.scratch("test_s3ec_store")
    val store = S3SimMetaStore.forTable(rootStr, listDelayMs = 60000L)
    val base = Paths.get(rootStr).toAbsolutePath.normalize
    val slot = base.resolve("locks").resolve("main-v1")
    assert(store.putIfAbsent(slot, "claim"))
    // single-key GET/HEAD are strongly consistent under LIST lag
    assert(store.exists(slot) && store.read(slot) === "claim")
    // ...but the fresh create-once key has not surfaced to LIST yet — the
    // state a stale-slot sweep sees: it skips the young slot (conservative,
    // repaired next cycle), never mis-repairs
    assert(!store.list(base.resolve("locks")).contains(slot),
      "young create-once key must lag out of LIST")
    store.backdate(slot, System.currentTimeMillis() - 120000L)
    assert(store.list(base.resolve("locks")).contains(slot), "aged past the lag → listed")
    // a key that has been OVERWRITTEN (generation > 0) is always listed:
    // LIST lag hides new objects, it never un-lists a live branch ref
    val ref = base.resolve("refs").resolve("main")
    store.put(ref, "a")
    assert(!store.list(base.resolve("refs")).contains(ref),
      "a ref's very first write is create-visibility-lagged like any new key")
    store.put(ref, "b")
    assert(store.list(base.resolve("refs")).contains(ref))
    assert(store.read(ref) === "b")
  }

  test("EC listings cannot corrupt vacuum: the branch index enumerates a just-created unlisted branch") {
    // THE object-store hazard the index exists for: branch from the current
    // head, then overwrite the source branch past it — the new branch is now
    // the ONLY reference keeping those files alive, and its fresh ref is
    // still invisible to eventually-consistent LISTs. Retention priced off
    // the listing alone would sweep the files; the single-key branch index
    // must keep them.
    val rootStr = Tables.scratch("test_s3ec_vacuum")
    val store = S3SimMetaStore.forTable(rootStr, listDelayMs = 3600000L) // nothing fresh ever lists
    val base = Paths.get(rootStr).toAbsolutePath.normalize
    val vt = VersionedTable.create(rootStr, store)
    vt.write(df(1), "main", "v0")
    vt.createBranch("rel", "main") // rel pins v0
    vt.write(df(2), "main", "v1")  // overwrite: v0 files reachable ONLY via rel
    assert(!store.list(base.resolve("refs")).map(_.getFileName.toString).contains("rel"),
      "precondition: the fresh ref must be lagging out of LIST")
    assert(vt.branches.contains("rel"), "the index must enumerate the unlisted branch")
    vt.vacuum(retainLast = 1)
    assert(vt.read(spark, "rel").as[Int].collect() === Array(1),
      "vacuum under EC listings must not sweep the unlisted branch's files")
    // and a deleted branch never resurrects through the index
    vt.deleteBranch("rel")
    assert(!vt.branches.contains("rel"))
  }

  test("EC listings cannot corrupt vacuum: the tag index pins a just-created unlisted tag") {
    // the tag-side twin of the branch-index hazard: a release tag is often
    // the ONLY reference keeping its commit's files alive, and tags are
    // create-once keys — exactly what an EC LIST hides while young. A
    // vacuum pricing retention off the listing alone would sweep the files.
    val rootStr = Tables.scratch("test_s3ec_tag_vacuum")
    val store = S3SimMetaStore.forTable(rootStr, listDelayMs = 3600000L)
    val base = Paths.get(rootStr).toAbsolutePath.normalize
    val vt = VersionedTable.create(rootStr, store)
    vt.write(df(1), "main", "v0")
    vt.createTag("release") // pins v0
    vt.write(df(2), "main", "v1") // overwrite: v0 files reachable ONLY via the tag
    assert(!store.list(base.resolve("tags")).map(_.getFileName.toString).contains("release"),
      "precondition: the fresh tag must be lagging out of LIST")
    assert(vt.tags.map(_._1).contains("release"),
      "the index must enumerate the unlisted tag")
    vt.vacuum(retainLast = 1)
    assert(vt.readTag(spark, "release").as[Int].collect() === Array(1),
      "vacuum under EC listings must not sweep the unlisted tag's files")
    // the index entry is add-only (removing it can strip a racing namesake
    // create's entry), but the deleted tag never resurrects: enumeration
    // probes each indexed name with a strongly-consistent exists check
    vt.deleteTag("release")
    assert(!vt.tags.map(_._1).contains("release"))
  }

  test("concurrent protection-rule edits from rival processes ALL land (CAS, not last-writer-wins)") {
    // the r14 ADVICE hazard: two admins adding different rules at once on a
    // read-modify-put rules object silently drop one, leaving a branch an
    // admin believes protected actually unprotected. The CasStringSet form
    // must land every edit. Two handles = two processes (no shared state
    // beyond the store); threads interleave their generation claims.
    val rootStr = Tables.scratch("test_rules_race")
    val store = S3SimMetaStore.forTable(rootStr)
    val vtA = VersionedTable.create(rootStr, store)
    val vtB = VersionedTable.open(rootStr, store)
    val rules = (0 until 8).map(i => s"rule-$i*")
    val (forA, forB) = rules.splitAt(4)
    val ta = new Thread(() => forA.foreach(vtA.protectBranch))
    val tb = new Thread(() => forB.foreach(vtB.protectBranch))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert(vtA.protectionRules.sorted === rules.sorted,
      "every concurrently added rule must survive")
    // removal is CAS too: rivals removing different rules both land
    val tc = new Thread(() => vtA.unprotectBranch("rule-0*"))
    val td = new Thread(() => vtB.unprotectBranch("rule-7*"))
    tc.start(); td.start(); tc.join(); td.join()
    assert(vtB.protectionRules.sorted === rules.slice(1, 7).sorted)
  }

  test("pre-CAS protection rules (legacy single object) stay enforced, migrate on first edit, never resurrect") {
    val rootStr = Tables.scratch("test_rules_legacy")
    val store = S3SimMetaStore.forTable(rootStr)
    val vt = VersionedTable.create(rootStr, store)
    // author the pre-r15 format directly: ONE plain object, newline-joined —
    // a distinct key from the CAS chain's rules.gen<N>, so without the
    // legacy union these rules would silently read as no protection at all
    val dir = Paths.get(rootStr).toAbsolutePath.normalize.resolve("protected")
    store.ensurePrefix(dir)
    store.put(dir.resolve("rules"), "main\nrel*")
    assert(vt.protectionRules === Seq("main", "rel*"), "legacy rules must read")
    assertThrows[IllegalStateException](vt.write(df(1), "main", "blocked"))
    // first edit folds the legacy set into generation 0 and retires the object
    vt.protectBranch("extra")
    assert(vt.protectionRules === Seq("extra", "main", "rel*"))
    assert(!store.exists(dir.resolve("rules")), "legacy object retired after migration")
    // a removed legacy-originated rule must NOT resurrect through the union
    assert(vt.unprotectBranch("main"))
    assert(vt.protectionRules === Seq("extra", "rel*"))
    vt.write(df(1), "main", "now allowed")
    assert(vt.head("main").isDefined)
  }

  test("dry-run vacuum equals the real vacuum in a crashed-writer (orphan replay) state") {
    val store = new InMemoryMetaStore
    val rootStr = Tables.scratch("test_dryrun_crash")
    val root = Paths.get(rootStr)
    val vt = VersionedTable.create(rootStr, store)
    vt.write(df(1, 2), "main", "v0")
    vt.write(df(3), "main", "v1")
    // simulate a writer that died between commit-json write and ref advance:
    // claim slot v2, publish a commit json for it, but leave the ref at v1
    val head = vt.head("main").get
    CommitLog.claimVersionSlot(root.resolve("locks"), "main", 2L, store = store)
    val orphanDir = root.resolve("data").resolve("main-v2-orphan00")
    Files.createDirectories(orphanDir)
    val orphanData = orphanDir.resolve("part-0.parquet")
    df(7, 8).coalesce(1).write.mode("overwrite").parquet(orphanDir.resolve("tmp").toString)
    val part = Files.list(orphanDir.resolve("tmp")).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) { val p = part.next(); if (p.toString.endsWith(".parquet")) src = p }
    Files.copy(src, orphanData)
    val orphan = graft.vt.Commit("main-v2-0badc0de", Some(head.id), 2L,
      Vector(root.relativize(orphanData).toString), df(7, 8).schema.json, "crashed", 1L)
    store.put(root.resolve("commits").resolve(orphan.id + ".json"), CommitLog.toJson(orphan))
    // age the slot so the sweep treats it as stale
    store.backdate(root.resolve("locks").resolve("main-v2"),
      System.currentTimeMillis() - 2 * VersionedTable.DefaultStaleSlotMs)
    // dry run must price retention AS IF the sweep replayed the orphan:
    // post-replay head is v2, so with retainLast=1 both v0 and v1 files die
    val planned = vt.vacuum(retainLast = 1, dryRun = true)
    val real = vt.vacuum(retainLast = 1)
    assert(planned === real,
      s"dry-run count $planned must match the real vacuum $real in a crashed-writer state")
    assert(vt.head("main").get.id === orphan.id, "real sweep must have replayed the orphan")
    assert(vt.read(spark, "main").as[Int].collect().sorted === Array(7, 8))
  }
}
