package graft

import java.nio.file.Path

import graft.vt.{InMemoryMetaStore, MetaStore, VersionedTable}

/** Commit-log checkpoints (r12 verdict #2): snapshot resolution must be O(1)
  * metadata reads at any history depth — Delta's checkpoint scheme, which the
  * reference's `versionAsOf` time travel (`jobs/vdt4.py:80-81`) depends on
  * once streaming ingest (one commit per micro-batch) pushes version counts
  * into the thousands. Also pins the r12-advice changesFeed fix: a long
  * append-only interval must plan ONE parquet scan, not one union branch per
  * commit.
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  /** Store wrapper counting metadata READ operations (read + exists + list) —
    * the currency of the O(1)-resolution claim. */
  private final class CountingStore(inner: InMemoryMetaStore) extends MetaStore {
    var reads = 0
    def resetCount(): Unit = reads = 0
    def putIfAbsent(key: Path, content: String): Boolean = inner.putIfAbsent(key, content)
    def put(key: Path, content: String): Unit = inner.put(key, content)
    def read(key: Path): String = { reads += 1; inner.read(key) }
    def exists(key: Path): Boolean = { reads += 1; inner.exists(key) }
    def delete(key: Path): Boolean = inner.delete(key)
    def list(dir: Path): Vector[Path] = { reads += 1; inner.list(dir) }
    def lastModified(key: Path): Long = inner.lastModified(key)
    def ensurePrefix(dir: Path): Unit = inner.ensurePrefix(dir)
  }

  private def df(xs: Int*) = xs.toDF("x")

  test("version-1000 history: head and deep time travel resolve in O(1) metadata reads") {
    val store = new CountingStore(new InMemoryMetaStore)
    val vt = VersionedTable.create(Tables.scratch("test_ckpt1000"), store)
    vt.write(df(1, 2), "main", "v0")
    vt.write(df(3), "main", "v1")
    // metadata-only commits: revert alternates between the two snapshots
    (2 to 1000).foreach(v => vt.revert("main", v % 2))
    assert(vt.head("main").get.version === 1000)
    // superseded checkpoints are pruned: O(1) files per branch, not one per
    // boundary (100 files here, O(V²/interval) cumulative bytes at scale)
    val ckDir = java.nio.file.Paths.get(vt.root.toString).resolve("checkpoints")
    assert(store.list(ckDir).size === 1)
    // ... and the surviving index is SPARSE: boundary versions only
    // (0,10,…,1000 → 101 entries), never all 1001
    val ckJson = store.read(ckDir.resolve("main-v1000"))
    val ckIdx = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(ckJson, classOf[java.util.Map[String, Object]])
      .get("index").asInstanceOf[java.util.Map[String, Object]]
    assert(ckIdx.size === 101, s"index must hold boundaries only, has ${ckIdx.size}")

    store.resetCount()
    assert(vt.head("main").get.version === 1000L)
    assert(store.reads <= 4, s"head resolution did ${store.reads} metadata reads")

    store.resetCount()
    val mid = vt.readVersion(spark, "main", 500).as[Int].collect().sorted
    assert(mid === Array(1, 2)) // even versions replay the v0 snapshot
    assert(store.reads <= 10,
      s"time travel to v500 of a v1000 table did ${store.reads} metadata reads (must be O(1), not O(V))")

    store.resetCount()
    assert(vt.readVersion(spark, "main", 997).as[Int].collect() === Array(3))
    assert(store.reads <= 10, s"near-head travel did ${store.reads} reads")
  }

  test("timestamp travel walks O(commits-since-ts), finishing from the checkpoint index") {
    val store = new CountingStore(new InMemoryMetaStore)
    val vt = VersionedTable.create(Tables.scratch("test_ckpt_ts"), store)
    vt.write(df(1), "main", "v0")
    (1 to 50).foreach(_ => vt.revert("main", 0))
    store.resetCount()
    // "now" resolves at the head immediately
    assert(vt.readAsOfTimestamp(spark, "main", System.currentTimeMillis())
      .as[Int].collect() === Array(1))
    assert(store.reads <= 6, s"as-of-now did ${store.reads} metadata reads")
    // a timestamp before the first commit is still the documented error
    intercept[IllegalArgumentException](vt.readAsOfTimestamp(spark, "main", 1L))
  }

  test("checkpointed resolution agrees with the full lineage walk on a branched history") {
    val vt = VersionedTable.create(Tables.scratch("test_ckpt_agree"), new InMemoryMetaStore)
    vt.write(df(0), "main", "v0")
    (1 to 25).foreach(v => vt.write(df(v), "main", s"v$v"))
    vt.createBranch("dev", "main") // no checkpoints of its own until v30
    (26 to 34).foreach(v => vt.write(df(v), "dev", s"dev v$v"))
    val byWalk = vt.lineage("dev").map(c => c.version -> c.id).toMap
    Seq(0L, 7L, 10L, 19L, 25L, 30L, 34L).foreach { v =>
      assert(vt.readVersion(spark, "dev", v).as[Int].collect() === Array(v.toInt),
        s"version $v resolved to the wrong snapshot")
    }
    // dev crossed its first boundary at v30 with no prior dev checkpoint:
    // the one-time full walk must have produced a complete, correct index
    assert(vt.readVersion(spark, "dev", 3).as[Int].collect() === Array(3))
    assert(byWalk.size === 35)
  }

  test("deleteBranch drops the branch's checkpoints: a recreated namesake never resolves stale ids") {
    val vt = VersionedTable.create(Tables.scratch("test_ckpt_namesake"), new InMemoryMetaStore)
    vt.write(df(1), "main", "v0")
    vt.createBranch("dev", "main")
    // the DEAD branch is LONGER than its successor, so its v20 checkpoint
    // would survive as "latest" for the name and cover deep targets
    (1 to 25).foreach(v => vt.write(df(100 + v), "dev", s"old dev v$v"))
    vt.deleteBranch("dev")
    vt.createBranch("dev", "main") // same name, fresh lineage from main's head
    (1 to 12).foreach(v => vt.write(df(200 + v), "dev", s"new dev v$v"))
    // v1 is >interval below the new head, so resolution consults checkpoints:
    // it must walk/index the NEW branch's history, not the dead branch's
    assert(vt.readVersion(spark, "dev", 1).as[Int].collect() === Array(201))
  }

  test("long append-only changesFeed plans ONE parquet scan with per-file version assignment") {
    val vt = VersionedTable.create(Tables.scratch("test_feed_onescan"), new InMemoryMetaStore)
    vt.write(df(0), "main", "v0")
    (1 to 12).foreach(v => vt.write(df(v), "main", s"append v$v", mode = "append"))
    val feed = vt.changesFeed(spark, "main", 0, 12)
    val rows = feed.select($"x", $"version").as[(Int, Long)].collect().sorted
    assert(rows === (1 to 12).map(v => (v, v.toLong)).toArray,
      "each appended row must carry the version of the commit that added it")
    val scans = feed.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1,
      s"append-only feed must be ONE scan over the delta files, saw $scans (O(V) plan regression)")
  }

  test("mixed feed (appends around an overwrite) keeps per-commit replay semantics") {
    val vt = VersionedTable.create(Tables.scratch("test_feed_mixed"), new InMemoryMetaStore)
    vt.write(df(1), "main", "v0")
    vt.write(df(2), "main", "v1", mode = "append")
    vt.write(df(7, 8), "main", "v2 overwrite")
    vt.write(df(9), "main", "v3", mode = "append")
    val feed = vt.changesFeed(spark, "main", 0, 3)
      .select($"version", $"change_type", $"x").as[(Long, String, Int)].collect().sorted
    assert(feed === Array(
      (1L, "insert", 2),
      (2L, "delete", 1), (2L, "delete", 2), (2L, "insert", 7), (2L, "insert", 8),
      (3L, "insert", 9)))
  }
}
