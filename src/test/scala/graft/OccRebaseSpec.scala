package graft

import graft.vt.VersionedTable

/** r20 OCC rebase for blind appends (Delta's WriteSerializable rule):
  * a data commit that only ADDS files re-publishes on the new head after a
  * lost version-slot CAS instead of failing — appends commute with appends.
  * Everything the append's validation depended on (schema, CHECK
  * constraints, bloom column set) moving concurrently still REFUSES, as do
  * lost overwrites (which would silently drop the winner's rows).
  *
  * The deterministic interleaving trick: pre-commit hooks run BEFORE the
  * slot claim, so a hook that triggers a second writer's commit guarantees
  * the first writer loses its CAS. */
class OccRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def twoWriters(tag: String): (VersionedTable, VersionedTable) = {
    val root = Tables.scratch(tag)
    val a = VersionedTable.create(root)
    a.write((1 to 10).map(i => (i.toLong, s"base$i")).toDF("k", "v")
      .coalesce(1), "main", "v0", statsCols = Seq("k"))
    (a, VersionedTable.open(root))
  }

  test("two concurrent blind appends BOTH land (loser rebases)") {
    val (a, b) = twoWriters("occ_both_land")
    @volatile var fired = false
    a.addPreCommitHook("race") { (_, _) =>
      if (!fired) { // the rebase re-runs hooks; interleave only once
        fired = true
        b.write(Seq((100L, "fromB")).toDF("k", "v").coalesce(1), "main", "B",
          mode = "append", statsCols = Seq("k"))
      }
    }
    val c = a.write(Seq((200L, "fromA")).toDF("k", "v").coalesce(1), "main",
      "A", mode = "append", statsCols = Seq("k"))
    assert(c.version === 2L, "loser must land as the NEXT version")
    val rows = a.read(spark, "main").select($"v").as[String].collect().toSet
    assert(rows.contains("fromA") && rows.contains("fromB"),
      "both appenders' rows must be in the final snapshot")
    assert(a.countRows(spark) === 12)
    // the rebase carried the winner's stats alongside its own
    val head = a.head("main").get
    assert(head.files.size === 3 && head.stats.size === 3)
  }

  test("a lost OVERWRITE still refuses — it would drop the winner's rows") {
    val (a, b) = twoWriters("occ_overwrite_refuses")
    @volatile var fired = false
    a.addPreCommitHook("race") { (_, _) =>
      if (!fired) {
        fired = true
        b.write(Seq((100L, "fromB")).toDF("k", "v").coalesce(1), "main", "B",
          mode = "append")
      }
    }
    intercept[java.util.ConcurrentModificationException] {
      a.write(Seq((200L, "fromA")).toDF("k", "v").coalesce(1), "main", "A")
    }
    // the winner's commit is intact
    assert(a.read(spark, "main").count() === 11)
  }

  test("a concurrently ADDED CHECK constraint refuses the rebase") {
    val (a, b) = twoWriters("occ_constraint_refuses")
    @volatile var fired = false
    a.addPreCommitHook("race") { (_, _) =>
      if (!fired) {
        fired = true
        // the winner adds a constraint the loser's rows were never
        // validated against (they would violate it)
        b.addCheckConstraint(spark, "main", "small_k", "k < 150")
      }
    }
    intercept[java.util.ConcurrentModificationException] {
      a.write(Seq((200L, "fromA")).toDF("k", "v").coalesce(1), "main", "A",
        mode = "append")
    }
    assert(a.read(spark, "main").count() === 10,
      "the unvalidated append must not have landed")
  }

  test("a stale claimed slot (crashed writer) surfaces as a conflict, not a spin") {
    val (a, _) = twoWriters("occ_stale_slot")
    // a crashed writer claimed v1 but never published: head cannot advance,
    // so the rebase must give up immediately instead of retrying forever
    graft.vt.CommitLog.claimVersionSlot(a.root.resolve("locks"), "main", 1L,
      store = a.store)
    intercept[java.util.ConcurrentModificationException] {
      a.write(Seq((300L, "x")).toDF("k", "v").coalesce(1), "main", "A",
        mode = "append")
    }
  }

  test("append-vs-append rebase composes with manifests: records stay O(new files)") {
    val (a, b) = twoWriters("occ_manifests")
    @volatile var fired = false
    a.addPreCommitHook("race") { (_, _) =>
      if (!fired) {
        fired = true
        b.write(Seq((100L, "fromB")).toDF("k", "v").coalesce(1), "main", "B",
          mode = "append", statsCols = Seq("k"))
      }
    }
    val c = a.write(Seq((200L, "fromA")).toDF("k", "v").coalesce(1), "main",
      "A", mode = "append", statsCols = Seq("k"))
    // rebased commit reuses the winner's manifests by reference
    val winner = a.loadCommit(c.parent.get)
    assert(c.manifests.init === winner.manifests)
    assert(a.loadCommit(c.id).stats === c.stats && c.stats.size === 3)
  }
}
