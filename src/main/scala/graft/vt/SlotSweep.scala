package graft.vt

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Crash recovery over the version-slot CAS, shared by [[VersionedTable]]
  * and [[Repo]] (both speak the same claim-slot → write-commit → advance-ref
  * protocol, so they share one recovery semantics instead of two drifting
  * copies):
  *
  *  - an aged slot with NO published commit is a crashed claim — reclaimed
  *    so retries can land (unless it is a completed fast-forward merge's
  *    `ff:<target>` CAS record, which is kept forever like any published
  *    slot);
  *  - an aged slot whose published commit is UNREACHABLE is an interrupted
  *    publish — its ref advance is replayed (guarded: must extend the
  *    current head, must not resurrect a deleted branch, files must still
  *    exist);
  *  - [[slotProtectedFiles]] names the replay targets' data files so vacuum
  *    retention never deletes what a later replay would publish.
  */
private[vt] object SlotSweep {

  private def listDir(p: Path): Vector[Path] = {
    if (!Files.exists(p)) return Vector.empty
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** See the bullet list above. `reachable` is the full-DAG closure of every
    * branch head; `isAncestor(id, of)` must walk BOTH parent edges. Returns
    * #slots reclaimed/repaired. */
  def sweepStaleSlots(root: Path,
                      head: String => Option[Commit],
                      loadCommit: String => Commit,
                      reachable: Set[String],
                      isAncestor: (String, Commit) => Boolean,
                      nowMs: Long, staleSlotMs: Long): Int = {
    val locksDir = root.resolve("locks")
    val commitsDir = root.resolve("commits")
    val refsDir = root.resolve("refs")
    if (!Files.exists(locksDir)) return 0
    val publishedIds =
      if (Files.exists(commitsDir))
        listDir(commitsDir).map(_.getFileName.toString.stripSuffix(".json")).sorted
      else Vector.empty
    // Snapshot the slot listing ONCE: the v0Safe count below must be evaluated
    // against the pre-sweep state, otherwise it is order-dependent — an
    // unpublished leftover slot of the same deleted branch reclaimed EARLIER
    // in this pass would drop the count to 1 and let a single-published-commit
    // deleted branch be resurrected.
    val slotSnapshot = listDir(locksDir).map(_.getFileName.toString)
    var reclaimed = 0
    listDir(locksDir)
      .filter(p => Files.getLastModifiedTime(p).toMillis < nowMs - staleSlotMs)
      .foreach { p =>
        val slot = p.getFileName.toString // "<branch>-v<version>"
        // EXACT id match (commit ids are "<slot>-<8 hex uuid chars>"): a prefix
        // test would let a branch literally named "<branch>-v<N>" shadow another
        // branch's stale slot and leave that branch wedged forever
        val idRe = (java.util.regex.Pattern.quote(slot) + "-[0-9a-f]{8}").r
        val owned = publishedIds.filter(id => idRe.pattern.matcher(id).matches())
        if (owned.isEmpty) {
          // No published commit owns this slot. Two cases:
          //  - a writer crashed between claimVersionSlot and the commit-json
          //    write — reclaim the slot so retries can land;
          //  - the slot is a COMPLETED fast-forward merge's CAS record (an FF
          //    advances the ref to an existing commit, publishing nothing):
          //    its content names the FF target, and the branch head
          //    descending from that target proves the ref advance landed.
          //    Keep it FOREVER, exactly like a published commit's slot —
          //    reclaiming it would let a writer stale by more than
          //    staleSlotMs claim this version and fork the merged history.
          //    (A crashed FF — target named but head not descended — is
          //    reclaimed; the merge caller simply retries.)
          val content = try CommitLog.readString(p).trim catch { case _: Exception => "" }
          val ffDone = content.startsWith("ff:") && {
            val tid = content.drop(3)
            Files.exists(commitsDir.resolve(tid + ".json")) && (slot match {
              case VersionedTable.SlotRe(branch, _) =>
                head(branch).exists(h => isAncestor(tid, h))
              case _ => false
            })
          }
          if (!ffDone) { Files.deleteIfExists(p); reclaimed += 1 }
        } else if (!owned.exists(reachable.contains)) {
          // crash between the commit-json write and the ref advance: the
          // commit exists but no ref reaches it, so every retry targets the
          // same version and hits the claimed slot. Finish the interrupted
          // publish: advance the branch ref to the orphan — guarded three ways.
          slot match {
            case VersionedTable.SlotRe(branch, _) =>
              val orphan = loadCommit(owned.head)
              // (1) the orphan must EXTEND the branch's current head —
              //     anything else means lineage moved some other way; leave it.
              // (2) deleted-branch resurrection guard: a parentless (v0)
              //     orphan with no current ref is only replayed when NOTHING
              //     else exists under the branch name — a crashed
              //     deleteBranch can leave a v0 slot behind, and None==None
              //     alone would recreate the deleted branch's ref.
              val extendsHead = head(branch).map(_.id) == orphan.parent
              val branchIdP = java.util.regex.Pattern.compile(
                java.util.regex.Pattern.quote(branch) + "-v\\d+-[0-9a-f]{8}")
              val branchSlotP = java.util.regex.Pattern.compile(
                java.util.regex.Pattern.quote(branch) + "-v\\d+")
              val v0Safe = orphan.parent.isDefined || (head(branch).isEmpty &&
                publishedIds.count(id => branchIdP.matcher(id).matches()) == 1 &&
                slotSnapshot.count(s => branchSlotP.matcher(s).matches()) == 1)
              if (extendsHead && v0Safe) {
                // (3) post-vacuum safety: every data file the orphan references
                //     must still exist — an earlier vacuum (run while this slot
                //     was age-gated but the commit already unreachable) may have
                //     swept them, and advancing the ref would publish a head
                //     that cannot be read. Such an orphan is garbage: reclaim
                //     the slot AND its commit json so retries can land.
                if (orphan.files.forall(f => Files.exists(root.resolve(f)))) {
                  // This read-head-then-write-ref pair is fully serialized:
                  // in-JVM writers by `synchronized`, and cross-process
                  // writers by the slot CAS — EVERY ref-advancing path
                  // (publish, and since r12 fast-forward merge too) first
                  // claims the branch's next version slot, which is exactly
                  // the slot this orphan still holds, so no concurrent ref
                  // write can interleave here.
                  CommitLog.writeAtomic(refsDir.resolve(branch), orphan.id)
                  reclaimed += 1
                } else {
                  Files.deleteIfExists(commitsDir.resolve(orphan.id + ".json"))
                  Files.deleteIfExists(p)
                  reclaimed += 1
                }
              }
            case _ => ()
          }
        }
      }
    reclaimed
  }

  /** Data files of published-but-UNREACHABLE commits whose version slot still
    * exists: these are [[sweepStaleSlots]]'s potential replay targets, so
    * vacuum must retain their files — otherwise the sequence (vacuum while the
    * slot is age-gated → later vacuum replays the ref) would publish a branch
    * head whose data was already deleted. Reachable commits are excluded, so
    * this never widens retention for ordinary history (every published commit
    * keeps its slot forever as the CAS record). */
  def slotProtectedFiles(root: Path, loadCommit: String => Commit,
                         reachable: Set[String]): Set[String] = {
    val locksDir = root.resolve("locks")
    val commitsDir = root.resolve("commits")
    if (!Files.exists(locksDir) || !Files.exists(commitsDir)) return Set.empty
    val slots = listDir(locksDir).map(_.getFileName.toString).toSet
    listDir(commitsDir).map(_.getFileName.toString.stripSuffix(".json"))
      .filter { id => // id = "<branch>-v<n>-<hex8>"
        val cut = id.lastIndexOf('-')
        cut > 0 && !reachable.contains(id) && slots.contains(id.substring(0, cut))
      }
      .flatMap(id => loadCommit(id).files).toSet
  }
}
