package graft

import org.apache.spark.sql.SparkSession

/** Chaos-harness writer main (driven by ChaosSpec): hammers single-row
  * appends at one versioned table from its OWN JVM, retrying cleanly on the
  * version-slot CAS ConcurrentModificationException. ChaosSpec spawns
  * several of these as real processes against one table root and SIGKILLs
  * some mid-protocol — the cross-process twin of PropertySpec's in-JVM
  * crash-point property: same invariants (gap-free monotonic versions,
  * readable head, vacuum un-wedges), but with genuine process isolation,
  * genuine kill -9, and the filesystem as the only coordination medium. */
object ChaosWriter {
  def main(args: Array[String]): Unit = {
    val (dir, id, n) = (args(0), args(1), args(2))
    // optional 4th arg selects the control-plane backend: "s3" = the
    // rename-free object-store simulator (shared bucket on disk, so real
    // sibling processes coordinate through conditional PUTs alone);
    // "s3ec" = the same with eventually-consistent LISTs (1.5 s lag)
    val store: graft.vt.MetaStore =
      if (args.length > 3 && args(3) == "s3") graft.vt.S3SimMetaStore.forTable(dir)
      else if (args.length > 3 && args(3) == "s3ec")
        graft.vt.S3SimMetaStore.forTable(dir, 1500L)
      else graft.vt.LocalFsMetaStore
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_chaos_$id")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vt = graft.vt.VersionedTable.open(dir, store)
    // "export" mode: loop Delta-log exports of whatever lineage each pass
    // observes, while sibling writer processes keep committing — kill-9 may
    // land mid-JSON-write (atomic rename must leave no torn commit), and a
    // pass races the head it pinned at entry (later versions wait for the
    // next pass). The harness then asserts every exported version replays
    // to a committed snapshot.
    if (args.contains("export")) {
      var exported = 0
      while (exported < n.toInt) {
        val v = vt.exportDeltaLog("main")
        exported += 1
        println(s"[chaos$id] exported $v ($exported/$n)")
        Thread.sleep(10)
      }
      spark.stop()
      return
    }
    // "tags" mode: tag every commit this writer lands (kill-9 may interrupt
    // between the commit and the tag CAS — the harness then checks every tag
    // that DID land resolves to a readable commit, never a dangling id)
    val tagging = args.contains("tags")
    var written = 0
    while (written < n.toInt) {
      try {
        val c = vt.write(Seq(id.toInt * 1000 + written).toDF("x"), "main",
          s"writer$id-$written", mode = "append")
        if (tagging) vt.createTagAt(s"t$id-$written", c.id)
        written += 1
        println(s"[chaos$id] appended $written/$n")
      } catch {
        // lost the CAS to a sibling process — re-read the head and retry
        case _: java.util.ConcurrentModificationException => Thread.sleep(20)
      }
    }
    spark.stop()
  }
}
