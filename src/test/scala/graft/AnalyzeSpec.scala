package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.vt.VersionedTable

/** ANALYZE backfill (r19c): metadata-only stats / bloom-index computation
  * over an ALREADY-INGESTED snapshot — one scan buys pruning forever, no
  * rewrite (the adoption path for tables written without statsCols /
  * bloomCols). */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def readVt(root: String): DataFrame =
    spark.read.format("vt").option("path", root).load()

  private def scanned(q: DataFrame): Long = {
    q.collect()
    q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get.metrics("numFiles").value
  }

  test("computeStats backfills skipping stats as a metadata-only commit") {
    val vt = VersionedTable.create(Tables.scratch("an_stats"))
    def part(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, f"name-$i%03d")).toDF("k", "v").coalesce(1)
    // ingested WITHOUT stats: nothing can skip
    vt.write(part(1, 10), "main", "A")
    vt.write(part(11, 20), "main", "B", mode = "append")
    vt.write(part(21, 30), "main", "C", mode = "append")
    val before = vt.head("main").get
    assert(before.stats.isEmpty)
    assert(scanned(readVt(vt.root.toString).where($"k".between(12, 18))) === 3,
      "without stats every file scans")
    // SQL ANALYZE verb: one metadata-only commit, same files, dataChange=false
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    val out = graft.sources.VtUtilitySql.exec(spark,
      s"ANALYZE vt.`${vt.root}` COMPUTE STATISTICS FOR COLUMNS (k, v)").collect()
    val after = vt.head("main").get
    assert(out.head.getLong(0) === after.version)
    assert(after.files === before.files && !after.dataChange)
    assert(after.files.forall(f => after.stats(f).contains("k") &&
      after.strStats(f).contains("v")), "numeric AND string quadrants fill")
    // the same band read now scans ONE file; metadata MIN/MAX answers
    assert(scanned(readVt(vt.root.toString).where($"k".between(12, 18))) === 1)
    assert(vt.minMaxFromStats(after, "k") === Some((1.0, 30.0)))
    // already-covered snapshot: a repeat is a NO-OP (no version churn)
    assert(vt.computeStats(spark, Seq("k"), "main").id === after.id)
    // PARTIAL coverage: a post-analyze append without stats only re-reads
    // the new file
    vt.write(part(31, 40), "main", "D", mode = "append")
    val h2 = vt.computeStats(spark, Seq("k", "v"), "main")
    assert(h2.files.forall(f => h2.stats(f).contains("k")))
    // pre-analyze versions still time-travel without stats
    assert(VersionedTable.checkConstraints(before).isEmpty)
    assert(vt.readVersion(spark, "main", before.version).count() === 30L)
    // unknown / unsupported columns refuse loudly
    intercept[IllegalArgumentException] { vt.computeStats(spark, Seq("nope"), "main") }
  }

  test("computeBloomIndex backfills the point-lookup index and turns the columns sticky") {
    val vt = VersionedTable.create(Tables.scratch("an_bloom"))
    // interleaved key alphabets: min/max windows can never separate these
    def part(r: Int) = (0 until 40).map(i => (f"id-${i * 3 + r}%04d", i.toLong))
      .toDF("k", "v").coalesce(1)
    vt.write(part(0), "main", "A")
    vt.write(part(1), "main", "B", mode = "append")
    vt.write(part(2), "main", "C", mode = "append")
    assert(scanned(readVt(vt.root.toString).where($"k" === "id-0006")) === 3,
      "no index: a point probe scans everything")
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    graft.sources.VtUtilitySql.exec(spark,
      s"ANALYZE vt.`${vt.root}` COMPUTE BLOOM INDEX FOR COLUMNS (k)").collect()
    val head = vt.head("main").get
    assert(!head.dataChange && head.bloomCols === Seq("k") && head.bloomFiles.nonEmpty)
    assert(scanned(readVt(vt.root.toString).where($"k" === "id-0006")) === 1,
      "the backfilled bloom must confine the point probe to one file")
    // STICKY: a later plain append gets its own sidecar without re-specifying
    vt.write(Seq(("zz-9999", 1L)).toDF("k", "v"), "main", "late", mode = "append")
    val h2 = vt.head("main").get
    assert(h2.bloomCols === Seq("k"))
    val look = vt.bloomLookup(h2)
    assert(h2.files.forall(f => look(f, "k").isDefined),
      "every file — backfilled and appended — must have a bloom entry")
    // fractional columns refuse (no exact probe image)
    val frac = VersionedTable.create(Tables.scratch("an_bloom_frac"))
    frac.write(Seq((1L, 0.5)).toDF("k", "d"), "main", "v0")
    intercept[IllegalArgumentException] { frac.computeBloomIndex(spark, Seq("d"), "main") }
  }
}
