package graft

import org.apache.spark.sql.functions._

import graft.vt.{DeltaForeignWriter, DeltaLogReader, VersionedTable}

/** r20: writes onto PRE-EXISTING foreign Delta tables — the last interop
  * direction. Appends/overwrites land as protocol-conformant log commits
  * with atomic version claims, constraint enforcement, and column-mapping
  *-aware file layout; everything unsupported refuses loudly. */
class DeltaForeignWriterSpec extends SparkSpec {
  import spark.implicits._

  /** A stock-log foreign table seeded through the engine's own exporter. */
  private def foreign(tag: String, df: org.apache.spark.sql.DataFrame,
                      check: Option[(String, String)] = None): VersionedTable = {
    val vt = VersionedTable.create(Tables.scratch(tag))
    vt.write(df, "main", "v0", statsCols = Seq())
    check.foreach { case (n, sql) => vt.addCheckConstraint(spark, "main", n, sql) }
    vt.exportDeltaLog("main")
    vt
  }

  private def readBack(root: String) =
    spark.read.format("delta-lite").option("path", root).load()

  test("append lands as one conformant version; stats carry numRecords; overwrite replaces") {
    val vt = foreign("dfw_append",
      (1 to 20).map(i => (i.toLong, s"r$i")).toDF("k", "v").coalesce(1))
    val v = DeltaForeignWriter.append(spark, vt.root.toString,
      (21 to 30).map(i => (i.toLong, s"r$i")).toDF("k", "v").coalesce(1))
    assert(v === vt.head("main").get.version + 1,
      "the foreign append claims the NEXT log version")
    val back = readBack(vt.root.toString)
    assert(back.count() === 30)
    assert(back.agg(sum($"k")).head.getLong(0) === (1L to 30L).sum)
    // the add actions carry numRecords: the snapshot's files all have stats
    val snap = DeltaLogReader.snapshot(vt.root.toString, None, Some(spark))
    assert(snap.files.forall(_.stats.exists(_.contains("numRecords"))))
    // column order in the frame is free — re-projected into table order
    DeltaForeignWriter.append(spark, vt.root.toString,
      Seq(("x", 99L)).toDF("v", "k"))
    assert(readBack(vt.root.toString).where($"k" === 99L)
      .select($"v").as[String].head() === "x")
    // overwrite: one commit removes the old files and installs the new rows
    val v2 = DeltaForeignWriter.overwrite(spark, vt.root.toString,
      Seq((1000L, "fresh")).toDF("k", "v").coalesce(1))
    assert(v2 > v)
    val after = readBack(vt.root.toString)
    assert(after.count() === 1 &&
      after.select($"v").as[String].head() === "fresh")
    // history is intact: the pre-overwrite version still reads
    assert(spark.read.format("delta-lite").option("path", vt.root.toString)
      .option("versionAsOf", (v2 - 1).toString).load().count() === 31)
  }

  test("a lost version race retries onto the next slot; both writers' rows land") {
    val vt = foreign("dfw_race",
      Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val head = vt.head("main").get.version
    // simulate a concurrent winner: claim the next slot with a real commit
    // between this writer's snapshot and its claim — the CREATE_NEW loses
    // and the retry lands one version later
    val winner = root(vt).resolve("_delta_log").resolve(f"${head + 1}%020d.json")
    java.nio.file.Files.writeString(winner,
      graft.vt.DeltaLogFixture.commitInfoLine(1L, "APPEND") + "\n")
    val v = DeltaForeignWriter.append(spark, vt.root.toString,
      Seq((2L, "b")).toDF("k", "v").coalesce(1))
    assert(v === head + 2, "the loser must rebase onto the next slot")
    assert(readBack(vt.root.toString).count() === 2)
  }

  private def root(vt: VersionedTable) = vt.root

  test("CHECK constraints and NOT NULL are enforced before any commit") {
    val vt = foreign("dfw_check",
      (1 to 5).map(i => (i.toLong, s"r$i")).toDF("k", "v").coalesce(1),
      check = Some(("pos_k", "k > 0")))
    val before = DeltaLogReader.latestVersion(vt.root.toString)
    val e = intercept[IllegalArgumentException] {
      DeltaForeignWriter.append(spark, vt.root.toString,
        Seq((-7L, "bad")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("CHECK") || e.getMessage.contains("constraints"))
    assert(DeltaLogReader.latestVersion(vt.root.toString) === before,
      "a refused append must leave the log untouched")
    // conforming rows land, and the constraint still rides the metaData
    DeltaForeignWriter.append(spark, vt.root.toString,
      Seq((100L, "ok")).toDF("k", "v"))
    assert(readBack(vt.root.toString).count() === 6)
  }

  test("column-mapped foreign tables take appends with physical names + field ids") {
    val vt = VersionedTable.create(Tables.scratch("dfw_mapped"))
    vt.write((1 to 10).map(i => (i.toLong, s"o$i")).toDF("id", "owner")
      .coalesce(1), "main", "v0")
    vt.renameColumn(spark, "main", "id", "doc_id")
    vt.exportDeltaLog("main")
    // the frame speaks LOGICAL names; the files land under the physical ones
    DeltaForeignWriter.append(spark, vt.root.toString,
      Seq((500L, "new")).toDF("doc_id", "owner"))
    val back = readBack(vt.root.toString)
    assert(back.columns.toSeq === Seq("doc_id", "owner"))
    assert(back.count() === 11)
    assert(back.where($"doc_id" === 500L).select($"owner").as[String].head() === "new")
  }

  test("refusals: schema mismatch, appendOnly overwrite, CDF overwrite, not-a-table") {
    val vt = foreign("dfw_refuse",
      Seq((1L, "a")).toDF("k", "v").coalesce(1))
    intercept[IllegalArgumentException] {
      DeltaForeignWriter.append(spark, vt.root.toString, Seq(1L).toDF("k"))
    }
    intercept[IllegalArgumentException] {
      DeltaForeignWriter.append(spark, vt.root.toString,
        Seq(("a", "b")).toDF("k", "v")) // k retyped
    }
    intercept[IllegalArgumentException] {
      DeltaForeignWriter.append(spark, Tables.scratch("dfw_nolog"),
        Seq((1L, "a")).toDF("k", "v"))
    }
    // delta.appendOnly: appends fine, overwrite refused
    val ao = VersionedTable.create(Tables.scratch("dfw_appendonly"))
    ao.write(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main", "v0")
    ao.setTableProperties("main", Map("delta.appendOnly" -> "true"), Nil)
    ao.exportDeltaLog("main")
    DeltaForeignWriter.append(spark, ao.root.toString,
      Seq((2L, "b")).toDF("k", "v"))
    assert(readBack(ao.root.toString).count() === 2)
    intercept[IllegalArgumentException] {
      DeltaForeignWriter.overwrite(spark, ao.root.toString,
        Seq((9L, "z")).toDF("k", "v"))
    }
    // CDF-enabled: append fine (inserts derive from adds), overwrite refused
    val cdf = VersionedTable.create(Tables.scratch("dfw_cdf"))
    cdf.write(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main", "v0")
    cdf.exportDeltaLog("main", changeDataFeed = true)
    DeltaForeignWriter.append(spark, cdf.root.toString,
      Seq((2L, "b")).toDF("k", "v"))
    assert(readBack(cdf.root.toString).count() === 2)
    intercept[IllegalArgumentException] {
      DeltaForeignWriter.overwrite(spark, cdf.root.toString,
        Seq((9L, "z")).toDF("k", "v"))
    }
  }
}
