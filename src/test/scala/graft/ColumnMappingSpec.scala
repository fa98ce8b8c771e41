package graft

import org.apache.spark.sql.functions._

import graft.vt.VersionedTable

/** r20 column mapping: RENAME/DROP COLUMN as metadata-only commits (Delta's
  * name mode re-expressed through StructField metadata in the commit-pinned
  * schema). Zero files rewritten; reads re-alias positionally; stats/bloom
  * skipping survives; dropped bytes are unreachable by construction. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  test("RENAME COLUMN: metadata-only, reads/time-travel/stats/appends/DML all follow") {
    val vt = VersionedTable.create(Tables.scratch("cmap_rename"))
    def part(lo: Int) = (lo until lo + 50).map(i => (i.toLong, s"u$i"))
      .toDF("id", "owner").coalesce(1)
    vt.write(part(0), "main", "v0", statsCols = Seq("id", "owner"))
    vt.write(part(100), "main", "v1", mode = "append", statsCols = Seq("id", "owner"))
    val before = vt.head("main").get

    val c = vt.renameColumn(spark, "main", "id", "doc_id")
    // metadata-only: same files, zero rewrites, dataChange=false
    assert(c.files === before.files && !c.dataChange)
    // reads see the new logical name with the same values
    val head = vt.read(spark, "main")
    assert(head.columns.toSeq === Seq("doc_id", "owner"))
    assert(head.agg(sum($"doc_id")).head.getLong(0) ===
      ((0L until 50L) ++ (100L until 150L)).sum)
    // old version still speaks the OLD name (pinned schema)
    assert(vt.readVersion(spark, "main", 1).columns.toSeq === Seq("id", "owner"))
    // stats were re-keyed: pruning on the NEW name still skips files
    assert(vt.readWhere(spark, "main", "doc_id", 100.0, 110.0).inputFiles.length === 1)
    // filters on the new name push through the aliasing into the scan
    assert(head.where($"doc_id" === 120L).select($"owner").as[String].head() === "u120")

    // appends keep working: logical frame in, physical bytes out
    vt.write(Seq((500L, "u500")).toDF("doc_id", "owner").coalesce(1), "main",
      "a", mode = "append", statsCols = Seq("doc_id"))
    assert(vt.read(spark, "main").count() === 101)
    assert(vt.readWhere(spark, "main", "doc_id", 499.0, 501.0).inputFiles.length === 1)
    // COW DML against the new name
    vt.delete(spark, "doc_id >= 100 AND doc_id < 150")
    assert(vt.read(spark, "main").count() === 51)
    vt.update(spark, "doc_id = 500", Map("owner" -> "'renamed'"))
    assert(vt.read(spark, "main").where($"doc_id" === 500)
      .select($"owner").as[String].head() === "renamed")
    // metadata COUNT still resolves from the log
    assert(vt.countRows(spark) === 51)
  }

  test("RENAME COLUMN: bloom sidecars survive (physical keys), probes on the new name prune") {
    val vt = VersionedTable.create(Tables.scratch("cmap_bloom"))
    def part(r: Int) = (0 until 40).map(i => ((i * 3 + r) * 1000001L, i.toLong))
      .toDF("id", "v").coalesce(1)
    vt.write(part(0), "main", "v0", bloomCols = Seq("id"))
    vt.write(part(1), "main", "v1", mode = "append", bloomCols = Seq("id"))
    vt.write(part(2), "main", "v2", mode = "append", bloomCols = Seq("id"))
    vt.renameColumn(spark, "main", "id", "key")
    assert(vt.head("main").get.bloomCols === Seq("key"))
    // a point probe on the renamed column still skips to one file
    val probed = vt.read(spark, "main").where($"key" === 3000003L)
    val rel = new graft.sources.VtMorRelation(
      spark.sqlContext, vt, vt.head("main").get)
    val plan = rel.scanPlan(Array("key", "v"),
      Array(org.apache.spark.sql.sources.EqualTo("key", 3000003L)))
    assert(plan.inputFiles.length === 1, "bloom probe must prune through the rename")
    assert(probed.count() === 1)
  }

  test("DROP COLUMN: bytes unreachable, re-added name reads NULL, old versions intact") {
    val vt = VersionedTable.create(Tables.scratch("cmap_drop"))
    vt.write((1 to 20).map(i => (i.toLong, s"secret$i", i * 2))
      .toDF("k", "payload", "v").coalesce(1), "main", "v0",
      statsCols = Seq("k", "payload"))
    val c = vt.dropColumn(spark, "main", "payload")
    assert(c.files === vt.lineage("main").last.files && !c.dataChange)
    val head = vt.read(spark, "main")
    assert(head.columns.toSeq === Seq("k", "v"))
    // time travel still sees the dropped column
    assert(vt.readVersion(spark, "main", 0).select("payload").count() === 20)
    // the dropped column's stats were purged
    assert(!vt.head("main").get.strStats.values.exists(_.contains("payload")))
    // re-adding the NAME yields a fresh column: old bytes must NOT resurrect
    vt.addColumns("main", Seq(org.apache.spark.sql.types.StructField("payload",
      org.apache.spark.sql.types.StringType, nullable = true)))
    val readded = vt.read(spark, "main")
    assert(readded.where($"payload".isNotNull).count() === 0,
      "re-added column must read NULL, never the dropped bytes")
    // and writes to the re-added column land under its fresh physical name
    vt.write(Seq((99L, 0, "new")).toDF("k", "v", "payload").coalesce(1),
      "main", "a", mode = "append")
    assert(vt.read(spark, "main").where($"payload" === "new").count() === 1)
    assert(vt.read(spark, "main").where($"payload".isNotNull).count() === 1)
  }

  test("rename+drop compose; constraints refuse; last column protected") {
    val vt = VersionedTable.create(Tables.scratch("cmap_guard"))
    vt.write(Seq((1L, "a", 2.0)).toDF("x", "y", "z").coalesce(1), "main", "v0")
    vt.addCheckConstraint(spark, "main", "pos_x", "x > 0")
    val e1 = intercept[IllegalArgumentException](
      vt.renameColumn(spark, "main", "x", "xx"))
    assert(e1.getMessage.contains("pos_x"))
    val e2 = intercept[IllegalArgumentException](
      vt.dropColumn(spark, "main", "x"))
    assert(e2.getMessage.contains("pos_x"))
    // unconstrained columns move freely; chain of renames keeps one physical
    vt.renameColumn(spark, "main", "y", "y1")
    vt.renameColumn(spark, "main", "y1", "y2")
    val f = org.apache.spark.sql.types.DataType.fromJson(
      vt.head("main").get.schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType]("y2")
    assert(VersionedTable.physicalName(f) === "y")
    assert(vt.read(spark, "main").select($"y2").as[String].head() === "a")
    vt.dropColumn(spark, "main", "z")
    vt.dropColumn(spark, "main", "y2")
    assertThrows[IllegalArgumentException](vt.dropColumn(spark, "main", "x"))
    assertThrows[IllegalArgumentException](
      vt.renameColumn(spark, "main", "nope", "x2"))
    // the constraint still enforces through the mapped writes
    intercept[Exception] {
      vt.write(Seq(-5L).toDF("x").coalesce(1), "main", "bad", mode = "append")
    }
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN; SELECT serves the V1 fallback; DML works") {
    val vt = VersionedTable.create(Tables.scratch("cmap_sql"))
    vt.write((1 to 60).map(i => (i.toLong, s"o$i", i % 5))
      .toDF("id", "owner", "grp").repartition(3), "main", "v0",
      statsCols = Seq("id"))
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    val t = s"vt.`${vt.root}`"
    spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO doc_id")
    assert(spark.table(t).columns.toSeq === Seq("doc_id", "owner", "grp"))
    assert(spark.sql(s"SELECT sum(doc_id) FROM $t").head.getLong(0) ===
      (1L to 60L).sum)
    spark.sql(s"ALTER TABLE $t DROP COLUMN grp")
    assert(spark.table(t).columns.toSeq === Seq("doc_id", "owner"))
    // filters on the renamed column still resolve (and the relation prunes
    // through the re-keyed stats inside scanPlan)
    assert(spark.sql(s"SELECT owner FROM $t WHERE doc_id = 7").head.getString(0) === "o7")
    // DSv2 DML flows through the mapped write paths
    spark.sql(s"INSERT INTO $t VALUES (1000, 'new')")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 61L)
    spark.sql(s"DELETE FROM $t WHERE doc_id <= 10")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 51L)
    graft.sources.VtSqlDml.exec(spark, s"UPDATE $t SET owner = 'x' WHERE doc_id = 1000")
    assert(spark.sql(s"SELECT owner FROM $t WHERE doc_id = 1000").head.getString(0) === "x")
    // time travel through SQL still speaks each version's own names
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 0").columns.toSeq ===
      Seq("id", "owner", "grp"))
    // DROP COLUMN IF EXISTS tolerates absence; plain DROP refuses
    spark.sql(s"ALTER TABLE $t DROP COLUMN IF EXISTS nope")
    intercept[Exception](spark.sql(s"ALTER TABLE $t DROP COLUMN nope"))
    // format("vt") V1 relation serves the mapped snapshot too
    val v1 = spark.read.format("vt").option("path", vt.root.toString).load()
    assert(v1.columns.toSeq === Seq("doc_id", "owner"))
    assert(v1.where($"doc_id" === 1000L).count() === 1)
  }

  test("streaming read refuses a mapped snapshot loudly; delta export refuses too") {
    val vt = VersionedTable.create(Tables.scratch("cmap_refusals"))
    vt.write((1 to 10).map(i => (i.toLong, s"r$i")).toDF("k", "v").coalesce(1),
      "main", "v0")
    vt.renameColumn(spark, "main", "k", "kk")
    val e = intercept[Exception] {
      spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
      val q = spark.readStream.table(s"vt.`${vt.root}`").writeStream
        .format("memory").queryName("cmap_stream").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("column-mapped") ||
      Option(e.getCause).exists(_.getMessage.contains("column-mapped")))
    val e2 = intercept[UnsupportedOperationException](vt.exportDeltaLog("main"))
    assert(e2.getMessage.contains("columnMapping"))
  }

  test("MOR deletion vectors compose with a rename (positions are name-agnostic)") {
    val vt = VersionedTable.create(Tables.scratch("cmap_dv"))
    vt.write((1 to 30).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .coalesce(1), "main", "v0")
    vt.deleteWithVectors(spark, "k <= 10", "main")
    vt.renameColumn(spark, "main", "k", "key")
    val head = vt.read(spark, "main")
    assert(head.count() === 20)
    assert(head.agg(min($"key")).head.getLong(0) === 11L)
    // DML through the MOR + mapped read path
    vt.deleteWithVectors(spark, "key > 25", "main")
    assert(vt.read(spark, "main").count() === 15)
    assert(vt.countRows(spark) === 15)
  }
}
