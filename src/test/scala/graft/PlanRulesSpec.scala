package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Custom optimizer rules injected via GraftExtensions: plan shape AND
  * result equality vs the un-extended session. */
class PlanRulesSpec extends SparkSpec {

  test("LevenshteinPrefilter adds the length guard and the threshold DP") {
    val shared = spark
    // truth from the UN-extended session (plain full-DP levenshtein);
    // parquet-backed input so the Filter survives optimization (a literal
    // LocalRelation would be constant-folded away before the rule matters)
    def query(s: SparkSession) = {
      Tables.documents(s, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")) <= 3)
        .select("doc_id")
    }
    val expected = query(spark).collect().map(_.getLong(0)).toSet
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val df = query(s2)
      val optimized = df.queryExecution.optimizedPlan.toString
      // the rewrite happened: length guard + 3-arg (thresholded) levenshtein
      assert(optimized.contains("abs("), s"no length guard in:\n$optimized")
      assert("levenshtein\\(.*Some\\(3\\)\\)".r.findFirstIn(optimized).isDefined,
        s"no thresholded levenshtein in:\n$optimized")
      // semantics preserved exactly
      assert(df.collect().map(_.getLong(0)).toSet === expected)
      // the cast form that DataFrame code produces rewrites too
      val casted = Tables.documents(s2, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")).cast("long") <= 3L)
        .select("doc_id")
      val castedPlan = casted.queryExecution.optimizedPlan.toString
      assert("levenshtein\\(.*Some\\(3\\)\\)".r.findFirstIn(castedPlan).isDefined,
        s"cast form not rewritten:\n$castedPlan")
      assert(casted.collect().map(_.getLong(0)).toSet === expected)
      // a Long threshold above Int.MaxValue must NOT be rewritten: the Int
      // cast would wrap it negative, flipping an always-true predicate
      val big = Tables.documents(s2, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")) <= 3000000000L)
        .select("doc_id")
      val bigPlan = big.queryExecution.optimizedPlan.toString
      assert("levenshtein\\(.*Some\\(".r.findFirstIn(bigPlan).isEmpty,
        s"oversized threshold was rewritten:\n$bigPlan")
      assert(big.count() === Tables.documents(s2, sf).count()) // stays always-true
      // negative thresholds are likewise untouched (always-false predicate)
      val neg = Tables.documents(s2, sf)
        .where(levenshtein(substring(col("text"), 1, 6), lit("common")) <= -1)
      assert("levenshtein\\(.*Some\\(".r
        .findFirstIn(neg.queryExecution.optimizedPlan.toString).isEmpty)
      assert(neg.count() === 0L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("table_changes TVF resolves through the analyzer rule (Delta CDF SQL surface)") {
    val shared = spark
    // the table is built with the SHARED session; the extended session only
    // has to RESOLVE the function — tables are path-addressed, no state moves
    val vt = graft.vt.VersionedTable.create(Tables.scratch("tvf_changes"))
    import shared.implicits._
    def band(m: Int) = (1 to 30).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .where($"k" % 3 === m)
    vt.write(band(0), "main", "v0")
    val c1 = vt.write(band(1), "main", "v1", mode = "append")
    // a wall-clock instant strictly between v1 and v2, for timestamp bounds
    while (System.currentTimeMillis() <= c1.ts) Thread.sleep(1)
    val betweenV1V2 = System.currentTimeMillis()
    while (System.currentTimeMillis() <= betweenV1V2) Thread.sleep(1)
    vt.write(band(2), "main", "v2", mode = "append")
    vt.createTag("rel-v2", "main") // tags v2 (the head)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val df = s2.sql(
        s"SELECT k, _change_type, _commit_version FROM " +
          s"table_changes('${vt.root}', 1, 2) ORDER BY k")
      // Delta's CDF columns, correct values: v1+v2 appends as inserts
      assert(df.columns.toSeq === Seq("k", "_change_type", "_commit_version"))
      val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.forall(_._2 == "insert"))
      assert(rows.filter(_._3 == 1L).map(_._1).sorted
        === (1 to 30).filter(_ % 3 == 1).map(_.toLong))
      assert(rows.filter(_._3 == 2L).map(_._1).sorted
        === (1 to 30).filter(_ % 3 == 2).map(_.toLong))
      // endVersion defaults to head; _commit_timestamp is a real timestamp
      val full = s2.sql(s"SELECT * FROM table_changes('${vt.root}', 0)")
      assert(full.schema("_commit_timestamp").dataType
        === org.apache.spark.sql.types.TimestampType)
      assert(full.count() === 30L) // v0 snapshot + both appends
      assert(full.where($"_commit_timestamp".isNull).count() === 0L)
      // SCALE PIN: an append-only interval scans ONLY the delta files —
      // the v0 snapshot's files never enter the plan
      val v0Files = vt.head("main").map(_ => vt.resolveRead("main",
        versionAsOf = Some(0L)).files.toSet).get
      val scanned = s2.sql(
        s"SELECT k FROM table_changes('${vt.root}', 1, 2)").inputFiles.toSet
      assert(scanned.nonEmpty &&
        !scanned.exists(f => v0Files.exists(v0 => f.endsWith(v0))),
        s"append-only table_changes must not scan the base snapshot: $scanned")
      // TIMESTAMP bounds (Delta's typed-argument rule: strings are
      // timestamps): a start timestamp resolves first-at-or-after → v2
      // only; an end timestamp resolves newest-at-or-before → v1 only
      val fromTs = s2.sql(s"SELECT DISTINCT _commit_version FROM " +
        s"table_changes('${vt.root}', '$betweenV1V2')")
        .collect().map(_.getLong(0)).toSet
      assert(fromTs === Set(2L), s"start-ts must resolve to v2, got $fromTs")
      val toTs = s2.sql(s"SELECT DISTINCT _commit_version FROM " +
        s"table_changes('${vt.root}', 1, '$betweenV1V2')")
        .collect().map(_.getLong(0)).toSet
      assert(toTs === Set(1L), s"end-ts must resolve to v1, got $toTs")
      // TAG bounds (r20): a string naming an existing tag resolves to the
      // tagged commit's version — matching the RESTORE TO TAG verb; tags
      // win over the timestamp reading (they are explicit user names)
      val fromTag = s2.sql(s"SELECT DISTINCT _commit_version FROM " +
        s"table_changes('${vt.root}', 'rel-v2')")
        .collect().map(_.getLong(0)).toSet
      assert(fromTag === Set(2L), s"tag start must resolve to v2, got $fromTag")
      val tagBoth = s2.sql(s"SELECT DISTINCT _commit_version FROM " +
        s"table_changes('${vt.root}', 1, 'rel-v2')")
        .collect().map(_.getLong(0)).toSet
      assert(tagBoth === Set(1L, 2L), s"tag end bound inclusive, got $tagBoth")
      // a string naming NO tag still refuses as a malformed timestamp
      intercept[Exception] {
        s2.sql(s"SELECT * FROM table_changes('${vt.root}', 'no-such-tag')").collect()
      }
      // a tag pinned on ANOTHER branch must refuse, not silently misread
      // as a version number on this one (r20 review fix)
      vt.createBranch("side", "main")
      vt.write(band(0), "side", "side-v", mode = "append")
      vt.createTag("side-tag", "side")
      val e3 = intercept[Exception] {
        s2.sql(s"SELECT * FROM table_changes('${vt.root}', 'side-tag')").collect()
      }
      assert(e3.getMessage.contains("not on branch") ||
        Option(e3.getCause).exists(_.getMessage.contains("not on branch")))
      // non-literal / malformed arguments refuse with the usage shape
      val e = intercept[Exception] {
        s2.sql(s"SELECT * FROM table_changes('${vt.root}', k)").collect()
      }
      assert(e.getMessage.contains("table_changes") ||
        Option(e.getCause).exists(_.getMessage.contains("table_changes")))
      val e2 = intercept[Exception] {
        s2.sql(s"SELECT * FROM table_changes('${vt.root}')").collect()
      }
      assert(e2.getMessage.contains("2 or 3 arguments") ||
        Option(e2.getCause).exists(_.getMessage.contains("2 or 3 arguments")))
      // an UNKNOWN TVF still fails with Spark's own error (the rule must
      // not swallow other names)
      intercept[Exception] { s2.sql("SELECT * FROM no_such_tvf(1)").collect() }
      // FOREIGN DELTA routing: a non-vt path carrying a _delta_log serves
      // the same SQL surface through the log replayer
      locally {
        import graft.vt.{DeltaLogFixture => F}
        import s2.implicits._
        val droot = java.nio.file.Paths.get(Tables.scratch("tvf_delta"))
        java.nio.file.Files.createDirectories(droot)
        val ddf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        val (f0, sz0) = F.writeDataFile(droot, ddf.where($"k" <= 2), "p0")
        val (f1, sz1) = F.writeDataFile(droot, ddf.where($"k" === 3), "p1")
        F.writeCommit(droot, 0, Seq(F.protocolLine(),
          F.metaDataLine(ddf.schema.json, Nil), F.addLine(f0, sz0)))
        F.writeCommit(droot, 1, Seq(F.addLine(f1, sz1)))
        val dch = s2.sql(s"SELECT k, _change_type, _commit_version FROM " +
          s"table_changes('$droot', 1, 1)")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        assert(dch.toSeq === Seq((3L, "insert", 1L)),
          s"foreign feed must carry exactly commit 1's insert, got ${dch.mkString(",")}")
        // mixed version/timestamp bounds refuse (two different clocks)
        val em = intercept[Exception] {
          s2.sql(s"SELECT * FROM table_changes('$droot', 1, '2026-01-01')").collect()
        }
        assert(em.getMessage.contains("agree in kind") ||
          Option(em.getCause).exists(_.getMessage.contains("agree in kind")))
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
