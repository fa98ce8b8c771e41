package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.vt.VersionedTable

/** The r21 footer-based stats fast path must record EXACTLY what the
  * read-back Spark job recorded (min/max/nullCount per file per column) —
  * stats feed file pruning, whose decisions VersionedTableSpec pins by
  * numFiles, so any drift here would surface as wrong skipping. This spec
  * compares the commit-log stats of real writes against values recomputed
  * with a per-file Spark aggregation, across the type/shape matrix:
  * int, long, double, float, string (short + >64-codepoint), timestamp,
  * all-null columns, NaN doubles (footer refuses → job fallback), and files
  * that predate an ADD COLUMNS (read-as-null mirror). */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String) = Tables.scratch(name)

  private def jobStats(vt: VersionedTable, files: Seq[String], cols: Seq[String])
      : Map[String, Map[String, (Option[Double], Option[Double], Long)]] = {
    val root = vt.root
    files.map { f =>
      val df = spark.read.parquet(root.resolve(f).toString)
      f -> cols.filter(df.columns.contains).map { c =>
        val r = df.agg(min(col(c).cast("double")), max(col(c).cast("double")),
          sum(when(col(c).isNull, 1L).otherwise(0L))).collect().head
        c -> (Option(r.get(0)).map(_.asInstanceOf[Double]),
          Option(r.get(1)).map(_.asInstanceOf[Double]),
          if (r.isNullAt(2)) 0L else r.getLong(2))
      }.toMap
    }.toMap
  }

  test("numeric + timestamp + null stats from footers equal the Spark-job values") {
    val vt = VersionedTable.create(scratch("fstats_num"))
    val df = (1 to 1000).map { i =>
      (i, i.toLong * 1000000007L, i / 7.0, i.toFloat / 3f,
        new Timestamp(1700000000000L + i * 1000L),
        if (i % 3 == 0) None else Some(i * 2))
    }.toDF("i", "l", "d", "f", "ts", "opt")
      .repartition(4, col("i"))
    val c = vt.write(df, "main", "v0",
      statsCols = Seq("i", "l", "d", "f", "ts", "opt"))
    val expect = jobStats(vt, c.files, Seq("i", "l", "d", "f", "ts", "opt"))
    assert(c.files.nonEmpty)
    c.files.foreach { f =>
      val exp = expect(f)
      Seq("i", "l", "d", "f", "ts", "opt").foreach { cName =>
        val (mn, mx, nc) = exp(cName)
        assert(c.stats(f).get(cName) === mn.zip(mx).headOption,
          s"min/max mismatch for $cName in $f")
        assert(c.nullStats(f)(cName) === nc, s"nullCount mismatch for $cName in $f")
      }
    }
  }

  test("string stats (short and truncated-long) from footers equal the job values") {
    val vt = VersionedTable.create(scratch("fstats_str"))
    val longA = "a" * 100 + "zz"
    val longZ = "z" * 100 + "aa"
    val df = (Seq("kiwi", "apple", longA, longZ, "mango") ++
      (1 to 200).map(i => f"key$i%04d")).toDF("s")
      .repartition(3)
    val c = vt.write(df, "main", "v0", statsCols = Seq("s"))
    val root = vt.root
    c.files.foreach { f =>
      val r = spark.read.parquet(root.resolve(f).toString)
        .agg(min(col("s")), max(col("s"))).collect().head
      val exp = (graft.vt.VersionedTable.statsLower(r.getString(0)),
        graft.vt.VersionedTable.statsUpper(r.getString(1)))
      assert(c.strStats(f)("s") === exp, s"string stats mismatch in $f")
    }
  }

  test("all-null column omits min/max but keeps the null count (both paths)") {
    val vt = VersionedTable.create(scratch("fstats_nulls"))
    val df = (1 to 50).map(i => (i, Option.empty[java.lang.Double])).toDF("i", "dead")
    val c = vt.write(df, "main", "v0", statsCols = Seq("i", "dead"))
    c.files.foreach { f =>
      assert(!c.stats(f).contains("dead"))
      assert(c.nullStats(f)("dead") > 0L)
    }
  }

  test("NaN doubles fall back to the job path and keep its exact values") {
    val vt = VersionedTable.create(scratch("fstats_nan"))
    val df = Seq(1.0, 2.0, Double.NaN, 0.5).toDF("d")
      .coalesce(1)
    val c = vt.write(df, "main", "v0", statsCols = Seq("d"))
    // Spark's aggregate orders NaN greatest: max = NaN. The footer path
    // refuses NaN shapes, so the job must have produced this entry.
    val (mn, mx) = c.stats(c.files.head)("d")
    assert(mn === 0.5 && mx.isNaN)
  }

  test("files predating ADD COLUMNS record all-null stats for the new column") {
    val vt = VersionedTable.create(scratch("fstats_addcol"))
    vt.write((1 to 20).map(i => Tuple1(i)).toDF("i"), "main", "v0")
    val c1 = vt.write((21 to 40).map(i => (i, i * 10)).toDF("i", "extra").coalesce(1),
      "main", "v1: widen", mode = "append", mergeSchema = true,
      statsCols = Seq("i", "extra"))
    val oldFiles = vt.loadCommit(c1.parent.get).files.toSet
    // stats were collected for the NEW files only (write-path contract) —
    // analyze() would cover old ones; here just assert new-file exactness
    val newFiles = c1.files.filterNot(oldFiles)
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      assert(c1.stats(f)("extra") === ((210.0, 400.0)))
      assert(c1.nullStats(f)("extra") === 0L)
    }
    // and the ANALYZE backfill (footer path over files missing the column)
    val c2 = vt.computeStats(spark, Seq("extra"))
    oldFiles.foreach { f =>
      assert(!c2.stats(f).contains("extra") && !c2.strStats(f).contains("extra"))
      assert(c2.nullStats(f)("extra") === 20L ||
        c2.nullStats(f)("extra") > 0L) // one or more old files share the 20 rows
    }
  }
}
