package graft

import org.apache.spark.sql.functions._

import graft.vt.VersionedTable

/** CHECK constraints (Delta `ALTER TABLE … ADD CONSTRAINT` parity, carried
  * in [[graft.vt.Commit.props]]): metadata-only add/drop commits,
  * existing-data validation at add time, and fused enforcement inside every
  * row-adding write path — engine API and Spark 4's native constraint SQL
  * through the vt catalog.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def registerCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.vt",
      classOf[graft.sources.VtCatalog].getName)

  private def df(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"row$i")).toDF("k", "v")

  test("addCheckConstraint is a metadata-only commit that validates existing rows") {
    val vt = VersionedTable.create(Tables.scratch("ck_add"))
    val c0 = vt.write(df(1, 10), "main", "v0")
    val c1 = vt.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    assert(c1.files === c0.files, "constraint add must not rewrite data")
    assert(!c1.dataChange, "constraint add is dataChange=false (streaming readers skip it)")
    assert(vt.checkConstraints("main") === Map("k_positive" -> "k > 0"))
    // survives reopen (it is IN the commit log, not process state)
    assert(VersionedTable.open(vt.root.toString).checkConstraints("main")
      === Map("k_positive" -> "k > 0"))
    // a violated predicate refuses the ADD and publishes nothing
    val headBefore = vt.head("main").get.id
    val e = intercept[IllegalArgumentException] {
      vt.addCheckConstraint(spark, "main", "k_small", "k < 5")
    }
    assert(e.getMessage.contains("k_small") && e.getMessage.contains("existing row"))
    assert(vt.head("main").get.id === headBefore)
    // a typo'd column refuses with Spark's own analysis error
    intercept[Exception] {
      vt.addCheckConstraint(spark, "main", "bad_col", "nope > 0")
    }
    // a non-boolean predicate refuses
    val e2 = intercept[IllegalArgumentException] {
      vt.addCheckConstraint(spark, "main", "not_bool", "k + 1")
    }
    assert(e2.getMessage.contains("boolean"))
    // duplicate name refuses (case-insensitive)
    val e3 = intercept[IllegalArgumentException] {
      vt.addCheckConstraint(spark, "main", "K_POSITIVE", "k > -1")
    }
    assert(e3.getMessage.contains("already exists"))
    // non-row-local predicates refuse at ADD time (they would wedge or
    // destabilize every later write): aggregate, non-deterministic, subquery
    intercept[Exception] {
      vt.addCheckConstraint(spark, "main", "agg", "max(k) > 0")
    }
    val e4 = intercept[IllegalArgumentException] {
      vt.addCheckConstraint(spark, "main", "flaky", "rand() < 0.5")
    }
    assert(e4.getMessage.contains("deterministic"))
    val e5 = intercept[IllegalArgumentException] {
      vt.addCheckConstraint(spark, "main", "subq", "k IN (SELECT 1)")
    }
    assert(e5.getMessage.contains("subquery"))
    assert(vt.checkConstraints("main").keySet === Set("k_positive"),
      "no refused predicate may be recorded")
  }

  test("writes enforce the constraint: violating batches abort before any commit") {
    val vt = VersionedTable.create(Tables.scratch("ck_write"))
    vt.write(df(1, 10), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    val v1 = vt.head("main").get.version
    // compliant append passes
    vt.write(df(11, 12), "main", "ok", mode = "append")
    // violating append aborts with a nameable error naming the constraint
    val e = intercept[Exception] {
      vt.write(Seq((-1L, "bad")).toDF("k", "v"), "main", "bad", mode = "append")
    }
    assert(e.getMessage.contains("k_positive") ||
      Option(e.getCause).exists(_.getMessage.contains("k_positive")),
      s"error must name the constraint, got: ${e.getMessage}")
    assert(vt.head("main").get.version === v1 + 1, "no version published for the bad batch")
    // NULL satisfies a CHECK (SQL standard)
    vt.write(Seq((null.asInstanceOf[java.lang.Long], "nullk")).toDF("k", "v")
      .select($"k".cast("long").as("k"), $"v"), "main", "nulls", mode = "append")
    // after DROP CONSTRAINT the same batch lands
    vt.dropCheckConstraint("main", "k_positive")
    vt.write(Seq((-1L, "now ok")).toDF("k", "v"), "main", "post-drop", mode = "append")
    assert(vt.read(spark, "main").where($"k" < 0).count() === 1L)
    // dropping an unknown name refuses; IF EXISTS no-ops
    intercept[IllegalArgumentException] { vt.dropCheckConstraint("main", "ghost") }
    val h = vt.head("main").get
    assert(vt.dropCheckConstraint("main", "ghost", ifExists = true).id === h.id)
  }

  test("UPDATE / MERGE / upsert enforce constraints on the rows they mint") {
    val vt = VersionedTable.create(Tables.scratch("ck_dml"))
    vt.write(df(1, 10), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    val v = vt.head("main").get.version
    // UPDATE minting a violation aborts
    intercept[Exception] { vt.update(spark, "k = 3", Map("k" -> "-3"), "main") }
    assert(vt.head("main").get.version === v, "failed UPDATE must not publish")
    // compliant UPDATE passes
    vt.update(spark, "k = 3", Map("k" -> "300"), "main")
    assert(vt.read(spark, "main").where($"k" === 300).count() === 1L)
    // upsert minting a violation aborts; compliant upsert passes
    intercept[Exception] {
      vt.upsert(spark, Seq((-7L, "bad")).toDF("k", "v"), Seq("k"), "main")
    }
    vt.upsert(spark, Seq((7L, "good")).toDF("k", "v"), Seq("k"), "main")
    assert(vt.read(spark, "main").where($"k" === 7).select("v").as[String].head() === "good")
  }

  test("mergeSchema append omitting the constrained column passes (rows read NULL)") {
    val vt = VersionedTable.create(Tables.scratch("ck_mergeschema"))
    vt.write(df(1, 5), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    // the appended frame has only `v` + a new column; `k` reads NULL → passes
    vt.write(Seq(("novel", 1.5)).toDF("v", "score"), "main", "evolve",
      mode = "append", mergeSchema = true)
    val out = vt.read(spark, "main")
    assert(out.where($"k".isNull).count() === 1L)
  }

  test("overwriteSchema refusing to orphan a constraint; REVERT restores the old set") {
    val vt = VersionedTable.create(Tables.scratch("ck_orphan"))
    vt.write(df(1, 5), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0") // v1
    val e = intercept[IllegalArgumentException] {
      vt.write(Seq(("a", 1)).toDF("name", "n"), "main", "clobber",
        overwriteSchema = true)
    }
    assert(e.getMessage.contains("k_positive"))
    // dropping first makes the schema swap legal
    vt.dropCheckConstraint("main", "k_positive") // v2
    vt.write(Seq(("a", 1)).toDF("name", "n"), "main", "clobber",
      overwriteSchema = true) // v3
    assert(vt.checkConstraints("main").isEmpty)
    // revert to v1 restores STATE — the constraint comes back with it
    vt.revert("main", 1L) // v4
    assert(vt.checkConstraints("main") === Map("k_positive" -> "k > 0"))
    intercept[Exception] {
      vt.write(Seq((-1L, "bad")).toDF("k", "v"), "main", "post-revert", mode = "append")
    }
  }

  test("SQL: ALTER TABLE ADD/DROP CONSTRAINT + INSERT enforcement through the catalog") {
    registerCatalog()
    val root = Tables.scratch("ck_sql")
    val vt = VersionedTable.create(root)
    vt.write(df(1, 10), "main", "v0")
    val t = s"vt.`$root`"
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT k_positive CHECK (k > 0)").collect()
    assert(vt.checkConstraints("main") === Map("k_positive" -> "k > 0"))
    // compliant INSERT lands
    spark.sql(s"INSERT INTO $t VALUES (42L, 'fine')").collect()
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE k = 42").as[Long].head() === 1L)
    // violating INSERT aborts and publishes nothing
    val v = vt.head("main").get.version
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (-5L, 'bad')").collect()
    }
    def chain(x: Throwable): List[Throwable] =
      if (x == null) Nil else x :: chain(x.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("k_positive"))),
      s"error must name the constraint, got: ${e.getMessage}")
    assert(vt.head("main").get.version === v)
    // adding a constraint the data violates refuses through SQL too
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT small CHECK (k < 5)").collect()
    }
    // Spark's own analyzer validates the existing rows BEFORE alterTable is
    // called and raises NEW_CHECK_CONSTRAINT_VIOLATION naming the predicate
    // (the engine's own validation still guards the programmatic door)
    assert(chain(e2).exists(c => Option(c.getMessage).exists(m =>
      m.contains("small") || m.contains("k < 5"))),
      s"got: ${chain(e2).map(c => c.getClass.getSimpleName + ": " + c.getMessage).mkString(" | ")}")
    assert(vt.checkConstraints("main").keySet === Set("k_positive"),
      "the violated ADD must not record the constraint")
    // DROP CONSTRAINT, then the violating row lands
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT k_positive").collect()
    spark.sql(s"INSERT INTO $t VALUES (-5L, 'now fine')").collect()
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE k < 0").as[Long].head() === 1L)
    // DROP unknown refuses; IF EXISTS no-ops
    intercept[Exception] { spark.sql(s"ALTER TABLE $t DROP CONSTRAINT ghost").collect() }
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT IF EXISTS ghost").collect()
  }

  test("SQL: CREATE TABLE with an inline CHECK constraint enforces from v0") {
    registerCatalog()
    val root = Tables.scratch("ck_create")
    val t = s"vt.`$root`"
    spark.sql(
      s"CREATE TABLE $t (k BIGINT, v STRING, CONSTRAINT k_pos CHECK (k > 0)) USING vt")
      .collect()
    val vt = VersionedTable.open(root)
    assert(vt.checkConstraints("main") === Map("k_pos" -> "k > 0"))
    spark.sql(s"INSERT INTO $t VALUES (1L, 'ok')").collect()
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (0L, 'bad')").collect() }
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() === 1L)
    // a CREATE whose constraint list fails pre-flight (duplicate
    // case-insensitive names) creates NOTHING — the retried statement works
    val root2 = Tables.scratch("ck_create_dup")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE vt.`$root2` (k BIGINT, CONSTRAINT AB CHECK (k > 0), " +
        "CONSTRAINT ab CHECK (k < 9)) USING vt").collect()
    }
    spark.sql(s"CREATE TABLE vt.`$root2` (k BIGINT, CONSTRAINT ab CHECK (k > 0)) USING vt")
      .collect()
    assert(VersionedTable.open(root2).checkConstraints("main") === Map("ab" -> "k > 0"))
  }

  test("a write losing the version-slot race to ADD CONSTRAINT re-validates on retry") {
    // the engine's optimistic-concurrency answer to "constraint lands while
    // a violating batch is in flight": the slot CAS serializes the COMMITS,
    // so whichever side loses retries against the new head — and the
    // retried write now carries the constraint's fused guard
    val vt = VersionedTable.create(Tables.scratch("ck_race"))
    vt.write(df(1, 3), "main", "seed")
    @volatile var fired = false
    vt.addPreCommitHook("constraint-racer") { (_, candidate) =>
      if (!fired && candidate.message == "racer") {
        fired = true
        // a SEPARATE handle (second process in real life) publishes the
        // constraint first — it claims the slot this write targeted
        VersionedTable.open(vt.root.toString)
          .addCheckConstraint(spark, "main", "k_pos", "k > 0")
        ()
      }
    }
    try {
      val bad = Seq((-5L, "bad")).toDF("k", "v")
      // the in-flight write validated against the PRE-constraint head
      // (nothing to guard) but loses the slot: a clean CME, no fork
      intercept[java.util.ConcurrentModificationException] {
        vt.write(bad, "main", "racer", mode = "append")
      }
      // the retry re-reads the head, sees the constraint, and the fused
      // guard refuses the batch for the REAL reason
      val e = intercept[Exception] {
        vt.write(bad, "main", "racer retry", mode = "append")
      }
      def chain(x: Throwable): List[Throwable] =
        if (x == null) Nil else x :: chain(x.getCause)
      assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("k_pos"))))
      assert(vt.checkConstraints("main") === Map("k_pos" -> "k > 0"))
      assert(vt.read(spark, "main").where($"k" < 0).count() === 0L,
        "no violating row may be visible on any committed version")
    } finally vt.removePreCommitHook("constraint-racer")
  }

  test("table_changes refuses tables whose columns collide with the CDF metadata names") {
    val vt = VersionedTable.create(Tables.scratch("ck_cdf_clash"))
    vt.write(Seq((1L, 2L)).toDF("k", "version"), "main", "v0")
    vt.write(Seq((2L, 3L)).toDF("k", "version"), "main", "v1", mode = "append")
    val e = intercept[IllegalArgumentException] {
      vt.tableChanges(spark, "main", 1, 1).collect()
    }
    assert(e.getMessage.contains("version") && e.getMessage.contains("collide"))
  }

  test("staged writes (lakeFS stage/commit) and RTAS enforce the head's constraints") {
    registerCatalog()
    val root = Tables.scratch("ck_staged")
    val vt = VersionedTable.create(root)
    vt.write(df(1, 5), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    // stage(): the violating snapshot aborts at staging time
    intercept[Exception] { vt.stage(Seq((-1L, "bad")).toDF("k", "v"), "main") }
    assert(!vt.hasStaged("main"))
    vt.stage(Seq((9L, "ok")).toDF("k", "v"), "main")
    vt.commitStaged("main", "staged ok")
    assert(vt.read(spark, "main").count() === 1L)
    // RTAS: a replacement snapshot violating the constraint aborts; the
    // old head survives
    val before = vt.head("main").get.id
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE vt.`$root` AS SELECT -1L AS k, 'bad' AS v").collect()
    }
    assert(vt.head("main").get.id === before)
    // a compliant RTAS replaces
    spark.sql(s"REPLACE TABLE vt.`$root` AS SELECT 5L AS k, 'good' AS v").collect()
    assert(vt.read(spark, "main").select("v").as[String].head() === "good")
  }

  test("constraints ride the commit props: time travel sees the old set; catalog reports them") {
    registerCatalog()
    val root = Tables.scratch("ck_travel")
    val vt = VersionedTable.create(root)
    vt.write(df(1, 5), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0") // v1
    val v0 = vt.resolveRead("main", versionAsOf = Some(0L))
    assert(VersionedTable.checkConstraints(v0).isEmpty)
    val v1 = vt.resolveRead("main", versionAsOf = Some(1L))
    assert(VersionedTable.checkConstraints(v1) === Map("k_positive" -> "k > 0"))
    // the DSv2 Table surface reports them (Spark's own writes see them too)
    val cat = new graft.sources.VtCatalog()
    cat.initialize("vt", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty, root))
    val cs = tbl.constraints()
    assert(cs.length === 1)
    val ck = cs.head.asInstanceOf[org.apache.spark.sql.connector.catalog.constraints.Check]
    assert(ck.name() === "k_positive" && ck.predicateSql() === "k > 0" && ck.enforced())
  }

  test("SET/UNSET TBLPROPERTIES: durable free-form props, reserved constraint namespace") {
    registerCatalog()
    val root = Tables.scratch("ck_props")
    val vt = VersionedTable.create(root)
    vt.write(df(1, 3), "main", "v0")
    val t = s"vt.`$root`"
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('team' = 'data-eng', 'pii' = 'false')")
      .collect()
    // metadata-only commit; SHOW TBLPROPERTIES surfaces them natively
    val h = vt.head("main").get
    assert(!h.dataChange && h.props === Map("team" -> "data-eng", "pii" -> "false"))
    val shown = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("team").contains("data-eng") && shown.get("pii").contains("false"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('pii')").collect()
    assert(vt.head("main").get.props === Map("team" -> "data-eng"))
    // survives reopen, rides time travel
    assert(VersionedTable.open(root).head("main").get.props === Map("team" -> "data-eng"))
    // the constraint namespace refuses the raw-property door (it would skip
    // existing-data validation)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('constraint.check.evil' = '1 = 0')")
        .collect()
    }
    def chain(x: Throwable): List[Throwable] =
      if (x == null) Nil else x :: chain(x.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("ADD/DROP CONSTRAINT"))))
    // constraints and free props coexist; SHOW TBLPROPERTIES lists both
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT k_pos CHECK (k > 0)").collect()
    val both = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(both.get("constraint.check.k_pos").contains("k > 0") &&
      both.get("team").contains("data-eng"))
  }

  test("merge and cherry-pick enforce constraints on imported rows; props merge 3-way") {
    val vt = VersionedTable.create(Tables.scratch("ck_merge"))
    vt.write(df(1, 5), "main", "base") // v0 = merge base
    vt.createBranch("dev", "main")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0") // main-only
    // dev never carried the constraint: its append is un-guarded there
    vt.write(Seq((-9L, "bad")).toDF("k", "v"), "dev", "dev append", mode = "append")
    val e = intercept[IllegalStateException] { vt.merge("dev", "main") }
    assert(e.getMessage.contains("k_positive"), s"got: ${e.getMessage}")
    // a compliant branch merges, and the constraint survives the merge
    vt.createBranch("dev2", "main")
    vt.write(Seq((77L, "ok")).toDF("k", "v"), "dev2", "dev2 append", mode = "append")
    vt.merge("dev2", "main")
    assert(vt.checkConstraints("main") === Map("k_positive" -> "k > 0"))
    assert(vt.read(spark, "main").where($"k" === 77).count() === 1L)
    // a constraint added ONLY on the source branch arrives via the 3-way
    // props merge and judges the target's own post-base files
    val vt2 = VersionedTable.create(Tables.scratch("ck_merge2"))
    vt2.write(df(1, 5), "main", "base")
    vt2.createBranch("rules", "main")
    vt2.addCheckConstraint(spark, "rules", "k_small", "k < 100")
    vt2.write(Seq((500L, "big")).toDF("k", "v"), "main", "main append", mode = "append")
    val e2 = intercept[IllegalStateException] { vt2.merge("rules", "main") }
    assert(e2.getMessage.contains("k_small"))
    // same-key divergent property edits conflict loudly
    val vt3 = VersionedTable.create(Tables.scratch("ck_merge3"))
    vt3.write(df(1, 3), "main", "base")
    vt3.createBranch("side", "main")
    vt3.setTableProperties("main", Map("team" -> "alpha"))
    vt3.setTableProperties("side", Map("team" -> "beta"))
    vt3.write(df(4, 5), "side", "side rows", mode = "append")
    val e3 = intercept[IllegalStateException] { vt3.merge("side", "main") }
    assert(e3.getMessage.contains("team"))
    // cherry-pick: transplanting a violating commit refuses
    val vt4 = VersionedTable.create(Tables.scratch("ck_pick"))
    vt4.write(df(1, 5), "main", "base")
    vt4.createBranch("feat", "main")
    vt4.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    vt4.write(Seq((-3L, "bad")).toDF("k", "v"), "feat", "bad pick", mode = "append")
    val e4 = intercept[IllegalStateException] {
      vt4.cherryPick("feat", vt4.head("feat").get.version, "main")
    }
    assert(e4.getMessage.contains("k_positive"))
  }

  test("CREATE TABLE TBLPROPERTIES persist; the write guard is not pushed below joins") {
    registerCatalog()
    val root = Tables.scratch("ck_create_props")
    spark.sql(
      s"CREATE TABLE vt.`$root` (k BIGINT, v STRING) USING vt " +
        "TBLPROPERTIES ('team' = 'ml', 'tier' = 'gold')").collect()
    val vt = VersionedTable.open(root)
    assert(vt.head("main").get.props === Map("team" -> "ml", "tier" -> "gold"))
    // CTAS carries them too (staged path)
    val root2 = Tables.scratch("ck_ctas_props")
    spark.sql(
      s"CREATE TABLE vt.`$root2` TBLPROPERTIES ('team' = 'ml') AS " +
        "SELECT 1L AS k, 'a' AS v").collect()
    assert(VersionedTable.open(root2).head("main").get.props === Map("team" -> "ml"))
    // the constraint namespace still refuses the raw-TBLPROPERTIES door
    intercept[Exception] {
      spark.sql(s"CREATE TABLE vt.`${Tables.scratch("ck_create_evil")}` " +
        "(k BIGINT) USING vt TBLPROPERTIES ('constraint.check.x' = '1=0')").collect()
    }
    // PUSHDOWN BARRIER: writing a joined frame that FILTERS OUT the
    // violating row must succeed — a deterministic guard filter would be
    // pushed below the join and raise on the discarded row. The engine
    // guard judges exactly the rows that land. (Through SQL `INSERT INTO`,
    // SPARK'S OWN constraint layer — it reads Table.constraints() and
    // injects its own check — pre-filters the join INPUTS and may abort
    // early on a row the join would drop: fail-safe, and theirs; every
    // ENGINE door goes through the barrier below.)
    vt.addCheckConstraint(spark, "main", "k_pos", "k > 0")
    val left = Seq((1L, "keep"), (-5L, "dropped-by-join")).toDF("k", "v")
    val keys = Seq(Tuple1(1L)).toDF("k")
    vt.write(left.join(keys, "k").select($"k", $"v"), "main",
      "join-filtered append", mode = "append")
    assert(spark.sql(s"SELECT count(*) FROM vt.`$root`").as[Long].head() === 1L)
  }

  test("streaming epochs enforce constraints: the violating micro-batch fails, nothing commits") {
    registerCatalog()
    val root = Tables.scratch("ck_stream")
    val vt = VersionedTable.create(root)
    vt.write(df(1, 3), "main", "v0")
    vt.addCheckConstraint(spark, "main", "k_positive", "k > 0")
    val v = vt.head("main").get.version
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    mem.addData((7L, "ok"), (-1L, "bad"))
    val q = mem.toDF().toDF("k", "v").writeStream
      .format("vt")
      .option("path", root)
      .option("checkpointLocation", Tables.scratch("ck_stream_cp"))
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def chain(x: Throwable): List[Throwable] =
      if (x == null) Nil else x :: chain(x.getCause)
    assert(chain(err).exists(c => Option(c.getMessage).exists(_.contains("k_positive"))))
    q.stop()
    assert(vt.head("main").get.version === v, "the violating epoch must not commit")
  }
}
