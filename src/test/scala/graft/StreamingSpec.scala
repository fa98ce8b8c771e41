package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{Ev, SessOut}

/** Streaming forms must agree with their batch twins on the same rows. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling counts equal the batch tumbling counts") {
    val batch = EventsStreaming.tumblingCounts(Tables.events(spark, sf))
      .orderBy("win_start", "event_type").collect()

    // file-source streams read directories: stage the single parquet file
    val dir = java.nio.file.Paths.get(Tables.scratch("stream_events"))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val eventsPath = dir.toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema
    val streamed = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(eventsPath))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_val_c"))
      .select(col("w.start").cast("long").as("win_start"), col("event_type"),
        col("cnt"), col("sum_val_c"))
    val q = streamed.writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_test").orderBy("win_start", "event_type").collect()
      assert(got.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming hopping counts equal the batch hopping counts") {
    val batch = EventsStreaming.hoppingCounts(Tables.events(spark, sf))
      .orderBy("win_start", "event_type").collect()
    val dir = java.nio.file.Paths.get(Tables.scratch("stream_events_hop"))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    // native sliding window(): same 4-windows-per-event, slide-aligned starts
    val streamed = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_val_c"))
      .select(col("w.start").cast("long").as("win_start"), col("event_type"),
        col("cnt"), col("sum_val_c"))
    val q = streamed.writeStream.format("memory").queryName("hopping_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hopping_test").orderBy("win_start", "event_type").collect()
      assert(got.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions on the gap rule") {
    implicit val s = spark
    val mem = MemoryStream[Ev](spark)
    val out = EventsStreaming.streamingSessionize(mem.toDS(), gapSec = 100)
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      // user 1: two events close together, then a gap > 100s closes session 0
      mem.addData(Ev(1L, 1000L), Ev(1L, 1050L))
      q.processAllAvailable()
      mem.addData(Ev(1L, 2000L)) // closes [1000,1050], opens session 1
      q.processAllAvailable()
      val sessions = spark.table("sess_test").as[SessOut].collect().toSeq
      assert(sessions === Seq(SessOut(1L, 0L, 2L, 1000L, 1050L)))
    } finally q.stop()
  }

  test("streaming dedup keeps one row per content fingerprint") {
    val ts = (sec: Long) => new Timestamp(sec * 1000L)
    val dir = java.nio.file.Paths.get(Tables.scratch("stream_dedup"))
    java.nio.file.Files.createDirectories(dir)
    Seq((1L, ts(0), "same text"), (2L, ts(10), "same text"), (3L, ts(20), "other"))
      .toDF("event_id", "ts", "payload")
      .write.mode("overwrite").parquet(dir.toString)
    val src = spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, payload STRING")
      .parquet(dir.toString)
    val deduped = graft.streaming.EventsStreaming.streamingDedup(src, "event_id", "payload")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_test").select("payload")
        .as[String].collect().sorted
      assert(got === Array("other", "same text"))
    } finally q.stop()
  }

  test("streaming ingest commits one append version per micro-batch") {
    val vt = graft.vt.VersionedTable.create(Tables.scratch("stream_ingest"))
    val mem = MemoryStream[Ev](spark)
    val q = EventsStreaming.streamingVersionedIngest(mem.toDS().toDF(), vt)
      .option("checkpointLocation", Tables.scratch("stream_ingest_ckpt")).start()
    try {
      mem.addData(Ev(1L, 100L), Ev(2L, 200L))
      q.processAllAvailable()
      mem.addData(Ev(3L, 300L))
      q.processAllAvailable()
      val head = vt.head("main").get
      assert(head.version === 1) // two micro-batches -> v0 append + v1 append
      assert(head.message.startsWith("stream batch"))
      assert(vt.read(spark, "main").count() === 3L)
      // each batch boundary is a time-travel point
      assert(vt.readVersion(spark, "main", 0).count() === 2L)
    } finally q.stop()
  }

  test("streaming dedup ingest screens each micro-batch against the persisted signatures") {
    val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the deep green forest while the hunter watches quietly from a hill"
    val vt = graft.vt.VersionedTable.create(Tables.scratch("stream_dedup_vt"))
    val sigVt = graft.vt.VersionedTable.create(Tables.scratch("stream_dedup_sigs"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = EventsStreaming.streamingDedupIngest(
        mem.toDS().toDF("doc_id", "text"), vt, sigVt)
      .option("checkpointLocation", Tables.scratch("stream_dedup_ckpt")).start()
    try {
      // batch 0: the seed corpus (all fresh)
      mem.addData((1L, base),
        (2L, "unrelated corpus filler about columnar storage formats and shuffle services"))
      q.processAllAvailable()
      assert(vt.read(spark, "main").count() === 2L)
      assert(sigVt.head("main").map(_.version) === vt.head("main").map(_.version))
      // batch 1: an exact dup of doc 1, a near-dup (one word off), a fresh doc
      mem.addData((10L, base), (11L, base.replace("lazy", "sleepy")),
        (12L, "a totally fresh document on watermarking and stateful streaming"))
      q.processAllAvailable()
      val kept = vt.read(spark, "main").select("doc_id").as[Long].collect().sorted
      assert(kept === Array(1L, 2L, 12L), s"kept=${kept.toSeq}") // 10 exact, 11 near → dropped
      // the signature table advanced in lockstep and covers only kept docs
      assert(sigVt.head("main").map(_.version) === vt.head("main").map(_.version))
      assert(sigVt.read(spark, "main").select("doc_id").as[Long].collect().sorted
        === Array(1L, 2L, 12L))
      // batch 2: a dup OF A PREVIOUS BATCH'S survivor (12) — screened against
      // the signatures maintained across batches, not just the seed corpus
      mem.addData((20L, "a totally fresh document on watermarking and stateful streaming"))
      q.processAllAvailable()
      assert(vt.read(spark, "main").select("doc_id").as[Long].collect().sorted
        === Array(1L, 2L, 12L))
      // every batch boundary is a time-travel point of the corpus
      assert(vt.readVersion(spark, "main", 0).count() === 2L)
      assert(vt.readVersion(spark, "main", 1).count() === 3L)
      // batch 3: two byte-identical docs in ONE micro-batch — the
      // within-batch exact collapse keeps only the min-doc_id survivor
      mem.addData((30L, "same-batch duplicate pair content goes here"),
        (31L, "same-batch duplicate pair content goes here"))
      q.processAllAvailable()
      assert(vt.read(spark, "main").select("doc_id").as[Long].collect().sorted
        === Array(1L, 2L, 12L, 30L))
    } finally q.stop()
  }

  test("dedup ingest heals a stale signature table before screening (crash between commit and maintenance)") {
    val vt = graft.vt.VersionedTable.create(Tables.scratch("heal_vt"))
    val sigVt = graft.vt.VersionedTable.create(Tables.scratch("heal_sigs"))
    // batch 0 lands normally
    EventsStreaming.dedupIngestBatch(vt, sigVt)(
      Seq((1L, "the first corpus document with enough words to shingle properly here")).toDF("doc_id", "text"), 0L)
    // simulate the crash: batch 1's corpus commit happened but the process
    // died BEFORE signature maintenance — sigVt is one version behind
    vt.write(Seq((2L, "a second document committed without its signatures"))
      .toDF("doc_id", "text"), "main", "stream batch 1", mode = "append")
    assert(sigVt.head("main").get.version < vt.head("main").get.version)
    // batch 2 contains an exact dup of the UNSIGNED doc 2: without the
    // heal-first step it would screen against stale signatures and land
    EventsStreaming.dedupIngestBatch(vt, sigVt)(
      Seq((3L, "a second document committed without its signatures")).toDF("doc_id", "text"), 2L)
    assert(vt.read(spark, "main").select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L), "stale-signature duplicate leaked into the corpus")
    assert(sigVt.head("main").map(_.version) === vt.head("main").map(_.version))
  }

  test("stream-stream interval join equals the batch range join on the same rows") {
    val ts = (s: Long) => new Timestamp(s * 1000L)
    val mk = (rows: Seq[(Long, Long, Long)]) => // (event_id, sec, user_id)
      rows.map { case (e, sec, u) => (e, ts(sec), u) }.toDF("event_id", "ts", "user_id")
    val lRows = Seq((1L, 1000L, 10L), (2L, 5000L, 10L), (3L, 1000L, 20L))
    val rRows = Seq((101L, 1500L, 10L), (102L, 5500L, 10L), (103L, 1200L, 20L))
    val dirL = java.nio.file.Paths.get(Tables.scratch("ssj_l"))
    val dirR = java.nio.file.Paths.get(Tables.scratch("ssj_r"))
    mk(lRows).write.mode("overwrite").parquet(dirL.toString)
    mk(rRows).write.mode("overwrite").parquet(dirR.toString)
    val schema = spark.read.parquet(dirL.toString).schema
    val joined = EventsStreaming.streamingIntervalJoin(
      spark.readStream.schema(schema).parquet(dirL.toString),
      spark.readStream.schema(schema).parquet(dirR.toString))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_test").select("l_event", "r_event")
        .as[(Long, Long)].collect().toSet
      // batch truth: r within [l.ts, l.ts + 1h] for the same user
      val expect = (for {
        (le, ls, lu) <- lRows; (re, rs, ru) <- rRows
        if lu == ru && rs >= ls && rs <= ls + 3600
      } yield (le, re)).toSet
      assert(got === expect)
      assert(expect === Set((1L, 101L), (2L, 102L), (3L, 103L)))
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from the static dim") {
    // the stream side joins a STATIC DataFrame — Spark re-plans the static
    // side per micro-batch, no state store involved; equals the batch join
    val mem = MemoryStream[Ev](spark)
    val dim = Seq((10L, "gold"), (20L, "silver")).toDF("user_id", "tier")
    val joined = mem.toDS().toDF().join(dim, Seq("user_id"), "left")
      .select("user_id", "sec", "tier")
    val q = joined.writeStream.format("memory").queryName("ss_join_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(10L, 1L), Ev(20L, 2L), Ev(30L, 3L))
      q.processAllAvailable()
      val got = spark.table("ss_join_test")
        .as[(Long, Long, Option[String])].collect().sortBy(_._2)
      assert(got === Array((10L, 1L, Some("gold")), (20L, 2L, Some("silver")),
        (30L, 3L, None)))
    } finally q.stop()
  }

  test("ingestBatch is idempotent: a re-delivered batchId appends nothing") {
    val vt = graft.vt.VersionedTable.create(Tables.scratch("stream_ingest_idem"))
    def batch(ids: Long*) = ids.map(Ev(_, 100L)).toDF()
    EventsStreaming.ingestBatch(vt, "main")(batch(1L), 0L)
    EventsStreaming.ingestBatch(vt, "main")(batch(2L, 3L), 1L)
    assert(vt.head("main").get.version === 1)
    // a restarted query re-delivers the last micro-batch under the SAME id:
    // the commit log already has it, so this must be a no-op, not a dup row
    EventsStreaming.ingestBatch(vt, "main")(batch(2L, 3L), 1L)
    assert(vt.head("main").get.version === 1)
    assert(vt.read(spark, "main").count() === 3L)
    // progress resumes: the NEXT batch id still appends
    EventsStreaming.ingestBatch(vt, "main")(batch(4L), 2L)
    assert(vt.head("main").get.version === 2)
    assert(vt.read(spark, "main").count() === 4L)
    // a manual commit whose message merely STARTS with the ingest prefix
    // must not wedge the stream (it used to NumberFormatException): it is
    // skipped and the idempotence walk finds the real ingest commit below it
    vt.write(batch(5L), "main", message = "stream batch backfill", mode = "append")
    EventsStreaming.ingestBatch(vt, "main")(batch(2L, 3L), 2L) // re-delivery: still a no-op
    assert(vt.read(spark, "main").count() === 5L)
    EventsStreaming.ingestBatch(vt, "main")(batch(6L), 3L) // progress still works
    assert(vt.read(spark, "main").count() === 6L)
  }

  test("change-feed consumer: cursor advance, redelivery on no-commit, chunked catch-up") {
    import graft.streaming.ChangeFeed
    val vt = graft.vt.VersionedTable.create(Tables.scratch("feed_consumer"))
    vt.write(Seq((1, "a")).toDF("k", "v"), "main", "v0")
    // caught up at v0: the initial snapshot is a plain read, not a feed batch
    assert(ChangeFeed.poll(spark, vt, "c1").isEmpty)
    vt.write(Seq((2, "b")).toDF("k", "v"), "main", "v1", mode = "append")
    vt.write(Seq((3, "c")).toDF("k", "v"), "main", "v2", mode = "append")
    // one poll covers the whole backlog (0, 2]; NOT committing redelivers it
    val b1 = ChangeFeed.poll(spark, vt, "c1").get
    assert(b1.fromVersion === 0 && b1.toVersion === 2)
    assert(b1.df.select("k").as[Int].collect().sorted === Array(2, 3))
    val b1again = ChangeFeed.poll(spark, vt, "c1").get // crash-twin: same interval
    assert(b1again.fromVersion === 0 && b1again.toVersion === 2)
    ChangeFeed.commit(vt, "c1", b1.toVersion)
    assert(ChangeFeed.poll(spark, vt, "c1").isEmpty)
    // a second consumer has its own cursor and sees the backlog from 0
    assert(ChangeFeed.poll(spark, vt, "c2").get.toVersion === 2)
    // chunked catch-up: maxVersions=1 yields one batch per version
    var seen = Vector.empty[(Long, Long)]
    val n = ChangeFeed.processAvailable(spark, vt, "c2", maxVersions = 1) { b =>
      seen :+= (b.fromVersion, b.toVersion)
    }
    assert(n === 2 && seen === Vector((0L, 1L), (1L, 2L)))
    // cursors never rewind (a slow replayer cannot undo a faster retry)
    assertThrows[IllegalArgumentException](ChangeFeed.commit(vt, "c2", 1L))
    // ...and cannot run past the head (a units bug would wedge the consumer
    // forever, since forward-only cursors have no API way back)
    assertThrows[IllegalArgumentException](ChangeFeed.commit(vt, "c2", 99L))
    // a typo'd branch fails loudly instead of reporting "caught up"
    assertThrows[IllegalArgumentException](ChangeFeed.poll(spark, vt, "c1", branch = "mian"))
    // cursors are per-(branch, consumer): c1's main offset does not leak to dev
    vt.createBranch("dev", from = "main")
    vt.write(Seq((4, "d")).toDF("k", "v"), "dev", "dev v3", mode = "append")
    assert(ChangeFeed.cursor(vt, "c1", "dev") === 0)
    val bd = ChangeFeed.poll(spark, vt, "c1", branch = "dev").get
    assert(bd.fromVersion === 0 && bd.toVersion === 3)
    ChangeFeed.commit(vt, "c1", bd.toVersion, "dev")
    assert(ChangeFeed.cursor(vt, "c1") === 2, "main cursor untouched by dev consumption")
    // a deleted-and-recreated namesake branch resets its cursors: the new
    // lineage must be consumed from scratch, not silently skipped
    vt.deleteBranch("dev")
    vt.createBranch("dev", from = "main")
    assert(ChangeFeed.cursor(vt, "c1", "dev") === 0)
  }

  test("replicateAppends: end-to-end exactly-once replication incl. crash replay") {
    import graft.streaming.ChangeFeed
    val src = graft.vt.VersionedTable.create(Tables.scratch("repl_src"))
    val dst = graft.vt.VersionedTable.create(Tables.scratch("repl_dst"))
    def rows(vt: graft.vt.VersionedTable) =
      vt.read(spark, "main").as[(Int, String)].collect().sortBy(_._1)
    src.write(Seq((1, "a")).toDF("k", "v"), "main", "v0")
    dst.write(src.read(spark, "main"), "main", "seed = initial snapshot") // v0 bootstrap
    src.write(Seq((2, "b")).toDF("k", "v"), "main", "v1", mode = "append")
    src.write(Seq((3, "c")).toDF("k", "v"), "main", "v2", mode = "append")
    // first drain ships the backlog as one interval
    assert(ChangeFeed.replicateAppends(spark, src, dst, "repl") === 1)
    assert(rows(dst) === Array((1, "a"), (2, "b"), (3, "c")))
    // CRASH TWIN: a batch was ingested but the consumer died BEFORE the
    // cursor commit. The restarted replicator reconciles from the sink's
    // ingest watermark (fast-forwards the cursor to the landed batchId), so
    // the interval is neither re-polled nor re-appended.
    src.write(Seq((4, "d")).toDF("k", "v"), "main", "v3", mode = "append")
    val b = ChangeFeed.poll(spark, src, "repl").get
    graft.streaming.EventsStreaming.ingestBatch(dst, "main")(
      b.df.where(col("change_type") === "insert").drop("change_type", "version"),
      b.toVersion) // ...crash here: no ChangeFeed.commit
    val dstCommitsBefore = dst.lineage("main").size
    assert(ChangeFeed.replicateAppends(spark, src, dst, "repl") === 0,
      "reconciled from the sink watermark: nothing to re-ship")
    assert(ChangeFeed.cursor(src, "repl") === b.toVersion,
      "the cursor must fast-forward to the landed batchId")
    assert(rows(dst) === Array((1, "a"), (2, "b"), (3, "c"), (4, "d")),
      "crash replay must not duplicate rows")
    assert(dst.lineage("main").size === dstCommitsBefore,
      "the redelivered batch must be a metadata no-op on the target")
    // caught up: nothing ships
    assert(ChangeFeed.replicateAppends(spark, src, dst, "repl") === 0)
    // THE r13-advice case: crash between sink commit and cursor commit, then
    // the SOURCE ADVANCES before the replayer restarts. Without the
    // watermark fast-forward, the re-polled interval widens to
    // (cursor, newHead] whose batchId (= newHead) passes the sink dedup and
    // the already-landed prefix appends TWICE.
    src.write(Seq((5, "e")).toDF("k", "v"), "main", "v4", mode = "append")
    val b2 = ChangeFeed.poll(spark, src, "repl").get // (3, 4]
    graft.streaming.EventsStreaming.ingestBatch(dst, "main")(
      b2.df.where(col("change_type") === "insert").drop("change_type", "version"),
      b2.toVersion) // ...crash again: no cursor commit
    src.write(Seq((6, "f")).toDF("k", "v"), "main", "v5 post-crash", mode = "append")
    assert(ChangeFeed.replicateAppends(spark, src, dst, "repl") === 1,
      "only the genuinely-new interval ships")
    assert(rows(dst) === Array((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f")),
      "advancing source after a crash must not duplicate the landed prefix")
    // a non-append source change refuses log shipping LOUDLY
    src.delete(spark, "k = 1")
    val e = intercept[IllegalStateException](
      ChangeFeed.replicateAppends(spark, src, dst, "repl"))
    assert(e.getMessage.contains("not append-only"))
    assert(rows(dst) === Array((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f")),
      "the refused interval must not partially apply")
  }

  test("replicateAppends exactly-once survives crash + advancing source on the S3-semantics store") {
    // The cursor markers and ingest batchIds are both put-if-absent CAS
    // objects — this replays the crash-with-advancing-source matrix with
    // BOTH commit logs living on the rename-free object store.
    import graft.streaming.ChangeFeed
    def mk(name: String) = {
      val root = Tables.scratch(name)
      graft.vt.VersionedTable.create(root, graft.vt.S3SimMetaStore.forTable(root))
    }
    val src = mk("repl_s3_src")
    val dst = mk("repl_s3_dst")
    def rows(vt: graft.vt.VersionedTable) =
      vt.read(spark, "main").as[(Int, String)].collect().sortBy(_._1)
    src.write(Seq((1, "a")).toDF("k", "v"), "main", "v0")
    dst.write(src.read(spark, "main"), "main", "seed")
    src.write(Seq((2, "b")).toDF("k", "v"), "main", "v1", mode = "append")
    assert(ChangeFeed.replicateAppends(spark, src, dst, "repl") === 1)
    // crash between sink commit and cursor commit, then the source advances
    src.write(Seq((3, "c")).toDF("k", "v"), "main", "v2", mode = "append")
    val b = ChangeFeed.poll(spark, src, "repl").get
    graft.streaming.EventsStreaming.ingestBatch(dst, "main")(
      b.df.where(col("change_type") === "insert").drop("change_type", "version"),
      b.toVersion) // ...crash: no cursor commit
    src.write(Seq((4, "d")).toDF("k", "v"), "main", "v3 post-crash", mode = "append")
    assert(ChangeFeed.replicateAppends(spark, src, dst, "repl") === 1,
      "only the genuinely-new interval ships")
    assert(rows(dst) === Array((1, "a"), (2, "b"), (3, "c"), (4, "d")),
      "no duplicates through the object-store control plane")
    assert(ChangeFeed.cursor(src, "repl") === 3)
  }

  test("change-feed drain pins its end offset: commits landing mid-drain wait") {
    import graft.streaming.ChangeFeed
    val vt = graft.vt.VersionedTable.create(Tables.scratch("feed_pinned"))
    vt.write(Seq((1, "a")).toDF("k", "v"), "main", "v0")
    vt.write(Seq((2, "b")).toDF("k", "v"), "main", "v1", mode = "append")
    vt.write(Seq((3, "c")).toDF("k", "v"), "main", "v2", mode = "append")
    // the first processed batch appends v3 — a sustained-writer stand-in; an
    // unpinned drain would chase it (and any successor) forever
    var appended = false
    val n = ChangeFeed.processAvailable(spark, vt, "c", maxVersions = 1) { b =>
      if (!appended) {
        vt.write(Seq((9, "z")).toDF("k", "v"), "main", "v3 mid-drain", mode = "append")
        appended = true
      }
    }
    assert(n === 2, "drain covers exactly the entry-time backlog (v1, v2)")
    assert(ChangeFeed.cursor(vt, "c") === 2)
    // the mid-drain commit is the NEXT drain's backlog
    val b = ChangeFeed.poll(spark, vt, "c").get
    assert(b.fromVersion === 2 && b.toVersion === 3)
  }

  test("tailFromDelta: keyed CDC apply lands delete/update versions as single commits, exactly-once") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.ChangeFeed
    import graft.vt.{DeltaLogFixture => F, VersionedTable}
    val root = Paths.get(Tables.scratch("tail_cdc_src"))
    Files.createDirectories(root)
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val (fa, sa) = F.writeDataFile(root, base, "a")
    F.writeCommit(root, 0, Seq(F.protocolLine(), F.metaDataLine(base.schema.json, Nil),
      F.addLine(fa, sa)))
    val target = VersionedTable.create(Tables.scratch("tail_cdc_tgt"))
    // without keyCols a delete version refuses loudly, target untouched
    val (fd, sd) = F.writeDataFile(root, base.where($"k" =!= 2), "a2")
    val (fc1, sc1) = F.writeDataFile(root,
      base.where($"k" === 2).withColumn("_change_type", lit("delete")), "cdc1")
    F.writeCommit(root, 1, Seq(F.removeLine(fa), F.addLine(fd, sd), F.cdcLine(fc1, sc1)))
    val e = intercept[IllegalStateException](
      ChangeFeed.tailFromDelta(spark, root.toString, target))
    assert(e.getMessage.contains("keyCols"), e.getMessage)
    // the shippable prefix (v0, insert-only) landed durably BEFORE the
    // refusal — a resumable position, not a rollback
    assert(target.head("main").get.version === 0)
    assert(target.read(spark, "main").count() === 4)
    // with keyCols the drain resumes: v1 lands the delete as ONE applyCdc commit
    assert(ChangeFeed.tailFromDelta(spark, root.toString, target,
      keyCols = Seq("k")) === 1)
    assert(target.head("main").get.version === 1,
      "one commit per source version — history mirrors the source")
    assert(target.readVersion(spark, "main", 1).select("k").as[Long].collect().sorted
      === Array(1L, 3L, 4L))
    // an update version (pre+post images) replaces in place
    val (fu, su) = F.writeDataFile(root,
      Seq((1L, "a"), (3L, "C"), (4L, "d")).toDF("k", "v"), "a3")
    val cdc2 = Seq(("update_preimage", 3L, "c"), ("update_postimage", 3L, "C"))
      .toDF("_change_type", "k", "v").select("k", "v", "_change_type")
    val (fc2, sc2) = F.writeDataFile(root, cdc2, "cdc2")
    F.writeCommit(root, 2, Seq(F.removeLine(fd), F.addLine(fu, su), F.cdcLine(fc2, sc2)))
    assert(ChangeFeed.tailFromDelta(spark, root.toString, target,
      keyCols = Seq("k")) === 1)
    assert(target.read(spark, "main").as[(Long, String)].collect().sorted ===
      Array((1L, "a"), (3L, "C"), (4L, "d")))
    // crash redelivery: a re-delivered batchId is a no-op at the sink — the
    // watermark dedups it even when the payload is garbage
    EventsStreaming.applyCdcBatch(target, "main", Seq("k"))(
      Seq((99L, "XX")).toDF("k", "v"), Seq(Tuple1(1L)).toDF("k"), 2L)
    assert(target.head("main").get.version === 2, "duplicate delivery must not commit")
    assert(target.read(spark, "main").as[(Long, String)].collect().sorted ===
      Array((1L, "a"), (3L, "C"), (4L, "d")))
    // caught up: nothing ships
    assert(ChangeFeed.tailFromDelta(spark, root.toString, target,
      keyCols = Seq("k")) === 0)
  }

  test("tailFromDelta follows a PARTITIONED foreign table, partition columns reconstituted") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.ChangeFeed
    import graft.vt.{DeltaLogFixture => F, VersionedTable}
    val root = Paths.get(Tables.scratch("tail_part_src"))
    Files.createDirectories(root)
    val full = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("k", "part")
    val (fx, sx) = F.writeDataFile(root, full.where($"part" === "x").drop("part"), "px")
    val (fy, sy) = F.writeDataFile(root, full.where($"part" === "y").drop("part"), "py")
    F.writeCommit(root, 0, Seq(F.protocolLine(),
      F.metaDataLine(full.schema.json, Seq("part")),
      F.addLine(fx, sx, Map("part" -> "x")), F.addLine(fy, sy, Map("part" -> "y"))))
    val target = VersionedTable.create(Tables.scratch("tail_part_tgt"))
    assert(ChangeFeed.tailFromDelta(spark, root.toString, target,
      keyCols = Seq("k")) === 1)
    assert(target.read(spark, "main").as[(Long, String)].collect().sorted ===
      Array((1L, "x"), (2L, "x"), (3L, "y")),
      "partition columns must land as regular columns in the replica")
    // a partition-scoped delete ships as a keyed apply
    F.writeCommit(root, 1, Seq(F.removeLine(fx, Some(Map("part" -> "x")))))
    assert(ChangeFeed.tailFromDelta(spark, root.toString, target,
      keyCols = Seq("k")) === 1)
    assert(target.read(spark, "main").as[(Long, String)].collect() ===
      Array((3L, "y")))
  }

  test("batch sessionize splits on gaps > 30min and counts events per session") {
    val ts = (s: Long) => new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(0), 10L, "a", 1.0, ""), (2L, ts(60), 10L, "a", 1.0, ""),
      (3L, ts(60 + 1900), 10L, "a", 1.0, ""), // > 1800s after previous
      (4L, ts(30), 20L, "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventsStreaming.sessionize(ev)
      .select("user_id", "sess_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((10L, 0L, 2L), (10L, 1L, 1L), (20L, 0L, 1L)))
  }

  test("streaming heavy hitters maintain one bounded Misra-Gries state per group across batches") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val mem = MemoryStream[(String, String)](spark)
    val q = EventsStreaming.streamingHeavyHitters(mem.toDS(), capacity = 64, k = 3)
      .writeStream.outputMode("update").format("memory").queryName("hh_stream")
      .option("checkpointLocation", Tables.scratch("hh_stream_ckpt")).start()
    try {
      mem.addData(("en", "alpha"), ("en", "alpha"), ("en", "beta"), ("de", "zwei"))
      q.processAllAvailable()
      mem.addData(("en", "alpha"), ("en", "gamma"), ("en", "beta"),
        ("en", "beta"), ("de", "zwei"), ("de", "eins"))
      q.processAllAvailable()
      // counts only grow in the exact (sub-capacity) regime, so the max cnt
      // per (group, token) across emitted updates IS the cumulative truth
      val fin = spark.table("hh_stream").groupBy("group", "token")
        .agg(org.apache.spark.sql.functions.max("cnt").as("cnt"))
        .as[(String, String, Long)].collect().toSet
      assert(fin === Set(("en", "alpha", 3L), ("en", "beta", 3L),
        ("en", "gamma", 1L), ("de", "zwei", 2L), ("de", "eins", 1L)),
        s"got $fin")
    } finally q.stop()
  }

  test("vt-changes streaming source: feed equals batch feed; restart delivers only new commits") {
    import graft.vt.VersionedTable
    val vt = VersionedTable.create(Tables.scratch("vtcf_src"))
    val nation = Tables.nation(spark, sf)
    vt.write(nation.where($"n_nationkey" < 10), "main", "v0")
    vt.write(nation.where($"n_nationkey" >= 10 && $"n_nationkey" < 15), "main",
      "v1", mode = "append")
    vt.write(nation.where($"n_nationkey" >= 15 && $"n_nationkey" < 20), "main",
      "v2", mode = "append")
    val ckpt = Tables.scratch("vtcf_ckpt")
    val got = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
    // foreachBatch sink: the memory sink cannot recover from a checkpoint,
    // and recovery is exactly what this test pins
    def startQ() =
      spark.readStream.format("vt-changes") // short name via META-INF services
        .option("path", vt.root.toString).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.select("n_nationkey", "change_type", "version")
              .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
          }
          ()
        }.start()
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      val want = vt.changesFeed(spark, "main", 0, 2)
        .select("n_nationkey", "change_type", "version")
        .as[(Int, String, Long)].collect().toSet
      assert(got.toSet === want, "streamed feed must equal the batch feed (0, head]")
      assert(got.map(_._1).toSet === (10 until 20).toSet,
        "v0 is the initial snapshot, not feed content")
    } finally q1.stop()
    // new commits land while the stream is DOWN; the restart resumes from
    // the checkpoint and delivers exactly the missed interval
    vt.write(nation.where($"n_nationkey" >= 20), "main", "v3", mode = "append")
    got.clear()
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      val got2 = got.toSet
      assert(got2.nonEmpty && got2.forall(_._3 == 3L),
        s"restart must deliver ONLY the (2, 3] interval, got $got2")
      assert(got2.map(_._1) === nation.where($"n_nationkey" >= 20)
        .select("n_nationkey").as[Int].collect().toSet)
    } finally q2.stop()
  }

  test("vt-changes rate limit and startingVersion=latest") {
    import graft.vt.VersionedTable
    val vt = VersionedTable.create(Tables.scratch("vtcf_rate"))
    val nation = Tables.nation(spark, sf)
    vt.write(nation.where($"n_nationkey" < 5), "main", "v0")
    vt.write(nation.where($"n_nationkey" === 5), "main", "v1", mode = "append")
    vt.write(nation.where($"n_nationkey" === 6), "main", "v2", mode = "append")
    vt.write(nation.where($"n_nationkey" === 7), "main", "v3", mode = "append")
    // maxVersionsPerBatch=1: each micro-batch covers exactly one commit
    val batches = scala.collection.mutable.ListBuffer.empty[(Long, Set[Long])]
    val q = spark.readStream.format("vt-changes")
      .option("path", vt.root.toString)
      .option("maxVersionsPerBatch", "1").load()
      .writeStream.option("checkpointLocation", Tables.scratch("vtcf_rate_ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches += ((id, df.select("version").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val delivered = batches.toList.filter(_._2.nonEmpty)
    assert(delivered.map(_._2) === List(Set(1L), Set(2L), Set(3L)),
      s"one version per rate-limited batch, got $batches")

    // startingVersion=latest: the three existing commits are skipped — but
    // ONLY for the fresh stream; a restart must resume from the CHECKPOINT,
    // not re-pin the floor to the restart-time head
    val got = scala.collection.mutable.ListBuffer.empty[(Int, Long)]
    val ckpt = Tables.scratch("vtcf_latest_ckpt")
    def startLatest() = spark.readStream.format("vt-changes")
      .option("path", vt.root.toString).option("startingVersion", "latest").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.select("n_nationkey", "version")
            .collect().map(r => (r.getInt(0), r.getLong(1)))
        }
        ()
      }.start()
    val q2 = startLatest()
    try {
      q2.processAllAvailable()
      assert(got.isEmpty, "startingVersion=latest must skip pre-existing commits")
      vt.write(nation.where($"n_nationkey" === 8), "main", "v4", mode = "append")
      q2.processAllAvailable()
      assert(got.toSet === Set((8, 4L)))
    } finally q2.stop()
    // commits land while the stream is DOWN: the restart must deliver them
    // (before the floor-rebase fix, 'latest' re-resolved to the new head
    // and versions 5..6 were silently withheld)
    vt.write(nation.where($"n_nationkey" === 9), "main", "v5", mode = "append")
    vt.write(nation.where($"n_nationkey" === 10), "main", "v6", mode = "append")
    got.clear()
    val q3 = startLatest()
    try {
      q3.processAllAvailable()
      assert(got.toSet === Set((9, 5L), (10, 6L)),
        s"restart must serve the checkpoint gap, got ${got.toSet}")
    } finally q3.stop()
    // and the rate limit still applies to the catch-up: two more commits
    // land while down, a max=1 restart drains them one version per batch
    vt.write(nation.where($"n_nationkey" === 11), "main", "v7", mode = "append")
    vt.write(nation.where($"n_nationkey" === 12), "main", "v8", mode = "append")
    val catchup = scala.collection.mutable.ListBuffer.empty[Set[Long]]
    val q4 = spark.readStream.format("vt-changes")
      .option("path", vt.root.toString).option("startingVersion", "latest")
      .option("maxVersionsPerBatch", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        catchup.synchronized {
          val vs = df.select("version")
            .collect().map(_.getLong(0)).toSet
          if (vs.nonEmpty) catchup += vs
        }
        ()
      }.start()
    try {
      q4.processAllAvailable()
      assert(catchup.toList === List(Set(7L), Set(8L)),
        s"catch-up must respect maxVersionsPerBatch, got $catchup")
    } finally q4.stop()
  }

  test("vt streaming sink: one commit per micro-batch, exactly-once across restart, Append only") {
    import graft.vt.VersionedTable
    val vt = VersionedTable.create(Tables.scratch("vtsink"))
    // the sink opens an EXISTING table (lifecycle stays with its owner)
    vt.write(Seq.empty[(Long, Long)].toDF("user_id", "sec"), "main", "init")
    val ckpt = Tables.scratch("vtsink_ckpt")
    val mem = MemoryStream[Ev](spark)
    def startQ() = mem.toDS().toDF()
      .writeStream.format("vt").option("path", vt.root.toString)
      .option("statsCols", "user_id") // r17: stats on streaming ingest
      .option("checkpointLocation", ckpt).start()
    val q1 = startQ()
    try {
      mem.addData(Ev(1L, 100L), Ev(2L, 200L))
      q1.processAllAvailable()
      mem.addData(Ev(3L, 300L))
      q1.processAllAvailable()
      assert(vt.read(spark, "main").count() === 3L)
      assert(vt.head("main").get.message.startsWith("stream batch"),
        "commits must carry the batchId watermark")
      assert(vt.head("main").get.stats.values.exists(_.contains("user_id")),
        "the statsCols option must reach each micro-batch commit — " +
          "streamed-in files skip like batch-written ones")
    } finally q1.stop()
    val headAfterRun1 = vt.head("main").get.version
    // restart on the same checkpoint: the replayed last batch must NOT
    // double-append (batchId dedup), new data lands as a new commit
    val q2 = startQ()
    try {
      mem.addData(Ev(4L, 400L))
      q2.processAllAvailable()
      assert(vt.read(spark, "main").count() === 4L,
        "replayed batch re-appended — exactly-once broken")
      assert(vt.head("main").get.version === headAfterRun1 + 1)
    } finally q2.stop()
    // Update output mode is refused loudly, not silently appended
    val e = intercept[Exception] {
      mem.toDS().toDF().groupBy("user_id").count()
        .writeStream.format("vt").outputMode("update")
        .option("path", vt.root.toString)
        .option("checkpointLocation", Tables.scratch("vtsink_upd_ckpt")).start()
    }
    assert(e.getMessage.contains("Append"), e.getMessage)
  }

  test("delta-cdf source -> vt sink: engine-driven standing mirror of a foreign Delta table") {
    import graft.vt.{DeltaLogFixture => F, VersionedTable}
    val root = java.nio.file.Paths.get(Tables.scratch("deltacdf_src"))
    java.nio.file.Files.createDirectories(root)
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
    def commitSlice(ver: Long, lo: Int, hi: Int, name: String,
                    withMeta: Boolean = false): Unit = {
      val (f, s) = F.writeDataFile(root, df.where($"k" >= lo && $"k" <= hi), name)
      val meta = if (withMeta) Seq(F.protocolLine(), F.metaDataLine(df.schema.json, Nil))
        else Nil
      F.writeCommit(root, ver, meta :+ F.addLine(f, s))
    }
    commitSlice(0, 1, 1, "p0", withMeta = true)
    commitSlice(1, 2, 2, "p1")
    val mirror = VersionedTable.create(Tables.scratch("deltacdf_mirror"))
    mirror.write(df.limit(0), "main", "init")
    val ckpt = Tables.scratch("deltacdf_ckpt")
    def startQ() = spark.readStream.format("delta-cdf")
      .option("path", root.toString).load()
      .where($"_change_type" === "insert")
      .select("k", "v")
      .writeStream.format("vt").option("path", mirror.root.toString)
      .option("checkpointLocation", ckpt).start()
    val q = startQ()
    try {
      q.processAllAvailable()
      assert(mirror.read(spark, "main").select("k").as[Int].collect().sorted
        === Array(1, 2), "startingVersion=earliest serves v0's load as inserts")
      // a foreign commit lands while the stream RUNS
      commitSlice(2, 3, 3, "p2")
      q.processAllAvailable()
      assert(mirror.read(spark, "main").select("k").as[Int].collect().sorted
        === Array(1, 2, 3))
    } finally q.stop()
    // and one while it is DOWN — the restart picks up exactly the gap
    commitSlice(3, 4, 4, "p3")
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(mirror.read(spark, "main").select("k").as[Int].collect().sorted
        === Array(1, 2, 3, 4), "restart must deliver exactly the missed commit")
    } finally q2.stop()
  }

  test("readStream.table: snapshot-then-tail; OPTIMIZE streams as silence; restart resumes") {
    import graft.vt.VersionedTable
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    val vt = VersionedTable.create(Tables.scratch("vtmbs"))
    vt.write((1 to 10).toDF("k"), "main", "v0")
    vt.write((11 to 15).toDF("k"), "main", "v1", mode = "append")
    val ckpt = Tables.scratch("vtmbs_ckpt")
    val got = scala.collection.mutable.ListBuffer.empty[Int]
    def startQ() = spark.readStream.table(s"vt.`${vt.root}`")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("k").as[Int].collect() }
        ()
      }.start()
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      assert(got.sorted === (1 to 15), "initial batch = full snapshot at stream start")
      vt.write((16 to 18).toDF("k"), "main", "v2", mode = "append")
      q1.processAllAvailable()
      assert(got.sorted === (1 to 18), "appends tail incrementally")
      // maintenance mid-stream: compaction removes files but publishes
      // dataChange=false — the stream sees silence, never a refusal or
      // re-emission
      vt.compact(spark, "main", numFiles = 1)
      assert(!vt.head("main").get.dataChange)
      q1.processAllAvailable()
      assert(got.size === 18, "OPTIMIZE must not re-emit rows into a stream")
      // metadata-only evolution mid-stream is silence too (pinned schema)
      vt.addColumns("main", Seq(org.apache.spark.sql.types.StructField(
        "note", org.apache.spark.sql.types.StringType)))
      q1.processAllAvailable()
      assert(got.size === 18)
      // appends carrying the evolved schema stream through the PINNED
      // schema: the new column is invisible until restart
      vt.write(Seq((19, "n")).toDF("k", "note"), "main", "v5", mode = "append")
      q1.processAllAvailable()
      assert(got.sorted === (1 to 19))
    } finally q1.stop()
    // commits land while the stream is DOWN; restart resumes from the
    // checkpoint and delivers exactly the missed interval
    vt.write(Seq((20, "x")).toDF("k", "note"), "main", "v6", mode = "append")
    got.clear()
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(got.toList === List(20), "restart delivers only the missed appends")
    } finally q2.stop()
  }

  test("readStream.table: deletes refuse loudly; ignoreDeletes skips; MOR snapshot applies DVs; startingVersion and rate limit") {
    import graft.vt.VersionedTable
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    val vt = VersionedTable.create(Tables.scratch("vtmbs_del"))
    vt.write((1 to 10).toDF("k"), "main", "v0")
    vt.deleteWithVectors(spark, "k = 3", "main") // v1: MOR delete
    // a stream STARTED on the DV-carrying head applies the deletion
    // vectors in its initial snapshot
    val got = scala.collection.mutable.ListBuffer.empty[Int]
    val ckpt = Tables.scratch("vtmbs_del_ckpt")
    def startQ(opts: Map[String, String] = Map.empty) = {
      val r = spark.readStream
      opts.foreach { case (k, v) => r.option(k, v) }
      r.table(s"vt.`${vt.root}`")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= df.select("k").as[Int].collect() }
          ()
        }.start()
    }
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      assert(got.sorted === ((1 to 10).toSet - 3).toSeq.sorted,
        "the initial snapshot must subtract deletion vectors")
      // a delete AFTER the snapshot refuses loudly (rows already streamed
      // would silently change meaning)
      vt.delete(spark, "k = 5", "main") // v2: COW delete — removes files
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        vt.write(Seq(11).toDF("k"), "main", "v3", mode = "append")
        q1.processAllAvailable()
      }
      assert(e.getMessage.contains("ignoreDeletes") ||
        Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")),
        s"refusal must name the options: ${e.getMessage}")
    } finally q1.stop()
    // ignoreChanges rides over the rewrite (re-emitting its files) and
    // the stream proceeds to the append
    got.clear()
    val q2 = startQ(Map("ignoreChanges" -> "true"))
    try {
      q2.processAllAvailable()
      assert(got.contains(11), "the append behind the delete must stream")
    } finally q2.stop()
    // a FRESH stream with maxVersionsPerTrigger must still snapshot AT
    // HEAD: version clamping is a TAIL dial — the buggy clamp pinned the
    // snapshot at v0 and replayed this table's deletes as refusals
    got.clear()
    val q2b = spark.readStream.option("maxVersionsPerTrigger", "1")
      .table(s"vt.`${vt.root}`")
      .writeStream
      .option("checkpointLocation", Tables.scratch("vtmbs_del_mv_ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("k").as[Int].collect() }
        ()
      }.start()
    try {
      q2b.processAllAvailable()
      assert(got.sorted === Seq(1, 2, 4, 6, 7, 8, 9, 10, 11),
        "snapshot pins at head — delete history below it is invisible")
    } finally q2b.stop()
    // startingVersion: no snapshot, tail from the given version's changes
    val vt2 = VersionedTable.create(Tables.scratch("vtmbs_sv"))
    vt2.write((1 to 5).toDF("k"), "main", "v0")
    vt2.write((6 to 8).toDF("k"), "main", "v1", mode = "append")
    vt2.write((9 to 9).toDF("k"), "main", "v2", mode = "append")
    got.clear()
    var batches = 0
    val q3 = spark.readStream.option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1")
      .table(s"vt.`${vt2.root}`")
      .writeStream.option("checkpointLocation", Tables.scratch("vtmbs_sv_ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          val rows = df.select("k").as[Int].collect()
          if (rows.nonEmpty) batches += 1
          got ++= rows
        }
        ()
      }.start()
    try {
      q3.processAllAvailable()
      assert(got.sorted === (6 to 9), "startingVersion=1 skips the v0 snapshot")
      assert(batches === 2, "maxVersionsPerTrigger=1 → one commit per batch")
    } finally q3.stop()
    // startingVersion=0 is NOT the snapshot sentinel (both sit at offset
    // −1): v0's files stream as an ordinary APPEND emission
    got.clear()
    val q4 = spark.readStream.option("startingVersion", "0")
      .table(s"vt.`${vt2.root}`")
      .writeStream.option("checkpointLocation", Tables.scratch("vtmbs_sv0_ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("k").as[Int].collect() }
        ()
      }.start()
    try {
      q4.processAllAvailable()
      assert(got.sorted === (1 to 9), "startingVersion=0 streams v0 as an append")
    } finally q4.stop()
    // maxFilesPerTrigger chunks the INITIAL SNAPSHOT (the 100 TB bootstrap
    // shape): 4 files, 2 per trigger → two snapshot batches pinned at one
    // version, then ordinary tailing
    val vt3 = VersionedTable.create(Tables.scratch("vtmbs_mft"))
    vt3.write((1 to 40).toDF("k").repartition(4), "main", "v0")
    assert(vt3.head("main").get.files.size === 4)
    got.clear()
    batches = 0
    val q5 = spark.readStream.option("maxFilesPerTrigger", "2")
      .table(s"vt.`${vt3.root}`")
      .writeStream.option("checkpointLocation", Tables.scratch("vtmbs_mft_ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          val rows = df.select("k").as[Int].collect()
          if (rows.nonEmpty) batches += 1
          got ++= rows
        }
        ()
      }.start()
    try {
      q5.processAllAvailable()
      assert(got.sorted === (1 to 40), "the chunked snapshot covers every row once")
      assert(batches === 2, s"4 files / 2 per trigger = 2 snapshot batches, got $batches")
      // tailing proceeds normally after the snapshot completes
      vt3.write((41 to 42).toDF("k"), "main", "v1", mode = "append")
      q5.processAllAvailable()
      assert(got.sorted === (1 to 42))
    } finally q5.stop()
  }

  test("r20 stateful agg end-to-end: readStream.table → watermark window agg → writeStream.toTable; late data drops across restarts") {
    import graft.vt.VersionedTable
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    val src = VersionedTable.create(Tables.scratch("vtsagg_src"))
    val dst = VersionedTable.create(Tables.scratch("vtsagg_dst"))
    spark.sql(
      s"CREATE TABLE vt.`${dst.root}` (wstart TIMESTAMP, usr STRING, total BIGINT)")
      .collect()
    def ev(ts: String, usr: String, amt: Long) =
      Seq((ts, usr, amt)).toDF("t", "usr", "amount")
        .select(to_timestamp($"t").as("ts"), $"usr", $"amount")
    src.write(ev("2024-01-01 10:00:10", "a", 1)
      .unionByName(ev("2024-01-01 10:00:20", "b", 2)), "main", "v0")
    val ckpt = Tables.scratch("vtsagg_ckpt")
    // the full stateful pipeline through the DSv2 catalog pair: the
    // micro-batch source feeds Spark's own watermarked windowed aggregation
    // (Append mode: a window emits once, when the watermark passes its
    // end), and the finalized rows land as epoch commits on a second
    // catalog table written by the query's own tasks
    def startQ() = spark.readStream.table(s"vt.`${src.root}`")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute"), $"usr")
      .agg(sum($"amount").as("total"))
      .select($"window.start".as("wstart"), $"usr", $"total")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .toTable(s"vt.`${dst.root}`")
    def dstRows(): Set[(String, String, Long)] =
      spark.sql(s"SELECT CAST(wstart AS STRING) AS w, usr, total FROM vt.`${dst.root}`")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      assert(dstRows().isEmpty, "no window is final before the watermark passes it")
      // an event far past the first window advances the watermark →
      // the [10:00, 10:01) window finalizes and lands in dst
      src.write(ev("2024-01-01 10:05:00", "a", 5), "main", "adv", mode = "append")
      q1.processAllAvailable()
      assert(dstRows() === Set(("2024-01-01 10:00:00", "a", 1L),
        ("2024-01-01 10:00:00", "b", 2L)),
        s"watermark passage must finalize the first window, got ${dstRows()}")
      // LATE data behind the watermark is DROPPED, not aggregated
      src.write(ev("2024-01-01 10:00:30", "a", 100), "main", "late", mode = "append")
      q1.processAllAvailable()
      assert(dstRows().forall(_._3 < 100L), "late rows must drop, not re-aggregate")
    } finally q1.stop()
    // commits land while the stream is DOWN — including MORE late data;
    // the restart restores the watermark from the checkpoint, so the late
    // row drops across the restart boundary too
    src.write(ev("2024-01-01 10:10:00", "b", 7), "main", "adv2", mode = "append")
    src.write(ev("2024-01-01 10:00:40", "b", 50), "main", "late2", mode = "append")
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(dstRows() === Set(("2024-01-01 10:00:00", "a", 1L),
        ("2024-01-01 10:00:00", "b", 2L), ("2024-01-01 10:05:00", "a", 5L)),
        s"restart: [10:05) finalizes, both late rows stay dropped — ${dstRows()}")
    } finally q2.stop()
  }

  test("writeStream.toTable: tasks write the parquet, one commit per epoch, replay-proof; Complete mode overwrites; catalog mirror") {
    import graft.vt.VersionedTable
    spark.conf.set("spark.sql.catalog.vt", classOf[graft.sources.VtCatalog].getName)
    // ---- Append mode: epoch commits without a DataFrame detour ----
    val vt = VersionedTable.create(Tables.scratch("vtsw"))
    spark.sql(s"CREATE TABLE vt.`${vt.root}` (k BIGINT, v STRING)").collect()
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", Tables.scratch("vtsw_ckpt"))
      .toTable(s"vt.`${vt.root}`")
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.sql(s"SELECT sum(k) AS s FROM vt.`${vt.root}`")
        .as[Long].head() === 3L)
      val h1 = vt.head("main").get
      assert(h1.message.startsWith("stream epoch "),
        "DSv2 epochs must NOT reuse the DSv1 'stream batch' watermark prefix " +
          "(a DSv1 ingest on this branch would skip its own batches)")
      assert(graft.streaming.EventsStreaming.lastIngestedBatchId(vt, "main").isEmpty,
        "the DSv1 watermark must be blind to DSv2 epoch commits")
      assert(h1.txnAppId === Some(q.id.toString) && h1.txnVersion.isDefined,
        "idempotence rides on the txn mark")
      in.addData((3L, "c"))
      q.processAllAvailable()
      assert(vt.head("main").get.version === h1.version + 1, "one epoch = one commit")
      assert(spark.sql(s"SELECT count(*) AS c FROM vt.`${vt.root}`")
        .as[Long].head() === 3L)
      // a REPLAYED epoch (crash between the engine's commit log and ours)
      // publishes nothing — THIS query's txn watermark (Delta's txn
      // appId+version, stamped on each epoch commit) already covers it
      val before = vt.head("main").get.version
      val qid = q.id.toString
      val lastEpoch = vt.lastTxnVersion("main", qid).get
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
      val sw = new graft.sources.VtStreamingWrite(spark, vt, "main",
        schema, "t", overwrite = false, queryId = qid)
      sw.commit(lastEpoch,
        Array(graft.sources.VtEpochFileMessage("data/ghost/replayed.parquet", 1)))
      assert(vt.head("main").get.version === before,
        "a replayed epoch must not double-commit")
      // …while a DIFFERENT query's writer at the same epoch number is NOT
      // swallowed (per-writer keying — the bare message watermark would
      // have silently dropped this epoch): its commit lands
      val extraDir = vt.root.resolve("data/other-stream-e9")
      Seq((99L, "z")).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(extraDir.toString)
      val extraRel = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(extraDir)
        try {
          val f = s.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          vt.root.relativize(f).toString
        } finally s.close()
      }
      val other = new graft.sources.VtStreamingWrite(spark, vt, "main",
        schema, "t2", overwrite = false, queryId = "another-query")
      other.commit(lastEpoch,
        Array(graft.sources.VtEpochFileMessage(extraRel, 1)))
      assert(vt.head("main").get.version === before + 1,
        "a different query's same-numbered epoch must still commit")
      assert(spark.sql(s"SELECT count(*) AS c FROM vt.`${vt.root}` WHERE k = 99")
        .as[Long].head() === 1L)
    } finally q.stop()
    // ---- Complete mode: each epoch OVERWRITES (and still time-travels) ----
    val aggRoot = Tables.scratch("vtsw_complete")
    val in2 = MemoryStream[String](spark)
    val q2 = in2.toDF().toDF("v").groupBy("v").count().writeStream
      .outputMode("complete")
      .option("checkpointLocation", Tables.scratch("vtsw_c_ckpt"))
      .toTable(s"vt.`$aggRoot`")
    try {
      in2.addData("x", "x", "y")
      q2.processAllAvailable()
      def agg(): Map[String, Long] = spark.sql(s"SELECT v, count FROM vt.`$aggRoot`")
        .as[(String, Long)].collect().toMap
      assert(agg() === Map("x" -> 2L, "y" -> 1L))
      in2.addData("y")
      q2.processAllAvailable()
      assert(agg() === Map("x" -> 2L, "y" -> 2L),
        "a Complete epoch REPLACES the snapshot")
      val vt2 = VersionedTable.open(aggRoot)
      val prev = vt2.readVersion(spark, "main", vt2.head("main").get.version - 1)
      assert(prev.as[(String, Long)].collect().toMap === Map("x" -> 2L, "y" -> 1L),
        "the replaced epoch still time-travels")
    } finally q2.stop()
    // ---- the catalog-native mirror: readStream.table → writeStream.toTable,
    // exactly-once across a restart with source commits landing in between ----
    val src = VersionedTable.create(Tables.scratch("vtsw_src"))
    src.write((1 to 5).toDF("k"), "main", "v0")
    val dstRoot = Tables.scratch("vtsw_dst")
    val ckpt = Tables.scratch("vtsw_mirror_ckpt")
    def mirror() = spark.readStream.table(s"vt.`${src.root}`")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(s"vt.`$dstRoot`")
    val m1 = mirror()
    try m1.processAllAvailable() finally m1.stop()
    src.write((6 to 8).toDF("k"), "main", "more", mode = "append")
    val m2 = mirror()
    try {
      m2.processAllAvailable()
      assert(spark.sql(s"SELECT k FROM vt.`$dstRoot`").as[Int].collect().sorted
        === (1 to 8).toArray, "mirror = source, no duplicates across the restart")
    } finally m2.stop()
  }
}
