package graft.vt

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** A branch/version-addressed table over immutable parquet files + a commit log.
  *
  * Layout under `root/`:
  * {{{
  *   refs/<branch>           head pointer: the branch's current commit id
  *   refs/<branch>.staged    staged (uncommitted) snapshot, lakeFS-style
  *   commits/<id>.json       immutable commit records (CommitLog JSON)
  *   data/<commit-dir>/part-… .parquet   immutable data files
  * }}}
  *
  * Re-expresses the reference's versioning surface natively (no Delta/lakeFS
  * jars offline — SURVEY.md §2.11):
  *  - Delta write v0 / overwrite v1 / `versionAsOf` / vacuum → `jobs/vdt4.py:39-85`
  *  - lakeFS branch / commit / diff / merge / revert / reset → `README.md:62-147`
  *
  * Scale design: reads resolve a commit (two tiny metadata reads) and then go
  * through the stock `DataFrameReader`, so Catalyst still sees a plain parquet
  * relation — predicate pushdown, column pruning, vectorized reads and
  * split-parallelism all survive (SURVEY.md §4). Writes create a fresh
  * directory per commit (no in-place mutation), so concurrent readers of older
  * versions are never disturbed; commit/ref publication is atomic-rename.
  *
  * Concurrency: writers within one JVM are serialized per table instance
  * (`synchronized`); ACROSS processes every ref-advancing write — commit,
  * 3-way merge, AND fast-forward merge — first claims its (branch, version)
  * slot with an atomic put-if-absent ([[CommitLog.claimVersionSlot]] — Delta's
  * optimistic-concurrency contract), so two racing writers produce a linear
  * history plus one clean `ConcurrentModificationException` to retry, never
  * a silent fork or a lost ref advance.
  *
  * Storage: ALL control-plane metadata (refs, commit JSON, version slots,
  * staged markers) goes through the pluggable [[MetaStore]] — the crash-safety
  * guarantees above are stated in its object-store terms (put-if-absent +
  * atomic full-object put), so they transfer to S3-class stores, which have
  * no atomic rename. The data plane (immutable parquet under `data/`) stays
  * on the Spark-visible filesystem.
  */

/** One WHEN clause of a generalized MERGE ([[VersionedTable.mergeInto]]):
  * `kind` is `update` / `delete` (matched, not-matched-by-source) or
  * `insert` (not-matched); `condition` the optional AND predicate (SQL text
  * over the merge's aliases); `assignments` maps target columns to SQL
  * right-hand sides (update/insert — a delete clause takes none). */
final case class MergeClause(kind: String, condition: Option[String] = None,
                             assignments: Map[String, String] = Map.empty)

object MergeClause {
  def update(assignments: Map[String, String], condition: Option[String] = None): MergeClause =
    MergeClause("update", condition, assignments)
  def delete(condition: Option[String] = None): MergeClause =
    MergeClause("delete", condition)
  def insert(assignments: Map[String, String], condition: Option[String] = None): MergeClause =
    MergeClause("insert", condition, assignments)
}

final class VersionedTable private (val root: Path, val store: MetaStore) {

  private def commitsDir: Path = root.resolve("commits")
  private def refsDir: Path = root.resolve("refs")
  private def dataDir: Path = root.resolve("data")
  private def checkpointsDir: Path = root.resolve("checkpoints")

  /** List a DATA directory, closing the underlying stream (Files.list leaks
    * the handle otherwise — fatal for a long-lived driver hosting many
    * tables). Metadata listings go through [[store]] instead. */
  private def listDir(p: Path): Vector[Path] = {
    val st = Files.list(p)
    try st.iterator().asScala.toVector finally st.close()
  }

  // ---- commit log access -------------------------------------------------

  def loadCommit(id: String): Commit =
    resolveManifests(CommitLog.fromJson(store.read(commitsDir.resolve(id + ".json"))))

  /** Materialize a manifest-backed commit (r20, [[Manifest]]): the JSON
    * record carries only manifest PATHS; their concatenated entries — in
    * manifest-list order, which [[buildManifests]] made identical to the
    * order publish saw — become the in-memory `files` list and per-file
    * stats maps. Everything downstream (scans, pruning, diff, merge, CDC,
    * vacuum) keeps seeing a fully materialized [[Commit]]; the resolution
    * is cheap because immutable manifests parse once per process
    * ([[Manifest.cached]]). Legacy inline commits pass through untouched. */
  private def resolveManifests(c: Commit): Commit =
    if (c.manifests.isEmpty) c
    else {
      val entries = c.manifests.flatMap(m => Manifest.cached(root.resolve(m)))
      c.copy(
        files = entries.map(_.file),
        stats = entries.iterator.filter(_.stats.nonEmpty)
          .map(e => e.file -> e.stats).toMap,
        strStats = entries.iterator.filter(_.strStats.nonEmpty)
          .map(e => e.file -> e.strStats).toMap,
        rowCounts = entries.iterator.flatMap(e => e.rows.map(e.file -> _)).toMap,
        nullStats = entries.iterator.filter(_.nulls.nonEmpty)
          .map(e => e.file -> e.nulls).toMap,
        fileSizes = entries.iterator.flatMap(e => e.size.map(e.file -> _)).toMap)
    }

  def head(branch: String): Option[Commit] = {
    val ref = refsDir.resolve(branch)
    if (store.exists(ref)) Some(loadCommit(store.read(ref).trim)) else None
  }

  /** Branch INDEX — a [[CasStringSet]] naming every branch, maintained by
    * the same operations that create/delete refs. Listings may be
    * EVENTUALLY CONSISTENT on object stores (a just-created ref can lag out
    * of LIST), and [[vacuum]] prices retention by enumerating branches — an
    * unlisted fresh branch would have its exclusive files swept. The index
    * is read through SINGLE-KEY operations only (head hint + exists probes +
    * one generation read), so enumeration is exact the moment the creating
    * operation returns. The listing is still unioned in (tables created
    * before the index, defensive completeness); index entries whose ref no
    * longer exists are filtered out, so a deleted branch never resurrects. */
  private def branchIndex = new CasStringSet(store, root.resolve("refidx"), "branches")

  def branches: Seq[String] = {
    val listed = store.list(refsDir).map(_.getFileName.toString)
      .filterNot(_.endsWith(".staged"))
    val indexed = branchIndex.all.filter(b => store.exists(refsDir.resolve(b)))
    (listed ++ indexed).distinct.sorted
  }

  /** Head-first lineage walk of a branch (head, head.parent, …, root). */
  def lineage(branch: String): List[Commit] = lineageFrom(head(branch))

  private def lineageFrom(h: Option[Commit]): List[Commit] = {
    @annotation.tailrec
    def walk(c: Option[Commit], acc: List[Commit]): List[Commit] = c match {
      case None => acc.reverse
      case Some(cc) => walk(cc.parent.map(loadCommit), cc :: acc)
    }
    walk(h, Nil)
  }

  /** First `n` commits of the head-first walk — O(n) metadata reads, never
    * O(history). What vacuum's retainLast retention uses so pricing retention
    * on a version-10⁶ table does not replay the whole log per branch. */
  private def lineageTake(h: Option[Commit], n: Int): List[Commit] = {
    @annotation.tailrec
    def walk(c: Option[Commit], left: Int, acc: List[Commit]): List[Commit] = c match {
      case Some(cc) if left > 0 => walk(cc.parent.map(loadCommit), left - 1, cc :: acc)
      case _ => acc.reverse
    }
    walk(h, n, Nil)
  }

  // ---- commit-log checkpoints (O(1) snapshot resolution) ------------------

  /** Resolve `(branch, version)` to its commit in O(1) metadata reads at any
    * history depth — Delta's checkpoint scheme (`_last_checkpoint` + numbered
    * log suffix), which its `versionAsOf` (reference `jobs/vdt4.py:80-81`)
    * depends on at high commit counts. Without this, a streaming ingest at
    * one-commit-per-micro-batch makes every time travel / CDC call replay
    * O(version) JSON files.
    *
    * Resolution order: the head itself (2 reads) → a bounded parent walk when
    * the target is within one checkpoint interval (≤ interval reads) → the
    * newest checkpoint's SPARSE boundary index (1 list + 1 read + 1 commit
    * load at the nearest boundary ≥ target + ≤interval parent steps).
    * Falls back to the plain walk when no checkpoint covers the target (e.g.
    * a branch younger than one interval — bounded by its own commit count). */
  private def resolveVersion(branch: String, version: Long): Commit = {
    val h = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    if (version > h.version || version < 0) throw new IllegalArgumentException(
      s"no version $version on $branch (vacuumed or never existed)")
    if (version == h.version) return h
    @annotation.tailrec
    def walk(c: Commit): Commit =
      if (c.version == version) c
      else c.parent.map(loadCommit) match {
        case Some(p) => walk(p)
        case None => throw new IllegalArgumentException(
          s"no version $version on $branch (vacuumed or never existed)")
      }
    if (h.version - version > VersionedTable.CheckpointInterval) {
      latestCheckpoint(branch) match {
        case Some((ckVersion, index)) if version <= ckVersion =>
          // nearest indexed boundary at or above the target, then ≤interval
          // parent steps down — ckVersion itself is always indexed, so the
          // jump exists whenever coverage does
          index.keys.filter(_ >= version).minOption match {
            case Some(jump) => return walk(loadCommit(index(jump)._1))
            case None => () // defensive: empty index → plain walk
          }
        case _ => ()
      }
    }
    walk(h)
  }

  /** The commits of `(fromVersion, toVersion]` plus `fromVersion` itself,
    * ascending — O(span) metadata reads via one [[resolveVersion]] and a
    * bounded parent walk, never O(full history). Package-visible so
    * incremental maintainers (IVF index, dedup signatures) can examine just
    * their catch-up interval instead of replaying the whole lineage. */
  private[graft] def commitRange(branch: String, fromVersion: Long, toVersion: Long): List[Commit] = {
    val to = resolveVersion(branch, toVersion)
    @annotation.tailrec
    def walk(c: Commit, acc: List[Commit]): List[Commit] =
      if (c.version == fromVersion) c :: acc
      else c.parent.map(loadCommit) match {
        case Some(p) => walk(p, c :: acc)
        case None => throw new IllegalArgumentException(
          s"no version $fromVersion on $branch (vacuumed or never existed)")
      }
    walk(to, Nil)
  }

  /** Newest checkpoint of `branch`: (checkpoint version, SPARSE version →
    * (commit id, ts) index holding only interval-boundary versions of the
    * first-parent lineage — O(V/interval) entries, never O(V)). A read race
    * with the writer's prune of the superseded file degrades to None (plain
    * walk), never an error. */
  private def latestCheckpoint(branch: String): Option[(Long, Map[Long, (String, Long)])] = {
    val names = store.list(checkpointsDir).map(_.getFileName.toString)
    val mine = names.flatMap {
      case VersionedTable.SlotRe(b, v) if b == branch => Some(v.toLong)
      case _ => None
    }
    if (mine.isEmpty) None
    else
      try {
        val v = mine.max
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val m = mapper.readValue(store.read(checkpointsDir.resolve(s"$branch-v$v")),
          classOf[java.util.Map[String, Object]])
        import scala.jdk.CollectionConverters._
        val idx = m.get("index").asInstanceOf[java.util.Map[String, java.util.List[Object]]]
          .asScala.map { case (ver, e) =>
            ver.toLong -> (e.get(0).asInstanceOf[String], e.get(1).asInstanceOf[Number].longValue())
          }.toMap
        Some((v, idx))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Write the checkpoint for `c` (a version divisible by the interval):
    * previous checkpoint's index + a ≤interval-step walk over the gap — so
    * checkpoint maintenance is O(interval) amortized, with ONE O(history)
    * walk the first time a branch (or a pre-checkpoint table) crosses a
    * boundary. The index keeps ONLY interval-boundary versions (resolution
    * jumps to the nearest boundary above the target, then walks ≤interval
    * parents), and the superseded checkpoint file — fully subsumed by its
    * successor — is pruned, so checkpoint storage is O(V/interval) total in
    * O(1) files per branch, not the O(V²) a cumulative never-pruned index
    * accretes. Failure here never fails the publish (the commit and ref are
    * already durable; the next boundary just walks a larger gap). */
  private def writeCheckpoint(branch: String, c: Commit): Unit =
    try {
      val prev = latestCheckpoint(branch)
      val floor = prev.map(_._1).getOrElse(-1L)
      @annotation.tailrec
      def gap(x: Commit, acc: List[(Long, (String, Long))]): List[(Long, (String, Long))] =
        if (x.version <= floor) acc
        else x.parent.map(loadCommit) match {
          case Some(p) => gap(p, (x.version, (x.id, x.ts)) :: acc)
          case None => (x.version, (x.id, x.ts)) :: acc
        }
      val index = (prev.map(_._2).getOrElse(Map.empty) ++ gap(c, Nil))
        .filter { case (v, _) => v % VersionedTable.CheckpointInterval == 0 }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val m = new java.util.LinkedHashMap[String, Object]()
      m.put("branch", branch)
      m.put("version", java.lang.Long.valueOf(c.version))
      val im = new java.util.LinkedHashMap[String, Object]()
      index.toSeq.sortBy(_._1).foreach { case (v, (id, ts)) =>
        im.put(v.toString, java.util.List.of(id, java.lang.Long.valueOf(ts)))
      }
      m.put("index", im)
      store.put(checkpointsDir.resolve(s"$branch-v${c.version}"), mapper.writeValueAsString(m))
      prev.foreach { case (pv, _) =>
        store.delete(checkpointsDir.resolve(s"$branch-v$pv")); ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** DAG ancestry: history is a DAG once merge commits carry a second parent,
    * so both walks below follow `parents` (first parent + mergeParent), not
    * just the first-parent chain. This is what makes "merge, keep committing
    * on the source, merge again" converge: the second merge sees the first
    * merge's imported commits as shared history, not as divergence. */
  private def isAncestor(maybeAncestor: String, of: Commit): Boolean =
    Ancestry.isAncestor(loadCommit, maybeAncestor, of)

  /** Nearest common ancestor of two commits (the merge base): breadth-first
    * from `b` in level order, first commit already in `a`'s ancestor closure
    * — a lowest common ancestor of the DAG. */
  private def mergeBase(a: Commit, b: Commit): Option[Commit] =
    Ancestry.mergeBase(loadCommit, a, b)

  // ---- writes ------------------------------------------------------------

  /** Write `df` as a new version on `branch` (v0 if the branch is new).
    *
    * `mode="overwrite"` replaces the snapshot (Delta overwrite semantics,
    * `jobs/vdt4.py:39-40,76-77`); `mode="append"` unions the parent's file
    * list with the new files — an O(metadata) append, no data rewrite.
    *
    * Append schema handling mirrors Delta: a divergent schema is REJECTED by
    * default (readCommit pins one schema over all files, so it would
    * silently null/drop columns), and accepted with `mergeSchema=true` as
    * ADDITIVE evolution — the commit schema becomes parent fields plus the
    * appended frame's new fields; parquet's by-name resolution then nulls a
    * file's missing columns on read, exactly Delta's mergeSchema contract.
    * A same-name/different-type collision is always an error.
    *
    * Overwrite schema handling also mirrors Delta: replacing the snapshot
    * with a DIFFERENT schema (names+types; nullability-insensitive) is
    * rejected unless `overwriteSchema=true` — the guard that turns an
    * accidental schema clobber into a loud error (Delta's
    * `overwriteSchema` option, which the reference's vdt4 overwrite relies
    * on). Old versions keep their own pinned schema either way, so time
    * travel across an intentional schema change still replays exactly.
    *
    * `check` is an optional Delta-style CHECK constraint (a boolean SQL
    * expression): the write REJECTS the whole batch if any row evaluates it
    * to false (NULL passes, per the SQL standard). The validation is one
    * filter + limit(1) scan — it short-circuits on the first violation and
    * pushes down like any filter, so its cost is bounded by the first bad
    * row's position, not the batch size. */
  def write(df: DataFrame, branch: String = "main", message: String = "",
            mode: String = "overwrite", statsCols: Seq[String] = Nil,
            mergeSchema: Boolean = false, check: Option[String] = None,
            overwriteSchema: Boolean = false,
            bloomCols: Seq[String] = Nil,
            dataChange: Boolean = true): Commit = synchronized {
    guardWritable(branch)
    // bloom-indexed columns must be STRING or INTEGRAL — the two hash
    // domains the probe can reproduce exactly (UTF-8 bytes; the cast-to-
    // long twin — long ids are as common a point-lookup key as uuids).
    // Fractional/decimal/timestamp keys have no exact probe image and
    // refuse loudly rather than skipping wrong.
    locally {
      val bad = bloomCols.filter(c => !df.schema.fieldNames.contains(c) ||
        !VersionedTable.bloomSupported(df.schema(c).dataType))
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"bloomCols must name STRING or integral (byte/short/int/long) columns " +
          s"of the written DataFrame, got: " + bad.mkString(", "))
    }
    // validate BEFORE any data file lands: a typo'd stats column must fail
    // with a nameable error and zero orphan parquet on disk (a failure
    // inside collectFileStats would be after writeDataFiles)
    locally {
      val missing = statsCols.filterNot(df.schema.fieldNames.contains)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"statsCols name columns absent from the written DataFrame: " +
          s"${missing.mkString(", ")} (schema: ${df.schema.fieldNames.mkString(", ")})")
      // only types with a well-defined stats domain may carry skipping stats:
      // numerics and timestamps compare as doubles (timestamps in epoch
      // SECONDS — the cast-to-double domain, which StatsWindows normalizes
      // literals into), strings as unsigned UTF-8 bytes. Anything else
      // (date, binary, struct, …) would record stats no prune path can
      // soundly compare against — refuse loudly instead of skipping wrong.
      val badType = statsCols.filter { c =>
        val dt = df.schema(c).dataType
        !(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
          dt == org.apache.spark.sql.types.StringType ||
          dt == org.apache.spark.sql.types.TimestampType)
      }
      if (badType.nonEmpty) throw new IllegalArgumentException(
        s"statsCols must be numeric, string, or timestamp columns; " +
          badType.map(c => s"$c: ${df.schema(c).dataType.simpleString}").mkString(", ") +
          " has no sound stats domain")
    }
    check.foreach { c =>
      val bad = df.where(org.apache.spark.sql.functions.expr(s"NOT ($c)")).limit(1).collect()
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"CHECK constraint violated on $branch: ($c) is false for row ${bad.head}; " +
          "no version was written")
    }
    val parent = head(branch)
    val schema: StructType = parent match {
      case Some(p) if mode == "append" =>
        val parentSchema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
        // all schema comparisons are NULLABILITY-INSENSITIVE (nullNormalized):
        // a compacted/overwritten snapshot read back from parquet reports
        // every field nullable, and appending a stricter (non-null) frame
        // into it is always safe — byte-exact json equality would reject it
        val byName = parentSchema.fields
          .map(f => f.name -> VersionedTable.nullNormalized(f.dataType)).toMap
        val clash = df.schema.fields.filter(f =>
          byName.get(f.name).exists(_ != VersionedTable.nullNormalized(f.dataType)))
        if (clash.nonEmpty) throw new IllegalArgumentException(
          s"append type collision on $branch for ${clash.map(_.name).mkString(", ")}: " +
            "a column cannot change type on append")
        def shape(s: StructType) =
          s.fields.map(f => (f.name, VersionedTable.nullNormalized(f.dataType))).toSeq
        if (!mergeSchema && shape(df.schema) != shape(parentSchema))
          throw new IllegalArgumentException(
            s"append schema mismatch on $branch: table has ${parentSchema.simpleString} but " +
              s"the appended DataFrame has ${df.schema.simpleString}; pass mergeSchema=true " +
              "for additive evolution or use mode=overwrite")
        // merged-in NEW columns are forced NULLABLE (Delta's mergeSchema
        // rule): pre-existing rows have no value for them, and a
        // non-nullable declaration would let Catalyst constant-fold
        // `new_col IS NOT NULL` to true over rows that read back null.
        // Symmetrically, a PARENT column the appended frame OMITS goes
        // nullable too — the new file's rows read null for it.
        val appended = df.schema.fieldNames.toSet
        val mapActive = mappingActive(p, parentSchema)
        StructType(parentSchema.fields
          .map(f => if (appended.contains(f.name)) f else f.copy(nullable = true)) ++
          df.schema.fields.filterNot(f => byName.contains(f.name))
            .map { f =>
              val g = f.copy(nullable = true)
              // fresh physical name under active mapping: see addColumns
              if (mapActive)
                VersionedTable.withPhysical(g, VersionedTable.freshPhysical(g.name))
              else g
            })
      case Some(p) if mode == "overwrite" && !overwriteSchema =>
        val parentSchema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
        // normalization covers NESTED nullability (ArrayType.containsNull,
        // inner StructField.nullable, MapType.valueContainsNull) that a parquet
        // round-trip may relax — only name+logical-type changes should trip this
        if (df.schema.fields.map(f => (f.name, VersionedTable.nullNormalized(f.dataType))).toSeq !=
            parentSchema.fields.map(f => (f.name, VersionedTable.nullNormalized(f.dataType))).toSeq)
          throw new IllegalArgumentException(
            s"overwrite schema mismatch on $branch: table has ${parentSchema.simpleString} " +
              s"but the new snapshot has ${df.schema.simpleString}; pass overwriteSchema=true " +
              "to replace the schema intentionally (Delta overwriteSchema semantics)")
        df.schema
      case _ => df.schema
    }
    // a schema-REPLACING overwrite must not leave a CHECK constraint
    // silently dead: if a recorded predicate no longer analyzes against the
    // new schema (its column was dropped/renamed away), refuse the write —
    // Delta likewise refuses to drop a constrained column. Same-schema
    // writes skip the probe (the predicate analyzed when it was added).
    if (overwriteSchema && mode == "overwrite")
      parent.map(VersionedTable.checkConstraints).getOrElse(Map.empty).foreach {
        case (cname, csql) =>
          try df.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
            .select(org.apache.spark.sql.functions.expr(csql)).queryExecution.analyzed
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                s"overwriteSchema would orphan CHECK constraint $cname ($csql): " +
                  s"it no longer analyzes against the new schema (${e.getMessage.linesIterator.next()}); " +
                  "DROP CONSTRAINT first", e)
          }
      }
    val newFiles = writeDataFiles(guardChecks(df, parent), branch,
      parent.map(_.version + 1).getOrElse(0L), mapTo = Some(schema))
    val (newStats, newStrStats, newNullStats) =
      if (statsCols.isEmpty)
        (Map.empty[String, Map[String, (Double, Double)]],
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, Long]])
      else collectFileStats(df.sparkSession, newFiles, statsCols, schema)
    // bloom columns are STICKY (Delta's bloom index is a table property):
    // unless this write names its own, the parent's bloom column set is
    // recomputed for the new files — so appends, compaction and z-order
    // keep the index alive without re-specifying it. Columns the new
    // schema dropped (or retyped away from a hashable type) silently fall
    // out.
    val effBloomCols = (if (bloomCols.nonEmpty) bloomCols
                        else parent.map(bloomColsOf).getOrElse(Nil))
      .filter(c => df.schema.fieldNames.contains(c) &&
        VersionedTable.bloomSupported(df.schema(c).dataType))
    val newBlooms = collectFileBlooms(df.sparkSession, newFiles, effBloomCols, schema)
    val sidecar = writeBloomSidecar(branch, parent.map(_.version + 1).getOrElse(0L), newBlooms)
    // append keeps the parent's index (sidecars + any legacy inline
    // entries) live alongside the new files' sidecar; overwrite replaces
    // the snapshot, so only the fresh sidecar carries
    def attempt(base: Option[Commit]): Commit = {
      val app = mode == "append"
      publish(branch, base, message, schema,
        (if (app) base.map(_.files).getOrElse(Vector.empty) else Vector.empty) ++ newFiles,
        (if (app) base.map(_.stats).getOrElse(Map.empty)
         else Map.empty[String, Map[String, (Double, Double)]]) ++ newStats,
        strStats = (if (app) base.map(_.strStats).getOrElse(Map.empty)
                    else Map.empty[String, Map[String, (String, String)]]) ++ newStrStats,
        nullStats = (if (app) base.map(_.nullStats).getOrElse(Map.empty)
                     else Map.empty[String, Map[String, Long]]) ++ newNullStats,
        // append keeps the old files, so their deletion vectors stay live;
        // overwrite replaces the snapshot, so none carry
        dvFiles = if (app) base.map(_.dvFiles).getOrElse(Vector.empty)
                  else Vector.empty,
        bloomStats = if (app) base.map(_.bloomStats).getOrElse(Map.empty)
                     else Map.empty[String, Map[String, String]],
        bloomCols = effBloomCols,
        bloomFiles = (if (app) base.map(_.bloomFiles).getOrElse(Vector.empty)
                      else Vector.empty) ++ sidecar,
        dataChange = dataChange)
    }
    try attempt(parent)
    catch {
      // OCC REBASE for blind appends (r20, Delta's WriteSerializable rule:
      // a transaction that only ADDS files never logically conflicts with
      // another committed change — appends commute with appends, DML and
      // layout commits). Losing the version-slot CAS therefore re-reads the
      // new head and re-publishes the SAME already-written data files on
      // top of it — metadata-only, the data job never re-runs — so a
      // 1000-writer concurrent ingest serializes instead of failing 999
      // writers. The rebase REFUSES (rethrowing the conflict) whenever the
      // winner moved anything this append's validation depended on: the
      // schema (our shape/type checks ran against the old one), the table
      // properties (a concurrently ADDED CHECK constraint has not validated
      // our rows), or the sticky bloom column set (our sidecar indexes the
      // old columns). Overwrites and DML never rebase here — an overwrite
      // that lost the race would silently drop the winner's rows.
      case e: java.util.ConcurrentModificationException
          if mode == "append" && parent.nonEmpty =>
        var base = parent
        var out: Option[Commit] = None
        var lost = 0
        while (out.isEmpty) {
          lost += 1
          if (lost > VersionedTable.MaxAppendRebase) throw e
          guardWritable(branch) // protection rules may have changed mid-race
          val nh = head(branch)
          val safe = nh.exists(h => base.exists(b =>
            h.version > b.version &&
              h.schemaJson == b.schemaJson && h.props == b.props &&
              bloomColsOf(h).sorted == bloomColsOf(b).sorted))
          if (!safe) throw e
          base = nh
          try out = Some(attempt(base))
          catch { case _: java.util.ConcurrentModificationException => () }
        }
        out.get
    }
  }

  /** Per-file min/max stats for `cols`, computed in ONE Spark job over the
    * just-written files (grouped by input_file_name) — the commit-log
    * equivalent of Delta's data-skipping stats. At 100 TB you would read
    * parquet footers instead of rescanning; one extra columnar scan of the
    * fresh files keeps this dependency-free and exact.
    *
    * STRING columns keep their min/max as strings (second map), compared at
    * prune time as unsigned UTF-8 bytes — the SAME ordering Spark's min/max
    * computed them under (see [[readWhereString]]) — Delta records string
    * stats too; a time/tenant-keyed lake skips on them constantly. Other
    * columns are cast to double as before. */
  /** `input_file_name()` yields a percent-encoded URI (`file:///…%20…`):
    * decode it before relativizing against `root`, or a table root containing
    * a URI-escaped character (space, `#`, …) matches NO commit-log entry and
    * the caller's file partition silently classifies everything untouched. */
  private def inputFileToRel(raw: String): String = {
    val p =
      try java.nio.file.Paths.get(new java.net.URI(raw).getPath)
      catch { case _: Exception => java.nio.file.Paths.get(raw.stripPrefix("file:")) }
    root.relativize(p).toString
  }

  private def collectFileStats(spark: SparkSession, files: Vector[String],
                               cols: Seq[String], schema: StructType)
      : (Map[String, Map[String, (Double, Double)]],
         Map[String, Map[String, (String, String)]],
         Map[String, Map[String, Long]]) =
    footerFileStats(files, cols, schema)
      .getOrElse(collectFileStatsJob(spark, files, cols, schema))

  /** Footer fast path for [[collectFileStats]] (r21, guide §1/§6): the
    * min/max/nullCount the Spark job re-reads every data page to compute
    * are ALREADY in each new file's parquet footer — written by the write
    * job itself moments earlier. Reading footers is O(files) driver-local
    * metadata I/O (cached, shared with [[VersionedTable.footerRowCount]]),
    * which removes one full read-back Spark job from EVERY stats-carrying
    * commit (write / COW rewrite / compaction / ANALYZE).
    *
    * Exactness: every bound equals the Spark job's value — footer min/max
    * are exact extrema of the same rows, and `long→double` / `float→double`
    * casts are monotone, so min/max commute with them. Returns None (caller
    * falls back to the job) for any shape whose equality is not PROVEN:
    * decimals, INT96 timestamps, or a chunk with non-null values but
    * dropped stats (NaN doubles, over-long binary) — so behavior in those
    * corners is byte-identical to before. A column absent from a file's
    * own schema (file predates ADD COLUMNS) mirrors the job's read-as-null:
    * all-null counts, no min/max entry. */
  private def footerFileStats(files: Vector[String], cols: Seq[String],
                              schema: StructType)
      : Option[(Map[String, Map[String, (Double, Double)]],
                Map[String, Map[String, (String, String)]],
                Map[String, Map[String, Long]])] = try {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.spark.sql.types._
    if (cols.exists(c => schema(c).dataType.isInstanceOf[DecimalType])) return None
    val num = scala.collection.mutable.Map.empty[String, Map[String, (Double, Double)]]
    val str = scala.collection.mutable.Map.empty[String, Map[String, (String, String)]]
    val nulls = scala.collection.mutable.Map.empty[String, Map[String, Long]]
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def leUtf8(a: Array[Byte], b: Array[Byte]): Boolean = { // unsigned lexicographic
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i) & 0xff; val y = b(i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      a.length <= b.length
    }
    for (f <- files) {
      val meta = VersionedTable.footerMeta(root.resolve(f)).getOrElse(return None)
      val blocks = meta.getBlocks
      val fileRows = {
        var s = 0L; blocks.forEach(b => s += b.getRowCount); s
      }
      if (fileRows > 0) {
        val fNum = Map.newBuilder[String, (Double, Double)]
        val fStr = Map.newBuilder[String, (String, String)]
        val fNul = Map.newBuilder[String, Long]
        for (c <- cols) {
          val phys = VersionedTable.physName(schema, c)
          val dt = schema(c).dataType
          var nullCount = 0L
          var dMin = Double.MaxValue; var dMax = Double.MinValue
          var sMin: Array[Byte] = null; var sMax: Array[Byte] = null
          var any = false
          val it = blocks.iterator()
          while (it.hasNext) {
            val b = it.next()
            val chunk = {
              var found: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
              val cit = b.getColumns.iterator()
              while (cit.hasNext && found == null) {
                val cc = cit.next()
                if (cc.getPath.size() == 1 && cc.getPath.toDotString == phys) found = cc
              }
              found
            }
            if (chunk == null) nullCount += b.getRowCount // pre-ADD COLUMNS file: reads as null
            else {
              val st = chunk.getStatistics
              if (st == null || !st.isNumNullsSet) return None
              nullCount += st.getNumNulls
              val nonNull = chunk.getValueCount - st.getNumNulls
              if (nonNull > 0) {
                if (!st.hasNonNullValue) return None // dropped stats (NaN / oversize binary)
                any = true
                dt match {
                  case StringType =>
                    val mn = st.getMinBytes; val mx = st.getMaxBytes
                    if (sMin == null || leUtf8(mn, sMin)) sMin = mn
                    if (sMax == null || leUtf8(sMax, mx)) sMax = mx
                  case TimestampType =>
                    val lt = chunk.getPrimitiveType.getLogicalTypeAnnotation
                    val unit = lt match {
                      case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                        t.getUnit
                      case _ => return None // INT96 or unexpected physical layout
                    }
                    val div = unit match {
                      case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS => 1e6
                      case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS => 1e3
                      case _ => return None
                    }
                    val mn = st.genericGetMin.asInstanceOf[java.lang.Long].toDouble / div
                    val mx = st.genericGetMax.asInstanceOf[java.lang.Long].toDouble / div
                    if (mn < dMin) dMin = mn
                    if (mx > dMax) dMax = mx
                  case _: NumericType =>
                    val (mn, mx) = chunk.getPrimitiveType.getPrimitiveTypeName match {
                      case PrimitiveTypeName.INT32 =>
                        (st.genericGetMin.asInstanceOf[java.lang.Integer].toDouble,
                          st.genericGetMax.asInstanceOf[java.lang.Integer].toDouble)
                      case PrimitiveTypeName.INT64 =>
                        (st.genericGetMin.asInstanceOf[java.lang.Long].toDouble,
                          st.genericGetMax.asInstanceOf[java.lang.Long].toDouble)
                      case PrimitiveTypeName.FLOAT =>
                        (st.genericGetMin.asInstanceOf[java.lang.Float].toDouble,
                          st.genericGetMax.asInstanceOf[java.lang.Float].toDouble)
                      case PrimitiveTypeName.DOUBLE =>
                        (st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
                          st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue())
                      case _ => return None
                    }
                    if (mn.isNaN || mx.isNaN) return None // Spark orders NaN greatest; don't mirror here
                    if (mn < dMin) dMin = mn
                    if (mx > dMax) dMax = mx
                  case _ => return None
                }
              }
            }
          }
          fNul += c -> nullCount
          if (any) dt match {
            case StringType =>
              fStr += c -> (VersionedTable.statsLower(new String(sMin, utf8)),
                VersionedTable.statsUpper(new String(sMax, utf8)))
            case _ => fNum += c -> (dMin, dMax)
          }
        }
        num(f) = fNum.result(); str(f) = fStr.result(); nulls(f) = fNul.result()
      }
    }
    // files with zero rows are absent from every map, and an inner map may
    // be empty — exactly the shapes the Spark job's groupBy produces
    Some((num.toMap, str.toMap, nulls.toMap))
  } catch { case scala.util.control.NonFatal(_) => None }

  private def collectFileStatsJob(spark: SparkSession, files: Vector[String],
                                  cols: Seq[String], schema: StructType)
      : (Map[String, Map[String, (Double, Double)]],
         Map[String, Map[String, (String, String)]],
         Map[String, Map[String, Long]]) = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit, max, min, sum, when}
    val isStr = cols.map(c =>
      c -> (schema(c).dataType == org.apache.spark.sql.types.StringType)).toMap
    // column mapping (r20): files store PHYSICAL names — aggregate over the
    // physical twin, emit maps keyed by the LOGICAL names the log uses. The
    // explicit schema also makes files that PREDATE a metadata-only ADD
    // COLUMNS read the missing column as NULL (omitted entry, conservative)
    // instead of failing on whichever footer Spark sampled for inference.
    def pc(c: String) = col(VersionedTable.physName(schema, c))
    val paths = files.map(f => root.resolve(f).toString)
    // layout per file row: [__file, (min,max) x cols, nullCount x cols]
    val aggs = cols.flatMap(c =>
      if (isStr(c)) Seq(min(pc(c)).as(s"__min_$c"), max(pc(c)).as(s"__max_$c"))
      else Seq(min(pc(c).cast("double")).as(s"__min_$c"),
        max(pc(c).cast("double")).as(s"__max_$c"))) ++
      cols.map(c => sum(when(pc(c).isNull, 1L).otherwise(0L)).as(s"__nc_$c"))
    val rows = spark.read.schema(VersionedTable.physicalSchema(schema)).parquet(paths: _*)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => inputFileToRel(r.getString(0)) -> r)
    // All-null (or non-castable) stats columns yield null min/max: omit
    // that column's entry — conservative "no stats, never skip".
    def defined(r: Row, i: Int) = !r.isNullAt(1 + 2 * i) && !r.isNullAt(2 + 2 * i)
    val num = rows.map { case (rel, r) =>
      rel -> cols.zipWithIndex.collect {
        case (c, i) if !isStr(c) && defined(r, i) =>
          c -> (r.getDouble(1 + 2 * i), r.getDouble(2 + 2 * i))
      }.toMap
    }.toMap
    val str = rows.map { case (rel, r) =>
      rel -> cols.zipWithIndex.collect {
        case (c, i) if isStr(c) && defined(r, i) =>
          // long values truncate to sound bounds — the commit log must stay
          // metadata-sized even when the stats column is document text
          c -> (VersionedTable.statsLower(r.getString(1 + 2 * i)),
            VersionedTable.statsUpper(r.getString(2 + 2 * i)))
      }.toMap
    }.toMap
    val ncBase = 1 + 2 * cols.size
    val nulls = rows.map { case (rel, r) =>
      rel -> cols.zipWithIndex.collect {
        case (c, i) if !r.isNullAt(ncBase + i) => c -> r.getLong(ncBase + i)
      }.toMap
    }.toMap
    (num, str, nulls)
  }

  /** Per-file BLOOM bitsets for `cols`, aggregated EXECUTOR-side (r19):
    * each row's k bit positions per column are computed by the codegen'd
    * `xxhash64` expression, partially deduped map-side (`collect_set` per
    * (file, column) — ≤ 16384 ints per group per input partition cross
    * the shuffle, never row-proportional), and each group's positions
    * fold into its ~2 KB bitset INSIDE the task. The driver receives ONE
    * bitset row per file × column — the same O(files) contract as
    * [[collectFileStats]] — where the r18 shape collected every (file,
    * column, position) triple (~4 orders of magnitude more; a 10k-file
    * write could OOM the driver).
    *
    * STRING columns hash their UTF-8 bytes; INTEGRAL columns hash their
    * cast-to-long twin, so byte/short/int/long key columns share one
    * probe image ([[VersionedTable.bloomPositionsLong]]). NULL values
    * contribute the seed-only position — harmless, since an equality
    * probe value is never NULL. */
  private def collectFileBlooms(spark: SparkSession, files: Vector[String],
                                cols: Seq[String], schema: StructType)
      : Vector[(String, String, Array[Byte])] = {
    import org.apache.spark.sql.functions.{array, col, input_file_name, lit, pmod, xxhash64}
    if (cols.isEmpty || files.isEmpty) return Vector.empty
    val m = VersionedTable.BloomMBits
    // sidecars are immutable and shared across commits, so their entries
    // key on the column's PHYSICAL name (stable across renames);
    // [[bloomLookup]] translates each probe's logical name once.
    // r21 (guide §2.3): each row's k positions fold DIRECTLY into the
    // ~2 KB bitset via the BloomBitsAgg typed aggregate — one buffer per
    // (file, column) per map partition crosses the shuffle, where the
    // previous shape exploded k rows per input row and collect_set-deduped
    // them first. Bitset contents are identical (same positions set).
    def hashable(c: String) =
      if (schema(c).dataType == org.apache.spark.sql.types.StringType)
        col(VersionedTable.physName(schema, c))
      else col(VersionedTable.physName(schema, c)).cast("long")
    def positions(c: String) =
      array((0 until VersionedTable.BloomKHashes).map(i =>
        pmod(xxhash64(lit(i), hashable(c)), lit(m.toLong)).cast("int")): _*)
    val aggs = cols.map(c =>
      graft.functions.BloomBitsAgg.bloomBits(positions(c), m).as(s"__bits_$c"))
    val rows = spark.read.schema(VersionedTable.physicalSchema(schema))
      .parquet(files.map(f => root.resolve(f).toString): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.toVector.flatMap { r =>
      val rel = inputFileToRel(r.getString(0))
      cols.zipWithIndex.map { case (c, i) =>
        (rel, VersionedTable.physName(schema, c), r.getAs[Array[Byte]](1 + i))
      }
    }
  }

  /** Persist one write batch's bloom entries as a sidecar `.bloom` file
    * under the commit's data namespace ([[BloomIndex]]); returns its
    * root-relative path (empty for an empty batch). Lives under `data/`
    * so the existing vacuum sweep/retention machinery manages it like any
    * data-plane artifact. */
  private def writeBloomSidecar(branch: String, version: Long,
                                entries: Seq[(String, String, Array[Byte])])
      : Vector[String] =
    if (entries.isEmpty) Vector.empty
    else {
      val rel = s"$branch-v$version-bloomidx-${java.util.UUID.randomUUID.toString.take(8)}"
      val dir = dataDir.resolve(rel)
      Files.createDirectories(dir)
      val p = dir.resolve("index.bloom")
      BloomIndex.write(p, entries)
      Vector(root.relativize(p).toString)
    }

  /** The bloom column set a commit tracks — what COW rewrites and sticky
    * writes recompute for their new files. Explicit field first (r19),
    * unioned with the legacy inline index's columns. */
  private def bloomColsOf(c: Commit): Seq[String] =
    (c.bloomCols ++ c.bloomStats.valuesIterator.flatMap(_.keys)).distinct

  /** COW carry rule for the bloom index, shared by delete/update/merge/
    * applyCdc: the parent's sidecars stay referenced (untouched files keep
    * their entries; rewritten files' old entries go dead-but-harmless),
    * legacy inline entries carry for untouched files only, and the
    * rewritten files get a FRESH sidecar over the parent's sticky column
    * set. Returns (bloomCols, bloomFiles, legacy inline carry) for
    * [[publish]]. */
  private def cowBloom(spark: SparkSession, parent: Commit, branch: String,
                       untouchedSet: Set[String], newFiles: Vector[String],
                       schema: StructType)
      : (Seq[String], Vector[String], Map[String, Map[String, String]]) = {
    val cols = bloomColsOf(parent).filter(c => schema.fieldNames.contains(c) &&
      VersionedTable.bloomSupported(schema(c).dataType))
    val sidecar = writeBloomSidecar(branch, parent.version + 1,
      collectFileBlooms(spark, newFiles, cols, schema))
    (cols, parent.bloomFiles ++ sidecar,
      parent.bloomStats.view.filterKeys(untouchedSet).toMap)
  }

  /** Lazy bloom probe surface of a commit: `(relFile, col) → bitset`,
    * merging the r19 sidecars with any legacy inline entries. Nothing is
    * read until the FIRST probe (scans without point predicates never pay
    * for the index); sidecar parses are memoized process-wide
    * ([[BloomIndex.cached]]). Driver footprint per loaded commit is
    * O(files × bloomCols × 2 KB) — the bounded metadata contract; a
    * missing/corrupt sidecar degrades to "no bloom, never skip" rather
    * than failing the scan. */
  private[graft] def bloomLookup(c: Commit): (String, String) => Option[Array[Byte]] = {
    if (c.bloomFiles.isEmpty && c.bloomStats.isEmpty) (_, _) => None
    else {
      lazy val side: Map[(String, String), Array[Byte]] =
        c.bloomFiles.flatMap { f =>
          try BloomIndex.cached(root.resolve(f))
          catch { case scala.util.control.NonFatal(_) => Map.empty }
        }.toMap
      // probes arrive with the query's LOGICAL column name; sidecars (and
      // legacy inline entries) key on the stable PHYSICAL name
      lazy val schema = DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
      (file, colName) => {
        val pn = VersionedTable.physName(schema, colName)
        side.get((file, pn)).orElse(
          c.bloomStats.get(file).flatMap(_.get(pn))
            .map(java.util.Base64.getDecoder.decode(_)))
      }
    }
  }

  /** Delta-style MERGE (upsert): source rows REPLACE current rows sharing
    * their key (WHEN MATCHED UPDATE ALL) and are INSERTED otherwise, as a
    * NEW version — old versions still time-travel. Relational core: one
    * left-anti join of the touched rows against the distinct source keys,
    * then a union — both shuffle only on the key columns, so the plan is two
    * key-partitioned exchanges regardless of table width or scale. Schemas
    * must match (same enforcement rationale as append).
    *
    * COPY-ON-WRITE, file-granular (Delta MERGE's file pruning): a parent
    * file whose per-file [min,max] stats on some key column are DISJOINT
    * from the source's key range provably contains no matched key — it is
    * carried into the new version UNTOUCHED (and keeps its stats entry).
    * Only the remaining files are rewritten. On a key-clustered petabyte
    * table a point-range upsert rewrites a handful of files, and the
    * file-granular [[changes]] diff over that interval scans only
    * touched+new files. Files without numeric key stats are conservatively
    * rewritten; correctness never depends on pruning.
    *
    * The source must be key-unique: Delta's MERGE errors when multiple source
    * rows match one target row, and silently keeping every duplicate would
    * violate the REPLACE contract above — so a duplicated key fails fast
    * here. The check is one aggregation on the key columns (the same shuffle
    * key the anti-join uses) short-circuited by `limit(1)`: a bounded extra
    * job, metadata-scale next to the rewrite itself. */
  def upsert(spark: SparkSession, source: DataFrame, keyCols: Seq[String],
             branch: String = "main", message: String = ""): Commit =
    applyCdc(spark, source, None, keyCols, branch,
      if (message.isEmpty) s"upsert on (${keyCols.mkString(", ")})" else message)

  /** Apply a KEYED CDC batch as ONE copy-on-write commit — the general form
    * of [[upsert]] (which is `applyCdc` with no deletes): rows in `upserts`
    * REPLACE any row sharing their key, keys in `deleteKeys` (a DataFrame
    * carrying at least the key columns) are REMOVED, and a key present in
    * both is a replace (the upsert wins — the net effect of a CDC batch's
    * delete-preimage + insert-postimage pair). This is what a CDC consumer
    * needs to land one source version ATOMICALLY: a split delete-commit +
    * upsert-commit pair would leave a torn intermediate version on a crash
    * between them and break batch-id idempotency
    * ([[graft.streaming.ChangeFeed.tailFromDelta]] relies on the one-commit
    * shape).
    *
    * Same COW mechanics and scale shape as upsert: numeric-key range stats
    * (over upserted AND deleted keys) prune the files that provably hold no
    * affected key; only the remainder is rewritten via one anti-join;
    * untouched files carry their stats and deletion vectors. */
  def applyCdc(spark: SparkSession, upserts: DataFrame,
               deleteKeys: Option[DataFrame], keyCols: Seq[String],
               branch: String = "main", message: String = ""): Commit = synchronized {
    guardWritable(branch)
    require(keyCols.nonEmpty, "applyCdc needs at least one key column")
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val dup = upserts.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
      .limit(1).collect()
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"upsert source is not unique on (${keyCols.mkString(", ")}): e.g. key " +
        s"${dup.head.toSeq.init.mkString("(", ", ", ")")} appears ${dup.head.getLong(keyCols.size)} " +
        "times — source rows REPLACE rows sharing their key, so duplicates are ambiguous " +
        "(Delta MERGE raises the same error); de-duplicate the source first")
    val parent = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    // name+type equality (nullability-insensitive, including NESTED nullability:
    // reading parquet back relaxes nullable flags, which must not block an upsert)
    require(schema.fields.map(f => (f.name, VersionedTable.nullNormalized(f.dataType))).toSeq ==
        upserts.schema.fields.map(f => (f.name, VersionedTable.nullNormalized(f.dataType))).toSeq,
      s"upsert schema mismatch on $branch: table has ${schema.simpleString} " +
        s"but the source has ${upserts.schema.simpleString}")
    deleteKeys.foreach(d => require(keyCols.forall(d.columns.contains),
      s"deleteKeys must carry the key columns (${keyCols.mkString(", ")}), " +
        s"got (${d.columns.mkString(", ")})"))
    val delKeys = deleteKeys.map(_.select(keyCols.map(col): _*))
    // An empty batch is a pure no-op: nothing matches, nothing inserts,
    // nothing deletes, so the current head IS the result — no rewrite, no
    // version churn (the same early-return shape as merge's already-equal
    // case). The incremental-pipeline cycle with no updates costs one
    // limit(1) probe per side.
    if (upserts.isEmpty && delKeys.forall(_.isEmpty)) return parent
    val affected = delKeys.foldLeft(upserts.select(keyCols.map(col): _*))(_ unionByName _)
    // file pruning: affected key range per NUMERIC key column (one bounded
    // action, 2 doubles per key) vs the parent's per-file stats — the same
    // range logic as readWhere. Only NumericType keys participate (a
    // DATE/BINARY key is not double-castable under ANSI and must not break
    // the apply); non-numeric-keyed tables simply rewrite conservatively.
    val numKeys = keyCols.filter(k =>
      schema(k).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val srcRange: Map[String, (Double, Double)] =
      if (numKeys.isEmpty) Map.empty
      else {
        val aggs = numKeys.flatMap(k => Seq(min(col(k).cast("double")).as(s"__mn_$k"),
          max(col(k).cast("double")).as(s"__mx_$k")))
        val r = affected.agg(aggs.head, aggs.tail: _*).collect().head
        numKeys.zipWithIndex.collect {
          case (k, i) if !r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1) =>
            k -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
        }.toMap
      }
    val (untouched, touched) = parent.files.partition { f =>
      srcRange.exists { case (k, (smn, smx)) =>
        parent.stats.get(f).flatMap(_.get(k)) match {
          case Some((mn, mx)) => mx < smn || mn > smx // provably no affected key
          case None => false
        }
      }
    }
    val touchedRows = readCommit(spark, parent.copy(files = touched))
    val keep = touchedRows.join(affected.distinct(), keyCols, "left_anti")
    // CHECK constraints guard only the INCOMING side: `keep` rows come from
    // the already-validated snapshot and re-land unchanged
    val newFiles = writeDataFiles(
      keep.unionByName(guardChecks(upserts, Some(parent))), branch, parent.version + 1,
      mapTo = Some(DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]))
    // untouched files keep their stats; new files get fresh stats over the
    // same column set the parent tracked (so skip-reads keep working)
    val statCols = (parent.stats.values.flatMap(_.keys) ++
      parent.strStats.values.flatMap(_.keys)).toSeq.distinct
    val (newStats, newStrStats, newNullStats) =
      if (statCols.isEmpty || newFiles.isEmpty) // a pure delete may empty the rewrite
        (Map.empty[String, Map[String, (Double, Double)]],
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, Long]])
      else collectFileStats(spark, newFiles, statCols, schema)
    val untouchedSet = untouched.toSet // O(1) lookups: stat carry is O(F), not O(F^2)
    val (bCols, bFiles, bLegacy) = cowBloom(spark, parent, branch, untouchedSet, newFiles, schema)
    publish(branch, Some(parent),
      if (message.isEmpty) s"applyCdc on (${keyCols.mkString(", ")})" else message,
      schema, untouched ++ newFiles,
      parent.stats.view.filterKeys(untouchedSet).toMap ++ newStats,
      strStats = parent.strStats.view.filterKeys(untouchedSet).toMap ++ newStrStats,
      nullStats = parent.nullStats.view.filterKeys(untouchedSet).toMap ++ newNullStats,
      dvFiles = parent.dvFiles, // untouched files keep their deletion vectors
      bloomStats = bLegacy, bloomCols = bCols, bloomFiles = bFiles)
  }

  /** Generalized `MERGE INTO` (the full Delta/Spark statement, where
    * [[upsert]] is the classic two-clause special case): target rows join
    * `source` on the `on` predicate, then
    *
    *  - `matched` clauses (UPDATE SET / DELETE, each with an optional AND
    *    condition) apply to target rows with a matching source row — FIRST
    *    applicable clause wins, a row no clause applies to is kept as-is;
    *  - `notMatched` clauses (INSERT, optional condition) apply to source
    *    rows matching no target row — unassigned columns insert as typed
    *    NULL (Delta's rule);
    *  - `notMatchedBySource` clauses (UPDATE / DELETE, optional condition)
    *    apply to target rows with no source match.
    *
    * Expressions (`on`, clause conditions, assignment right-hand sides) are
    * SQL text over `targetAlias`/`sourceAlias`-qualified columns, evaluated
    * on the joined row; a NULL condition applies nothing (three-valued
    * logic, same as [[delete]]'s keep rule). Assignment targets must be
    * existing columns and cast to the column's type — the merge never
    * drifts the schema UNLESS `schemaEvolution` is set (Delta's `MERGE
    * WITH SCHEMA EVOLUTION`): then source-only columns append to the
    * target schema as nullable fields, assignments may fill them, and
    * every row/file without a value reads null — old versions keep their
    * own pinned schema, so time travel across the widening still replays
    * exactly. A target row matched by MULTIPLE source rows where
    * more than one joined copy has an applicable clause fails fast
    * (Delta's cardinality error): which copy should win is ambiguous.
    *
    * COPY-ON-WRITE, file-granular, all as ONE commit: equi-key conjuncts
    * of `on` (`t.k = s.k`) prune candidate files through the commit-log
    * stats exactly like [[upsert]] — numeric and timestamp keys against
    * the double-domain stats, STRING keys (doc_id/uuid, the common
    * LLM-corpus merge shape) against the truncation-sound strStats under
    * unsigned-UTF-8 order; an exact detection pass
    * lists the files actually holding a row some clause APPLIES to; only
    * those are rewritten (kept rows carried, updates applied, deletes
    * dropped), inserts land in the new files, and every untouched file
    * keeps its entry, stats and deletion vectors. A `notMatchedBySource`
    * clause must examine every target row, so its detection scans the
    * whole snapshot (still file-exact about what it rewrites) — the same
    * cost Delta pays for that clause. Matching is over LIVE rows (deletion
    * vectors subtracted) and the rewrite materializes survivors, so MOR
    * and COW history compose. */
  /** The candidate-file set a merge source with the given per-key ranges
    * could possibly match: a file is DROPPED only when some key's file
    * stats are provably disjoint from the source's [min, max] on that key
    * — numeric/timestamp keys against the double-domain stats, string keys
    * against the truncation-sound strStats under unsigned-UTF-8 order.
    * Missing stats keep the file (conservative); soundness is pinned by
    * the ScalaCheck pruning property and the ghost-file merge spec. */
  private[graft] def mergeCandidates(parent: Commit,
      numRange: Map[String, (Double, Double)],
      strRange: Map[String, (String, String)]): Vector[String] =
    parent.files.filterNot { f =>
      numRange.exists { case (k, (lo, hi)) =>
        parent.stats.get(f).flatMap(_.get(k)) match {
          case Some((mn, mx)) => mx < lo || mn > hi // provably no equi-key match
          case None => false
        }
      } || strRange.exists { case (k, (lo, hi)) =>
        parent.strStats.get(f).flatMap(_.get(k)) match {
          // file stats are truncation-SOUND bounds (statsLower ≤ true min,
          // statsUpper ≥ true max), so disjointness stays a proof
          case Some((mn, mx)) =>
            VersionedTable.utf8Cmp(mx, lo) < 0 || VersionedTable.utf8Cmp(mn, hi) > 0
          case None => false
        }
      }
    }

  def mergeInto(spark: SparkSession, source: DataFrame, on: String,
                matched: Seq[MergeClause] = Nil,
                notMatched: Seq[MergeClause] = Nil,
                notMatchedBySource: Seq[MergeClause] = Nil,
                targetAlias: String = "t", sourceAlias: String = "s",
                branch: String = "main", message: String = "",
                schemaEvolution: Boolean = false): Commit = synchronized {
    guardWritable(branch)
    import org.apache.spark.sql.functions.{coalesce, col, count, expr, lit, max => smax, min => smin, when}
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "mergeInto needs at least one WHEN clause")
    require(targetAlias != sourceAlias,
      s"target and source aliases must differ, both are '$targetAlias'")
    matched.foreach(c => require(c.kind == "update" || c.kind == "delete",
      s"WHEN MATCHED supports update/delete, got '${c.kind}'"))
    notMatched.foreach(c => require(c.kind == "insert",
      s"WHEN NOT MATCHED supports insert only, got '${c.kind}'"))
    notMatchedBySource.foreach(c => require(c.kind == "update" || c.kind == "delete",
      s"WHEN NOT MATCHED BY SOURCE supports update/delete, got '${c.kind}'"))
    val parent = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    // WITH SCHEMA EVOLUTION (Delta's rule): source-only columns APPEND to
    // the target schema as NULLABLE fields — assignments may target them,
    // kept/by-source rows and untouched files read them back as null (a
    // parquet file lacking a requested column yields nulls, the same
    // mechanism mergeSchema appends rely on). Same-name columns keep the
    // TARGET type; assignment right-hand sides cast to it as ever.
    // source-vs-target column matching is CASE-INSENSITIVE (Spark's default
    // resolver, Delta's evolution rule): a source column differing only in
    // case must NOT append a duplicate field — the merged files would then
    // carry both and every later read fails parquet's duplicate-field check
    val outSchema: StructType =
      if (!schemaEvolution) schema
      else StructType(schema.fields ++
        source.schema.fields
          .filterNot(f => schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
          .map(_.copy(nullable = true)))
    (matched ++ notMatched ++ notMatchedBySource).foreach { c =>
      val unknown = c.assignments.keySet.diff(outSchema.fieldNames.toSet)
      require(unknown.isEmpty,
        s"merge ${c.kind} assigns unknown column(s): ${unknown.mkString(", ")}" +
          (if (schemaEvolution) ""
           else " — source-only columns need schemaEvolution=true (MERGE WITH SCHEMA EVOLUTION)"))
      require(c.kind != "delete" || c.assignments.isEmpty,
        "a DELETE clause takes no assignments")
    }
    // every internal planning column is reserved, in BOTH schemas: a user
    // column named __graft_applied/__graft_ins would be silently replaced by
    // the clause-routing withColumn and corrupt which clause fires
    Seq(VersionedTable.FkCol, VersionedTable.PosCol, "__graft_src",
        "__graft_applied", "__graft_ins").foreach { r =>
      require(!source.columns.contains(r), s"source may not carry reserved column $r")
      require(!schema.fieldNames.contains(r), s"target may not carry reserved column $r")
    }
    // mergeInto evaluates the source in up to four independent jobs (equi-key
    // range agg, matched detection, rewrite join, insert anti-join); a
    // non-deterministic source (rand(), sample, a re-read mutable input)
    // could apply clauses inconsistently between detection and rewrite.
    // Delta materializes such sources for exactly this reason — pin it once.
    val source0 =
      if (source.queryExecution.analyzed.exists(_.expressions.exists(e => !e.deterministic)))
        source.localCheckpoint()
      else source

    val srcMark = "__graft_src"
    val src = source0.alias(sourceAlias)
    val onExpr = expr(on)
    def tgtScan(c: Commit) = scanWithPos(spark, c).alias(targetAlias)
    // NULL clause condition applies nothing (SQL three-valued logic)
    def condCol(c: MergeClause): org.apache.spark.sql.Column =
      coalesce(expr(c.condition.getOrElse("true")), lit(false))
    def anyCond(cs: Seq[MergeClause]) = cs.map(condCol).reduce(_ || _)
    // first-applicable-clause index; `offset` keeps the matched and
    // by-source chains in disjoint index spaces of one column
    def chain(cs: Seq[MergeClause], offset: Int): org.apache.spark.sql.Column =
      cs.zipWithIndex.foldRight(lit(null).cast("int")) { case ((c, i), rest) =>
        when(condCol(c), lit(offset + i)).otherwise(rest)
      }

    // ---- candidate pruning: numeric equi-key conjuncts of `on` ----------
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, Expression => CExpr}
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val equiKeys: Seq[(String, String)] = // (target col, source col)
      conjuncts(spark.sessionState.sqlParser.parseExpression(on)).collect {
        case CEq(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
          (a.nameParts, b.nameParts) match {
            case (Seq(ta, tc), Seq(sa, sc)) if ta == targetAlias && sa == sourceAlias => Some((tc, sc))
            case (Seq(sa, sc), Seq(ta, tc)) if ta == targetAlias && sa == sourceAlias => Some((tc, sc))
            case _ => None
          }
      }.flatten.filter { case (tc, _) => schema.fieldNames.contains(tc) }
    // numeric AND timestamp keys prune through the double-domain stats
    // (timestamps live there as epoch seconds — the cast below lands in the
    // same domain); STRING keys — the common LLM-corpus shape, doc_id/uuid —
    // prune through strStats under unsigned-UTF-8 order, exactly like
    // delete/update's statsCandidates. One bounded agg computes every range.
    val numKeys = equiKeys.filter { case (tc, _) =>
      val dt = schema(tc).dataType
      dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.TimestampType
    }
    val strKeys = equiKeys.filter { case (tc, _) =>
      schema(tc).dataType == org.apache.spark.sql.types.StringType
    }
    val (srcRange, srcStrRange): (Map[String, (Double, Double)], Map[String, (String, String)]) =
      if (numKeys.isEmpty && strKeys.isEmpty) (Map.empty, Map.empty)
      else {
        val aggs = numKeys.flatMap { case (tc, sc) =>
          Seq(smin(col(sc).cast("double")).as(s"__mn_$tc"),
            smax(col(sc).cast("double")).as(s"__mx_$tc"))
        } ++ strKeys.flatMap { case (tc, sc) =>
          Seq(smin(col(sc)).as(s"__smn_$tc"), smax(col(sc)).as(s"__smx_$tc"))
        }
        val r = source0.agg(aggs.head, aggs.tail: _*).collect().head
        val nums = numKeys.map(_._1).zipWithIndex.collect {
          case (tc, i) if !r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1) =>
            tc -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
        }.toMap
        val base = 2 * numKeys.size
        val strs = strKeys.map(_._1).zipWithIndex.collect {
          case (tc, i) if !r.isNullAt(base + 2 * i) && !r.isNullAt(base + 2 * i + 1) =>
            tc -> (r.getString(base + 2 * i), r.getString(base + 2 * i + 1))
        }.toMap
        (nums, strs)
      }
    val candidates = {
      val base = mergeCandidates(parent, srcRange, srcStrRange)
      // BLOOM probe (r19): when the source's DISTINCT keys on a
      // bloom-indexed equi-key column are FEW (the point-upsert shape —
      // exactly where scattered uuid/long-id keys defeat the range
      // windows above), probe each surviving candidate's bloom with every
      // source key; a file whose bloom provably misses them all cannot
      // hold a match and carries untouched. One bounded `distinct().
      // limit(cap+1)` job per probed column; a bigger-than-cap source
      // skips the probe (range pruning already did its part). False
      // positives only ever KEEP files, so the rewrite set stays sound.
      val bloomKeyCols = equiKeys.filter { case (tc, _) =>
        bloomColsOf(parent).contains(tc) &&
          VersionedTable.bloomSupported(schema(tc).dataType)
      }
      if (base.isEmpty || bloomKeyCols.isEmpty) base
      else {
        val bloom = bloomLookup(parent)
        bloomKeyCols.foldLeft(base) { case (files, (tc, sc)) =>
          val cap = VersionedTable.MaxMergeBloomProbes
          val vals = source0.select(col(sc)).distinct().limit(cap + 1).collect()
          if (files.isEmpty || vals.length > cap) files
          else {
            val isStr = schema(tc).dataType == org.apache.spark.sql.types.StringType
            // every non-null source key must convert EXACTLY into the
            // bloom's hash domain, else probe nothing (a cast-mismatched
            // join could match values the probe image misses)
            val probes: Option[Seq[Either[Long, String]]] = {
              val conv = vals.filterNot(_.isNullAt(0)).map(_.get(0)).map {
                case s: String if isStr => Some(scala.Right(s))
                case b: java.lang.Byte if !isStr => Some(scala.Left(b.toLong))
                case sh: java.lang.Short if !isStr => Some(scala.Left(sh.toLong))
                case i: java.lang.Integer if !isStr => Some(scala.Left(i.toLong))
                case l: java.lang.Long if !isStr => Some(scala.Left(l.longValue))
                case _ => None
              }
              if (conv.forall(_.isDefined)) Some(conv.toSeq.map(_.get)) else None
            }
            probes match {
              case None => files
              case Some(ks) => files.filter { f =>
                bloom(f, tc) match {
                  case Some(bits) => ks.exists {
                    case scala.Left(l) => VersionedTable.bloomMightContainLong(bits, l)
                    case scala.Right(s) => VersionedTable.bloomMightContain(bits, s)
                  }
                  case None => true
                }
              }
            }
          }
        }
      }
    }

    // ---- exact touched-file detection (files some clause APPLIES to) ----
    // The same pass carries Delta's cardinality check: for src-present rows
    // "some matched clause applies" ⟺ anyCond(matched), so counting applied
    // copies per target row here saves a second target×source join later.
    val fkToRel = parent.files.map(f => VersionedTable.fileKey(f) -> f).toMap
    val (matchedTouched, multiMatch): (Set[String], Boolean) =
      if (matched.isEmpty || candidates.isEmpty) (Set.empty, false)
      else {
        val perFile = tgtScan(parent.copy(files = candidates)).join(src, onExpr, "inner")
          .where(anyCond(matched))
          .groupBy(col(VersionedTable.FkCol), col(VersionedTable.PosCol))
          .agg(count(lit(1)).as("__graft_n"))
          .groupBy(col(VersionedTable.FkCol))
          .agg(smax(col("__graft_n")).as("__graft_mx"))
          .collect() // O(touched files) rows
        (perFile.map(r => fkToRel(r.getString(0))).toSet,
          perFile.exists(_.getLong(1) > 1L))
      }
    if (multiMatch) throw new IllegalArgumentException(
      "mergeInto: multiple source rows match and attempt to modify the " +
        "same target row — de-duplicate the source or tighten the ON / " +
        "clause conditions (Delta MERGE raises the same error)")
    val bySourceTouched: Set[String] =
      if (notMatchedBySource.isEmpty || parent.files.isEmpty) Set.empty
      else tgtScan(parent).join(src, onExpr, "left_anti")
        .where(anyCond(notMatchedBySource))
        .select(col(VersionedTable.FkCol)).distinct().collect()
        .map(r => fkToRel(r.getString(0))).toSet
    val touchedSet = matchedTouched ++ bySourceTouched
    val (touched, untouched) = parent.files.partition(touchedSet.contains)

    // ---- the rewrite + insert plan, one write ----------------------------
    def projectTo(c: MergeClause)(frame: DataFrame, fromTarget: Boolean): DataFrame =
      frame.select(outSchema.fields.toIndexedSeq.map { f =>
        c.assignments.get(f.name) match {
          case Some(rhs) => expr(rhs).cast(f.dataType).as(f.name)
          // an EVOLVED (source-only) column has no target side: null, like
          // the INSERT rule — only an explicit assignment fills it
          case None if fromTarget && schema.fieldNames.contains(f.name) =>
            col(s"$targetAlias.`${f.name}`").as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name) // Delta INSERT rule
        }
      }: _*)
    val rewriteParts: Seq[DataFrame] =
      if (touched.isEmpty) Nil
      else {
        val srcMarked = source0.withColumn(srcMark, lit(true)).alias(sourceAlias)
        val j = tgtScan(parent.copy(files = touched))
          .join(srcMarked, onExpr, "left_outer")
          .withColumn("__graft_applied",
            when(col(srcMark).isNotNull, chain(matched, 0))
              .otherwise(chain(notMatchedBySource, 1000)))
        // (the cardinality check already ran in the detection pass above)
        // a row is kept iff NO joined copy applies a clause — and exactly
        // once, however many source rows matched it without applying
        // (a copy-level filter alone would wrongly keep the original of a
        // row some OTHER copy modified)
        val appliedIds = j.where(col("__graft_applied").isNotNull)
          .select(col(VersionedTable.FkCol), col(VersionedTable.PosCol)).distinct()
        val kept = j.where(col("__graft_applied").isNull)
          .dropDuplicates(VersionedTable.FkCol :: VersionedTable.PosCol :: Nil)
          .join(appliedIds, Seq(VersionedTable.FkCol, VersionedTable.PosCol), "left_anti")
          .select(outSchema.fields.toIndexedSeq.map { f =>
            if (schema.fieldNames.contains(f.name)) col(s"$targetAlias.`${f.name}`").as(f.name)
            else lit(null).cast(f.dataType).as(f.name) // evolved column: null until assigned
          }: _*)
        val updates = (matched.zipWithIndex.map { case (c, i) => (c, i) } ++
          notMatchedBySource.zipWithIndex.map { case (c, i) => (c, 1000 + i) })
          .filter(_._1.kind == "update")
          .map { case (c, idx) =>
            projectTo(c)(j.where(col("__graft_applied") === idx), fromTarget = true)
          } // delete clauses: their rows simply never reach the output
        kept +: updates
      }
    val insertParts: Seq[DataFrame] =
      if (notMatched.isEmpty) Nil
      else {
        val unmatched = // anti over candidates is exact: non-candidates hold no match
          if (candidates.isEmpty) src
          else src.join(tgtScan(parent.copy(files = candidates)), onExpr, "left_anti")
        val withIns = unmatched.withColumn("__graft_ins", chain(notMatched, 0))
        notMatched.zipWithIndex.map { case (c, i) =>
          projectTo(c)(withIns.where(col("__graft_ins") === i), fromTarget = false)
        }
      }
    val parts = rewriteParts ++ insertParts
    if (parts.isEmpty) return parent // clauses can touch nothing: no-op, no churn
    val out = parts.reduce(_ unionByName _)
    // UPDATE/INSERT clauses can mint constraint-violating values — the
    // fused guard aborts the rewrite before any commit publishes
    val newFiles = writeDataFiles(guardChecks(out, Some(parent)), branch, parent.version + 1,
      mapTo = Some(DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]))
    // insert-only merge with zero inserts: no-op, no version churn — decided
    // from the landed footers (r21) instead of a separate isEmpty probe job
    // that ran the whole insert anti-join twice
    if (touched.isEmpty &&
        newFiles.map(f => VersionedTable.footerRowCount(root.resolve(f)).getOrElse(1L)).sum == 0L) {
      newFiles.headOption.foreach(f =>
        graft.Tables.deleteRecursively(root.resolve(f).getParent))
      return parent
    }
    val statCols = (parent.stats.values.flatMap(_.keys) ++
      parent.strStats.values.flatMap(_.keys)).toSeq.distinct
    val (newStats, newStrStats, newNullStats) =
      if (statCols.isEmpty || newFiles.isEmpty)
        (Map.empty[String, Map[String, (Double, Double)]],
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, Long]])
      else collectFileStats(spark, newFiles, statCols, outSchema)
    val untouchedSet = untouched.toSet
    val (bCols, bFiles, bLegacy) = cowBloom(spark, parent, branch, untouchedSet, newFiles, outSchema)
    publish(branch, Some(parent),
      if (message.isEmpty) s"merge into on ($on)" else message,
      outSchema, untouched ++ newFiles,
      parent.stats.view.filterKeys(untouchedSet).toMap ++ newStats,
      strStats = parent.strStats.view.filterKeys(untouchedSet).toMap ++ newStrStats,
      nullStats = parent.nullStats.view.filterKeys(untouchedSet).toMap ++ newNullStats,
      // untouched files keep their deletion vectors; touched files were read
      // with DVs applied and rewritten, leaving only harmless dead entries
      dvFiles = parent.dvFiles,
      bloomStats = bLegacy, bloomCols = bCols, bloomFiles = bFiles)
  }

  /** Delta `DELETE FROM … WHERE`: remove the rows where `where` evaluates
    * TRUE, as a NEW version — old versions still time-travel; rows where the
    * predicate is NULL are KEPT (SQL/Delta semantics: DELETE removes only
    * confirmed matches). Returns the new commit, or the unchanged head when
    * nothing matched (no version churn, like the empty-source upsert).
    *
    * COPY-ON-WRITE, file-granular (Delta DELETE's find-touched-files scan):
    * one predicate-pushed scan over the snapshot lists the files that
    * actually CONTAIN a matching row — parquet row-group stats make
    * non-matching files a footer-level probe, and the driver receives a
    * bounded O(#files) list, never rows. Only those files are rewritten with
    * their kept rows; every other file (and its data-skipping stats entry)
    * is carried untouched, so a point delete on a petabyte key-clustered
    * table rewrites a handful of files. The file-granular [[changes]] /
    * [[changesFeed]] diff over the interval then scans only
    * rewritten+replacement files and reports the removed rows as
    * `change_type = delete`. */
  /** Per-column [lo, hi] bounds implied by a delete/read predicate, for
    * commit-log stats pruning: walks top-level conjuncts, recognizing
    * `column cmp numeric-literal` in either orientation. Anything else — OR,
    * NOT, function-wrapped columns, non-numeric literals — contributes NO
    * constraint, so pruning stays conservative: a file is skipped only when
    * a recognized bound provably excludes every row it could hold (and the
    * residual predicate still runs exactly on the survivors). NaN bounds are
    * dropped too: Spark orders NaN above +Inf while Java's NaN comparisons
    * are all-false, so a NaN range check would wrongly skip files. */
  private[graft] def predicateBounds(
      pred: org.apache.spark.sql.catalyst.expressions.Expression): Map[String, (Double, Double)] =
    allPredicateBounds(pred)._1

  private[graft] def predicateStrBounds(
      pred: org.apache.spark.sql.catalyst.expressions.Expression)
      : Map[String, (Option[String], Option[String])] =
    allPredicateBounds(pred)._2

  /** Numeric and string bounds in one walk. String bounds are Options (no
    * ±∞ exists for strings) and combine under the UNSIGNED UTF-8 BYTE order
    * — the ordering the stats were computed under (see [[readWhereString]]);
    * comparing with Java's UTF-16 `compareTo` instead would wrongly skip
    * files around supplementary-plane code points. */
  private def allPredicateBounds(
      pred: org.apache.spark.sql.catalyst.expressions.Expression)
      : (Map[String, (Double, Double)], Map[String, (Option[String], Option[String])]) = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def num(e: Expression): Option[Double] = e match {
      // TimestampType literals carry MICROseconds; the stats live in the
      // cast-to-double domain (epoch SECONDS) — normalize, or the bound
      // wrongly prunes files holding matching rows. Date/NTZ literals have
      // no stats domain at all (the writer refuses such statsCols): no bound.
      case Literal(v: java.lang.Long, org.apache.spark.sql.types.TimestampType) =>
        Some(v.toDouble / 1e6)
      case Literal(_, dt) if dt == org.apache.spark.sql.types.DateType ||
          dt == org.apache.spark.sql.types.TimestampNTZType => None
      case Literal(v: Number, _) => Some(v.doubleValue()).filterNot(_.isNaN)
      case Literal(d: org.apache.spark.sql.types.Decimal, _) => Some(d.toDouble)
      case _ => None
    }
    def str(e: Expression): Option[String] = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String,
                   org.apache.spark.sql.types.StringType) => Some(s.toString)
      case _ => None
    }
    // one constraint: col ∈ [lo, hi] (numeric) or [slo, shi] (string)
    final case class B(c: String, lo: Double = Double.NegativeInfinity,
                       hi: Double = Double.PositiveInfinity,
                       slo: Option[String] = None, shi: Option[String] = None)
    def cmp(c: Expression, v: Expression,
            mk: (String, Either[Double, String]) => B,
            mkRev: (String, Either[Double, String]) => B): Seq[B] = {
      val fwd = colName(c).flatMap(n =>
        num(v).map(x => mk(n, scala.Left(x))).orElse(str(v).map(s => mk(n, scala.Right(s)))))
      val rev = colName(v).flatMap(n =>
        num(c).map(x => mkRev(n, scala.Left(x))).orElse(str(c).map(s => mkRev(n, scala.Right(s)))))
      (fwd orElse rev).toSeq
    }
    def ge(n: String, x: Either[Double, String]) =
      x.fold(v => B(n, lo = v), s => B(n, slo = Some(s)))
    def le(n: String, x: Either[Double, String]) =
      x.fold(v => B(n, hi = v), s => B(n, shi = Some(s)))
    def eq(n: String, x: Either[Double, String]) =
      x.fold(v => B(n, lo = v, hi = v), s => B(n, slo = Some(s), shi = Some(s)))
    def walk(e: Expression): Seq[B] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(c, v) => cmp(c, v, eq, eq)
      case GreaterThan(c, v) => cmp(c, v, ge, le)
      case GreaterThanOrEqual(c, v) => cmp(c, v, ge, le)
      case LessThan(c, v) => cmp(c, v, le, ge)
      case LessThanOrEqual(c, v) => cmp(c, v, le, ge)
      case _ => Nil
    }
    def u8max(a: Option[String], b: Option[String]) = (a, b) match {
      case (Some(x), Some(y)) => Some(if (VersionedTable.utf8Cmp(x, y) >= 0) x else y)
      case _ => a orElse b
    }
    def u8min(a: Option[String], b: Option[String]) = (a, b) match {
      case (Some(x), Some(y)) => Some(if (VersionedTable.utf8Cmp(x, y) <= 0) x else y)
      case _ => a orElse b
    }
    val grouped = walk(pred).groupBy(_.c)
    val numB = grouped.collect {
      case (c, bs) if bs.exists(b => b.lo > Double.NegativeInfinity || b.hi < Double.PositiveInfinity) =>
        c -> (bs.map(_.lo).max, bs.map(_.hi).min)
    }
    val strB = grouped.collect {
      case (c, bs) if bs.exists(b => b.slo.isDefined || b.shi.isDefined) =>
        c -> (bs.map(_.slo).reduce(u8max), bs.map(_.shi).reduce(u8min))
    }
    (numB, strB)
  }

  /** Commit-log stats pruning shared by the delete paths: the files of
    * `parent` that COULD hold a row matching `where` — a file whose recorded
    * [min,max] excludes a recognized predicate bound never enters the scan,
    * so a point delete on a key-clustered petabyte table probes a handful of
    * files' worth of metadata, not a million parquet footers. Files without
    * stats for a bounded column are conservatively kept. */
  /** Top-level-conjunct `IS NULL` / `IS NOT NULL` column demands — the null-
    * stats complement of [[allPredicateBounds]]. Anything under OR/NOT or
    * wrapped in a function contributes nothing (conservative, like bounds). */
  private[graft] def nullDemands(
      pred: org.apache.spark.sql.catalyst.expressions.Expression)
      : (Set[String], Set[String]) = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def walk(e: Expression): (Set[String], Set[String]) = e match {
      case And(l, r) =>
        val (a1, b1) = walk(l); val (a2, b2) = walk(r); (a1 ++ a2, b1 ++ b2)
      case IsNull(c) => (colName(c).toSet, Set.empty)
      case IsNotNull(c) => (Set.empty, colName(c).toSet)
      case _ => (Set.empty, Set.empty)
    }
    walk(pred)
  }

  /** Bloom POINT PROBES of a DML predicate (r19): top-level equality / IN
    * conjuncts pinning a column to integral or string literal(s) — the
    * scattered-key shape (`doc_id = '…'`, `id IN (…)`) whose min/max
    * windows prune nothing. Same conservatism as the scan-side extraction
    * ([[graft.sources.StatsWindows.pointProbes]]): unrecognized shapes,
    * mixed/partial IN lists and non-exact value types probe nothing. */
  private def predicateProbes(pred: org.apache.spark.sql.catalyst.expressions.Expression)
      : List[(String, Either[List[Long], List[String]])] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def longOf(e: Expression): Option[Long] = e match {
      case Literal(v: java.lang.Byte, _) => Some(v.toLong)
      case Literal(v: java.lang.Short, _) => Some(v.toLong)
      case Literal(v: java.lang.Integer, _) => Some(v.toLong)
      case Literal(v: java.lang.Long, dt)
          if dt != org.apache.spark.sql.types.TimestampType => Some(v.longValue)
      case _ => None
    }
    def strOf(e: Expression): Option[String] = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String,
                   org.apache.spark.sql.types.StringType) => Some(s.toString)
      case _ => None
    }
    def group(n: String, vs: Seq[Expression])
        : List[(String, Either[List[Long], List[String]])] = {
      val longs = vs.map(longOf)
      val strs = vs.map(strOf)
      if (vs.nonEmpty && longs.forall(_.isDefined))
        List(n -> scala.Left(longs.map(_.get).toList))
      else if (vs.nonEmpty && strs.forall(_.isDefined))
        List(n -> scala.Right(strs.map(_.get).toList))
      else Nil
    }
    def walk(e: Expression): List[(String, Either[List[Long], List[String]])] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(c, v) =>
        colName(c).map(group(_, Seq(v)))
          .orElse(colName(v).map(group(_, Seq(c)))).getOrElse(Nil)
      case In(c, vs) => colName(c).map(group(_, vs)).getOrElse(Nil)
      case _ => Nil
    }
    walk(pred)
  }

  private def statsCandidates(parent: Commit, where: String): Vector[String] = {
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(where)
    val (bounds, strBounds) = allPredicateBounds(parsed)
    val (needNull, needNotNull) = nullDemands(parsed)
    // bloom probes confine a point-keyed DML (the scattered doc_id/uuid
    // delete/update shape) to the files that might hold a probed key —
    // lazily loaded, zero cost for range predicates. The probe's hash
    // domain must be the COLUMN's, not the literal's: Spark evaluates the
    // predicate with implicit casts (`long_col = '5'` can match rows), so
    // a literal whose type disagrees with the column probes NOTHING — a
    // string probe against a long-image bloom would "prove" every file
    // missing and silently skip rows the predicate matches.
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    def integral(dt: DataType): Boolean =
      dt == org.apache.spark.sql.types.ByteType ||
        dt == org.apache.spark.sql.types.ShortType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.LongType
    val probes = predicateProbes(parsed).filter {
      case (c, scala.Left(_)) =>
        schema.fieldNames.contains(c) && integral(schema(c).dataType)
      case (c, scala.Right(_)) =>
        schema.fieldNames.contains(c) &&
          schema(c).dataType == org.apache.spark.sql.types.StringType
    }
    lazy val bloom = bloomLookup(parent)
    def bloomSurvives(f: String): Boolean =
      probes.forall { case (c, g) =>
        bloom(f, c) match {
          case Some(bits) => g match {
            case scala.Left(ls) => ls.exists(VersionedTable.bloomMightContainLong(bits, _))
            case scala.Right(ss) => ss.exists(VersionedTable.bloomMightContain(bits, _))
          }
          case None => true
        }
      }
    parent.files.filter { f =>
      bounds.forall { case (k, (lo, hi)) =>
        parent.stats.get(f).flatMap(_.get(k)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      } && strBounds.forall { case (k, (slo, shi)) =>
        parent.strStats.get(f).flatMap(_.get(k)) match {
          case Some((mn, mx)) =>
            slo.forall(lo => VersionedTable.utf8Cmp(mx, lo) >= 0) &&
              shi.forall(hi => VersionedTable.utf8Cmp(mn, hi) <= 0)
          case None => true
        }
      } && needNull.forall { k =>
        // `k IS NULL` can match only files recording at least one null
        parent.nullStats.get(f).flatMap(_.get(k)) match {
          case Some(nc) => nc > 0
          case None => true
        }
      } && needNotNull.forall { k =>
        // `k IS NOT NULL` can match only files that are not ALL-null in k
        (parent.nullStats.get(f).flatMap(_.get(k)), parent.rowCounts.get(f)) match {
          case (Some(nc), Some(rc)) => nc < rc
          case _ => true
        }
      } && (probes.isEmpty || bloomSurvives(f))
    }
  }

  /** Merge-on-read DELETE (Delta deletion vectors / Iceberg v2 position
    * deletes): instead of rewriting every touched file ([[delete]]'s
    * copy-on-write), record the matched ROW POSITIONS in a small deletion-
    * vector parquet and publish a commit with the SAME file list — O(matched
    * rows) bytes written, zero data rewritten. This is the point-delete
    * shape a petabyte table needs: deleting 3 rows clustered in a 1 GB file
    * costs kilobytes, where copy-on-write rewrites the gigabyte. Readers
    * subtract DVs with one broadcast anti-join on (file key, row position)
    * ([[readCommit]]); [[compact]] materializes them away. Semantics match
    * [[delete]]: NULL predicate keeps the row, a no-match delete returns the
    * unchanged head, stats pruning bounds the find-matches scan, and rows
    * already deleted by earlier DVs are never re-recorded (the scan applies
    * existing vectors first). */
  def deleteWithVectors(spark: SparkSession, where: String, branch: String = "main",
                        message: String = ""): Commit = synchronized {
    guardWritable(branch)
    import org.apache.spark.sql.functions.{col, expr}
    val parent = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    if (parent.files.isEmpty) return parent
    val candidates = statsCandidates(parent, where)
    if (candidates.isEmpty) return parent
    val matched = scanWithPos(spark, parent.copy(files = candidates))
      .where(expr(where))
      .select(col(VersionedTable.FkCol).as("fk"),
        col(VersionedTable.PosCol).cast("long").as("pos"))
    val rel = s"$branch-v${parent.version + 1}-dv-${java.util.UUID.randomUUID.toString.take(8)}"
    val out = dataDir.resolve(rel)
    // sorted WITHIN partitions by (fk, pos): each DV part-file's row
    // groups cluster by file key, so the per-TASK DV load (r19,
    // [[graft.sources.DvTaskLoader]]) prunes the DV parquet by row-group
    // stats down to ~O(its own file's deletions). No extra shuffle — the
    // matched scan's own partitioning (and its parallelism) is preserved.
    // ONE pass (r21): the former `matched.isEmpty` probe ran the whole
    // find-matches scan once before the write re-ran it; emptiness is read
    // off the landed footers instead, and a no-match delete removes the
    // empty output and returns the unchanged head exactly as before.
    matched.sortWithinPartitions("fk", "pos")
      .write.mode("overwrite").parquet(out.toString)
    val dvNew = listDir(out).filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString).sorted
    if (dvNew.map(f => VersionedTable.footerRowCount(root.resolve(f)).getOrElse(1L)).sum == 0L) {
      graft.Tables.deleteRecursively(out)
      return parent
    }
    publish(branch, Some(parent),
      if (message.isEmpty) s"delete (merge-on-read) where ($where)" else message,
      DataType.fromJson(parent.schemaJson).asInstanceOf[StructType], parent.files,
      parent.stats, strStats = parent.strStats, nullStats = parent.nullStats,
      dvFiles = parent.dvFiles ++ dvNew,
      // blooms carry verbatim: a deleted row's bits become false positives,
      // which only KEEP files — skipping stays sound
      bloomStats = parent.bloomStats,
      bloomCols = parent.bloomCols, bloomFiles = parent.bloomFiles)
  }

  def delete(spark: SparkSession, where: String, branch: String = "main",
             message: String = ""): Commit = synchronized {
    guardWritable(branch)
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not}
    val parent = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    if (parent.files.isEmpty) return parent
    val pred = expr(where)
    val candidates = statsCandidates(parent, where)
    if (candidates.isEmpty) return parent // stats alone prove nothing matches
    // find touched files via the provenance scan's file-key column, not
    // input_file_name(): on a DV-bearing snapshot the live-row scan is a
    // multi-source join where input_file_name() throws, and only live rows
    // (DVs applied) should drive the rewrite set
    val fkToRel = candidates.map(f => VersionedTable.fileKey(f) -> f).toMap
    val touchedSet = scanWithPos(spark, parent.copy(files = candidates)).where(pred)
      .select(col(VersionedTable.FkCol)).distinct().collect()
      .map(r => fkToRel(r.getString(0)))
      .toSet
    if (touchedSet.isEmpty) return parent // delete matched nothing
    val (touched, untouched) = parent.files.partition(touchedSet.contains)
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    val kept = readCommit(spark, parent.copy(files = touched))
      .where(not(coalesce(pred, lit(false)))) // NULL predicate keeps the row
    val newFiles = writeDataFiles(kept, branch, parent.version + 1, mapTo = Some(schema))
    val statCols = (parent.stats.values.flatMap(_.keys) ++
      parent.strStats.values.flatMap(_.keys)).toSeq.distinct
    val (newStats, newStrStats, newNullStats) =
      if (statCols.isEmpty || newFiles.isEmpty) // all touched rows may be gone
        (Map.empty[String, Map[String, (Double, Double)]],
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, Long]])
      else collectFileStats(spark, newFiles, statCols, schema)
    val untouchedSet = untouched.toSet // O(1) lookups: stat carry is O(F), not O(F^2)
    val (bCols, bFiles, bLegacy) = cowBloom(spark, parent, branch, untouchedSet, newFiles, schema)
    publish(branch, Some(parent),
      if (message.isEmpty) s"delete where ($where)" else message,
      schema, untouched ++ newFiles,
      parent.stats.view.filterKeys(untouchedSet).toMap ++ newStats,
      strStats = parent.strStats.view.filterKeys(untouchedSet).toMap ++ newStrStats,
      nullStats = parent.nullStats.view.filterKeys(untouchedSet).toMap ++ newNullStats,
      // untouched files keep their deletion vectors; touched files were read
      // with DVs applied and rewritten, leaving only harmless dead entries
      dvFiles = parent.dvFiles,
      bloomStats = bLegacy, bloomCols = bCols, bloomFiles = bFiles)
  }

  /** Row-level UPDATE (Delta `UPDATE t SET c = e WHERE p`) over the same
    * copy-on-write machinery as [[delete]]: commit-log stats prune the
    * candidate files, one scan finds the files actually holding matching
    * rows, and ONLY those files are rewritten — matching rows get the `set`
    * expressions applied (cast to the column's existing type, so the schema
    * never drifts), non-matching rows in a touched file are carried
    * byte-identical, and untouched files keep their file entries AND their
    * per-file stats. A NULL predicate leaves the row unchanged (three-valued
    * WHERE, same as [[delete]]'s keep rule). Updates surface in CDC
    * ([[changes]] / [[changesFeed]]) as a delete of the before-image plus an
    * insert of the after-image, restricted to the rewritten files.
    *
    * `set` maps existing column names to SQL expressions evaluated against
    * the pre-update row (standard UPDATE semantics: all right-hand sides see
    * the OLD values, so `SET a = b, b = a` swaps). Unknown columns are
    * rejected rather than added — additive evolution stays an explicit
    * [[append]]-with-mergeSchema decision. */
  def update(spark: SparkSession, where: String, set: Map[String, String],
             branch: String = "main", message: String = ""): Commit = synchronized {
    guardWritable(branch)
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
    require(set.nonEmpty, "update needs at least one SET column")
    val parent = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    val unknown = set.keySet.diff(schema.fieldNames.toSet)
    require(unknown.isEmpty, s"update SET names unknown column(s): ${unknown.mkString(", ")}")
    if (parent.files.isEmpty) return parent
    val pred = expr(where)
    val candidates = statsCandidates(parent, where)
    if (candidates.isEmpty) return parent // stats alone prove nothing matches
    // same DV-safe touched-file detection as delete (see comment there)
    val fkToRel = candidates.map(f => VersionedTable.fileKey(f) -> f).toMap
    val touchedSet = scanWithPos(spark, parent.copy(files = candidates)).where(pred)
      .select(col(VersionedTable.FkCol)).distinct().collect()
      .map(r => fkToRel(r.getString(0)))
      .toSet
    if (touchedSet.isEmpty) return parent // update matched nothing
    val (touched, untouched) = parent.files.partition(touchedSet.contains)
    // All SET right-hand sides evaluate against the OLD row: build every new
    // column from the original scan in one select (no sequential withColumn,
    // which would let later assignments see earlier ones).
    val hit = coalesce(pred, lit(false)) // NULL predicate -> row unchanged
    val rewritten = readCommit(spark, parent.copy(files = touched)).select(
      schema.fields.toIndexedSeq.map { f =>
        set.get(f.name) match {
          case Some(rhs) => when(hit, expr(rhs).cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    // SET can mint violating values — fuse the constraint guard into the rewrite
    val newFiles = writeDataFiles(guardChecks(rewritten, Some(parent)), branch,
      parent.version + 1, mapTo = Some(schema))
    val statCols = (parent.stats.values.flatMap(_.keys) ++
      parent.strStats.values.flatMap(_.keys)).toSeq.distinct
    val (newStats, newStrStats, newNullStats) =
      if (statCols.isEmpty || newFiles.isEmpty)
        (Map.empty[String, Map[String, (Double, Double)]],
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, Long]])
      else collectFileStats(spark, newFiles, statCols, schema)
    val untouchedSet = untouched.toSet // O(1) lookups: stat carry is O(F), not O(F^2)
    val (bCols, bFiles, bLegacy) = cowBloom(spark, parent, branch, untouchedSet, newFiles, schema)
    publish(branch, Some(parent),
      if (message.isEmpty) s"update set (${set.keys.toSeq.sorted.mkString(", ")}) where ($where)"
      else message,
      schema, untouched ++ newFiles,
      parent.stats.view.filterKeys(untouchedSet).toMap ++ newStats,
      strStats = parent.strStats.view.filterKeys(untouchedSet).toMap ++ newStrStats,
      nullStats = parent.nullStats.view.filterKeys(untouchedSet).toMap ++ newNullStats,
      // untouched files keep their deletion vectors; touched files were read
      // with DVs applied and rewritten, leaving only harmless dead entries
      dvFiles = parent.dvFiles,
      bloomStats = bLegacy, bloomCols = bCols, bloomFiles = bFiles)
  }

  /** Publish an EMPTY v0 snapshot carrying only a schema — SQL
    * `CREATE TABLE`'s registration commit
    * ([[graft.sources.VtCatalog.createTable]]): the table then EXISTS for
    * every later load (schema pinned, zero files, COUNT(*) = 0 from
    * metadata), and a CTAS's data lands as v1 through the ordinary append
    * path. O(metadata); goes through the same version-slot CAS as any
    * commit, so two racing CREATEs produce one winner and one clean
    * conflict. */
  private[graft] def createEmpty(branch: String, schema: StructType,
                                 message: String,
                                 props: Map[String, String] = Map.empty): Commit =
    synchronized {
      guardWritable(branch)
      require(head(branch).isEmpty,
        s"branch $branch already has commits — CREATE TABLE needs a fresh table")
      publish(branch, None, message, schema, Vector.empty, props = Some(props))
    }

  /** Delta `ALTER TABLE … ADD COLUMNS`: a METADATA-ONLY schema-evolution
    * commit. The new version keeps the parent's files, stats, deletion
    * vectors and bloom index byte-for-byte — only the schema grows, so on
    * a 100 TB table this is one commit-record write, zero data I/O. Every
    * pre-evolution file simply lacks the new columns in its footer, and
    * the parquet readers (DSv1 [[readCommit]] and the native DSv2 scans
    * alike) fill them with NULL — which is why each added column MUST be
    * nullable: existing rows have no value for it, and a non-nullable
    * declaration would let Catalyst constant-fold `c IS NOT NULL` to true
    * over rows that read back null (the same rule [[write]] applies to
    * mergeSchema'd columns). Name collisions are checked
    * CASE-INSENSITIVELY, matching Spark's default resolution — a table
    * with both `Note` and `note` would be unreadable by SQL. Stats/bloom
    * pruning stays sound for free: the new columns have no stats entries,
    * and every prune path conservatively keeps files with missing stats. */
  def addColumns(branch: String, newCols: Seq[StructField],
                 message: String = ""): Commit = synchronized {
    guardWritable(branch)
    require(newCols.nonEmpty, "ADD COLUMNS needs at least one column")
    val parent = headOrThrow(branch)
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    newCols.foldLeft(schema.fieldNames.map(_.toLowerCase).toSet) { (seen, f) =>
      require(!seen.contains(f.name.toLowerCase),
        s"column ${f.name} already exists on $branch (names are case-insensitive)")
      require(f.nullable,
        s"added column ${f.name} must be nullable: existing rows read NULL for it")
      seen + f.name.toLowerCase
    }
    // once column mapping is active, a NEW column needs a collision-proof
    // fresh physical name: reusing a previously DROPPED column's name would
    // resurrect its bytes from the old files
    val added =
      if (mappingActive(parent, schema))
        newCols.map(f => VersionedTable.withPhysical(f, VersionedTable.freshPhysical(f.name)))
      else newCols
    val evolved = StructType(schema.fields ++ added)
    publish(branch, Some(parent),
      if (message.nonEmpty) message
      else s"ALTER TABLE ADD COLUMNS (${newCols.map(_.name).mkString(", ")})",
      evolved, parent.files, parent.stats, strStats = parent.strStats,
      dvFiles = parent.dvFiles, nullStats = parent.nullStats,
      bloomStats = parent.bloomStats, bloomCols = bloomColsOf(parent),
      bloomFiles = parent.bloomFiles, dataChange = false)
  }

  /** Column mapping activity test: the sticky props flag (set by the first
    * rename/drop — it outlives a later rename-back) or any field already
    * carrying a physical name. */
  private def mappingActive(parent: Commit, schema: StructType): Boolean =
    parent.props.get(VersionedTable.ColMapProp).contains("name") ||
      VersionedTable.hasColumnMapping(schema)

  /** Refuse a schema change that would orphan a CHECK constraint: each
    * recorded predicate must still analyze against the candidate schema
    * (Delta likewise refuses renaming/dropping constrained columns). */
  private def probeConstraints(spark: SparkSession, parent: Commit,
                               candidate: StructType, what: String): Unit =
    VersionedTable.checkConstraints(parent).foreach { case (cname, csql) =>
      try spark.createDataFrame(new java.util.ArrayList[Row](), candidate)
        .select(org.apache.spark.sql.functions.expr(csql)).queryExecution.analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$what would orphan CHECK constraint $cname ($csql) — " +
              "DROP CONSTRAINT first", e)
      }
    }

  /** `ALTER TABLE RENAME COLUMN` as a METADATA-ONLY commit (r20 — Delta's
    * name-mode column mapping): ZERO files rewritten. The field keeps its
    * PHYSICAL parquet name (recorded in StructField metadata,
    * [[VersionedTable.PhysKey]]) and only the LOGICAL name queries see
    * changes; reads re-alias positionally ([[readCommit]]), the
    * logical-keyed per-file stats maps and the sticky bloom column set are
    * re-keyed in the same commit (pure metadata — at 10⁶ files this is one
    * manifest rewrite, no data I/O), and bloom sidecars — immutable and
    * shared — stay valid because they key on the physical name. Old
    * versions time-travel with their own pinned schema. A CHECK constraint
    * referencing the old name refuses the rename. */
  def renameColumn(spark: SparkSession, branch: String, from: String,
                   to: String, message: String = ""): Commit = synchronized {
    guardWritable(branch)
    val parent = headOrThrow(branch)
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(from),
      s"RENAME COLUMN: no such column $from on $branch")
    require(from != to, "RENAME COLUMN: old and new names are identical")
    require(!schema.fieldNames.exists(n => n != from && n.equalsIgnoreCase(to)),
      s"RENAME COLUMN: column $to already exists on $branch (names are " +
        "case-insensitive)")
    val renamed = StructType(schema.fields.map(f =>
      if (f.name == from)
        VersionedTable.withPhysical(f, VersionedTable.physicalName(f)).copy(name = to)
      else f))
    probeConstraints(spark, parent, renamed, s"RENAME COLUMN $from TO $to")
    def rekey[V](m: Map[String, Map[String, V]]): Map[String, Map[String, V]] =
      m.view.mapValues(_.map { case (k, v) =>
        (if (k == from) to else k) -> v }).toMap
    publish(branch, Some(parent),
      if (message.nonEmpty) message else s"ALTER TABLE RENAME COLUMN $from TO $to",
      renamed, parent.files,
      rekey(parent.stats), strStats = rekey(parent.strStats),
      nullStats = rekey(parent.nullStats),
      dvFiles = parent.dvFiles, bloomStats = parent.bloomStats,
      bloomCols = bloomColsOf(parent).map(c => if (c == from) to else c),
      bloomFiles = parent.bloomFiles, dataChange = false,
      props = Some(parent.props + (VersionedTable.ColMapProp -> "name")))
  }

  /** `ALTER TABLE DROP COLUMN` as a METADATA-ONLY commit (r20): the field
    * leaves the logical schema; old files keep the bytes and every
    * explicit-schema read simply never requests them. The dropped column's
    * logical-keyed stats are PURGED in the same commit so a later re-added
    * column of the same name can never inherit them — and, with mapping
    * now active, that re-add gets a FRESH physical name
    * ([[VersionedTable.freshPhysical]]), so the old bytes are unreachable
    * by construction. Constraints referencing the column refuse the drop;
    * old versions still time-travel with the column present. */
  /** Dry-run validation of a RENAME/DROP COLUMN sequence against the branch
    * head — the SAME checks [[renameColumn]]/[[dropColumn]] apply (name
    * existence, case-insensitive collisions, last-column, constraint
    * probes), replayed over a simulated schema WITHOUT publishing anything.
    * A multi-change ALTER runs this first so a failure mid-list can never
    * leave the table partially altered (the ADD COLUMNS path is one commit
    * and never had the problem). Left = rename(from, to);
    * Right = drop(name, ifExists). */
  def validateColumnOps(spark: SparkSession, branch: String,
                        ops: Seq[Either[(String, String), (String, Boolean)]]): Unit = synchronized {
    guardWritable(branch)
    val parent = headOrThrow(branch)
    var schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    ops.foreach {
      case Left((from, to)) =>
        require(schema.fieldNames.contains(from),
          s"RENAME COLUMN: no such column $from on $branch")
        require(from != to, "RENAME COLUMN: old and new names are identical")
        require(!schema.fieldNames.exists(n => n != from && n.equalsIgnoreCase(to)),
          s"RENAME COLUMN: column $to already exists on $branch (names are " +
            "case-insensitive)")
        schema = StructType(schema.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f))
        probeConstraints(spark, parent, schema, s"RENAME COLUMN $from TO $to")
      case Right((name, ifExists)) =>
        if (!(ifExists && !schema.fieldNames.contains(name))) {
          require(schema.fieldNames.contains(name),
            s"DROP COLUMN: no such column $name on $branch")
          require(schema.fields.length > 1,
            s"DROP COLUMN: cannot drop the last column of $branch")
          schema = StructType(schema.fields.filterNot(_.name == name))
          probeConstraints(spark, parent, schema, s"DROP COLUMN $name")
        }
    }
  }

  def dropColumn(spark: SparkSession, branch: String, name: String,
                 message: String = ""): Commit = synchronized {
    guardWritable(branch)
    val parent = headOrThrow(branch)
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    require(schema.fieldNames.contains(name),
      s"DROP COLUMN: no such column $name on $branch")
    require(schema.fields.length > 1,
      s"DROP COLUMN: cannot drop the last column of $branch")
    val remaining = StructType(schema.fields.filterNot(_.name == name))
    probeConstraints(spark, parent, remaining, s"DROP COLUMN $name")
    def purge[V](m: Map[String, Map[String, V]]): Map[String, Map[String, V]] =
      m.view.mapValues(_ - name).toMap.filter(_._2.nonEmpty)
    publish(branch, Some(parent),
      if (message.nonEmpty) message else s"ALTER TABLE DROP COLUMN $name",
      remaining, parent.files,
      purge(parent.stats), strStats = purge(parent.strStats),
      nullStats = purge(parent.nullStats),
      dvFiles = parent.dvFiles, bloomStats = parent.bloomStats,
      bloomCols = bloomColsOf(parent).filterNot(_ == name),
      bloomFiles = parent.bloomFiles, dataChange = false,
      props = Some(parent.props + (VersionedTable.ColMapProp -> "name")))
  }

  /** `ANALYZE`-shape stats BACKFILL (Delta recomputes stats the same way):
    * collect per-file min/max/null-count stats for `cols` over the files
    * that MISS them and publish as a METADATA-ONLY commit — same files,
    * same rows, `dataChange=false` (streams see silence). One scan of the
    * un-statted files buys skip-reads and metadata MIN/MAX forever — the
    * adoption path for a table that was ingested without `statsCols`
    * (re-writing a 100 TB table to get pruning would be absurd). Files
    * already covered for every requested column are NOT re-read; pass
    * `recompute = true` to force a full rebuild of the requested columns.
    * Validation matches [[write]]'s statsCols rules (named columns must
    * exist and have a sound stats domain). A snapshot already fully
    * covered publishes nothing and returns the head unchanged. */
  def computeStats(spark: SparkSession, cols: Seq[String],
                   branch: String = "main", recompute: Boolean = false,
                   message: String = ""): Commit = synchronized {
    guardWritable(branch)
    require(cols.nonEmpty, "computeStats needs at least one column")
    val parent = headOrThrow(branch)
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    val missing = cols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"computeStats names columns absent from the table: ${missing.mkString(", ")}")
    val badType = cols.filter { c =>
      val dt = schema(c).dataType
      !(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.StringType ||
        dt == org.apache.spark.sql.types.TimestampType)
    }
    require(badType.isEmpty,
      s"computeStats needs numeric, string, or timestamp columns; " +
        badType.map(c => s"$c: ${schema(c).dataType.simpleString}").mkString(", ") +
        " has no sound stats domain")
    def covered(f: String): Boolean = cols.forall { c =>
      parent.stats.get(f).exists(_.contains(c)) ||
        parent.strStats.get(f).exists(_.contains(c))
    }
    val targets = if (recompute) parent.files else parent.files.filterNot(covered)
    if (targets.isEmpty) return parent
    val (num, str, nulls) = collectFileStats(spark, targets, cols, schema)
    def merge[V](old: Map[String, Map[String, V]],
                 fresh: Map[String, Map[String, V]]): Map[String, Map[String, V]] =
      (old.keySet ++ fresh.keySet).map { f =>
        f -> (old.getOrElse(f, Map.empty) ++ fresh.getOrElse(f, Map.empty))
      }.toMap
    publish(branch, Some(parent),
      if (message.nonEmpty) message
      else s"ANALYZE: stats for (${cols.mkString(", ")}) over ${targets.size} file(s)",
      schema, parent.files,
      merge(parent.stats, num), strStats = merge(parent.strStats, str),
      nullStats = merge(parent.nullStats, nulls),
      dvFiles = parent.dvFiles, bloomStats = parent.bloomStats,
      bloomCols = bloomColsOf(parent), bloomFiles = parent.bloomFiles,
      dataChange = false)
  }

  /** [[computeStats]]' BLOOM-INDEX sibling: build the per-file bloom
    * sidecar for `cols` over the CURRENT snapshot and make the column set
    * STICKY (later writes, compaction and COW rewrites keep it fresh, the
    * same rule as write(bloomCols=…)) — the point-lookup adoption path for
    * an already-ingested corpus keyed by uuid/doc_id. Metadata-only:
    * files and rows unchanged, one sidecar written, `dataChange=false`. */
  def computeBloomIndex(spark: SparkSession, cols: Seq[String],
                        branch: String = "main",
                        message: String = ""): Commit = synchronized {
    guardWritable(branch)
    require(cols.nonEmpty, "computeBloomIndex needs at least one column")
    val parent = headOrThrow(branch)
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    val bad = cols.filter(c => !schema.fieldNames.contains(c) ||
      !VersionedTable.bloomSupported(schema(c).dataType))
    require(bad.isEmpty,
      s"computeBloomIndex needs STRING or integral columns of the table, got: " +
        bad.mkString(", "))
    val sidecar = writeBloomSidecar(branch, parent.version + 1,
      collectFileBlooms(spark, parent.files, cols, schema))
    publish(branch, Some(parent),
      if (message.nonEmpty) message
      else s"ANALYZE: bloom index on (${cols.mkString(", ")})",
      schema, parent.files, parent.stats, strStats = parent.strStats,
      nullStats = parent.nullStats, dvFiles = parent.dvFiles,
      bloomStats = parent.bloomStats,
      bloomCols = (bloomColsOf(parent) ++ cols).distinct,
      bloomFiles = parent.bloomFiles ++ sidecar,
      dataChange = false)
  }

  /** `ALTER TABLE … SET/UNSET TBLPROPERTIES`: a metadata-only commit
    * adjusting [[Commit.props]]. The `constraint.check.` namespace is
    * reserved — a CHECK constraint smuggled in as a raw property would skip
    * the existing-data validation ADD CONSTRAINT performs, so those keys
    * refuse loudly in both directions. UNSET of a missing key is a no-op
    * within the statement (Delta's behavior), but a statement that changes
    * NOTHING still publishes (idempotent audit trail beats a surprising
    * silent no-op here — the commit is one metadata record). */
  def setTableProperties(branch: String, set: Map[String, String],
                         unset: Seq[String] = Nil,
                         message: String = ""): Commit = synchronized {
    guardWritable(branch)
    val reserved = (set.keys ++ unset).filter(
      _.startsWith(VersionedTable.CheckConstraintPrefix))
    require(reserved.isEmpty,
      s"properties in the ${VersionedTable.CheckConstraintPrefix}* namespace " +
        s"are managed by ADD/DROP CONSTRAINT (existing-data validation), got: " +
        reserved.mkString(", "))
    val parent = headOrThrow(branch)
    publish(branch, Some(parent),
      if (message.nonEmpty) message
      else s"ALTER TABLE SET TBLPROPERTIES (${(set.keys ++ unset).mkString(", ")})",
      DataType.fromJson(parent.schemaJson).asInstanceOf[StructType],
      parent.files, parent.stats, strStats = parent.strStats,
      dvFiles = parent.dvFiles, nullStats = parent.nullStats,
      bloomStats = parent.bloomStats, bloomCols = bloomColsOf(parent),
      bloomFiles = parent.bloomFiles, dataChange = false,
      props = Some(parent.props -- unset ++ set))
  }

  // ---- CHECK constraints (Delta `ALTER TABLE … ADD CONSTRAINT`) ----------

  /** The branch head's CHECK constraints: name → predicate SQL. */
  def checkConstraints(branch: String = "main"): Map[String, String] =
    head(branch).map(VersionedTable.checkConstraints).getOrElse(Map.empty)

  /** Delta `ALTER TABLE … ADD CONSTRAINT <name> CHECK (<predicate>)`: a
    * METADATA-ONLY commit that records the predicate in [[Commit.props]]
    * (`constraint.check.<name>`) AFTER validating that every EXISTING row
    * satisfies it — Delta refuses to add a constraint the current snapshot
    * already violates, and so do we (one pushed-down `NOT(p)` scan,
    * short-circuiting on the first violation via `limit(1)`; an empty
    * table validates for free). From this commit on, every row-adding
    * write path enforces the predicate INSIDE its own write job
    * ([[guardChecks]] — zero extra passes on the happy path). NULL
    * satisfies a CHECK, per the SQL standard. Names are case-insensitive
    * and stored lowercase (Delta does the same). */
  def addCheckConstraint(spark: SparkSession, branch: String, name: String,
                         predicateSql: String, message: String = ""): Commit =
    synchronized {
      guardWritable(branch)
      require(name.matches("""[A-Za-z_][A-Za-z0-9_]*"""),
        s"constraint name must be an identifier, got '$name'")
      val key = name.toLowerCase
      val parent = headOrThrow(branch)
      require(!parent.props.contains(VersionedTable.CheckConstraintPrefix + key),
        s"constraint $key already exists on $branch: " +
          s"(${parent.props(VersionedTable.CheckConstraintPrefix + key)}); " +
          "DROP CONSTRAINT first to replace it")
      val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
      VersionedTable.validateCheckPredicate(spark, schema, predicateSql)
      if (parent.files.nonEmpty) {
        import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
        val bad = readCommit(spark, parent)
          .where(not(coalesce(expr(predicateSql), lit(true)))).limit(1).collect()
        if (bad.nonEmpty) throw new IllegalArgumentException(
          s"cannot add CHECK constraint $key ($predicateSql) on $branch: " +
            s"existing row violates it: ${bad.head}")
      }
      publish(branch, Some(parent),
        if (message.nonEmpty) message
        else s"ALTER TABLE ADD CONSTRAINT $key CHECK ($predicateSql)",
        schema, parent.files, parent.stats, strStats = parent.strStats,
        dvFiles = parent.dvFiles, nullStats = parent.nullStats,
        bloomStats = parent.bloomStats, bloomCols = bloomColsOf(parent),
        bloomFiles = parent.bloomFiles, dataChange = false,
        props = Some(parent.props +
          (VersionedTable.CheckConstraintPrefix + key -> predicateSql)))
    }

  /** Delta `ALTER TABLE … DROP CONSTRAINT [IF EXISTS] <name>`: a
    * metadata-only commit removing the predicate; unknown names refuse
    * loudly unless `ifExists`. */
  def dropCheckConstraint(branch: String, name: String,
                          ifExists: Boolean = false,
                          message: String = ""): Commit = synchronized {
    guardWritable(branch)
    val key = name.toLowerCase
    val parent = headOrThrow(branch)
    val propKey = VersionedTable.CheckConstraintPrefix + key
    if (!parent.props.contains(propKey)) {
      if (ifExists) return parent
      throw new IllegalArgumentException(
        s"no such constraint on $branch: $key (have: " +
          s"${VersionedTable.checkConstraints(parent).keys.toSeq.sorted.mkString(", ")})")
    }
    publish(branch, Some(parent),
      if (message.nonEmpty) message else s"ALTER TABLE DROP CONSTRAINT $key",
      DataType.fromJson(parent.schemaJson).asInstanceOf[StructType],
      parent.files, parent.stats, strStats = parent.strStats,
      dvFiles = parent.dvFiles, nullStats = parent.nullStats,
      bloomStats = parent.bloomStats, bloomCols = bloomColsOf(parent),
      bloomFiles = parent.bloomFiles, dataChange = false,
      props = Some(parent.props - propKey))
  }

  /** ONE pass over `frame` for ALL constraints: the first row failing any
    * predicate, with the violated constraint's (name, sql). Shared by the
    * read-back enforcement sites (streaming epochs; merge / cherry-pick
    * incoming files) — k separate limit(1) jobs would re-read the same
    * files k times. */
  private def firstCheckViolation(frame: DataFrame, rowCols: Seq[String],
                                  checks: Seq[(String, String)])
      : Option[(String, String, Row)] = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not, struct}
    if (checks.isEmpty) return None
    val flags = checks.zipWithIndex.map { case ((_, csql), i) =>
      not(coalesce(expr(csql), lit(true))).as(s"__bad_$i")
    }
    frame
      .select(struct(rowCols.toIndexedSeq.map(col): _*).as("__row") +: flags: _*)
      .where(flags.indices.map(i => col(s"__bad_$i")).reduce(_ || _))
      .limit(1).collect()
      .headOption.map { r =>
        val i = flags.indices.find(i => r.getBoolean(1 + i)).getOrElse(0)
        (checks(i)._1, checks(i)._2, r.getStruct(0))
      }
  }

  /** Enforce `checks` over the LIVE rows of `files` (merged `dvFiles`
    * applied — a violating row both sides agreed to MOR-delete is not
    * incoming data). Used by the version-graph ops that import rows a
    * branch's own write-time guard never saw (merge, cherry-pick); needs a
    * session, taken from the active/default one — version-graph ops keep
    * their sessionless signatures and only demand a session when there is
    * actually something to validate. */
  private def enforceChecksOnFiles(files: Vector[String], dvFiles: Vector[String],
                                   schemaJson: String,
                                   checks: Map[String, String],
                                   context: String): Unit = {
    if (files.isEmpty || checks.isEmpty) return
    val spark = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        s"$context must validate CHECK constraints " +
          s"(${checks.keys.toSeq.sorted.mkString(", ")}) over the incoming " +
          "files, which needs an active SparkSession"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val snap = Commit("VALIDATE", None, -1L, files, schemaJson, "", 0L,
      dvFiles = dvFiles)
    firstCheckViolation(readCommit(spark, snap),
      schema.fieldNames.toIndexedSeq, checks.toSeq.sortBy(_._1)).foreach {
      case (name, sql, row) => throw new IllegalStateException(
        s"$context: CHECK constraint $name ($sql) violated by incoming row $row " +
          "— the rows were written on a branch that did not carry the " +
          "constraint; fix them there (or DROP CONSTRAINT) and retry")
    }
  }

  /** CHECK-constraint enforcement, FUSED into the write job (Delta's
    * `CheckInvariant` shape): each constraint becomes one codegen'd filter
    * `coalesce(p, true) OR raise_error(…)` over the outgoing rows — the
    * happy path costs a predicate eval per row inside the job that was
    * writing the rows anyway (no second scan of the batch), and the first
    * violating row aborts the job with a nameable error BEFORE any commit
    * publishes. An aborted job may leave orphan part-files under `data/`;
    * those are unreferenced by any commit and the next vacuum sweeps them —
    * the same contract as a lost version-slot race. Columns the batch
    * omits (mergeSchema appends) evaluate as NULL, which satisfies a CHECK
    * per the SQL standard — exactly what their rows read back as. */
  private def guardChecks(df: DataFrame, parent: Option[Commit]): DataFrame = {
    val checks = parent.map(VersionedTable.checkConstraints).getOrElse(Map.empty)
    if (checks.isEmpty) df
    else {
      import org.apache.spark.sql.functions._
      val schema = DataType.fromJson(parent.get.schemaJson).asInstanceOf[StructType]
      val missing = schema.fields.filter(f => !df.columns.contains(f.name))
      val widened = missing.foldLeft(df)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
      val guarded = checks.toSeq.sortBy(_._1).foldLeft(widened) {
        case (d, (name, sql)) =>
          // the trailing disjunct is a PLAN BARRIER, never evaluated (the
          // raise_error before it either throws or is short-circuited
          // away): a DECLARED-non-deterministic false that pins the filter
          // at the top of the plan — a deterministic guard would be pushed
          // below a join/filter inside the incoming frame and raise on
          // rows the query was about to DISCARD. The guard must judge
          // exactly the rows that land. (`rand() < -1` would not survive:
          // Spark 4's OptimizeRand folds it away — see
          // [[graft.functions.NondeterministicFalse]].)
          d.where(coalesce(expr(sql), lit(true)) ||
            raise_error(concat(
              lit(s"CHECK constraint $name ($sql) violated by row "),
              to_json(struct(df.columns.map(col).toIndexedSeq: _*)))).cast("boolean") ||
            org.apache.spark.sql.graftbridge.ColumnBridge.column(
              graft.functions.NondeterministicFalse()))
      }
      guarded.select(df.columns.map(col).toIndexedSeq: _*)
    }
  }

  /** One micro-batch epoch of the DSv2 STREAMING sink
    * ([[graft.sources.VtStreamingWrite]]): publish data files the epoch's
    * TASKS already wrote straight into the table root — no DataFrame
    * detour, no driver row traffic — as ONE commit. `overwrite` = Complete
    * output mode (the epoch's rows replace the snapshot); append keeps the
    * parent's files, stats, DVs and bloom index live, recomputing the
    * sticky bloom columns for the new files (the same rule as
    * [[write]]). The schema must match the table's append contract —
    * nullability-insensitive, same names and types — because streamed
    * epochs are homogeneous and Spark already resolved the query against
    * the table schema; a drift here would be a bug, so it throws. */
  private[graft] def commitStreamEpoch(spark: SparkSession, branch: String,
                                       newFiles: Vector[String], schema: StructType,
                                       message: String,
                                       overwrite: Boolean = false,
                                       txn: Option[(String, Long)] = None): Commit =
    synchronized {
      guardWritable(branch)
      val parent = head(branch)
      val tblSchema = parent match {
        case Some(p) if !overwrite =>
          val ps = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
          def shape(s: StructType) =
            s.fields.map(f => (f.name, VersionedTable.nullNormalized(f.dataType))).toSeq
          require(shape(schema) == shape(ps),
            s"streamed epoch schema ${schema.simpleString} does not match table " +
              s"schema ${ps.simpleString} on $branch")
          ps
        case _ => schema
      }
      // CHECK constraints: the epoch's rows are already on disk (task-written,
      // unreferenced), so enforcement is a read-back of JUST the epoch's new
      // files — O(micro-batch), short-circuiting on the first violation; a
      // refusal leaves only vacuum-sweepable orphans, and the sink surfaces
      // the error to the streaming query before any commit publishes
      locally {
        val checks = parent.map(VersionedTable.checkConstraints)
          .getOrElse(Map.empty).toSeq.sortBy(_._1)
        if (checks.nonEmpty && newFiles.nonEmpty) {
          // ONE pass over the epoch's files for ALL constraints (this runs
          // on every micro-batch — k separate limit(1) jobs would re-read
          // the same files k times)
          val epoch = spark.read.schema(tblSchema)
            .parquet(newFiles.map(f => root.resolve(f).toString): _*)
          firstCheckViolation(epoch, tblSchema.fieldNames.toIndexedSeq, checks)
            .foreach { case (cname, csql, row) =>
              throw new IllegalArgumentException(
                s"CHECK constraint $cname ($csql) violated by streamed epoch " +
                  s"row $row; the epoch was not committed")
            }
        }
      }
      val cols = parent.map(bloomColsOf).getOrElse(Nil).filter(c =>
        tblSchema.fieldNames.contains(c) &&
          VersionedTable.bloomSupported(tblSchema(c).dataType))
      val sidecar = writeBloomSidecar(branch, parent.map(_.version + 1).getOrElse(0L),
        collectFileBlooms(spark, newFiles, cols, tblSchema))
      if (overwrite)
        publish(branch, parent, message, tblSchema, newFiles,
          bloomCols = cols, bloomFiles = sidecar, txn = txn)
      else
        publish(branch, parent, message, tblSchema,
          parent.map(_.files).getOrElse(Vector.empty) ++ newFiles,
          parent.map(_.stats).getOrElse(Map.empty),
          strStats = parent.map(_.strStats).getOrElse(Map.empty),
          nullStats = parent.map(_.nullStats).getOrElse(Map.empty),
          dvFiles = parent.map(_.dvFiles).getOrElse(Vector.empty),
          bloomStats = parent.map(_.bloomStats).getOrElse(Map.empty),
          bloomCols = cols,
          bloomFiles = parent.map(_.bloomFiles).getOrElse(Vector.empty) ++ sidecar,
          txn = txn)
    }

  /** Newest transaction version `appId` has committed on `branch`, if any
    * (Delta's `txn` lookup): the per-WRITER idempotence watermark —
    * head-first metadata walk to the first commit stamped by this appId,
    * O(commits since that writer's last epoch) reads, no data touched. */
  def lastTxnVersion(branch: String, appId: String): Option[Long] =
    Iterator.iterate(head(branch))(_.flatMap(_.parent).map(loadCommit))
      .takeWhile(_.isDefined).map(_.get)
      .collectFirst { case c if c.txnAppId.contains(appId) => c.txnVersion }
      .flatten

  /** Atomic CTAS/RTAS support ([[graft.sources.VtCatalog]]'s
    * StagingTableCatalog face): write the query's rows as data files
    * UNDER THE TABLE ROOT without publishing any commit. Until
    * [[commitStagedSnapshot]] lands, the files are unreferenced — no
    * reader can see them, and an abort (or a crash) leaves only orphans
    * vacuum reclaims. Unlike the lakeFS-style [[stage]] ref, nothing is
    * recorded on disk but the files themselves, so concurrent staged
    * writes to the same branch cannot clobber each other's state. */
  private[graft] def writeStagedFiles(df: DataFrame, branch: String): Vector[String] =
    // RTAS onto a constrained table enforces the CURRENT head's constraints
    // (the staged snapshot replaces it as one commit; fresh CTAS has none)
    writeDataFiles(guardChecks(df, head(branch)), branch + "-staging",
      head(branch).map(_.version + 1).getOrElse(0L))

  /** Publish a staged snapshot as ONE commit — the atomic half of
    * CTAS/RTAS. The parent is re-read under the lock, so the commit
    * targets whatever head exists NOW and the slot CAS serializes against
    * concurrent writers: a raced atomic CTAS (`mustCreate`) loses cleanly
    * to a concurrent first commit instead of forking v0. The snapshot
    * REPLACES the branch contents (REPLACE TABLE semantics — overwrite
    * schema and all); the parent's sticky bloom column set carries, with
    * the index rebuilt for the new files (same rule as
    * [[write]](mode=overwrite)). */
  private[graft] def commitStagedSnapshot(spark: SparkSession, branch: String,
                                          files: Vector[String], schema: StructType,
                                          message: String,
                                          mustCreate: Boolean = false,
                                          mustReplace: Boolean = false,
                                          extraProps: Map[String, String] = Map.empty)
      : Commit =
    synchronized {
      guardWritable(branch)
      val parent = head(branch)
      if (mustCreate) require(parent.isEmpty,
        s"table already exists on $branch — a concurrent writer created it first")
      if (mustReplace) require(parent.nonEmpty,
        s"REPLACE TABLE: no such table/branch to replace: $branch")
      // RTAS replaces the schema: a CHECK predicate that no longer analyzes
      // against it would go silently dead — refuse, like write(overwriteSchema)
      parent.map(VersionedTable.checkConstraints).getOrElse(Map.empty).foreach {
        case (cname, csql) =>
          try spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
            .select(org.apache.spark.sql.functions.expr(csql)).queryExecution.analyzed
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                s"REPLACE TABLE would orphan CHECK constraint $cname ($csql) — " +
                  "DROP CONSTRAINT first", e)
          }
      }
      val cols = parent.map(bloomColsOf).getOrElse(Nil).filter(c =>
        schema.fieldNames.contains(c) &&
          VersionedTable.bloomSupported(schema(c).dataType))
      val sidecar = writeBloomSidecar(branch, parent.map(_.version + 1).getOrElse(0L),
        collectFileBlooms(spark, files, cols, schema))
      // REPLACE resets FREE-FORM properties to the statement's declared set
      // (Spark/Delta REPLACE semantics: undeclared properties drop) — but
      // the RESERVED namespaces survive: CHECK constraints stay enforced
      // unless dropped explicitly (the safer reading of RTAS; their
      // predicates were compatibility-probed above), and the engine's own
      // graft.* markers (column-mapping activity) keep their guarantees
      val reserved = parent.map(_.props).getOrElse(Map.empty).view.filterKeys(k =>
        k.startsWith(VersionedTable.CheckConstraintPrefix) ||
          k.startsWith("graft.")).toMap
      publish(branch, parent, message, schema, files,
        bloomCols = cols, bloomFiles = sidecar,
        props = Some(reserved ++ extraProps))
    }

  /** Stage a snapshot on `branch` without committing (lakeFS staging area,
    * `README.md:85-127`). Promote with [[commitStaged]]; discard with [[reset]]. */
  def stage(df: DataFrame, branch: String = "main"): Unit = synchronized {
    guardWritable(branch)
    val parent = head(branch)
    val files = writeDataFiles(guardChecks(df, parent), branch + "-staged",
      parent.map(_.version + 1).getOrElse(0L))
    val staged = Commit("STAGED", parent.map(_.id),
      parent.map(_.version + 1).getOrElse(0L), files, df.schema.json, "", System.currentTimeMillis())
    store.put(refsDir.resolve(branch + ".staged"), CommitLog.toJson(staged))
  }

  def hasStaged(branch: String): Boolean = store.exists(refsDir.resolve(branch + ".staged"))

  /** lakeFS `commit`: promote the staged snapshot to a real commit (V3). */
  def commitStaged(branch: String, message: String): Commit = synchronized {
    guardWritable(branch)
    val stagedPath = refsDir.resolve(branch + ".staged")
    require(store.exists(stagedPath), s"nothing staged on $branch")
    val staged = CommitLog.fromJson(store.read(stagedPath))
    val c = publish(branch, head(branch), message,
      DataType.fromJson(staged.schemaJson).asInstanceOf[StructType], staged.files)
    store.delete(stagedPath)
    c
  }

  /** lakeFS `reset`: drop staged changes and their orphaned data files (V7). */
  def reset(branch: String): Unit = synchronized {
    val stagedPath = refsDir.resolve(branch + ".staged")
    if (store.exists(stagedPath)) {
      val staged = CommitLog.fromJson(store.read(stagedPath))
      staged.files.foreach(f => Files.deleteIfExists(root.resolve(f)))
      store.delete(stagedPath)
    }
  }

  private def writeDataFiles(df: DataFrame, branch: String, version: Long,
                             mapTo: Option[StructType] = None): Vector[String] = {
    val rel = s"$branch-v$version-${java.util.UUID.randomUUID.toString.take(8)}"
    val out = dataDir.resolve(rel)
    // column mapping (r20): parquet always stores PHYSICAL names — rename
    // the logical frame positionally per the table schema's mapping
    val body = mapTo.map(VersionedTable.toPhysical(df, _)).getOrElse(df)
    body.write.mode("overwrite").parquet(out.toString)
    listDir(out)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString).sorted
  }

  private def locksDir: Path = root.resolve("locks")

  private def publish(branch: String, parent: Option[Commit], message: String,
                      schema: StructType, files: Vector[String],
                      stats: Map[String, Map[String, (Double, Double)]] = Map.empty,
                      mergeParent: Option[String] = None,
                      strStats: Map[String, Map[String, (String, String)]] = Map.empty,
                      dvFiles: Vector[String] = Vector.empty,
                      nullStats: Map[String, Map[String, Long]] = Map.empty,
                      bloomStats: Map[String, Map[String, String]] = Map.empty,
                      bloomCols: Seq[String] = Nil,
                      bloomFiles: Vector[String] = Vector.empty,
                      dataChange: Boolean = true,
                      txn: Option[(String, Long)] = None,
                      // table properties: None = carry the first parent's
                      // map (constraints et al. are sticky by default);
                      // Some(...) = this commit SETS the map (metadata ops,
                      // and revert/restore restoring an old state's props)
                      props: Option[Map[String, String]] = None,
                      // extra rowCounts/fileSizes inheritance (SHALLOW CLONE
                      // seeds the source's logged metadata so a 10^6-file
                      // clone never reads a footer or stats a file)
                      seedRowCounts: Map[String, Long] = Map.empty,
                      seedFileSizes: Map[String, Long] = Map.empty): Commit = {
    val version = parent.map(_.version + 1).getOrElse(0L)
    val id = s"$branch-v$version-${java.util.UUID.randomUUID.toString.take(8)}"
    val mergeParentCommit = mergeParent.map(loadCommit)
    // Per-file row counts (Delta numRecords): inherited from either parent's
    // map when the file carries over; ONE local footer read per genuinely new
    // file. Keeping them in the log is what makes COUNT(*) metadata-only at
    // object-store scale — the alternative re-reads a footer per file per
    // count. A failed footer read just omits the entry (countRows falls back
    // to a scan); it never fails the publish.
    val inheritedCounts = seedRowCounts ++
      parent.map(_.rowCounts).getOrElse(Map.empty) ++
      mergeParentCommit.map(_.rowCounts).getOrElse(Map.empty)
    val rowCounts = files.flatMap { f =>
      inheritedCounts.get(f).orElse(VersionedTable.footerRowCount(root.resolve(f)))
        .map(f -> _)
    }.toMap
    // per-file byte sizes, same inheritance rule: one local stat per NEW
    // file at publish time buys stat-free scan planning forever after
    val inheritedSizes = seedFileSizes ++
      parent.map(_.fileSizes).getOrElse(Map.empty) ++
      mergeParentCommit.map(_.fileSizes).getOrElse(Map.empty)
    val fileSizes = files.flatMap { f =>
      inheritedSizes.get(f).orElse {
        val p = root.resolve(f)
        try if (Files.exists(p)) Some(Files.size(p)) else None
        catch { case _: java.io.IOException => None }
      }.map(f -> _)
    }.toMap
    // r20: per-file metadata moves to immutable shared MANIFEST files; the
    // commit record carries only their paths, so an append's record is
    // O(its new files) — not O(table) — and unchanged segments are reused
    // by reference across commits (Iceberg's manifest sharing).
    val (manifestRefs, orderedFiles) = buildManifests(branch, version, parent,
      mergeParentCommit, files, stats, strStats, rowCounts, nullStats, fileSizes)
    val c = Commit(id, parent.map(_.id), version, orderedFiles, schema.json, message,
      System.currentTimeMillis(), stats, mergeParent, strStats, dvFiles, rowCounts,
      nullStats, fileSizes, bloomStats, bloomCols, bloomFiles, dataChange,
      txn.map(_._1), txn.map(_._2),
      props = props.getOrElse(parent.map(_.props).getOrElse(Map.empty)),
      manifests = manifestRefs)
    // pre-commit hooks (lakeFS Actions) see the full candidate and may throw;
    // running BEFORE the slot claim means an abort leaves no claimed slot to
    // sweep — only orphan data files the next vacuum reclaims.
    runPreCommitHooks(branch, c)
    // cross-process CAS: two writers based on the same parent both target
    // this version; exactly one claims the slot, the other gets a clean
    // ConcurrentModificationException (never a silently forked lineage).
    // A loser's already-written data files are orphans vacuum reclaims.
    CommitLog.claimVersionSlot(locksDir, branch, version, store = store)
    store.put(commitsDir.resolve(id + ".json"), CommitLog.toJson(c))
    // index BEFORE the ref lands: vacuum enumerating mid-creation sees the
    // name (and an exists-check on the not-yet-written ref just skips it) —
    // the reverse order would leave a fresh unlisted branch enumerable by
    // neither index nor EC listing for one sweep
    if (parent.isEmpty) branchIndex.add(branch)
    store.put(refsDir.resolve(branch), id)
    if (version > 0 && version % VersionedTable.CheckpointInterval == 0)
      writeCheckpoint(branch, c)
    c
  }

  /** Factor this commit's per-file metadata into MANIFEST references
    * (r20, [[Manifest]]): reuse every parent manifest whose entries are ALL
    * still live and unchanged (the common case — an append or a metadata-only
    * commit touches none of them), pool the surviving entries of partially
    * dead manifests with the genuinely new files into ONE fresh manifest,
    * and — when the reference list would exceed
    * [[VersionedTable.MaxManifests]] — compact everything into a single
    * manifest so `open()` cost stays bounded by a constant number of cached
    * reads no matter how many commits the table accretes (Iceberg's
    * rewrite-manifests, amortized O(files/MaxManifests) per commit).
    *
    * Returns (manifest paths, files in RESOLUTION order) — the order
    * [[resolveManifests]] will reproduce, which publish stores in the
    * in-memory commit so a round-trip through the log is an identity.
    * A legacy inline parent (no manifests) converts wholesale: its carried
    * files land in the fresh manifest once, O(table) at conversion only. */
  private def buildManifests(
      branch: String, version: Long,
      parent: Option[Commit], mergeParentCommit: Option[Commit],
      files: Vector[String],
      stats: Map[String, Map[String, (Double, Double)]],
      strStats: Map[String, Map[String, (String, String)]],
      rowCounts: Map[String, Long],
      nullStats: Map[String, Map[String, Long]],
      fileSizes: Map[String, Long]): (Vector[String], Vector[String]) =
    Manifest.factor(
      load = mref => Manifest.cached(root.resolve(mref)),
      write = entries => writeManifest(branch, version, entries),
      candidateRefs = parent.map(_.manifests).getOrElse(Vector.empty) ++
        mergeParentCommit.map(_.manifests).getOrElse(Vector.empty),
      files = files,
      entryOf = f => ManifestEntry(f, fileSizes.get(f), rowCounts.get(f),
        stats.getOrElse(f, Map.empty), strStats.getOrElse(f, Map.empty),
        nullStats.getOrElse(f, Map.empty)),
      maxRefs = VersionedTable.MaxManifests)

  /** Persist one manifest as a flat `.manifest` file under `data/` —
    * data-plane like the bloom sidecars, so the existing vacuum
    * sweep/retention machinery manages it; returns its root-relative path. */
  private def writeManifest(branch: String, version: Long,
                            entries: Seq[ManifestEntry]): String = {
    Files.createDirectories(dataDir)
    val p = dataDir.resolve(
      s"$branch-v$version-mf-${java.util.UUID.randomUUID.toString.take(8)}.manifest")
    Manifest.write(p, entries)
    root.relativize(p).toString
  }

  // ---- reads -------------------------------------------------------------

  def read(spark: SparkSession, branch: String = "main"): DataFrame =
    readCommit(spark, head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch")))

  /** Data-skipping read: prune the snapshot's file list with the commit's
    * per-file [min,max] stats for `column` before Spark ever lists them, then
    * apply the residual filter. Files without stats are conservatively kept.
    * This is the lakehouse file-skipping contract: at 100 TB the win is not
    * reading (or even listing) the 99% of files whose range can't match. */
  def readWhere(spark: SparkSession, branch: String, column: String,
                lower: Double, upper: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val c = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    val keep = c.files.filter { f =>
      c.stats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => mx >= lower && mn <= upper
        case None => true
      }
    }
    readCommit(spark, c.copy(files = keep))
      .where(col(column).cast("double").between(lower, upper))
  }

  /** String-column data-skipping read: same contract as [[readWhere]], with
    * the per-file [min,max] compared as UNSIGNED UTF-8 BYTES — the exact
    * ordering Spark's min/max produced the stats under (UTF8String binary
    * comparison). Java String `<`/`>` (UTF-16 code units) disagrees with it
    * for supplementary-plane code points mixed with U+E000–U+FFFF, and a
    * prune under the wrong order silently drops matching rows, so the
    * byte-wise compare is load-bearing, not cosmetic. Files without string
    * stats for `column` are conservatively kept; the residual filter stays
    * exact (and is evaluated by Spark under the same binary ordering). */
  def readWhereString(spark: SparkSession, branch: String, column: String,
                      lower: String, upper: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import VersionedTable.utf8Cmp
    val c = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    val keep = c.files.filter { f =>
      c.strStats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => utf8Cmp(mx, lower) >= 0 && utf8Cmp(mn, upper) <= 0
        case None => true
      }
    }
    readCommit(spark, c.copy(files = keep))
      .where(col(column).between(lower, upper))
  }

  /** Delta `versionAsOf` time travel (`jobs/vdt4.py:80-81`, S6/V8) — O(1)
    * metadata reads at any history depth via [[resolveVersion]]. */
  def readVersion(spark: SparkSession, branch: String, version: Long): DataFrame =
    readCommit(spark, resolveVersion(branch, version))

  /** Delta `timestampAsOf` time travel: the newest commit at or before
    * `tsMillis` — "the table as it was at 9am". Walks from the head with an
    * early stop (first-parent timestamps are nondecreasing: every publish
    * stamps after its parent), so the cost is O(commits since `tsMillis`),
    * not O(history) — and once the walk reaches checkpoint coverage it
    * finishes from the in-memory index (1 more read). A timestamp before the
    * first commit is an error, matching Delta's behavior. */
  def readAsOfTimestamp(spark: SparkSession, branch: String, tsMillis: Long): DataFrame =
    readCommit(spark, commitAtTimestamp(branch, tsMillis))

  /** Newest version at or before `tsMillis` — Delta's CDF
    * `endingTimestamp` rule (errors when the timestamp precedes the first
    * commit, like Delta). */
  private[graft] def versionAtOrBefore(branch: String, tsMillis: Long): Long =
    commitAtTimestamp(branch, tsMillis).version

  /** First version at or after `tsMillis` — Delta's CDF
    * `startingTimestamp` rule: a timestamp after the branch's newest
    * commit refuses (there is nothing to stream from it), one before the
    * first commit resolves to version 0. O(commits since tsMillis) like
    * [[commitAtTimestamp]] (checkpoint-accelerated). */
  private[graft] def firstVersionAtOrAfter(branch: String, tsMillis: Long): Long = {
    val h = headOrThrow(branch)
    require(h.ts >= tsMillis,
      s"timestamp $tsMillis is after the newest commit on $branch (${h.ts})")
    // first ≥ ts  ==  (newest ≤ ts−1).version + 1; no commit ≤ ts−1 → v0
    try commitAtTimestamp(branch, tsMillis - 1).version + 1
    catch { case _: IllegalArgumentException => 0L }
  }

  private def commitAtTimestamp(branch: String, tsMillis: Long): Commit = {
    val h = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    lazy val checkpoint = latestCheckpoint(branch)
    def fail() = throw new IllegalArgumentException(
      s"no commit on $branch at or before timestamp $tsMillis (first commit is later)")
    @annotation.tailrec
    def walk(c: Commit): Commit =
      if (c.ts <= tsMillis) c
      else checkpoint match {
        // the answer (if any) lies strictly below c: jump down to the LOWEST
        // indexed boundary still after tsMillis — first-parent timestamps are
        // nondecreasing, so the answer sits within one interval below it and
        // the remaining parent walk is ≤interval steps
        case Some((ckVersion, index)) if c.version - 1 <= ckVersion =>
          index.filter { case (v, (_, ts)) => ts > tsMillis && v < c.version }
            .keys.minOption match {
            case Some(jump) => walk(loadCommit(index(jump)._1))
            case None => c.parent.map(loadCommit) match {
              case Some(p) => walk(p)
              case None => fail()
            }
          }
        case _ => c.parent.map(loadCommit) match {
          case Some(p) => walk(p)
          case None => fail()
        }
      }
    walk(h)
  }

  /** Resolve the commit a read addresses — branch head, `versionAsOf`, or
    * `timestampAsOf` (mutually exclusive) — the shared entry point for the
    * read methods above and the `format("vt")` batch relation
    * ([[graft.sources.VtDataSource]]). */
  def resolveRead(branch: String, versionAsOf: Option[Long] = None,
                  timestampAsOf: Option[Long] = None): Commit = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    (versionAsOf, timestampAsOf) match {
      case (Some(v), _) => resolveVersion(branch, v)
      case (_, Some(ts)) => commitAtTimestamp(branch, ts)
      case _ => head(branch).getOrElse(
        throw new IllegalArgumentException(s"no such branch: $branch"))
    }
  }

  def readCommit(spark: SparkSession, c: Commit): DataFrame = {
    val schema = DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
    if (c.files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else {
      // LISTING-FREE scan over the commit's pinned file list (r21, guide
      // §6): a HadoopFsRelation over the commit-log-backed
      // [[graft.sources.VtFileIndex]] — file statuses come from the
      // commit's recorded sizes, so the plan never lists paths (the old
      // `spark.read.parquet(files…)` paid one driver getFileStatus per
      // path, and past 32 paths a whole distributed LISTING JOB per read).
      // Pushdown, pruning and vectorization are intact as before, PLUS the
      // index folds commit-log stats/bloom file skipping into planning.
      // The pinned schema keeps replays of old versions immune to later
      // schema evolution. Column-mapped snapshots (r20 RENAME/DROP) read
      // the PHYSICAL-named twin of the schema and re-alias positionally —
      // filters on logical names push through the aliasing Project into
      // the parquet scan as usual.
      val raw = physFrame(spark, c, schema)
      val base = if (!VersionedTable.hasColumnMapping(schema)) raw
                 else raw.toDF(schema.fieldNames.toIndexedSeq: _*)
      if (c.dvFiles.isEmpty) base
      else
        // merge-on-read: subtract the deletion vectors with ONE broadcast
        // anti-join on (file key, physical row index). The DV side is tiny
        // (only deleted positions), the corpus side never shuffles, and data
        // predicates still push below the join into the parquet scan.
        scanWithPos(spark, c).drop(VersionedTable.FkCol, VersionedTable.PosCol)
    }
  }

  /** The physical-named parquet frame over a commit's files, planned
    * through [[graft.sources.VtFileIndex]] (no listing, commit-stats file
    * skipping); shared by [[readCommit]] and [[scanWithPos]]. */
  private def physFrame(spark: SparkSession, c: Commit,
                        schema: StructType): DataFrame =
    org.apache.spark.sql.graft.SessionShim.ofRelation(spark,
      org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        new graft.sources.VtFileIndex(spark, this, c),
        StructType(Nil), VersionedTable.physicalSchema(schema), None,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        Map.empty[String, String])(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))

  /** Metadata-only `SELECT COUNT(*)` (Delta answers it from `numRecords` in
    * the log; so does this). When every file has a logged row count and the
    * snapshot has no deletion vectors, the answer is a driver-side sum over
    * the commit record — ZERO file reads, the shape a 10⁶-file table needs
    * (a scan-based count costs a footer GET per file at minimum). With DVs,
    * the base sum still comes from the log and only the TINY vector files
    * are read: each live DV entry marks exactly one deleted row
    * ([[deleteWithVectors]] never re-records an already-deleted position),
    * and entries pointing at rewritten files (dead, left by copy-on-write
    * ops that carry `dvFiles` forward) are dropped by a broadcast semi-join
    * against the live file keys. The same (fk,pos) can appear in TWO vector
    * files — merge/cherry-pick union `dvFiles` from both parents, and two
    * branches may MOR-delete the same row of a shared base file (the
    * conflict check allows it: both sides agree the row is gone) — so the
    * subtrahend is the count of DISTINCT live positions, matching the
    * anti-join semantics of [[scanWithPos]]. Files missing a logged count
    * (pre-rowCounts history) fall back to one real scan-based count. */
  def countRows(spark: SparkSession, branch: String = "main"): Long = {
    val c = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    if (!c.files.forall(c.rowCounts.contains)) readCommit(spark, c).count()
    else {
      val base = c.files.iterator.map(c.rowCounts).sum
      if (c.dvFiles.isEmpty) base
      else base - dvCardByKey(spark, c,
        c.files.map(VersionedTable.fileKey).toSet).valuesIterator.sum
    }
  }

  /** THE one implementation of "how many rows has each file MOR-deleted,
    * and which DV parquet part-files say so": per-file-key DISTINCT
    * deleted-position counts PLUS the set of DV part-file paths mentioning
    * the key, from one distributed aggregate over the snapshot's DV
    * parquet, restricted to `keys` (dead entries for rewritten-away files
    * drop out; duplicated (fk,pos) entries across DV files — merged
    * branches deleting the same base row — mark ONE row). The driver
    * receives O(files-with-deletions) rows — counts and path lists, never
    * positions. Feeds [[countRows]], the native MOR scan's statistics /
    * columnar / per-task-load routing, and the SQL `COUNT(*)` metadata
    * answer ([[graft.sources.VtMorScanBuilder]]) — a future DV-semantics
    * change lands in all of them at once. The path set is what lets each
    * MOR task open ONLY the DV part-files that mention its key: on a long
    * delete history a task pays footer reads for its own deletes' files,
    * not every delete ever made. */
  private[graft] def dvStatsByKey(spark: SparkSession, c: Commit,
                                  keys: Set[String])
      : Map[String, (Long, Seq[String])] = {
    import org.apache.spark.sql.functions.{col, collect_set, count_distinct, input_file_name}
    if (c.dvFiles.isEmpty) Map.empty
    else spark.read.parquet(c.dvFiles.map(f => root.resolve(f).toString): _*)
      // restrict to the CALLER'S keys BELOW the aggregate (isInCollection
      // compiles to an InSet hash probe, and the DV parquet is sorted by
      // fk so row-group stats skip non-matching groups): a point read on a
      // heavily-deleted table must collect O(its files), not one row +
      // path set per file-with-deletions table-wide
      .where(col("fk").isInCollection(keys))
      // input_file_name() materializes BELOW the aggregate (Catalyst
      // refuses non-deterministic expressions inside aggregate arguments)
      .select(col("fk"), col("pos"), input_file_name().as("__src"))
      .groupBy(col("fk"))
      .agg(count_distinct(col("pos")).as("n"),
        collect_set(col("__src")).as("srcs"))
      .collect().iterator
      .map { r =>
        // input_file_name() yields percent-encoded URIs — decode to plain
        // filesystem paths (same trap [[inputFileToRel]] documents)
        val srcs = r.getSeq[String](2).map { raw =>
          try java.nio.file.Paths.get(new java.net.URI(raw).getPath).toString
          catch { case _: Exception => raw.stripPrefix("file:") }
        }
        r.getString(0) -> (r.getLong(1), srcs)
      }
      .filter { case (k, _) => keys(k) }
      .toMap
  }

  private[graft] def dvCardByKey(spark: SparkSession, c: Commit,
                                 keys: Set[String]): Map[String, Long] =
    dvStatsByKey(spark, c, keys).view.mapValues(_._1).toMap

  /** Metadata-only `SELECT MIN(col), MAX(col)` from the commit log's
    * per-file stats — ZERO file reads, not even footers (Spark's own
    * parquet aggregate pushdown still costs one footer GET per file; at a
    * million files this is the difference between a driver-side fold and
    * a million GETs for the everyday "how fresh is this table?" query).
    * Answers `None` — caller falls back to a scan — whenever the answer
    * cannot be PROVEN from metadata: the snapshot carries deletion
    * vectors (a deletion may have removed the extreme row), or any file
    * lacks stats for the column without being provably all-null
    * (nullCount == rowCount files contribute nothing to min/max, exactly
    * SQL's null-ignoring semantics, so they are safely skipped). Numeric
    * stats live in the double domain (the same domain the skipping stats
    * use), so the answer is exact wherever the column's values are —
    * i.e. for every numeric type except int64 values beyond 2⁵³. */
  def minMaxFromStats(c: Commit, column: String): Option[(Double, Double)] =
    minMaxFrom(c, column, c.stats)(math.min, math.max)

  /** String twin of [[minMaxFromStats]] — the stats were computed under
    * Spark's own binary-UTF-8 string ordering, which is also what SQL
    * MIN/MAX use, so the metadata answer is exact. */
  def minMaxStringFromStats(c: Commit, column: String): Option[(String, String)] =
    minMaxFrom(c, column, c.strStats)(
      (a, b) => if (VersionedTable.utf8Cmp(a, b) <= 0) a else b,
      (a, b) => if (VersionedTable.utf8Cmp(a, b) >= 0) a else b)
      .filterNot { case (mn, mx) =>
        // a stat at the truncation limit may be a truncated BOUND, not the
        // value itself — refuse; the caller's scan fallback stays exact
        VersionedTable.overLimit(mn) || VersionedTable.overLimit(mx)
      }

  def minMaxFromStats(branch: String, column: String): Option[(Double, Double)] =
    minMaxFromStats(headOrThrow(branch), column)

  /** [[minMaxFromStats]] under DELETION VECTORS, one end at a time (r20):
    * a deletion can only REMOVE rows, so the live MIN can only move up and
    * the live MAX only down — and the end stays EXACTLY the stats answer
    * whenever some file ACHIEVING it (a) has ZERO deleted rows, so its
    * extremal value provably survives, and (b) records the exact value
    * rather than a truncation bound. Per-file bounds stay sound for the
    * NON-achieving files in the right direction (statsLower ≤ true min),
    * so only the witness file needs exactness. `dvFree` answers per
    * root-relative file path from the bounded per-file-key cardinality
    * aggregate. Same all-files-known refusal contract as the DV-free
    * twins; no witness → None → the caller's scan fallback stays exact. */
  private[graft] def minMaxNumFromStatsDv(c: Commit, column: String,
      takeMax: Boolean, dvFree: String => Boolean): Option[Double] =
    endFromStatsDv(c, column, takeMax, dvFree, c.stats)(
      Ordering.Double.TotalOrdering, _ => true)

  /** String twin of [[minMaxNumFromStatsDv]] — adds the truncated-bound
    * refusal ([[VersionedTable.overLimit]]) on the witness value. */
  private[graft] def minMaxStringFromStatsDv(c: Commit, column: String,
      takeMax: Boolean, dvFree: String => Boolean): Option[String] =
    endFromStatsDv(c, column, takeMax, dvFree, c.strStats)(
      (a: String, b: String) => VersionedTable.utf8Cmp(a, b),
      s => !VersionedTable.overLimit(s))

  private def endFromStatsDv[T](c: Commit, column: String, takeMax: Boolean,
      dvFree: String => Boolean, statsOf: Map[String, Map[String, (T, T)]])(
      ord: Ordering[T], exact: T => Boolean): Option[T] = {
    if (c.files.isEmpty) return None
    // per file: Some(Some(f, end)) contributes, Some(None) provably
    // all-null (contributes nothing), None = unknown → no metadata answer
    val per: Vector[Option[Option[(String, T)]]] = c.files.map { f =>
      statsOf.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => Some(Some(f -> (if (takeMax) mx else mn)))
        case None =>
          val allNull = for {
            nc <- c.nullStats.get(f).flatMap(_.get(column))
            rows <- c.rowCounts.get(f)
          } yield nc == rows
          if (allNull.contains(true)) Some(None) else None
      }
    }
    if (per.exists(_.isEmpty)) return None
    val ends = per.flatten.flatten
    if (ends.isEmpty) return None // every row null — let the scan say NULL
    val best = if (takeMax) ends.iterator.map(_._2).max(ord)
               else ends.iterator.map(_._2).min(ord)
    val witnessed = ends.exists { case (f, v) =>
      ord.equiv(v, best) && exact(v) && dvFree(f) }
    if (witnessed) Some(best) else None
  }

  private def headOrThrow(branch: String): Commit = head(branch).getOrElse(
    throw new IllegalArgumentException(s"no such branch: $branch"))

  private def minMaxFrom[T](c: Commit, column: String,
                            statsOf: Map[String, Map[String, (T, T)]])
                           (lo: (T, T) => T, hi: (T, T) => T): Option[(T, T)] = {
    if (c.dvFiles.nonEmpty || c.files.isEmpty) None
    else {
      // per file: Some(Some(mm)) contributes, Some(None) provably all-null
      // (contributes nothing), None = unknown → no metadata answer
      val per: Vector[Option[Option[(T, T)]]] = c.files.map { f =>
        statsOf.get(f).flatMap(_.get(column)) match {
          case Some(mm) => Some(Some(mm))
          case None =>
            val allNull = for {
              nc <- c.nullStats.get(f).flatMap(_.get(column))
              rows <- c.rowCounts.get(f)
            } yield nc == rows
            if (allNull.contains(true)) Some(None) else None
        }
      }
      if (per.exists(_.isEmpty)) None
      else {
        val mms = per.flatten.flatten
        if (mms.isEmpty) None // every row null: SQL answer is NULL — scan says so
        else Some((mms.map(_._1).reduce(lo), mms.map(_._2).reduce(hi)))
      }
    }
  }

  /** The live rows of `c` tagged with their provenance — `__graft_fk` (file
    * key: last two path segments) and `__graft_pos` (0-based physical row
    * index from `_metadata.row_index`, stable because data files are
    * immutable) — with `c`'s deletion vectors already subtracted. The
    * building block of the merge-on-read path: [[readCommit]] drops the tag
    * columns; [[deleteWithVectors]] keeps them to record new deletions. */
  private def scanWithPos(spark: SparkSession, c: Commit): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, concat_ws, slice, split}
    val schema = DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
    // column mapping: tag positions on the PHYSICAL scan (metadata columns
    // resolve only on the scan relation), then re-alias data columns to
    // their logical names — positional, so DV subtraction is untouched
    val raw = physFrame(spark, c, schema)
      .withColumn(VersionedTable.FkCol,
        concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -2, 2)))
      .withColumn(VersionedTable.PosCol, col("_metadata.row_index"))
    val tagged =
      if (!VersionedTable.hasColumnMapping(schema)) raw
      else raw.toDF((schema.fieldNames :+ VersionedTable.FkCol :+
        VersionedTable.PosCol).toIndexedSeq: _*)
    if (c.dvFiles.isEmpty) tagged
    else {
      val dv = spark.read.parquet(c.dvFiles.map(f => root.resolve(f).toString): _*)
        .select(col("fk").as(VersionedTable.FkCol), col("pos").as(VersionedTable.PosCol))
      tagged.join(broadcast(dv), Seq(VersionedTable.FkCol, VersionedTable.PosCol), "left_anti")
    }
  }

  // ---- branch plumbing (lakeFS README.md:105-147) ------------------------

  /** V2 `branch create`: zero-copy — a new head pointer at `from`'s commit. */
  def createBranch(name: String, from: String = "main"): Unit = synchronized {
    require(!store.exists(refsDir.resolve(name)), s"branch exists: $name")
    val h = head(from).getOrElse(throw new IllegalArgumentException(s"no such branch: $from"))
    branchIndex.add(name) // before the ref: see publish's ordering note
    store.put(refsDir.resolve(name), h.id)
  }

  /** lakeFS `branch delete`: drop the head pointer (and any staged snapshot
    * with its uncommitted files). Commits stay on disk — another branch may
    * still reach them, and an unreachable commit's data files are reclaimed
    * by the next vacuum, never here (deletion must not be able to corrupt a
    * surviving branch). The last branch cannot be deleted: a repo with no
    * refs would be unreadable. */
  def deleteBranch(name: String): Unit = synchronized {
    guardWritable(name)
    require(branches.contains(name), s"no such branch: $name")
    require(branches.size > 1, s"cannot delete the last branch: $name")
    reset(name) // staged files are uncommitted: safe to reclaim now
    // release the branch's version slots BEFORE the ref: a crash mid-delete
    // then leaves (fewer slots + live ref) — the branch still exists and the
    // delete can simply be retried. The old order (ref first) could leave a
    // refless v0 slot behind, which vacuum's orphan-replay might mistake for
    // a crashed first commit and resurrect the deleted branch. Slot release
    // lets a recreated branch with the same name commit again (its commits
    // get fresh uuid'd ids, so old still-reachable commits are never shadowed).
    val slotRe = ("^" + java.util.regex.Pattern.quote(name) + """-v\d+$""").r
    store.list(locksDir).filter(p => slotRe.findFirstIn(p.getFileName.toString).isDefined)
      .foreach(store.delete)
    // checkpoints are per-branch version→id indexes: a later branch REUSING
    // this name must never resolve versions from the dead branch's index
    store.list(checkpointsDir)
      .filter(p => slotRe.findFirstIn(p.getFileName.toString).isDefined)
      .foreach(store.delete)
    // change-feed cursors are per-branch offsets: a recreated namesake with a
    // shorter history must not inherit them (consumers would silently skip
    // every commit up to the dead branch's offset)
    val cursorsBranchDir = root.resolve("cursors").resolve(VersionedTable.b64(name))
    store.list(cursorsBranchDir).foreach { consumerDir =>
      store.list(consumerDir).foreach(store.delete)
      store.delete(consumerDir)
    }
    store.delete(cursorsBranchDir)
    store.delete(refsDir.resolve(name))
    // the index entry is NOT removed — entries are ADD-ONLY, same rule as
    // the tag index (TagStore.delete): a remove here racing a namesake
    // createBranch can strip the NEW branch's entry (create's index.add
    // no-ops while the stale entry exists), leaving a live ref invisible
    // to index-only enumerators — the EC-vacuum hazard again. branches()'
    // strongly-consistent exists probe filters the dead name instead.
    ()
  }

  // ---- branch protection (lakeFS branch-protection rules) -----------------

  private def protectedDir: Path = root.resolve("protected")

  /** lakeFS branch-protection rules: glob patterns (`*` = any run of chars,
    * `?` = one char) naming branches that reject DIRECT mutation — write /
    * append / upsert / delete / update / stage / commit / revert / cherry-pick
    * / compaction / branch deletion all throw. Changes reach a protected
    * branch only by [[merge]] from a reviewed side branch (exactly the lakeFS
    * model: protected branches guarantee every commit arrived via a merge).
    * The rule set persists as a chain of immutable putIfAbsent-claimed
    * generations under `protected/` ([[ProtectionRules]]): each edit is a
    * REAL compare-and-set, so concurrent edits from different processes
    * serialize — the loser rebases on the winner's set and retries, and no
    * rule is ever silently dropped. Patterns must not contain newlines
    * (the set is newline-joined per generation). Enforced by every table
    * handle, not just the one that added the rule. */
  def protectBranch(pattern: String): Unit =
    synchronized { ProtectionRules.add(store, protectedDir, pattern) }

  /** Remove one protection rule (exact pattern, not a matching branch name).
    * Returns false when no such rule exists. */
  def unprotectBranch(pattern: String): Boolean =
    synchronized { ProtectionRules.remove(store, protectedDir, pattern) }

  def protectionRules: Seq[String] = ProtectionRules.all(store, protectedDir)

  def isProtected(branch: String): Boolean =
    ProtectionRules.isProtected(store, protectedDir, branch)

  /** Throws unless `branch` accepts direct mutation. Merge deliberately does
    * NOT call this on its target: landing reviewed commits is the one door a
    * protected branch keeps open. */
  private def guardWritable(branch: String): Unit =
    ProtectionRules.guard(store, protectedDir, branch)

  // ---- hooks (lakeFS Actions: pre-commit / pre-merge) ---------------------

  private val preCommitHooks =
    new scala.collection.mutable.LinkedHashMap[String, (String, Commit) => Unit]
  private val preMergeHooks =
    new scala.collection.mutable.LinkedHashMap[String, (String, String) => Unit]

  /** lakeFS Actions, pre-commit flavor: `f(branch, candidate)` runs for EVERY
    * commit this handle is about to publish — writes, upserts, deletes,
    * updates, reverts, cherry-picks, and merge commits alike — BEFORE the
    * version slot is claimed. A throwing hook aborts the operation with the
    * table untouched (the candidate's already-written data files are orphans
    * the next vacuum reclaims — the same crash-equivalence the slot protocol
    * already guarantees). The candidate Commit carries files/schema/stats, so
    * hooks can veto on schema drift, file-count explosions, missing stats, or
    * message conventions. Hooks run in registration order and are
    * driver-process-scoped (lakeFS keeps Actions in repo config; a persisted
    * hook would need arbitrary code in the metadata store — a non-goal). */
  def addPreCommitHook(name: String)(f: (String, Commit) => Unit): Unit =
    synchronized { preCommitHooks.update(name, f) }

  def removePreCommitHook(name: String): Boolean =
    synchronized { preCommitHooks.remove(name).isDefined }

  /** Pre-merge flavor: `f(from, into)` runs at [[merge]] entry, before any
    * merge-base computation; throwing vetoes the merge. */
  def addPreMergeHook(name: String)(f: (String, String) => Unit): Unit =
    synchronized { preMergeHooks.update(name, f) }

  def removePreMergeHook(name: String): Boolean =
    synchronized { preMergeHooks.remove(name).isDefined }

  private def runPreCommitHooks(branch: String, candidate: Commit): Unit =
    preCommitHooks.foreach { case (n, f) =>
      try f(branch, candidate) catch {
        case e: Throwable => throw new IllegalStateException(
          s"pre-commit hook '$n' rejected commit on $branch: ${e.getMessage}", e)
      }
    }

  private def runPreMergeHooks(from: String, into: String): Unit =
    preMergeHooks.foreach { case (n, f) =>
      try f(from, into) catch {
        case e: Throwable => throw new IllegalStateException(
          s"pre-merge hook '$n' rejected merge $from -> $into: ${e.getMessage}", e)
      }
    }

  // ---- tags (lakeFS `lakectl tag`, immutable named refs) ------------------

  private def tagsDir: Path = root.resolve("tags")

  /** lakeFS `tag create` (`lakectl tag create lakefs://repo@tag ref`): an
    * IMMUTABLE named ref pinning one commit forever — the release-snapshot
    * primitive ("the exact data the model was trained on"). Unlike a branch,
    * a tag never advances; unlike a raw version number, it survives vacuum:
    * the tagged commit's files join vacuum's retained set until the tag is
    * deleted. Creation is a [[MetaStore.putIfAbsent]], so two racing
    * `createTag`s of the same name resolve atomically — one wins, the other
    * throws — on any store honoring the put-if-absent contract (no
    * read-then-write window). Tags live under `tags/`, not `refs/`, so the
    * branch listing and slot machinery never see them. */
  def createTag(name: String, branch: String = "main"): Commit = {
    TagStore.validateName(name)
    val h = head(branch).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $branch"))
    createTagAt(name, h.id)
  }

  /** Tag an arbitrary commit id (lakeFS allows tagging any reachable ref,
    * not just a head — e.g. the version a benchmark ran against). */
  def createTagAt(name: String, commitId: String): Commit = {
    require(store.exists(commitsDir.resolve(commitId + ".json")),
      s"no such commit: $commitId")
    val c = loadCommit(commitId)
    TagStore.create(store, tagsDir, name, commitId)
    c
  }

  /** (tag name, commit id) pairs, name-sorted. */
  def tags: Seq[(String, String)] = TagStore.all(store, tagsDir)

  def tagCommit(name: String): Commit =
    loadCommit(TagStore.commitIdOf(store, tagsDir, name))

  /** Read the table exactly as the tagged commit captured it. */
  def readTag(spark: SparkSession, name: String): DataFrame =
    readCommit(spark, tagCommit(name))

  /** Delta `RESTORE TABLE ... TO VERSION AS OF <tag>`: publish the tagged
    * state as a NEW commit on `branch` — same O(metadata) mechanics as
    * [[revert]] (no data movement, history intact, the restore is itself
    * revertable), but addressed by release name instead of version number,
    * and able to restore a state from ANOTHER branch's lineage (tags are
    * branch-agnostic pins). */
  def restoreTag(name: String, branch: String = "main", message: String = ""): Commit =
    synchronized {
      guardWritable(branch)
      // a typo'd branch must fail, not be silently born from the tag
      val h = head(branch).getOrElse(
        throw new IllegalArgumentException(s"no such branch: $branch"))
      val target = tagCommit(name)
      publish(branch, Some(h),
        if (message.isEmpty) s"restore tag $name" else message,
        DataType.fromJson(target.schemaJson).asInstanceOf[StructType], target.files,
        target.stats, strStats = target.strStats, nullStats = target.nullStats,
        dvFiles = target.dvFiles, bloomStats = target.bloomStats,
        bloomCols = target.bloomCols, bloomFiles = target.bloomFiles,
        // restore restores STATE — table properties (constraints) included,
        // Delta's RESTORE semantics: the restored data was validated under
        // the restored constraint set, not the current one
        props = Some(target.props))
    }

  /** Delta `CREATE TABLE … SHALLOW CLONE src [VERSION AS OF n]`: THIS table's
    * first commit references the source snapshot's files BY ABSOLUTE PATH —
    * a metadata-only operation (one commit record; zero data copied, zero
    * footers read — the source's logged rowCounts/fileSizes/stats seed the
    * clone's). Every reader path resolves commit entries via
    * `root.resolve(f)`, which passes absolute paths through untouched, so
    * scans, stats pruning, DV subtraction (file KEYS are the last two path
    * segments — unchanged by absolutization) and metadata COUNT all work
    * unchanged on the clone.
    *
    * Divergence is natural copy-on-write: appends add local files next to
    * the external references; a COW rewrite (delete/update/merge/compact)
    * replaces the touched external files with LOCAL rewrites — the clone
    * "localizes" exactly what it changes, like Delta's. The clone's vacuum
    * can never delete source data (the sweep walks only the clone's own
    * `data/` directory). Table properties — CHECK constraints included —
    * clone with the snapshot.
    *
    * Shared-fate caveat (Delta documents the same): `VACUUM` on the SOURCE
    * reclaims files by ITS OWN retention rules and does not know about
    * clones — keep a tag/branch pinning the cloned version on the source,
    * or vacuum the source with enough retention. The bloom sidecar index is
    * NOT carried (its entries key source-relative names); the clone's first
    * own write rebuilds blooms for its new files if `bloomCols` is set. */
  def shallowCloneFrom(src: VersionedTable, srcBranch: String = "main",
                       versionAsOf: Option[Long] = None,
                       branch: String = "main", message: String = ""): Commit =
    synchronized {
      guardWritable(branch)
      require(head(branch).isEmpty,
        s"SHALLOW CLONE target branch $branch already has commits")
      require(src.root.toAbsolutePath != root.toAbsolutePath,
        "SHALLOW CLONE of a table into itself")
      val target = versionAsOf match {
        case Some(v) => src.resolveVersion(srcBranch, v)
        case None => src.headOrThrow(srcBranch)
      }
      def abs(f: String) = src.root.resolve(f).toString
      def absKeys[V](m: Map[String, V]): Map[String, V] =
        m.map { case (k, v) => abs(k) -> v }
      publish(branch, None,
        if (message.nonEmpty) message
        else s"SHALLOW CLONE of ${src.root}@$srcBranch v${target.version}",
        DataType.fromJson(target.schemaJson).asInstanceOf[StructType],
        target.files.map(abs),
        absKeys(target.stats), strStats = absKeys(target.strStats),
        nullStats = absKeys(target.nullStats),
        dvFiles = target.dvFiles.map(abs),
        props = Some(target.props),
        seedRowCounts = absKeys(target.rowCounts),
        seedFileSizes = absKeys(target.fileSizes))
    }

  /** [[shallowCloneFrom]] for a FOREIGN DELTA source: import a stock Delta
    * table (any `_delta_log` this repo's reader replays — delta-spark
    * exports included) as a zero-copy versioned table. The clone's v0
    * references the Delta snapshot's parquet by absolute path; numeric
    * stats / null counts / row counts / sizes convert straight from the
    * add actions' stats JSON (no file I/O at all — the whole import is a
    * log replay plus one commit write), so skip-reads and metadata
    * COUNT(*) work on the import immediately. From there the table is
    * fully native: branches, constraints, MERGE, time travel forward.
    *
    * Refused shapes — each would silently corrupt reads, so they error
    * loudly toward the COPYING path
    * ([[graft.streaming.ChangeFeed.replicateFromDelta]]): PARTITIONED
    * sources (partition values live in the log, not the parquet — a direct
    * scan would drop those columns), sources with live DELETION VECTORS
    * (Delta's DV binary format is not this engine's), and COLUMN-MAPPED
    * tables (the parquet carries physical names). String stats are not
    * imported: delta-spark truncates them, and vt's metadata MIN/MAX
    * treats `strStats` as exact (pruning simply stays conservative). */
  def shallowCloneFromDelta(spark: SparkSession, deltaRoot: String,
                            versionAsOf: Option[Long] = None,
                            branch: String = "main",
                            message: String = ""): Commit = synchronized {
    guardWritable(branch)
    require(head(branch).isEmpty,
      s"SHALLOW CLONE target branch $branch already has commits")
    val snap = DeltaLogReader.snapshot(deltaRoot, versionAsOf, Some(spark))
    require(snap.partitionColumns.isEmpty,
      s"cannot shallow-clone a PARTITIONED Delta table (partition values " +
        "live in the log, not the parquet files) — import it with " +
        "replicateFromDelta instead")
    require(snap.files.forall(_.dv.isEmpty),
      "cannot shallow-clone a Delta table with live deletion vectors " +
        "(Delta's DV binary format differs) — import it with " +
        "replicateFromDelta instead")
    require(snap.configuration.getOrElse("delta.columnMapping.mode", "none") == "none",
      "cannot shallow-clone a column-mapped Delta table (parquet files " +
        "carry physical column names) — import it with replicateFromDelta instead")
    val droot = java.nio.file.Paths.get(deltaRoot).toAbsolutePath.normalize
    require(droot != root.toAbsolutePath, "SHALLOW CLONE of a table into itself")
    def abs(p: String) = droot.resolve(p).toString
    val (stats, nullStats, rowCounts) = DeltaLogReader.vtStatsOf(snap, abs)
    // the source's own CHECK constraints (`delta.constraints.<name>` in the
    // metaData configuration — Delta predicates are Spark SQL) import into
    // the clone's constraint namespace: the source enforced them over the
    // cloned snapshot already, so no validation scan is needed — only the
    // predicate's ANALYZABILITY against the schema is checked, loudly (an
    // unparseable constraint must not silently become unenforced). Other
    // configuration keys (appendOnly, retention dials, …) are Delta-engine
    // dials with no meaning here and are NOT imported.
    val importedChecks = snap.configuration.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        val name = k.stripPrefix("delta.constraints.").toLowerCase
        VersionedTable.validateCheckPredicate(spark, snap.schema, v)
        VersionedTable.CheckConstraintPrefix + name -> v
    }
    publish(branch, None,
      if (message.nonEmpty) message
      else s"SHALLOW CLONE of Delta table $deltaRoot v${snap.version}",
      snap.schema, snap.files.map(f => abs(f.path)),
      stats, nullStats = nullStats,
      props = Some(importedChecks),
      seedRowCounts = rowCounts,
      seedFileSizes = snap.files.collect {
        case f if f.size >= 0 => abs(f.path) -> f.size
      }.toMap)
  }

  /** lakeFS `tag delete`: the commit becomes vacuumable again (if nothing
    * else retains it). Deleting a missing tag is a no-op returning false. */
  def deleteTag(name: String): Boolean = TagStore.delete(store, tagsDir, name)

  /** Data+DV files pinned by tags — part of every vacuum's retained set. */
  private def taggedFiles: Set[String] =
    tags.flatMap { case (_, id) => loadCommit(id).allFiles }.toSet

  /** V4 `diff`: object-level change list between two branch heads, as
    * (path, change_type) pairs — lakeFS `lakectl diff` semantics. */
  def diffFiles(branch: String, other: String): Seq[(String, String)] = {
    val a = head(branch).map(_.files.toSet).getOrElse(Set.empty)
    val b = head(other).map(_.files.toSet).getOrElse(Set.empty)
    ((a -- b).toSeq.sorted.map(_ -> "added") ++ (b -- a).toSeq.sorted.map(_ -> "removed"))
  }

  /** V5 `merge from into`: fast-forward when `into` hasn't moved since the
    * branch point; when both branches moved but their changes since the merge
    * base are PURE DISJOINT APPENDS (each side only added files), a true
    * 3-way merge commit unions them — the lakeFS rule that `lakectl merge`
    * succeeds iff no object changed on both sides (reference
    * README.md:141-147), tightened one notch: a side that REMOVED base files
    * (overwrite / compact / revert) conflicts with ANY change on the other
    * side. Object-wise lakeFS would merge that case too, but the row-level
    * outcome — an overwrite snapshot silently interleaved with the other
    * side's appended rows — is ambiguous enough that we refuse it loudly;
    * redo the overwrite on the merged head instead.
    *
    * The merge commit records the source head as [[Commit.mergeParent]], so
    * the merge base ADVANCES: keep committing appends on `from` and merging —
    * each later merge sees only the new commits as divergence. */
  def merge(from: String, into: String): Commit = synchronized {
    runPreMergeHooks(from, into) // lakeFS Actions: a throwing hook vetoes
    val src = head(from).getOrElse(throw new IllegalArgumentException(s"no such branch: $from"))
    val dst = head(into).getOrElse(throw new IllegalArgumentException(s"no such branch: $into"))
    if (src.id == dst.id) src
    else if (isAncestor(dst.id, of = src)) { // fast-forward
      // An FF advances the ref without publishing a commit, but it still
      // claims the next version slot exactly like a publish: EVERY
      // ref-advancing path holds the branch's next slot, so a concurrent
      // cross-process writer, another merge, or vacuum's orphan-replay
      // (which only acts while the orphan's own slot is claimed) can never
      // interleave with — and silently overwrite — this ref write. The slot
      // records the FF target so the stale-slot sweep keeps it as this
      // version's CAS record once the head descends from the target (lakeFS
      // promises merge atomicity — reference README.md:145).
      CommitLog.claimVersionSlot(locksDir, into, dst.version + 1,
        content = "ff:" + src.id, store = store)
      store.put(refsDir.resolve(into), src.id)
      src
    } else if (isAncestor(src.id, of = dst)) dst // already merged
    else {
      val base = mergeBase(src, dst).getOrElse(throw new IllegalStateException(
        s"merge conflict: $from and $into share no common ancestor"))
      val baseFiles = base.files.toSet
      val srcAdded = src.files.toSet -- baseFiles
      val srcRemoved = baseFiles -- src.files.toSet
      val dstAdded = dst.files.toSet -- baseFiles
      val dstRemoved = baseFiles -- dst.files.toSet
      val overlap = (srcAdded ++ srcRemoved) intersect (dstAdded ++ dstRemoved)
      if (overlap.nonEmpty) throw new IllegalStateException(
        s"merge conflict: ${overlap.size} paths changed on both $from and $into " +
          s"since the merge base (e.g. ${overlap.toSeq.sorted.take(3).mkString(", ")})")
      // merge-on-read deletes count as changes against a rewriting side:
      // an overwrite replaced the very objects the other side's deletion
      // vectors point into, so silently unioning them would drop the delete
      // intent (append + MOR-delete still merge cleanly below — DV union)
      val srcDvChanged = src.dvFiles.toSet != base.dvFiles.toSet
      val dstDvChanged = dst.dvFiles.toSet != base.dvFiles.toSet
      if (srcRemoved.nonEmpty && (dstAdded.nonEmpty || dstRemoved.nonEmpty || dstDvChanged))
        throw new IllegalStateException(
          s"merge conflict: $from replaced base files (overwrite/compact/revert) while " +
            s"$into also changed — merging would silently combine an overwrite snapshot " +
            "with the other side's rows; redo the rewrite on the merged head instead")
      if (dstRemoved.nonEmpty && (srcAdded.nonEmpty || srcDvChanged))
        throw new IllegalStateException(
          s"merge conflict: $into replaced base files (overwrite/compact/revert) while " +
            s"$from appended — merging would silently graft $from's rows onto the rewritten " +
            "snapshot; redo the append on the merged head instead")
      if (src.schemaJson != dst.schemaJson) throw new IllegalStateException(
        s"merge conflict: $from and $into disagree on the table schema")
      // TABLE-PROPERTIES 3-way merge (constraints included), git's per-key
      // rule: a key changed on ONE side since the base carries; changed
      // DIFFERENTLY on both sides conflicts loudly — silently keeping one
      // side would drop a constraint (or a governance tag) nobody deleted.
      val mergedProps: Map[String, String] =
        (base.props.keySet ++ src.props.keySet ++ dst.props.keySet).flatMap { k =>
          (base.props.get(k), src.props.get(k), dst.props.get(k)) match {
            case (_, s, d) if s == d => s.map(k -> _) // agree (both set same / both absent)
            case (b, s, d) if s == b => d.map(k -> _) // only dst changed
            case (b, s, d) if d == b => s.map(k -> _) // only src changed
            case _ => throw new IllegalStateException(
              s"merge conflict: table property '$k' changed differently on " +
                s"$from and $into since the merge base — resolve it with " +
                "SET/UNSET TBLPROPERTIES (or DROP CONSTRAINT) on one side")
          }
        }.toMap
      val merged = (dst.files.filterNot(srcRemoved.contains) ++
        src.files.filter(srcAdded.contains)).distinct.sorted.toVector
      val mergedDvs = (dst.dvFiles ++ src.dvFiles).distinct.sorted.toVector
      // CHECK constraints judge the rows each side IMPORTS (a branch's own
      // writes were fused-guarded when they landed, but a branch that never
      // carried the constraint enforced nothing): constraints the TARGET
      // carries validate the source's added files; constraints NEWLY
      // arriving from the source validate the target's own post-base files
      // (the source's ADD already validated its snapshot, base included).
      // Bounded by the merge delta, short-circuits on the first violation,
      // and MOR-deleted rows don't count (merged DVs applied).
      locally {
        val inMerged = VersionedTable.checkConstraints _
        val mergedChecks = mergedProps.collect {
          case (k, v) if k.startsWith(VersionedTable.CheckConstraintPrefix) =>
            k.stripPrefix(VersionedTable.CheckConstraintPrefix) -> v
        }
        val dstChecks = inMerged(dst).filter { case (n, v) =>
          mergedChecks.get(n).contains(v) }
        val srcNewChecks = mergedChecks.filter { case (n, v) =>
          !inMerged(dst).get(n).contains(v) }
        enforceChecksOnFiles(src.files.filter(srcAdded.contains), mergedDvs,
          dst.schemaJson, dstChecks, s"merge $from into $into")
        enforceChecksOnFiles(dst.files.filter(dstAdded.contains), mergedDvs,
          dst.schemaJson, srcNewChecks, s"merge $from into $into")
      }
      publish(into, Some(dst), s"merge $from into $into",
        DataType.fromJson(dst.schemaJson).asInstanceOf[StructType], merged,
        dst.stats ++ src.stats, mergeParent = Some(src.id),
        strStats = dst.strStats ++ src.strStats,
        nullStats = dst.nullStats ++ src.nullStats,
        // deletion vectors union: concurrent merge-on-read deletes compose —
        // the merged snapshot subtracts BOTH sides' deleted positions
        dvFiles = mergedDvs,
        bloomStats = dst.bloomStats ++ src.bloomStats,
        bloomCols = (dst.bloomCols ++ src.bloomCols).distinct,
        bloomFiles = (dst.bloomFiles ++ src.bloomFiles).distinct.sorted,
        props = Some(mergedProps))
    }
  }

  /** V6 `revert`: append a NEW commit whose snapshot equals `toVersion` —
    * history is never rewritten (lakeFS `README.md:132`). */
  def revert(branch: String, toVersion: Long, message: String = ""): Commit = synchronized {
    guardWritable(branch)
    val target = resolveVersion(branch, toVersion)
    publish(branch, head(branch), if (message.isEmpty) s"revert to v$toVersion" else message,
      DataType.fromJson(target.schemaJson).asInstanceOf[StructType], target.files,
      target.stats, strStats = target.strStats, nullStats = target.nullStats,
      dvFiles = target.dvFiles, bloomStats = target.bloomStats,
      bloomCols = target.bloomCols, bloomFiles = target.bloomFiles,
      props = Some(target.props)) // revert restores state, props included
  }

  /** Delta `RESTORE TABLE … TO TIMESTAMP AS OF`: [[revert]] addressed by
    * wall clock — the restored state is the newest commit at or before
    * `tsMillis` (same resolution as [[readAsOfTimestamp]], checkpoint-
    * accelerated), published as a NEW commit so history stays. */
  def restoreToTimestamp(tsMillis: Long, branch: String = "main",
                         message: String = ""): Commit = synchronized {
    val target = commitAtTimestamp(branch, tsMillis)
    revert(branch, target.version,
      if (message.nonEmpty) message
      else s"RESTORE TO TIMESTAMP AS OF $tsMillis (v${target.version})")
  }

  /** [[revert]] with the parent PINNED to `raced` — the raced-first-write
    * repair ([[graft.sources.VtDataSource]]). A plain `revert` re-reads the
    * branch head internally, so a third writer landing between the caller's
    * head check and that read would become the revert's parent and be
    * silently reverted out of head. Pinning the parent makes the repair
    * target exactly slot `raced.version + 1`: a third writer's claim of
    * that slot fails this publish's CAS
    * ([[java.util.ConcurrentModificationException]]) and the repair is
    * SKIPPED — it can only ever undo `raced` itself, never a later commit.
    * The restored snapshot is `raced`'s own parent (the concurrent winner
    * the mode contract says should own the table). */
  private[graft] def revertRaced(branch: String, raced: Commit,
                                 message: String): Commit = synchronized {
    guardWritable(branch)
    val target = loadCommit(raced.parent.getOrElse(throw new IllegalStateException(
      s"revertRaced needs a raced commit with a parent, got root ${raced.id}")))
    publish(branch, Some(raced), message,
      DataType.fromJson(target.schemaJson).asInstanceOf[StructType], target.files,
      target.stats, strStats = target.strStats, nullStats = target.nullStats,
      dvFiles = target.dvFiles, bloomStats = target.bloomStats,
      bloomCols = target.bloomCols, bloomFiles = target.bloomFiles,
      props = Some(target.props)) // the repair restores the winner's state
  }

  /** lakeFS `cherry-pick` (lakectl's single-commit transplant): apply the
    * CHANGE one commit introduced — its file delta versus its own parent —
    * onto `into`'s head as a NEW commit, with no merge parent (git's
    * cherry-pick shape: the transplanted change does not link histories).
    * Object-granular and O(metadata):
    *
    *   added   = picked.files − parent.files
    *   removed = parent.files − picked.files
    *
    * The pick CONFLICTS loudly when the target no longer carries a removed
    * file (that object already changed or vanished on `into` — the
    * changed-on-both-sides rule) or already carries an added file, and when
    * the two heads disagree on the table schema (grafting files under a
    * diverged schema would silently null/drop columns — same rule as
    * [[merge]]). A root commit's delta is its full snapshot. An empty delta
    * (e.g. picking a revert that landed on its own parent state) is a no-op
    * returning the unchanged head. */
  def cherryPick(fromBranch: String, version: Long, into: String): Commit = synchronized {
    guardWritable(into)
    val picked = resolveVersion(fromBranch, version)
    val pickedParent = picked.parent.map(loadCommit)
    val parentFiles = pickedParent.map(_.files.toSet).getOrElse(Set.empty)
    val added = picked.files.filterNot(parentFiles.contains)
    val removed = parentFiles -- picked.files.toSet
    // a merge-on-read delete's whole delta is its new deletion vectors
    val dvAdded = picked.dvFiles
      .filterNot(pickedParent.map(_.dvFiles.toSet).getOrElse(Set.empty))
    val dst = head(into).getOrElse(
      throw new IllegalArgumentException(s"no such branch: $into"))
    if (added.isEmpty && removed.isEmpty && dvAdded.isEmpty) return dst
    val dstFiles = dst.files.toSet
    val missing = removed.filterNot(dstFiles.contains)
    if (missing.nonEmpty) throw new IllegalStateException(
      s"cherry-pick conflict: ${missing.size} file(s) removed by $fromBranch@v$version " +
        s"no longer exist on $into (e.g. ${missing.toSeq.sorted.take(3).mkString(", ")})")
    val dup = added.filter(dstFiles.contains)
    if (dup.nonEmpty) throw new IllegalStateException(
      s"cherry-pick conflict: ${dup.size} file(s) added by $fromBranch@v$version " +
        s"already present on $into (e.g. ${dup.sorted.take(3).mkString(", ")})")
    if (picked.schemaJson != dst.schemaJson) throw new IllegalStateException(
      s"cherry-pick conflict: $fromBranch@v$version and $into disagree on the table schema")
    // the transplanted files were written under the SOURCE branch's
    // constraint set — the target's CHECK constraints must judge them
    // (bounded by the pick's delta; DV-deleted rows don't count)
    enforceChecksOnFiles(added, (dst.dvFiles ++ dvAdded).distinct.sorted.toVector,
      dst.schemaJson, VersionedTable.checkConstraints(dst),
      s"cherry-pick $fromBranch@v$version into $into")
    val files = (dst.files.filterNot(removed.contains) ++ added).distinct.sorted.toVector
    publish(into, Some(dst),
      s"cherry-pick $fromBranch@v$version (${picked.id.take(8)}): ${picked.message}",
      DataType.fromJson(dst.schemaJson).asInstanceOf[StructType], files,
      dst.stats.view.filterKeys(files.contains).toMap ++
        picked.stats.view.filterKeys(added.contains).toMap,
      strStats = dst.strStats.view.filterKeys(files.contains).toMap ++
        picked.strStats.view.filterKeys(added.contains).toMap,
      nullStats = dst.nullStats.view.filterKeys(files.contains).toMap ++
        picked.nullStats.view.filterKeys(added.contains).toMap,
      dvFiles = (dst.dvFiles ++ dvAdded).distinct.sorted.toVector,
      bloomStats = dst.bloomStats.view.filterKeys(files.contains).toMap ++
        picked.bloomStats.view.filterKeys(added.contains).toMap,
      bloomCols = (dst.bloomCols ++ picked.bloomCols).distinct,
      // picked sidecars carry whole; entries for files the pick did not
      // transplant are dead-but-harmless (lookups key on live file names)
      bloomFiles = (dst.bloomFiles ++ picked.bloomFiles).distinct.sorted)
  }

  // ---- vacuum (jobs/vdt4.py:84-85, V9) -----------------------------------

  /** Delete data files unreferenced by any retained commit. A commit is
    * retained iff it is among the newest `retainLast` versions of some
    * branch's lineage (plus every staged snapshot). Returns #files deleted.
    *
    * `dryRun = true` (Delta's `VACUUM ... DRY RUN`): report the count that
    * WOULD be deleted and mutate NOTHING. The stale-slot sweep runs in PLAN
    * mode — a pure read that reports the ref repairs a real sweep would
    * perform — and retention is priced against those VIRTUAL post-sweep
    * heads, so the dry-run count matches the subsequent real vacuum even in
    * a crashed-writer state (r12 advice: the old dry run skipped the sweep
    * and could over- or under-count around an orphan replay).
    *
    * Safety invariant (property-tested): a file referenced by any retained
    * version is never deleted — vacuum can only break time travel to versions
    * older than the retention horizon, exactly like Delta's `vacuum()`.
    *
    * Eventually-consistent listings (S3-class stores, [[S3SimMetaStore]]
    * with `listDelayMs` > 0) cannot corrupt retention: branch enumeration
    * goes through the single-key [[branchIndex]] in union with the listing,
    * so a branch created a millisecond ago is priced into retention even
    * while its ref lags out of LIST (MetaStoreSpec pins exactly this:
    * branch → overwrite past it → vacuum under an EC store → the branch's
    * exclusive files survive). Slot sweeps are likewise safe — an unlisted
    * young slot is merely repaired a cycle later.
    */
  def vacuum(retainLast: Int = 1, staleSlotMs: Long = VersionedTable.DefaultStaleSlotMs,
             dryRun: Boolean = false): Int = synchronized {
    require(retainLast >= 1, "retainLast must be >= 1")
    val repairs =
      sweepStaleSlots(System.currentTimeMillis(), staleSlotMs, act = !dryRun).refRepairs
    // After a REAL sweep head() is already post-repair; in a dry run the
    // planned repairs substitute for the ref advances that did not happen.
    def vHead(b: String): Option[Commit] =
      (if (dryRun) repairs.get(b).map(loadCommit) else None).orElse(head(b))
    val vReachable = Ancestry.reachableIds(loadCommit, branches.flatMap(vHead))
    sweep((branches.flatMap(b => lineageTake(vHead(b), retainLast).flatMap(_.allFiles)) ++
      stagedFiles).toSet ++ slotProtectedFiles(vReachable) ++ taggedFiles ++
      reachableManifests(vReachable), dryRun)
  }

  /** Manifests of every REACHABLE commit (r20 review fix): the commit
    * RECORD must stay resolvable for ancestry walks — reachableIds, merge
    * bases, lineage, timestamp resolution — in a fresh process even after
    * the commit's DATA fell off the retention horizon (pre-manifest inline
    * records had this property for free). Only unreachable commits'
    * manifests sweep. Cost: O(history) tiny JSON parses, zero data reads —
    * the manifests themselves are O(files) path lists, the exact metadata
    * the inline records used to carry. */
  private def reachableManifests(reachable: Set[String]): Set[String] =
    reachable.flatMap(id =>
      try CommitLog.fromJson(store.read(commitsDir.resolve(id + ".json"))).manifests
      catch { case scala.util.control.NonFatal(_) => Vector.empty })

  /** Time-based retention, Delta's `vacuum()` dial (`jobs/vdt4.py:84-85`
    * defaults to 168h): a commit is retained iff it is younger than
    * `retainHours` — or is a branch head, which is always kept so the table
    * stays readable. `nowMs` is injectable for deterministic tests.
    * `dryRun` COUNTS the reclaimable files without deleting (Delta's
    * `VACUUM … DRY RUN`, same plan-then-act shape as [[vacuum]]'s dial —
    * planned-but-unacted ref repairs substitute for the real sweep's). */
  def vacuumRetainHours(retainHours: Double,
                        nowMs: Long = System.currentTimeMillis(),
                        staleSlotMs: Long = VersionedTable.DefaultStaleSlotMs,
                        dryRun: Boolean = false): Int = synchronized {
    require(retainHours >= 0, "retainHours must be >= 0")
    val cutoff = nowMs - (retainHours * 3600 * 1000).toLong
    val repairs = sweepStaleSlots(nowMs, staleSlotMs, act = !dryRun).refRepairs
    def vHead(b: String): Option[Commit] =
      (if (dryRun) repairs.get(b).map(loadCommit) else None).orElse(head(b))
    val vReachable = Ancestry.reachableIds(loadCommit, branches.flatMap(vHead))
    sweep((branches.flatMap(b => lineageFrom(vHead(b)).zipWithIndex.collect {
      case (c, i) if i == 0 || c.ts >= cutoff => c.allFiles // i==0 = the head
    }.flatten) ++ stagedFiles).toSet ++ slotProtectedFiles(vReachable) ++
      taggedFiles ++ reachableManifests(vReachable), dryRun)
  }

  /** Crash recovery for this table's slots — semantics and guards live in
    * [[SlotSweep.sweepStaleSlots]] (shared with [[Repo]], which speaks the
    * same claim-slot → write-commit → advance-ref protocol). */
  private def sweepStaleSlots(nowMs: Long, staleSlotMs: Long,
                              act: Boolean = true): SlotSweep.SweepResult =
    SlotSweep.sweepStaleSlots(store, root, head, loadCommit, reachableIds,
      nowMs, staleSlotMs, act)

  /** Ids of every commit reachable from some branch ref through the FULL
    * parent edge set (first parent + mergeParent) — see
    * [[Ancestry.reachableIds]]. */
  private def reachableIds: Set[String] =
    Ancestry.reachableIds(loadCommit, branches.flatMap(head))

  /** Replay-target data files vacuum must retain — see
    * [[SlotSweep.slotProtectedFiles]]. */
  private def slotProtectedFiles(reachable: Set[String]): Set[String] =
    SlotSweep.slotProtectedFiles(store, root, loadCommit, reachable)

  private def stagedFiles: Seq[String] =
    branches.filter(hasStaged).flatMap(b =>
      CommitLog.fromJson(store.read(refsDir.resolve(b + ".staged"))).files)

  /** Delete every data-plane file not in `retained` (or just COUNT them
    * when `dryRun`); prune emptied commit dirs. Covers parquet (data +
    * deletion vectors) AND `.bloom` index sidecars — an orphaned sidecar
    * is reclaimable garbage exactly like an orphaned data file. */
  private def sweep(retained: Set[String], dryRun: Boolean = false): Int = {
    def dataPlane(name: String): Boolean =
      name.endsWith(".parquet") || name.endsWith(".bloom") ||
        name.endsWith(".manifest")
    if (!Files.exists(dataDir)) return 0
    val walk = Files.walk(dataDir)
    val all =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) && dataPlane(p.getFileName.toString))
        .map(p => root.relativize(p).toString).toVector
      finally walk.close()
    val dead = all.filterNot(retained.contains)
    if (dryRun) return dead.size
    dead.foreach(f => Files.deleteIfExists(root.resolve(f)))
    // prune now-empty commit directories
    listDir(dataDir).foreach { d =>
      if (Files.isDirectory(d) && !listDir(d).exists(p =>
            dataPlane(p.getFileName.toString)))
        graft.Tables.deleteRecursively(d)
    }
    dead.size
  }

  /** CDC between two versions of a branch: row-level changes as a DataFrame
    * of (change_type, row-columns).
    *
    * Fast path: when the interval is APPEND-ONLY (every `fromVersion` file is
    * still in `toVersion`'s snapshot — the common case for ingest branches),
    * the inserts are EXACTLY the rows of the added files, so the plan scans
    * only the delta files and touches neither snapshot. At 100 TB this is
    * the difference between reading the day's increment and diffing two
    * petabyte snapshots. Detected from commit metadata alone (file-list
    * subset check), so the decision costs no I/O.
    *
    * General path (overwrites/upserts/reverts in the interval): exceptAll
    * both ways — but FILE-GRANULAR, not snapshot-granular. Files are
    * immutable, so every file common to both snapshots contributes the same
    * bag of rows to each side and cancels out of the bag difference exactly:
    *   bag(to) ∖ bag(from) = bag(added files) ∖ bag(removed files).
    * The plan therefore scans only the SYMMETRIC DIFFERENCE of the two file
    * lists (decided from commit metadata, zero I/O). For a copy-on-write
    * upsert that rewrote 1% of a petabyte table, that is a diff over ~2% of
    * the files instead of two full snapshots. Rows that were merely COPIED
    * into a rewritten file (same values, new file) appear in both restricted
    * bags and cancel, so the output is still exactly the row-level delta. */
  def changes(spark: SparkSession, branch: String, fromVersion: Long,
              toVersion: Long): DataFrame =
    changesBetween(spark, resolveVersion(branch, fromVersion),
      resolveVersion(branch, toVersion))

  /** [[changes]] over already-resolved commits — what [[changesFeed]] calls
    * so an N-interval feed resolves the lineage ONCE (O(history) metadata
    * reads total), not twice per interval. */
  private def changesBetween(spark: SparkSession, from: Commit, to: Commit): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val appendOnly = from.files.toSet.subsetOf(to.files.toSet) &&
      from.schemaJson == to.schemaJson && from.dvFiles.toSet == to.dvFiles.toSet
    if (appendOnly) {
      val added = to.files.filterNot(from.files.toSet)
      readCommit(spark, to.copy(files = added))
        .withColumn("change_type", lit("insert"))
    } else {
      // The interval may contain a mergeSchema append, so the two snapshots
      // can disagree on columns; align both sides to the union schema with
      // null-filled missing columns before the bag diff (append forbids
      // same-name/different-type, so a name appears with one type only).
      // Without this the exceptAll below throws AnalysisException at runtime.
      val fromSchema = DataType.fromJson(from.schemaJson).asInstanceOf[StructType]
      val toSchema = DataType.fromJson(to.schemaJson).asInstanceOf[StructType]
      val allFields = toSchema.fields ++
        fromSchema.fields.filterNot(f => toSchema.fieldNames.contains(f.name))
      def align(df: DataFrame): DataFrame = df.select(allFields.toIndexedSeq.map { f =>
        import org.apache.spark.sql.functions.col
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
      // file-granular restriction: common immutable files cancel, diff only
      // the symmetric difference (removed files on the before side, added on
      // the after side) — PLUS any common file whose deletion vectors changed
      // in the interval: its row set differs even though the file bytes are
      // identical, so it must enter both sides (a merge-on-read delete stays
      // file-granular in CDC: only the DV-touched files are scanned, found by
      // reading the interval's small DV delta, never the corpus)
      val toSet = to.files.toSet
      val fromSet = from.files.toSet
      val dvDelta = (to.dvFiles.toSet diff from.dvFiles.toSet) ++
        (from.dvFiles.toSet diff to.dvFiles.toSet) // reverts drop DVs too
      // PURE-DV step (r21, guide §2.3/§2.4): same file set, same schema, only
      // deletion vectors moved — a MOR delete (or its revert). The bag diff
      // below shuffles EVERY row of the touched files through two exceptAll
      // aggregations; but the change set is, by construction, exactly the
      // rows at the symmetric position difference of the two DV relations.
      // Read the touched files once with `_metadata.row_index` and inner-
      // broadcast-join the O(changed rows) position delta — zero shuffle of
      // data rows. Values are bag-identical to the exceptAll form (positions
      // are unique per file, so each changed position contributes exactly
      // its row once — even when equal-valued rows exist elsewhere).
      // Bounded: the position delta is broadcast, so fall back to the bag
      // diff when the DV delta's footer row counts exceed the cap (a
      // 100 TB mega-delete keeps the shuffle path).
      val pureDvCap = 2000000L
      lazy val dvDeltaRows: Option[Long] =
        dvDelta.toSeq.foldLeft(Option(0L)) { (acc, f) =>
          acc.flatMap(a => VersionedTable.footerRowCount(root.resolve(f)).map(a + _))
        }
      if (fromSet == toSet && from.schemaJson == to.schemaJson &&
          dvDelta.nonEmpty && dvDeltaRows.exists(_ <= pureDvCap)) {
        import org.apache.spark.sql.functions.{broadcast, col}
        def dvPos(c2: Commit) =
          if (c2.dvFiles.isEmpty)
            spark.createDataFrame(new java.util.ArrayList[Row](),
              StructType(Seq(
                org.apache.spark.sql.types.StructField("fk", org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.LongType))))
          else spark.read.parquet(c2.dvFiles.map(f => root.resolve(f).toString): _*)
            .select(col("fk"), col("pos"))
        val fromPos = dvPos(from)
        val toPos = dvPos(to)
        val delPos = toPos.except(fromPos)   // newly deleted positions
        val insPos = fromPos.except(toPos)   // un-deleted positions (revert)
        // fks whose DV changed: scan only those files (raw, NO DV subtraction)
        val touchedFks = spark.read
          .parquet(dvDelta.toSeq.map(f => root.resolve(f).toString): _*)
          .select("fk").distinct().collect().map(_.getString(0)).toSet
        val touched = to.files.filter(f => touchedFks.contains(VersionedTable.fileKey(f)))
        val rows = scanWithPos(spark, to.copy(files = touched, dvFiles = Vector.empty))
        def attach(pos: DataFrame, kind: String) =
          align(rows.join(broadcast(pos
              .withColumnRenamed("fk", VersionedTable.FkCol)
              .withColumnRenamed("pos", VersionedTable.PosCol)),
            Seq(VersionedTable.FkCol, VersionedTable.PosCol))
            .drop(VersionedTable.FkCol, VersionedTable.PosCol))
            .withColumn("change_type", lit(kind))
        return attach(insPos, "insert").unionByName(attach(delPos, "delete"))
      }
      val dvTouchedFks: Set[String] =
        if (dvDelta.isEmpty) Set.empty
        else spark.read.parquet(dvDelta.toSeq.map(f => root.resolve(f).toString): _*)
          .select("fk").distinct().collect().map(_.getString(0)).toSet
      def dvTouched(rel: String) = dvTouchedFks.contains(VersionedTable.fileKey(rel))
      val before = align(readCommit(spark,
        from.copy(files = from.files.filter(f => !toSet(f) || dvTouched(f)))))
      val after = align(readCommit(spark,
        to.copy(files = to.files.filter(f => !fromSet(f) || dvTouched(f)))))
      after.exceptAll(before).withColumn("change_type", lit("insert"))
        .unionByName(before.exceptAll(after).withColumn("change_type", lit("delete")))
    }
  }

  /** Delta-CDF-style change feed (`table_changes` shape): the per-commit
    * deltas of the interval `(fromVersion, toVersion]`, each row tagged with
    * the commit version that produced it — what a downstream incremental
    * consumer replays commit-by-commit instead of as one squashed diff
    * (upsert-then-delete sequences stay visible; the squashed [[changes]]
    * would cancel them). Each per-commit interval takes the same fast paths
    * as [[changes]]: append-only commits scan only their delta files,
    * rewrites diff only the symmetric file difference.
    *
    * Scale shape (r12 advice): metadata is O(interval span) reads — one
    * bounded walk via [[commitRange]], never a full-lineage replay — and the
    * PLAN is O(#rewrite-commits + #schema-changes) nodes, not O(V): maximal
    * runs of append-only same-schema commits collapse into ONE parquet scan
    * over their delta files, with each row's `version` assigned by a
    * broadcast join of file→version (files are immutable and belong to
    * exactly the commit that added them). A year of streaming ingest
    * (thousands of append commits) replays as a single scan. */
  def changesFeed(spark: SparkSession, branch: String, fromVersion: Long,
                  toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, concat_ws, input_file_name, lit, slice, split}
    require(toVersion > fromVersion,
      s"changesFeed needs an ascending interval, got ($fromVersion, $toVersion]")
    val range = commitRange(branch, fromVersion, toVersion)
    val steps = range.zip(range.tail) // (v-1 commit, v commit) per feed version
    final case class Run(schemaJson: String, pairs: List[(String, Long)])
    val segments = scala.collection.mutable.ListBuffer.empty[Either[Run, (Commit, Commit)]]
    steps.foreach { case (from, to) =>
      val appendOnly = from.files.toSet.subsetOf(to.files.toSet) &&
        from.schemaJson == to.schemaJson && from.dvFiles.toSet == to.dvFiles.toSet
      if (appendOnly) {
        val added = to.files.filterNot(from.files.toSet).map(_ -> to.version).toList
        segments.lastOption match {
          case Some(Left(run)) if run.schemaJson == to.schemaJson =>
            segments.update(segments.size - 1, Left(Run(run.schemaJson, run.pairs ++ added)))
          case _ => segments += Left(Run(to.schemaJson, added))
        }
      } else segments += Right((from, to))
    }
    // Version assignment key: the last two path segments (uuid'd commit dir +
    // part file) — unique per file, scheme-independent (input_file_name
    // returns a URI; the relative path in the commit log does not).
    def fileKey(rel: String): String = VersionedTable.fileKey(rel)
    val frames = segments.toList.flatMap {
      case Left(run) if run.pairs.isEmpty => None // steps that appended nothing
      case Left(run) =>
        import spark.implicits._
        val schema = DataType.fromJson(run.schemaJson).asInstanceOf[StructType]
        val versionByFile = run.pairs.map { case (f, v) => (fileKey(f), v) }
          .toDF("__fk", "version")
        Some(spark.read.schema(schema)
          .parquet(run.pairs.map { case (f, _) => root.resolve(f).toString }: _*)
          .withColumn("__fk", concat_ws("/", slice(split(input_file_name(), "/"), -2, 2)))
          .join(broadcast(versionByFile), "__fk")
          .drop("__fk")
          .withColumn("change_type", lit("insert")))
      case Right((from, to)) =>
        Some(changesBetween(spark, from, to).withColumn("version", lit(to.version)))
    }
    if (frames.isEmpty) {
      val schema = DataType.fromJson(range.last.schemaJson).asInstanceOf[StructType]
        .add("change_type", org.apache.spark.sql.types.StringType)
        .add("version", org.apache.spark.sql.types.LongType, nullable = false)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    } else frames.reduce(_.unionByName(_))
  }

  /** Delta's `table_changes(tbl, start, end)` surface over [[changesFeed]]:
    * the per-commit row deltas of versions `[startVersion, endVersion]`
    * (both INCLUSIVE, Delta's contract), each row tagged with Delta's CDF
    * metadata columns — `_change_type`, `_commit_version`,
    * `_commit_timestamp`. `startVersion = 0` includes the root commit's
    * rows as inserts (a feed interval is exclusive below, so v0 is the
    * snapshot itself). Same scale shape as the feed: append-only runs
    * collapse to one delta-file scan, rewrites diff only symmetric file
    * differences, and the timestamp attaches via ONE broadcast of the
    * interval's O(span) version→ts metadata — never a per-row lineage
    * walk. SQL-text form: `SELECT … FROM table_changes('[branch@]path',
    * s [, e])` via [[graft.plans.TableChangesRule]] (extensions
    * sessions); this method is the extensions-free door. */
  def tableChanges(spark: SparkSession, branch: String, startVersion: Long,
                   endVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, timestamp_millis}
    import spark.implicits._
    require(startVersion >= 0,
      s"table_changes: startVersion must be >= 0, got $startVersion")
    require(endVersion >= startVersion,
      s"table_changes: need startVersion <= endVersion, got [$startVersion, $endVersion]")
    // the feed plumbing tags rows with unprefixed `change_type`/`version`
    // columns ([[changesFeed]]'s documented output) and this method joins
    // on `__ts_ms` — a DATA column with one of those names would be
    // silently clobbered and then dropped from the output. Refuse loudly
    // (Delta likewise reserves its CDF column names).
    locally {
      val schema = DataType.fromJson(
        resolveVersion(branch, endVersion).schemaJson).asInstanceOf[StructType]
      val clash = schema.fieldNames.filter(
        Set("change_type", "version", "__ts_ms").contains)
      require(clash.isEmpty,
        s"table_changes: column name(s) ${clash.mkString(", ")} collide with " +
          "the change-feed metadata columns — rename the column(s) to read " +
          "this table's changes")
    }
    val feed =
      if (startVersion == 0) {
        val c0 = resolveVersion(branch, 0L)
        val v0 = readCommit(spark, c0)
          .withColumn("change_type", lit("insert"))
          .withColumn("version", lit(0L))
        if (endVersion == 0) v0
        else v0.unionByName(changesFeed(spark, branch, 0L, endVersion),
          allowMissingColumns = true) // mergeSchema evolution inside the interval
      } else changesFeed(spark, branch, startVersion - 1, endVersion)
    // version → commit millis for the interval: [max(start-1,0), end] is
    // already the metadata the feed walked; one tiny broadcast frame
    val tsByVersion = commitRange(branch, math.max(startVersion - 1, 0L), endVersion)
      .filter(_.version >= startVersion || startVersion == 0)
      .map(c => (c.version, c.ts)).toDF("version", "__ts_ms")
    val rowCols = feed.columns.filterNot(Set("change_type", "version")).toIndexedSeq
    feed.join(broadcast(tsByVersion), Seq("version"), "left")
      .select(rowCols.map(col) ++ Seq(
        col("change_type").as("_change_type"),
        col("version").as("_commit_version"),
        timestamp_millis(col("__ts_ms")).as("_commit_timestamp")): _*)
  }

  /** Commit history of a branch, newest first: (version, message, ts, n_files). */
  def history(spark: SparkSession, branch: String): DataFrame = {
    import spark.implicits._
    lineage(branch).map(c => (c.version, c.message, c.ts, c.files.size))
      .toDF("version", "message", "ts", "n_files")
  }

  /** Small-file compaction: rewrite the head snapshot into `numFiles` files
    * as a NEW version (history intact — old versions still time-travel, and
    * vacuum reclaims the small files once they fall off the retention
    * horizon). The at-scale answer to streaming/append write amplification. */
  /** Run a LAYOUT-ONLY commit (compaction, z-order) with Delta OPTIMIZE's
    * concurrency rule: losing the version-slot race to a concurrent writer is
    * not an error, because a layout rewrite commutes with any committed
    * change — the right response is to re-read the NEW head (picking up the
    * winner's rows) and rewrite again. Bounded retries: maintenance must
    * never starve out real writers, so after `maxRetries` losses the caller
    * gets the plain conflict. `attempt` MUST re-read the head each call —
    * that is the rebase. */
  private def retryLayoutCommit(maxRetries: Int)(attempt: () => Commit): Commit = {
    var lost = 0
    while (true) {
      try return attempt()
      catch {
        case e: java.util.ConcurrentModificationException =>
          lost += 1
          if (lost > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def compact(spark: SparkSession, branch: String = "main", numFiles: Int = 1,
              statsCols: Seq[String] = Nil, maxRetries: Int = 3): Commit =
    retryLayoutCommit(maxRetries) { () =>
      write(read(spark, branch).repartition(numFiles), branch,
        s"compact to $numFiles files", statsCols = statsCols, dataChange = false)
    }

  /** Delta `OPTIMIZE ZORDER BY (a, b, …)`: rewrite the head snapshot
    * sorted by the Morton interleave of 1..n numeric columns
    * ([[graft.ops.Scale.zValueN]]) as a NEW version with fresh per-file
    * stats on EVERY clustered column — each file then covers a small
    * hyper-rectangle of the clustered space, so [[readWhere]] range
    * probes on ANY of them prune files. Rows are untouched (layout-only
    * commit, history intact); the normalization bounds come from one
    * bounded driver action. */
  def compactZorder(spark: SparkSession, branch: String, cols: Seq[String],
                    numFiles: Int, maxRetries: Int): Commit =
    retryLayoutCommit(maxRetries) { () =>
      write(graft.ops.Scale.zorderLayout(read(spark, branch), cols, numFiles),
        branch, s"optimize zorder by (${cols.mkString(", ")})", statsCols = cols,
        dataChange = false)
    }

  def compactZorder(spark: SparkSession, branch: String, colA: String,
                    colB: String, numFiles: Int = 8, maxRetries: Int = 3): Commit =
    compactZorder(spark, branch, Seq(colA, colB), numFiles, maxRetries)

  /** Delta `OPTIMIZE … WHERE` (r19): SELECTIVE compaction — only the files
    * whose commit-log stats windows intersect `where` (the same
    * [[statsCandidates]] test delete/update prune with) are rewritten,
    * coalesced into `numFiles` (z-ordered when `zorderCols` is set); every
    * other file carries with its IDENTITY, stats, and bloom entries
    * untouched. On a petabyte table this compacts yesterday's hot
    * partition's small files without touching the cold 99%, and the
    * file-granular CDC diff over the interval cancels exactly (rows are
    * unchanged). Touched files are read with their deletion vectors
    * APPLIED, so the rewrite also materializes away the region's DVs;
    * untouched files keep theirs. A predicate whose stats provably match
    * no file (or a stats-free table where nothing can be excluded — then
    * everything rewrites, like bare OPTIMIZE) behaves accordingly;
    * matching zero files is a no-op returning the unchanged head. Retries
    * through the same lost-race-rebase rule as [[compact]]. */
  def compactWhere(spark: SparkSession, branch: String, where: String,
                   numFiles: Int = 1, zorderCols: Seq[String] = Nil,
                   maxRetries: Int = 3): Commit =
    retryLayoutCommit(maxRetries) { () =>
      guardWritable(branch)
      val parent = head(branch).getOrElse(
        throw new IllegalArgumentException(s"no such branch: $branch"))
      val touchedSet = statsCandidates(parent, where).toSet
      if (touchedSet.isEmpty) parent
      else synchronized {
        val (touched, untouched) = parent.files.partition(touchedSet.contains)
        val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
        val rows = readCommit(spark, parent.copy(files = touched))
        val layout =
          if (zorderCols.nonEmpty) graft.ops.Scale.zorderLayout(rows, zorderCols, numFiles)
          else rows.repartition(numFiles)
        val newFiles = writeDataFiles(layout, branch, parent.version + 1,
          mapTo = Some(schema))
        val statCols = (parent.stats.values.flatMap(_.keys) ++
          parent.strStats.values.flatMap(_.keys) ++ zorderCols).toSeq.distinct
          .filter(schema.fieldNames.contains)
        val (newStats, newStrStats, newNullStats) =
          if (statCols.isEmpty || newFiles.isEmpty)
            (Map.empty[String, Map[String, (Double, Double)]],
              Map.empty[String, Map[String, (String, String)]],
              Map.empty[String, Map[String, Long]])
          else collectFileStats(spark, newFiles, statCols, schema)
        val untouchedSet = untouched.toSet
        val (bCols, bFiles, bLegacy) = cowBloom(spark, parent, branch, untouchedSet, newFiles, schema)
        publish(branch, Some(parent),
          s"optimize where ($where)" +
            (if (zorderCols.nonEmpty) s" zorder by (${zorderCols.mkString(", ")})" else ""),
          schema, untouched ++ newFiles,
          parent.stats.view.filterKeys(untouchedSet).toMap ++ newStats,
          strStats = parent.strStats.view.filterKeys(untouchedSet).toMap ++ newStrStats,
          nullStats = parent.nullStats.view.filterKeys(untouchedSet).toMap ++ newNullStats,
          // untouched files keep their deletion vectors; the touched
          // region's DVs were applied during the rewrite (dead entries stay
          // harmless)
          dvFiles = parent.dvFiles,
          bloomStats = bLegacy, bloomCols = bCols, bloomFiles = bFiles,
          dataChange = false)
      }
    }

  /** V10 upload/rm analog: raw object ops under the table root (staging dir). */
  /** Export `branch`'s lineage as a Delta `_delta_log` INSIDE the table root
    * — zero-copy protocol interop ([[DeltaLogWriter]]): the add actions
    * reference this table's existing parquet, so after the export the root
    * doubles as a Delta table readable at every version through
    * [[DeltaLogReader]] (or stock delta-spark — protocol v1, upgraded in
    * place to v3 `deletionVectors` at the first version whose native MOR
    * delete vectors are exported as Delta DV descriptors). Incremental and
    * idempotent. Returns the newest exported version. */
  def exportDeltaLog(branch: String = "main", changeDataFeed: Boolean = false,
                     checkpointInterval: Option[Int] = None): Long =
    DeltaLogWriter.exportDeltaLog(this, branch, changeDataFeed, checkpointInterval)

  /** Reclaim export artifacts (DV bins, cdc parquet, tmp dirs) no exported
    * version references — the export-side companion of [[vacuum]], with the
    * same stale-horizon discipline. See [[DeltaLogWriter.vacuumExport]]. */
  def vacuumDeltaExport(spark: SparkSession,
                        olderThanMs: Long = VersionedTable.DefaultStaleSlotMs): Int =
    DeltaLogWriter.vacuumExport(spark, root.toString, olderThanMs)

  def putObject(rel: String, content: String): Unit =
    store.put(root.resolve(rel), content)
  def getObject(rel: String): String = store.read(root.resolve(rel))
  def rmObject(rel: String): Boolean = store.delete(root.resolve(rel))
}

object VersionedTable {
  /** [[Commit.props]] key namespace for CHECK constraints — the same keying
    * shape as Delta's `delta.constraints.<name>` configuration entries. */
  private[graft] val CheckConstraintPrefix = "constraint.check."

  /** A commit's CHECK constraints: lowercase name → predicate SQL. */
  def checkConstraints(c: Commit): Map[String, String] =
    c.props.collect {
      case (k, v) if k.startsWith(CheckConstraintPrefix) =>
        k.stripPrefix(CheckConstraintPrefix) -> v
    }

  /** Static admission rules for a CHECK predicate, against a SCHEMA alone
    * (no table needed — CREATE TABLE pre-flights its inline constraints
    * with this BEFORE publishing anything, so a rejected predicate leaves
    * no half-created table). The predicate must analyze, be boolean, and
    * be ROW-LOCAL + DETERMINISTIC (Delta's rule): an aggregate/window
    * would analyze but wedge every later WRITE (no aggregates in a
    * filter), a non-deterministic one would make "which rows pass" depend
    * on the run, and a subquery's answer drifts with other tables. */
  private[graft] def validateCheckPredicate(spark: org.apache.spark.sql.SparkSession,
                                            schema: org.apache.spark.sql.types.StructType,
                                            predicateSql: String): Unit = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val probe = empty.select(org.apache.spark.sql.functions.expr(predicateSql).as("p"))
    require(probe.schema.head.dataType == org.apache.spark.sql.types.BooleanType,
      s"CHECK predicate must be boolean, got ${probe.schema.head.dataType.simpleString}: " +
        predicateSql)
    val cond = empty
      .where(org.apache.spark.sql.functions.expr(predicateSql)) // throws on aggregates
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.getOrElse(throw new IllegalStateException(
        s"CHECK probe lost its Filter node for: $predicateSql"))
    require(cond.deterministic,
      s"CHECK predicate must be deterministic (no rand()/uuid()/…): $predicateSql")
    require(cond.collectFirst {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s
    }.isEmpty,
      s"CHECK predicate must not contain a subquery " +
        s"(its answer would drift with other tables): $predicateSql")
  }

  /** Physical row count from a parquet FOOTER — no data pages touched. Used
    * once per new file at publish time to stock the commit log's
    * [[Commit.rowCounts]]; None (unreadable/corrupt footer) just omits the
    * entry rather than failing the commit. */
  /** One shared Hadoop Configuration for local footer reads: constructing a
    * fresh one per file re-parses core-default.xml out of the hadoop jar
    * (~50 ms of driver time PER NEW FILE at publish — jstack-confirmed as
    * the dominant commit-path driver cost before r21). Immutable use only. */
  private[vt] lazy val footerConf = new org.apache.hadoop.conf.Configuration()

  /** Footer metadata cache, keyed by (path, size, mtime) — data files are
    * immutable once written (UUID'd directory names), but a few artifacts
    * (cdc files) reuse deterministic names across re-exports, so the key
    * carries the stat fingerprint. Failures are NOT cached. Shared by
    * publish's rowCounts and the footer stats fast path, so one commit
    * reads each new file's footer at most once. */
  private val footerMetaCache =
    new BoundedCache[(String, Long, Long),
      org.apache.parquet.hadoop.metadata.ParquetMetadata](4096)

  private[vt] def footerMeta(p: Path)
      : Option[org.apache.parquet.hadoop.metadata.ParquetMetadata] =
    try Some(footerMetaCache.get((p.toString, Files.size(p),
      Files.getLastModifiedTime(p).toMillis)) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), footerConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter finally r.close()
    }) catch { case scala.util.control.NonFatal(_) => None }

  private[vt] def footerRowCount(p: Path): Option[Long] =
    footerMeta(p).map { m =>
      var s = 0L; m.getBlocks.forEach(b => s += b.getRowCount); s
    }

  /** Exact [min, max] of a primitive-numeric top-level column from one
    * parquet file's FOOTER (r21, guide §6) — driver-local cached metadata,
    * zero data pages. Outer None = not provable from the footer (missing
    * column, dropped/NaN stats, decimal/non-primitive physical type);
    * Some(None) = provably zero non-null values; Some(Some((lo, hi)))
    * otherwise. Callers that only need APPROXIMATE bounds (bucket
    * balancing) fall back to a sketch pass on outer None. */
  private[graft] def footerDoubleRange(p: Path, colName: String)
      : Option[Option[(Double, Double)]] = try {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    footerMeta(p).flatMap { m =>
      var lo = Double.MaxValue
      var hi = -Double.MaxValue
      var any = false
      val it = m.getBlocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        val cit = b.getColumns.iterator()
        var found = false
        while (cit.hasNext) {
          val cc = cit.next()
          if (cc.getPath.size() == 1 && cc.getPath.toDotString == colName) {
            found = true
            val st = cc.getStatistics
            if (st == null || !st.isNumNullsSet) return None
            if (cc.getValueCount - st.getNumNulls > 0) {
              if (!st.hasNonNullValue) return None
              // decimals store UNSCALED ints — not the logical value domain
              if (cc.getPrimitiveType.getLogicalTypeAnnotation
                  .isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation])
                return None
              val (mn, mx) = cc.getPrimitiveType.getPrimitiveTypeName match {
                case PrimitiveTypeName.INT32 =>
                  (st.genericGetMin.asInstanceOf[java.lang.Integer].toDouble,
                    st.genericGetMax.asInstanceOf[java.lang.Integer].toDouble)
                case PrimitiveTypeName.INT64 =>
                  (st.genericGetMin.asInstanceOf[java.lang.Long].toDouble,
                    st.genericGetMax.asInstanceOf[java.lang.Long].toDouble)
                case PrimitiveTypeName.FLOAT =>
                  (st.genericGetMin.asInstanceOf[java.lang.Float].toDouble,
                    st.genericGetMax.asInstanceOf[java.lang.Float].toDouble)
                case PrimitiveTypeName.DOUBLE =>
                  (st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue())
                case _ => return None
              }
              if (mn.isNaN || mx.isNaN) return None
              any = true
              if (mn < lo) lo = mn
              if (mx > hi) hi = mx
            }
          }
        }
        // a file without the column reads as all-null for it (pre-ADD
        // COLUMNS history): provably contributes nothing to min/max
      }
      Some(if (any) Some((lo, hi)) else None)
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** URL-safe base64 (no padding) — lets any protection pattern or branch
    * name serve as a metadata-store object name (also used by
    * [[graft.streaming.ChangeFeed]]'s per-branch cursor directories). */
  private[graft] def b64(s: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Branch-protection glob: `*` = any run of characters, `?` = exactly one;
    * everything else matches literally. Branch names never contain `/`, so no
    * path-segment subtleties exist. */
  private[vt] def globMatches(pattern: String, name: String): Boolean = {
    val sb = new StringBuilder("^")
    pattern.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append(".")
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    sb.append("$").toString.r.findFirstIn(name).isDefined
  }

  /** Recursively force every nullable flag true (Spark's `DataType.asNullable`
    * is package-private) so schema comparisons ignore nullability at any
    * nesting depth; field metadata is also dropped — only name+logical type
    * should participate in equality. */
  private[graft] def nullNormalized(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f => org.apache.spark.sql.types.StructField(
        f.name, nullNormalized(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(nullNormalized(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(nullNormalized(m.keyType), nullNormalized(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Age before an unpublished version slot counts as a crashed writer's
    * leftover and becomes vacuum-reclaimable (1 h — far beyond any single
    * commit's claim→publish window, which is one parquet write). */
  val DefaultStaleSlotMs: Long = 3600L * 1000

  /** Checkpoint cadence: every N commits a branch writes a version→commit
    * index (Delta writes parquet checkpoints every 10 commits for the same
    * reason — snapshot resolution must not replay the log). */
  val CheckpointInterval: Long = 10L

  /** Manifest-list cap (r20): when a commit would reference more manifests
    * than this, publish compacts them into one — so `open()` resolves a
    * snapshot in a bounded number of (cached) manifest reads no matter how
    * many commits the table accretes, and the compaction's O(files) rewrite
    * amortizes to O(files/MaxManifests) per commit (Iceberg's
    * rewrite-manifests cadence). */
  val MaxManifests: Int = 32

  /** Bounded lost-CAS rebases for a blind append (r20 OCC): enough that a
    * realistic concurrent-ingest burst serializes, small enough that a
    * stuck slot (crashed claimer) surfaces as a conflict quickly. */
  val MaxAppendRebase: Int = 5

  // ---- COLUMN MAPPING (r20: RENAME/DROP COLUMN as metadata-only commits) --
  //
  // Delta's name-mode column mapping, carried in the one place the engine
  // already versions per commit: StructField METADATA inside `schemaJson`.
  // A field whose metadata holds [[PhysKey]] reads and writes its data under
  // that PHYSICAL parquet column name; the field's `name` is the LOGICAL name
  // queries see. Physical names never change once assigned — a RENAME swaps
  // only the logical name (metadata-only commit, zero files rewritten), a
  // DROP removes the field (old files keep the bytes; explicit-schema reads
  // skip them). Because the mapping is NAME-only (types and positions are
  // untouched), the whole read-side translation is positional: read parquet
  // with the physical-named twin of the schema, then re-alias to logical.
  //
  // Commit-log key domains under mapping:
  //  - stats / strStats / nullStats / bloomCols: LOGICAL names as of their
  //    commit (a rename commit re-keys them — pure metadata), so every
  //    pruning and metadata-aggregate path keeps working untranslated;
  //  - bloom SIDECARS (immutable, shared across commits): PHYSICAL names —
  //    [[VersionedTable.bloomLookup]] translates the probe once;
  //  - parquet files: PHYSICAL names, uniformly (pre-mapping files ARE
  //    physical — logical == physical until the first rename/drop).

  /** StructField metadata key holding a column's physical parquet name. */
  val PhysKey = "graft.physicalName"

  /** Table-property flag marking column mapping ACTIVE: once a rename/drop
    * has happened, later ADDed columns need FRESH physical names — reusing
    * a dropped column's name would resurrect its bytes from old files. */
  val ColMapProp = "graft.columnMapping"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** Logical column name → physical parquet name (identity when unmapped,
    * and for pseudo-columns not in the schema). */
  def physName(schema: StructType, col: String): String =
    schema.fields.find(_.name == col).map(physicalName).getOrElse(col)

  /** The schema as parquet stores it: field names swapped to physical. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))))

  def hasColumnMapping(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** Attach a physical name to a field's metadata. */
  def withPhysical(f: StructField, phys: String): StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putString(PhysKey, phys).build())

  /** A fresh collision-proof physical name for a column ADDED while mapping
    * is active (Delta generates `col-<uuid>` for the same reason). */
  def freshPhysical(logical: String): String =
    s"${logical}_${java.util.UUID.randomUUID.toString.take(8)}"

  /** Rename a DataFrame's columns to their physical twins per `schema`
    * (identity when unmapped). Positional: only names change. */
  def toPhysical(df: org.apache.spark.sql.DataFrame,
                 schema: StructType): org.apache.spark.sql.DataFrame =
    if (!hasColumnMapping(schema)) df
    else df.toDF(df.schema.fieldNames.map(n => physName(schema, n)).toIndexedSeq: _*)

  /** Slot filename "<branch>-v<version>"; greedy branch group so hyphenated
    * branch names (even ones ending in "-vN") parse to the right (branch,
    * version) split — the version is always the TRAILING digits. */
  private[vt] val SlotRe = "(.+)-v(\\d+)".r

  /** Internal provenance-tag column names of the merge-on-read scan —
    * underscored to stay clear of user schemas. */
  private[vt] val FkCol = "__graft_fk"
  private[vt] val PosCol = "__graft_pos"

  /** File identity key: the last two path segments (uuid'd commit dir + part
    * file) — unique per file, scheme/root-independent, the same key the
    * scan-side `concat_ws("/", slice(split(file_path, "/"), -2, 2))`
    * computes. Used by change feeds and deletion vectors. */
  private[graft] def fileKey(rel: String): String = rel.split('/').takeRight(2).mkString("/")

  // ---- per-file bloom filter index (Delta's bloom filter index) ----------
  // Point-lookup skipping for scattered high-cardinality STRING keys
  // (uuid/doc_id), where min/max windows prune nothing. Geometry matches
  // ops/Scale's bloom recipe (16384 bits / 3 hashes ≈ 2% FPR at ~1500 keys
  // per file); hashing is Spark's own xxhash64 so the write-side expression
  // `pmod(xxhash64(lit(i), col), m)` and the driver-side probe below are
  // bit-identical by construction (xxhash64 CHAINS: the int literal's hash
  // becomes the seed for the column value).
  private[graft] val BloomMBits = 16384
  private[graft] val BloomKHashes = 3

  /** MERGE sources with at most this many DISTINCT keys per equi-key
    * column get bloom-probed against candidate files ([[mergeInto]]) —
    * the point-upsert shape; bigger sources rely on range pruning. */
  private[graft] val MaxMergeBloomProbes = 1024

  /** Column types a bloom index can hash with an exactly reproducible
    * probe image: strings (UTF-8 bytes) and integrals (the cast-to-long
    * twin — byte/short/int/long share one image). */
  private[graft] def bloomSupported(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.StringType ||
      dt == org.apache.spark.sql.types.ByteType ||
      dt == org.apache.spark.sql.types.ShortType ||
      dt == org.apache.spark.sql.types.IntegerType ||
      dt == org.apache.spark.sql.types.LongType

  private def bloomSeed(i: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    XxHash64Function.hash(i, org.apache.spark.sql.types.IntegerType, 42L)
  }

  /** The k bit positions of a STRING probe value — the driver-side twin of
    * the write-side `xxhash64(lit(i), col)` expression. */
  private[graft] def bloomPositions(value: String): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    Array.tabulate(BloomKHashes) { i =>
      val h = XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(value),
        org.apache.spark.sql.types.StringType, bloomSeed(i))
      java.lang.Math.floorMod(h, BloomMBits.toLong).toInt
    }
  }

  /** The k bit positions of an INTEGRAL probe value — the driver-side twin
    * of the write-side `xxhash64(lit(i), col.cast("long"))` expression
    * (one long image for byte/short/int/long key columns). */
  private[graft] def bloomPositionsLong(value: Long): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    Array.tabulate(BloomKHashes) { i =>
      val h = XxHash64Function.hash(value, org.apache.spark.sql.types.LongType,
        bloomSeed(i))
      java.lang.Math.floorMod(h, BloomMBits.toLong).toInt
    }
  }

  private def bitsHave(bits: Array[Byte], ps: Array[Int]): Boolean =
    ps.forall(p => (bits(p >> 3) & (1 << (p & 7))) != 0)

  /** Membership probe against a bloom bitset: false means PROVABLY absent
    * (prune the file); true means "maybe" (keep). */
  private[graft] def bloomMightContain(bits: Array[Byte], value: String): Boolean =
    bitsHave(bits, bloomPositions(value))

  private[graft] def bloomMightContainLong(bits: Array[Byte], value: Long): Boolean =
    bitsHave(bits, bloomPositionsLong(value))

  /** Unsigned UTF-8 byte comparison — the ordering Spark's string min/max
    * stats are computed under (UTF8String binary compare). */
  private[graft] def utf8Cmp(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
    a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** String stats are TRUNCATED to this many code points in the commit log
    * (Delta truncates at 32): a stats column over document-length text must
    * not stream whole documents into per-file metadata — at object-store
    * scale the log itself becomes the bottleneck. Truncated bounds stay
    * SOUND for pruning (min → prefix, a valid lower bound; max → the
    * prefix's successor padded maximal, a valid upper bound) and
    * [[VersionedTable.minMaxStringFromStats]] refuses to answer from any
    * stat at the limit, so exact MIN/MAX falls back to the scan. */
  private[graft] val StatsStringMaxLen = 64

  /** The smallest string greater than every `p`-prefixed string: last
    * non-maximal code point incremented (surrogate gap D800–DFFF skipped —
    * not scalar values), maximal tail dropped; None when no finite
    * successor exists (empty / all-U+10FFFF). UTF-8 byte order is
    * code-point monotone, so the bound is exact under [[utf8Cmp]]. */
  private[graft] def prefixSuccessor(p: String): Option[String] = {
    val cps = p.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) == 0x10FFFF) i -= 1
    if (i < 0) None
    else {
      val next = if (cps(i) + 1 == 0xD800) 0xE000 else cps(i) + 1
      Some(new String(cps, 0, i) + new String(Character.toChars(next)))
    }
  }

  private def cpPrefix(s: String, n: Int): String =
    s.substring(0, s.offsetByCodePoints(0, n))
  private[vt] def overLimit(s: String): Boolean =
    s.codePointCount(0, s.length) >= StatsStringMaxLen

  /** Commit-log form of a string MIN stat: the value itself when short, its
    * [[StatsStringMaxLen]]-code-point prefix otherwise (a prefix is ≤ the
    * original bytewise — still a sound lower bound). */
  private[graft] def statsLower(s: String): String =
    if (s.codePointCount(0, s.length) <= StatsStringMaxLen) s
    else cpPrefix(s, StatsStringMaxLen)

  /** Commit-log form of a string MAX stat: the value itself when short;
    * otherwise the truncation prefix's successor — greater than EVERY
    * string carrying that prefix, so a sound upper bound — padded with
    * U+10FFFF back to the limit so a truncated max is always recognizable
    * (≥ limit code points) by the metadata-MIN/MAX refusal check. The
    * pathological no-successor prefix keeps the full value (correct, just
    * unbounded — it cannot occur for real text). */
  private[graft] def statsUpper(s: String): String =
    if (s.codePointCount(0, s.length) <= StatsStringMaxLen) s
    else prefixSuccessor(cpPrefix(s, StatsStringMaxLen)) match {
      case Some(succ) =>
        val pad = StatsStringMaxLen - succ.codePointCount(0, succ.length)
        succ + (new String(Character.toChars(0x10FFFF)) * math.max(0, pad))
      case None => s
    }

  /** V1 `repo create`: initialize an empty table root. `store` carries the
    * control-plane metadata (default: local filesystem); the data plane under
    * `data/` is always the Spark-visible filesystem. */
  def create(root: String, store: MetaStore = LocalFsMetaStore): VersionedTable = {
    val p = Paths.get(root)
    store.ensurePrefix(p.resolve("commits"))
    store.ensurePrefix(p.resolve("refs"))
    Files.createDirectories(p.resolve("data"))
    store.put(p.resolve("_graft_table"), "versioned-table-v1")
    new VersionedTable(p, store)
  }

  def open(root: String, store: MetaStore = LocalFsMetaStore): VersionedTable = {
    val p = Paths.get(root)
    require(store.exists(p.resolve("_graft_table")) ||
        Files.isDirectory(p.resolve("commits")), // pre-marker tables on local FS
      s"not a versioned table root: $root")
    new VersionedTable(p, store)
  }

  /** V1 `repo delete`. */
  def delete(root: String): Unit = graft.Tables.deleteRecursively(Paths.get(root))
}
