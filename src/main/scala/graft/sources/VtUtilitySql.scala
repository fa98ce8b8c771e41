package graft.sources

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.vt.VersionedTable

/** Delta-parity UTILITY statements over versioned tables — the maintenance
  * surface Delta adds to SQL beyond DML, mapped onto the engine's own ops:
  *
  * {{{
  *   VACUUM vt.`path` [RETAIN n HOURS | RETAIN n VERSIONS] [DRY RUN]
  *   DESCRIBE HISTORY vt.`path`
  *   DESCRIBE DETAIL vt.`path`                   -- Delta's table-metadata row
  *   OPTIMIZE vt.`path` [FILES n] [WHERE pred] [ZORDER BY (a, b, …)]
  *                                               -- WHERE: selective (r19)
  *   RESTORE TABLE vt.`path` TO VERSION AS OF n
  *   RESTORE TABLE vt.`path` TO TAG 'name'
  *   CREATE BRANCH dev IN vt.`path` [FROM src]   -- lakeFS verbs as SQL
  *   DROP BRANCH dev IN vt.`path`
  *   CREATE TAG v1.0 IN vt.`path`                -- `branch@path` tags a side branch
  *   DROP TAG v1.0 IN vt.`path`
  *   MERGE BRANCH dev INTO main IN vt.`path`
  *   SHOW BRANCHES IN vt.`path`
  *   SHOW TAGS IN vt.`path`
  * }}}
  *
  * None of these parse in Spark's grammar, so [[GraftSqlParser]] offers
  * them to this mini-parser only AFTER the delegate throws — a statement
  * Spark understands can never be shadowed. Addressing matches the
  * catalog's (`[branch@]path`, catalog name resolved through the
  * `spark.sql.catalog.<name>` runtime conf). [[exec]] is the
  * extensions-free programmatic door. Semantics follow Delta where the
  * dials coincide: bare `VACUUM` retains 168 hours (Delta's default);
  * `RETAIN n VERSIONS` exposes the engine's count dial; `OPTIMIZE` is a
  * layout-only commit (bin-pack, or Morton z-order with fresh stats on
  * both columns) that retries through Delta's lost-race-rebase rule;
  * `RESTORE` publishes the target state as a NEW commit — history stays. */
object VtUtilitySql {

  sealed trait Stmt { def address: String }
  final case class VacuumStmt(address: String, retain: Option[(Double, String)],
                              dryRun: Boolean) extends Stmt
  final case class HistoryStmt(address: String) extends Stmt
  final case class DetailStmt(address: String) extends Stmt
  final case class OptimizeStmt(address: String, files: Option[Int],
                                zorder: Option[Seq[String]],
                                where: Option[String] = None) extends Stmt
  final case class RestoreStmt(address: String, to: Either[Long, String]) extends Stmt
  /** `RESTORE TABLE t TO TIMESTAMP AS OF '<ts>'` — epoch millis, ISO
    * instant, or session-zone date/date-time (the reader-option shapes). */
  final case class RestoreTsStmt(address: String, ts: String) extends Stmt
  final case class BranchStmt(address: String, op: String, name: String,
                              from: Option[String]) extends Stmt // create/drop
  final case class TagStmt(address: String, op: String, name: String) extends Stmt
  final case class MergeBranchStmt(address: String, from: String, into: String) extends Stmt
  final case class ShowBranchesStmt(address: String) extends Stmt
  final case class ShowTagsStmt(address: String) extends Stmt
  /** `ANALYZE t COMPUTE STATISTICS FOR COLUMNS (a, b) [RECOMPUTE]` /
    * `ANALYZE t COMPUTE BLOOM INDEX FOR COLUMNS (a, b)` — metadata-only
    * stats / bloom-index BACKFILL over the current snapshot (the adoption
    * path for tables ingested without statsCols/bloomCols). Deliberately
    * NOT Spark's `ANALYZE TABLE` spelling: that parses natively and would
    * never reach this mini-parser. */
  final case class AnalyzeStmt(address: String, cols: Seq[String],
                               bloom: Boolean, recompute: Boolean) extends Stmt

  /** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n]` — `address` is
    * the DESTINATION (the table the statement creates). A source in a
    * delta-lite catalog imports a FOREIGN DELTA table by reference. */
  final case class CloneStmt(address: String, source: String,
                             versionAsOf: Option[Long],
                             sourceIsDelta: Boolean = false) extends Stmt

  // one identifier shape everywhere: <catalog>.`<[branch@]path>`
  private val T = "(\\w+)\\.`([^`]+)`"
  private val VacuumRe: Regex =
    s"""(?is)\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+(HOURS|VERSIONS))?(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val HistoryRe: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*""".r
  private val DetailRe: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private val OptimizeRe: Regex =
    s"""(?is)\\s*OPTIMIZE\\s+$T(?:\\s+FILES\\s+(\\d+))?(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*""".r
  private val RestoreVerRe: Regex =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTagRe: Regex =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+$T\\s+TO\\s+TAG\\s+'([^']+)'\\s*;?\\s*""".r
  private val RestoreTsRe: Regex =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+$T\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  // branch/tag lifecycle — the reference's lakeFS verbs as statements
  private val CreateBranchRe: Regex =
    s"""(?is)\\s*CREATE\\s+BRANCH\\s+(\\w+)\\s+IN\\s+$T(?:\\s+FROM\\s+(\\w+))?\\s*;?\\s*""".r
  private val DropBranchRe: Regex =
    s"""(?is)\\s*DROP\\s+BRANCH\\s+(\\w+)\\s+IN\\s+$T\\s*;?\\s*""".r
  private val CreateTagRe: Regex =
    s"""(?is)\\s*CREATE\\s+TAG\\s+([\\w.-]+)\\s+IN\\s+$T\\s*;?\\s*""".r
  private val DropTagRe: Regex =
    s"""(?is)\\s*DROP\\s+TAG\\s+([\\w.-]+)\\s+IN\\s+$T\\s*;?\\s*""".r
  private val MergeBranchRe: Regex =
    s"""(?is)\\s*MERGE\\s+BRANCH\\s+(\\w+)\\s+INTO\\s+(\\w+)\\s+IN\\s+$T\\s*;?\\s*""".r
  private val ShowBranchesRe: Regex =
    s"""(?is)\\s*SHOW\\s+BRANCHES\\s+IN\\s+$T\\s*;?\\s*""".r
  private val ShowTagsRe: Regex =
    s"""(?is)\\s*SHOW\\s+TAGS\\s+IN\\s+$T\\s*;?\\s*""".r
  private val AnalyzeStatsRe: Regex =
    s"""(?is)\\s*ANALYZE\\s+$T\\s+COMPUTE\\s+STATISTICS\\s+FOR\\s+COLUMNS\\s*\\(([^)]+)\\)(\\s+RECOMPUTE)?\\s*;?\\s*""".r
  private val AnalyzeBloomRe: Regex =
    s"""(?is)\\s*ANALYZE\\s+$T\\s+COMPUTE\\s+BLOOM\\s+INDEX\\s+FOR\\s+COLUMNS\\s*\\(([^)]+)\\)\\s*;?\\s*""".r
  // Delta's zero-copy clone verb; Spark's grammar has no CLONE clause, so
  // the whole statement arrives here after the native parse throws
  private val CloneRe: Regex =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$T(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*""".r

  private def splitCols(raw: String): Seq[String] =
    raw.split(',').toSeq.map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty)

  private def isVt(spark: SparkSession, catalog: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$catalog")
      .contains(classOf[VtCatalog].getName)

  private def isDlite(spark: SparkSession, catalog: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$catalog")
      .contains(classOf[DeltaLiteCatalog].getName)

  /** Recognize a utility statement over a vt-catalog table; None lets the
    * caller surface the original parse error. */
  def parse(spark: SparkSession, sql: String): Option[Stmt] = sql match {
    case VacuumRe(cat, addr, n, unit, dry) if isVt(spark, cat) =>
      Some(VacuumStmt(addr, Option(n).map(v => (v.toDouble, unit.toUpperCase)),
        dry != null))
    case HistoryRe(cat, addr) if isVt(spark, cat) => Some(HistoryStmt(addr))
    case DetailRe(cat, addr) if isVt(spark, cat) => Some(DetailStmt(addr))
    case OptimizeRe(cat, addr, files, where, zcols) if isVt(spark, cat) =>
      Some(OptimizeStmt(addr, Option(files).map(_.toInt),
        Option(zcols).map(_.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)),
        Option(where).map(_.trim).filter(_.nonEmpty)))
    case RestoreVerRe(cat, addr, v) if isVt(spark, cat) =>
      Some(RestoreStmt(addr, Left(v.toLong)))
    case RestoreTagRe(cat, addr, tag) if isVt(spark, cat) =>
      Some(RestoreStmt(addr, Right(tag)))
    case RestoreTsRe(cat, addr, ts) if isVt(spark, cat) =>
      Some(RestoreTsStmt(addr, ts))
    case CreateBranchRe(name, cat, addr, from) if isVt(spark, cat) =>
      Some(BranchStmt(addr, "create", name, Option(from)))
    case DropBranchRe(name, cat, addr) if isVt(spark, cat) =>
      Some(BranchStmt(addr, "drop", name, None))
    case CreateTagRe(name, cat, addr) if isVt(spark, cat) =>
      Some(TagStmt(addr, "create", name))
    case DropTagRe(name, cat, addr) if isVt(spark, cat) =>
      Some(TagStmt(addr, "drop", name))
    case MergeBranchRe(from, into, cat, addr) if isVt(spark, cat) =>
      Some(MergeBranchStmt(addr, from, into))
    case ShowBranchesRe(cat, addr) if isVt(spark, cat) =>
      Some(ShowBranchesStmt(addr))
    case ShowTagsRe(cat, addr) if isVt(spark, cat) => Some(ShowTagsStmt(addr))
    case AnalyzeStatsRe(cat, addr, cols, rec) if isVt(spark, cat) =>
      Some(AnalyzeStmt(addr, splitCols(cols), bloom = false, recompute = rec != null))
    case AnalyzeBloomRe(cat, addr, cols) if isVt(spark, cat) =>
      Some(AnalyzeStmt(addr, splitCols(cols), bloom = true, recompute = false))
    case CloneRe(dstCat, dst, srcCat, src, v)
        if isVt(spark, dstCat) && (isVt(spark, srcCat) || isDlite(spark, srcCat)) =>
      Some(CloneStmt(dst, src, Option(v).map(_.toLong),
        sourceIsDelta = isDlite(spark, srcCat)))
    case _ => None
  }

  def schemaOf(stmt: Stmt): StructType = stmt match {
    case _: VacuumStmt => StructType(Seq(StructField("reclaimed", LongType, nullable = false)))
    case _: HistoryStmt => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("message", StringType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("n_files", IntegerType, nullable = false)))
    case _: DetailStmt => StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("location", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("num_files", IntegerType, nullable = false),
      // nullable: a pre-fileSizes history file that no longer stats cleanly
      // surfaces size as UNKNOWN (null), never a silent under-report
      StructField("size_bytes", LongType, nullable = true),
      StructField("created_at", LongType, nullable = false),
      StructField("last_modified", LongType, nullable = false)))
    case _: OptimizeStmt => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("n_files", IntegerType, nullable = false)))
    case _: RestoreStmt | _: RestoreTsStmt =>
      StructType(Seq(StructField("version", LongType, nullable = false)))
    case _: BranchStmt | _: TagStmt =>
      StructType(Seq(StructField("done", StringType, nullable = false)))
    case _: MergeBranchStmt =>
      StructType(Seq(StructField("version", LongType, nullable = false)))
    case _: ShowBranchesStmt => StructType(Seq(
      StructField("branch", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case _: ShowTagsStmt => StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case _: CloneStmt => StructType(Seq(
      StructField("source_version", LongType, nullable = false),
      StructField("n_files", IntegerType, nullable = false)))
    case _: AnalyzeStmt => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("n_files", IntegerType, nullable = false)))
  }

  def run(spark: SparkSession, stmt: Stmt): Seq[Row] = {
    val (branch, path) = VtAddress.split(stmt.address)
    // CLONE creates its destination — the shared open() below would refuse
    stmt match {
      case CloneStmt(_, source, versionAsOf, sourceIsDelta) =>
        // resolve the source version ONCE and pin the clone to it — a
        // second head/log read after the clone could disagree with the
        // snapshot actually cloned under a concurrent writer
        if (sourceIsDelta) {
          val srcPath = SourcePaths.local(source) // delta tables have no branches
          val srcVersion = versionAsOf.getOrElse(
            graft.vt.DeltaLogReader.latestVersion(srcPath))
          require(srcVersion >= 0, s"not a Delta table (no _delta_log): $srcPath")
          val dst = VersionedTable.create(SourcePaths.local(path))
          val c = dst.shallowCloneFromDelta(spark, srcPath, Some(srcVersion), branch)
          return Seq(Row(srcVersion, c.files.size))
        }
        val (srcBranch, srcPath) = VtAddress.split(source)
        val src = VersionedTable.open(SourcePaths.local(srcPath))
        val srcVersion = versionAsOf.getOrElse(src.head(srcBranch)
          .getOrElse(throw new IllegalArgumentException(
            s"no such branch on clone source: $srcBranch")).version)
        val dst = VersionedTable.create(SourcePaths.local(path))
        val c = dst.shallowCloneFrom(src, srcBranch, Some(srcVersion), branch,
          s"CREATE TABLE SHALLOW CLONE $source VERSION AS OF $srcVersion")
        return Seq(Row(srcVersion, c.files.size))
      case _ => ()
    }
    val vt = VersionedTable.open(SourcePaths.local(path))
    stmt match {
      case VacuumStmt(_, retain, dry) =>
        val reclaimed = retain match {
          case Some((n, "VERSIONS")) =>
            require(n == n.toInt && n >= 1, s"RETAIN $n VERSIONS: need a positive integer")
            vt.vacuum(retainLast = n.toInt, dryRun = dry)
          case Some((n, _)) => // HOURS — DRY RUN counts without deleting
            vt.vacuumRetainHours(n, dryRun = dry)
          case None => // Delta's default retention window
            vt.vacuumRetainHours(168.0, dryRun = dry)
        }
        Seq(Row(reclaimed.toLong))
      case HistoryStmt(_) =>
        vt.history(spark, branch).collect().toSeq // O(versions) metadata rows
      case DetailStmt(_) =>
        // Delta's DESCRIBE DETAIL row, from commit metadata alone on the
        // common path (sizes live in the log; O(history) commit-json reads
        // for the created_at bound). A pre-`fileSizes` HISTORY file pays a
        // real Files.size (bounded: legacy files only), and a legacy file
        // that no longer stats cleanly makes size_bytes NULL — unknown must
        // surface as unknown, never as a silent under-report.
        val h = vt.head(branch).getOrElse(
          throw new IllegalArgumentException(s"no such branch: $branch"))
        val lin = vt.lineage(branch)
        val sizes = h.files.map { f =>
          h.fileSizes.get(f).orElse {
            val p = vt.root.resolve(f)
            try if (java.nio.file.Files.exists(p))
              Some(java.nio.file.Files.size(p)) else None
            catch { case _: java.io.IOException => None }
          }
        }
        val sizeBytes: Any =
          if (sizes.forall(_.isDefined)) sizes.flatten.sum else null
        Seq(Row("vt", vt.root.toString, h.version, h.files.size,
          sizeBytes, lin.last.ts, h.ts))
      case OptimizeStmt(_, files, zorder, where) =>
        // WHERE → selective compaction of only the predicate's files
        // (Delta's OPTIMIZE … WHERE); the bare forms rewrite the snapshot
        val c = (where, zorder) match {
          case (Some(w), z) => vt.compactWhere(spark, branch, w,
            numFiles = files.getOrElse(if (z.isDefined) 8 else 1),
            zorderCols = z.getOrElse(Nil))
          case (None, Some(cols)) => vt.compactZorder(spark, branch, cols,
            numFiles = files.getOrElse(8), maxRetries = 3)
          case (None, None) => vt.compact(spark, branch, numFiles = files.getOrElse(1))
        }
        Seq(Row(c.version, c.files.size))
      case RestoreStmt(_, Left(version)) =>
        val c = vt.revert(branch, version, s"RESTORE TO VERSION AS OF $version")
        Seq(Row(c.version))
      case RestoreStmt(_, Right(tag)) =>
        Seq(Row(vt.restoreTag(tag, branch).version))
      case RestoreTsStmt(_, ts) =>
        Seq(Row(vt.restoreToTimestamp(
          SourcePaths.parseTimestamp(spark, ts), branch).version))
      case BranchStmt(_, "create", name, from) =>
        vt.createBranch(name, from.getOrElse(branch))
        Seq(Row(s"branch $name created"))
      case BranchStmt(_, _, name, _) =>
        vt.deleteBranch(name)
        Seq(Row(s"branch $name dropped"))
      case TagStmt(_, "create", name) =>
        vt.createTag(name, branch) // `branch@path` addressing tags a side branch
        Seq(Row(s"tag $name created"))
      case TagStmt(_, _, name) =>
        if (!vt.deleteTag(name)) throw new IllegalArgumentException(s"no such tag: $name")
        Seq(Row(s"tag $name dropped"))
      case MergeBranchStmt(_, from, into) =>
        Seq(Row(vt.merge(from, into).version))
      case ShowBranchesStmt(_) =>
        vt.branches.sorted.map(b => Row(b, vt.head(b).map(_.version).getOrElse(-1L)))
      case ShowTagsStmt(_) =>
        // resolve versions tolerantly: a tag dropped between the listing and
        // the commit read just vanishes from the result (TOCTOU-safe), it
        // must not fail the whole statement; name-sorted like SHOW BRANCHES
        vt.tags.sortBy(_._1).flatMap { case (name, _) =>
          try Some(Row(name, vt.tagCommit(name).version))
          catch { case scala.util.control.NonFatal(_) => None }
        }
      case AnalyzeStmt(_, cols, bloom, recompute) =>
        val c =
          if (bloom) vt.computeBloomIndex(spark, cols, branch)
          else vt.computeStats(spark, cols, branch, recompute = recompute)
        Seq(Row(c.version, c.files.size))
      case _: CloneStmt => throw new IllegalStateException("CLONE handled above")
    }
  }

  /** Extensions-free programmatic door: parse + run + results as a
    * DataFrame (the same rows `spark.sql` returns in extension sessions). */
  def exec(spark: SparkSession, sql: String): DataFrame = {
    val stmt = parse(spark, sql).getOrElse(throw new IllegalArgumentException(
      s"not a vt utility statement (VACUUM / DESCRIBE HISTORY / OPTIMIZE / RESTORE TABLE): $sql"))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(run(spark, stmt).asJava, schemaOf(stmt))
  }
}

/** Execution node for an intercepted utility statement: output attributes
  * come from the statement's result schema so `spark.sql(...)` returns
  * real rows (VACUUM's reclaim count, DESCRIBE HISTORY's lineage, …). */
case class VtUtilityCommand(stmt: VtUtilitySql.Stmt, sqlText: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = VtUtilitySql.schemaOf(stmt).fields.toIndexedSeq
    .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    VtUtilitySql.run(sparkSession, stmt)
  override def simpleString(maxFields: Int): String =
    s"VtUtilityCommand ${sqlText.linesIterator.mkString(" ").take(120)}"
}
