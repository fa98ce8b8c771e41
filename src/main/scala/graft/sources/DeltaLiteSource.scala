package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.SessionShim
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.vt.{DeltaLogReader, VersionedTable}
import graft.vt.DeltaLogReader.{DeltaSnapshot, FileEntry}

/** Per-file survival of a FOREIGN Delta snapshot's metadata against a set
  * of [[StatsWindows]] — shared by [[DeltaFileIndex]] (data-skipping
  * during native scan planning) and [[DeltaLiteMorRelation]] (the same
  * skipping under the fallback, where windows on PARTITION columns test
  * the add action's `partitionValues` instead of stats — conservative is
  * safe there because the fallback re-applies every pushed filter as an
  * ordinary row predicate). Stats keys are PHYSICAL names in
  * column-mapped tables; both name forms are consulted. Files without
  * stats for a bounded column are conservatively kept. */
private[sources] final class DeltaStatsTester(schema: StructType,
                                              partitionColumns: Seq[String]) {
  private val mapper = new ObjectMapper()
  // logical -> on-disk key for stats/partitionValues lookups: PHYSICAL
  // names in column-mapped tables, the logical name otherwise
  private val physByLogical: Map[String, String] =
    schema.fields.map(f => f.name -> DeltaLogReader.physName(f)).toMap
  def physKey(logical: String): String = physByLogical.getOrElse(logical, logical)

  /** Partition columns by their LOGICAL names (metaData.partitionColumns
    * may carry either form in a mapped table). */
  val partNames: Set[String] = schema.fields
    .filter(f => partitionColumns.contains(f.name) ||
      partitionColumns.contains(DeltaLogReader.physName(f)))
    .map(_.name).toSet

  def statsSurvive(stats: Option[String],
                   bounds: List[StatsWindows.Window],
                   nulls: List[(String, Boolean)]): Boolean =
    stats match {
      case None => true
      case Some(s) =>
        val node = mapper.readTree(s)
        val mins = node.path("minValues"); val maxs = node.path("maxValues")
        val nullCounts = node.path("nullCount")
        val numRecords = node.path("numRecords")
        nulls.forall { case (colName, wantNull) =>
          val nc = nullCounts.path(physKey(colName))
          if (!nc.isNumber) true
          else if (wantNull) nc.asLong() > 0L // IS NULL: skip zero-null files
          else !numRecords.isNumber || nc.asLong() < numRecords.asLong()
        } && bounds.forall {
          case (colName, Left(ranges)) =>
            val mn = mins.path(physKey(colName)); val mx = maxs.path(physKey(colName))
            !(mn.isNumber && mx.isNumber) ||
              StatsWindows.numSurvives(mn.asDouble(), mx.asDouble(), ranges)
          case (colName, Right(ranges)) =>
            val mn = mins.path(physKey(colName)); val mx = maxs.path(physKey(colName))
            !(mn.isTextual && mx.isTextual) ||
              StatsWindows.strSurvives(mn.asText(), mx.asText(), ranges)(
                VersionedTable.utf8Cmp)
        }
    }

  /** Conservative window test against a file's single partition VALUE:
    * every window-producing shape is a comparison (never true of NULL),
    * so a null/empty partition value fails bounds windows outright, and a
    * value that parses tests point-exactly. Unparseable values (e.g. a
    * date string under a numeric window) keep the file. */
  private def partSurvives(pv: Map[String, String],
                           bounds: List[StatsWindows.Window],
                           nulls: List[(String, Boolean)]): Boolean = {
    def raw(c: String): Option[String] = pv.get(physKey(c)).orElse(pv.get(c))
    bounds.forall { case (c, ranges) =>
      raw(c) match {
        case None => true
        case Some(v) if v == null || v.isEmpty => false
        case Some(v) => ranges match {
          case Left(rs) => v.toDoubleOption.forall(d => StatsWindows.numSurvives(d, d, rs))
          case Right(rs) => StatsWindows.strSurvives(v, v, rs)(VersionedTable.utf8Cmp)
        }
      }
    } && nulls.forall { case (c, wantNull) =>
      raw(c) match {
        case None => true
        case Some(v) =>
          val isNull = v == null || v.isEmpty
          if (wantNull) isNull else !isNull
      }
    }
  }

  /** The full per-file test for the fallback relation: partition-column
    * windows against `partitionValues`, the rest against `stats`. */
  def fileSurvives(fe: FileEntry,
                   bounds: List[StatsWindows.Window],
                   nulls: List[(String, Boolean)]): Boolean = {
    val (partB, dataB) = bounds.partition(w => partNames(w._1))
    val (partN, dataN) = nulls.partition(w => partNames(w._1))
    partSurvives(fe.partitionValues, partB, partN) &&
      statsSurvive(fe.stats, dataB, dataN)
  }
}

/** [[FileIndex]] over a FOREIGN Delta table's snapshot: the log's live
  * file set with BOTH pruning layers folded into scan planning —
  * partition pruning from each add action's `partitionValues` (evaluated
  * against the scan's partition filters) and data skipping from the
  * per-file `stats` JSON (`minValues`/`maxValues`, numeric compared as
  * doubles, strings as unsigned UTF-8 bytes — Delta's stats ordering).
  * This is delta-spark's TahoeFileIndex role re-expressed on
  * [[DeltaLogReader]]'s snapshot: `spark.read.format("delta-lite")` plans
  * the same pruned parquet scan a Delta-jar reader would, with pushdown,
  * vectorization and whole-stage codegen intact. Files without stats for
  * a bounded column are conservatively kept; unrecognized predicate
  * shapes prune nothing. */
final class DeltaFileIndex(spark: SparkSession, root: java.nio.file.Path,
                           snap: DeltaSnapshot) extends FileIndex {

  private val tester = new DeltaStatsTester(snap.schema, snap.partitionColumns)
  // metaData.partitionColumns may carry either name form in a mapped
  // table (the tolerance DeltaLogReader.readSnapshot applies): resolve
  // each against logical OR physical field names
  private val partFields: Array[StructField] =
    snap.partitionColumns.map { n =>
      snap.schema.fields.find(f => f.name == n || DeltaLogReader.physName(f) == n)
        .getOrElse(throw new IllegalArgumentException(
          s"partition column '$n' not found in the snapshot schema"))
    }.toArray

  override val partitionSchema: StructType = StructType(partFields)

  /** One FileStatus per live file, built from the LOG'S OWN size/mtime
    * (every protocol-conformant add action records them) — ZERO driver
    * filesystem calls on the common path; only a malformed add without a
    * size pays a real getFileStatus. At a million files this is the
    * difference between reading one snapshot and issuing a million stat
    * RPCs, the same reason delta-spark's own file index trusts the log. */
  private lazy val statuses: Vector[(DeltaLogReader.FileEntry, FileStatus)] = {
    lazy val fs =
      new HPath(root.toUri).getFileSystem(spark.sparkContext.hadoopConfiguration)
    snap.files.map { f =>
      val p = new HPath(root.resolve(f.path).toUri)
      val status =
        if (f.size >= 0L) new FileStatus(f.size, false, 1, 0L, f.modTime, p)
        else fs.getFileStatus(p)
      f -> status
    }
  }

  override def rootPaths: Seq[HPath] = Seq(new HPath(root.toUri))

  /** Typed catalyst value of a partition-value string (the supported-type
    * gate lives in [[DeltaLite.partTypesSupported]]). */
  private def partValue(f: StructField, raw: String): Any =
    if (raw == null || raw.isEmpty) null
    else f.dataType match {
      case ByteType => raw.toByte
      case ShortType => raw.toShort
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case FloatType => raw.toFloat
      case DoubleType => raw.toDouble
      case BooleanType => raw.toBoolean
      case StringType => UTF8String.fromString(raw)
      case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case other => throw new IllegalStateException(
        s"unsupported partition type $other reached DeltaFileIndex")
    }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val partNames = partFields.map(_.name).toSet
    val dataWins = dataFilters.flatMap(StatsWindows.windows)
      .filterNot { case (c, _) => partNames(c) }.toList
    val dataNulls = dataFilters.flatMap(StatsWindows.nullWindows)
      .filterNot { case (c, _) => partNames(c) }.toList
    val groups = statuses.groupBy(_._1.partitionValues).toSeq.map { case (pv, group) =>
      val row = InternalRow.fromSeq(partFields.toSeq.map(f =>
        partValue(f, pv.get(tester.physKey(f.name)).orElse(pv.get(f.name)).orNull)))
      (row, group)
    }
    // Partition pruning is EXACT evaluation, never a conservative window:
    // FileSourceStrategy REMOVES partition-only filters from the post-scan
    // filter set and trusts listFiles to enforce them (the contract
    // PartitioningAwareFileIndex.prunePartitions and Delta's TahoeFileIndex
    // honor) — a kept-but-non-matching group here would return WRONG ROWS,
    // so every partition filter shape (!=, IN, OR, IS NULL, ...) is bound
    // to the partition row and evaluated for real.
    val pruned =
      if (partitionFilters.isEmpty) groups
      else {
        import org.apache.spark.sql.catalyst.expressions.{And => CatAnd, AttributeReference, BoundReference, Predicate => CatPredicate}
        val bound = partitionFilters.reduce(CatAnd(_, _)).transform {
          case a: AttributeReference =>
            val idx = partFields.indexWhere(_.name == a.name)
            require(idx >= 0,
              s"partition filter references non-partition column '${a.name}'")
            BoundReference(idx, partFields(idx).dataType, nullable = true)
        }
        val pred = CatPredicate.createInterpreted(bound)
        pred.initialize(0)
        groups.filter { case (row, _) => pred.eval(row) }
      }
    pruned.map { case (row, group) =>
      PartitionDirectory(row,
        group.filter(g => tester.statsSurvive(g._1.stats, dataWins, dataNulls))
          .map(_._2).toArray)
    }
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => root.resolve(f.path).toString).toArray

  override def refresh(): Unit = () // a pinned snapshot is immutable

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum
}

/** Fallback relation for the snapshot shapes a bare file scan cannot
  * express — deletion vectors (merge-on-read), renamed name-mode schemas
  * without parquet field ids, exotic partition types: delegates to the
  * snapshot replay ([[DeltaLogReader.read]]'s machinery, which handles
  * all of them). It is a [[PrunedFilteredScan]]: pushed filters (a)
  * prune the snapshot's file list through the SAME per-file stats and
  * partitionValues the native index uses — one MOR delete on a 100 TB
  * table no longer turns every filtered read into a full scan — and (b)
  * are re-expressed as Column predicates on the inner DataFrame, below
  * the DV position subtraction, where parquet pushdown sees them (a
  * filter never resurrects a deleted row, so filtering under the
  * anti-join is exact). Untranslatable conjuncts are reported via
  * `unhandledFilters` and Spark re-applies them above the scan. */
final class DeltaLiteMorRelation(ctx: SQLContext, tableRoot: String,
                                 version: Option[Long],
                                 preResolved: Option[DeltaSnapshot] = None)
    extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = ctx
  // ONE log replay per relation — and ZERO when the provider already
  // resolved the snapshot to route here (it passes it in): schema and
  // every buildScan share it (the data plan itself is rebuilt per scan
  // over the PRUNED file subset)
  private lazy val snap = preResolved.getOrElse(
    DeltaLogReader.snapshot(tableRoot, version, Some(ctx.sparkSession)))
  private lazy val tester = new DeltaStatsTester(snap.schema, snap.partitionColumns)
  override def schema: StructType = snap.schema

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    FilterColumns.unhandled(filters)

  /** The pruned, filtered, projected inner plan — package-visible so specs
    * can assert the file-skipping evidence (`scanPlan(...).inputFiles`). */
  private[graft] def scanPlan(requiredColumns: Array[String],
                                filters: Array[Filter]): DataFrame = {
    val (bounds, nulls) = StatsWindows.fromFilters(filters.toSeq)
    val kept =
      if (bounds.isEmpty && nulls.isEmpty) snap.files
      else snap.files.filter(f => tester.fileSurvives(f, bounds, nulls))
    val df = FilterColumns.applyAll(
      DeltaLogReader.readPinnedSnapshot(ctx.sparkSession, tableRoot,
        snap.copy(files = kept)), filters)
    if (requiredColumns.isEmpty) df
    else df.select(requiredColumns.head, requiredColumns.tail: _*)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] =
    scanPlan(requiredColumns, filters).rdd
}

/** `spark.read.format("delta-lite")`: batch reads of a STOCK Delta table
  * without the Delta jar, planned through Spark's native file-scan
  * machinery with the log's partition values and per-file stats pruning
  * folded in ([[DeltaFileIndex]]). Options: `path` (required),
  * `versionAsOf`, `timestampAsOf` (epoch millis, ISO instant, or a
  * session-zone date/date-time — [[SourcePaths.parseTimestamp]];
  * mutually exclusive with `versionAsOf`).
  *
  * Column-mapped tables stay NATIVE wherever the files allow it: id mode
  * binds columns by parquet field id inside Spark's own vectorized
  * reader; name mode binds by field id too when the data files carry ids
  * (what delta-spark writes — probed from ONE footer, the oldest file,
  * the likeliest to predate a mapping upgrade), or scans plainly when no
  * column was ever renamed (physicalName == logical name throughout).
  * The field-id conf is scoped to the RELATION'S cloned session
  * ([[SessionShim.withConf]]) — the user's session is never mutated.
  * Snapshots with deletion vectors, renamed name-mode schemas without
  * file field ids, or partition types beyond the primitive set fall back
  * to [[DeltaLiteMorRelation]] (correct, pruned, filter-pushed).
  *
  * Note: as with Spark's own partitioned reads, partition columns
  * surface AFTER the data columns in the relation's schema. */
final class DeltaLite extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "delta-lite"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = SourcePaths.required(parameters, "delta-lite", "Delta table root")
    val vAsOf = parameters.get("versionAsOf").map(_.toLong)
    val tAsOf = parameters.get("timestampAsOf")
      .map(SourcePaths.parseTimestamp(sqlContext.sparkSession, _))
    require(vAsOf.isEmpty || tAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = vAsOf.orElse(tAsOf.map(DeltaLogReader.versionAtTimestamp(path, _)))
    val spark = sqlContext.sparkSession
    val snap = DeltaLogReader.snapshot(path, version, Some(spark))
    val mode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    val hasDv = snap.files.exists(_.dv.isDefined)
    val root = java.nio.file.Paths.get(path).toAbsolutePath.normalize
    def fallback = new DeltaLiteMorRelation(sqlContext, path,
      version.orElse(Some(snap.version)), preResolved = Some(snap))
    if (hasDv || !DeltaLite.partTypesSupported(snap)) fallback
    else {
      val dataFields = snap.schema.fields
        .filterNot(f => snap.partitionColumns.contains(f.name) ||
          snap.partitionColumns.contains(DeltaLogReader.physName(f)))
      // (schema option, needs field-id resolution) per mapping mode; None =
      // this snapshot cannot be served natively
      val routed: Option[(StructType, Boolean)] = mode match {
        case "none" => Some((StructType(dataFields), false))
        case _ if DeltaLite.unrenamed(StructType(dataFields)) =>
          // mapping enabled but no column ever renamed (the upgrade
          // default): physical == logical, a plain scan binds correctly
          Some((StructType(dataFields), false))
        case "id" =>
          Some((DeltaLogReader.fieldIdSchema(StructType(dataFields)), true))
        case "name" =>
          // renamed name-mode columns can still bind NATIVELY when the
          // data files carry parquet field ids (delta-spark's do): reuse
          // the id-mode machinery; fall back only when ids are genuinely
          // absent (probed from the oldest file's footer — a mixed table
          // whose old files lack ids fails loudly in the reader rather
          // than returning wrong columns)
          scala.util.Try(DeltaLogReader.fieldIdSchema(StructType(dataFields)))
            .toOption
            .filter(_ => DeltaLite.oldestFileHasFieldIds(spark, root, snap))
            .map(s => (s, true))
        case _ => None
      }
      routed match {
        case None => fallback
        case Some((dataSchema, needsIds)) =>
          // field-id resolution is read at scan planning from the
          // RELATION's session — scope it to a clone, never the user's
          val relSession =
            if (needsIds) SessionShim.withConf(spark,
              "spark.sql.parquet.fieldId.read.enabled" -> "true")
            else spark
          val index = new DeltaFileIndex(relSession, root, snap)
          HadoopFsRelation(index, index.partitionSchema, dataSchema, None,
            new ParquetFileFormat, Map.empty[String, String])(relSession)
      }
    }
  }
}

object DeltaLite {
  private val SupportedPartTypes: Set[DataType] = Set(ByteType, ShortType,
    IntegerType, LongType, FloatType, DoubleType, BooleanType, StringType,
    DateType)
  private[sources] def partTypesSupported(snap: DeltaSnapshot): Boolean =
    snap.partitionColumns.forall(n =>
      snap.schema.fields
        .find(f => f.name == n || DeltaLogReader.physName(f) == n)
        .exists(f => SupportedPartTypes.contains(f.dataType)))

  /** True when NO field (nested included) was ever renamed — physical
    * name equals logical name throughout, so the parquet files' column
    * names ARE the logical names and a plain scan binds correctly. The
    * walk recurses through EVERY container shape (array-of-array,
    * map-value structs, …): a renamed struct field reachable only under
    * nested containers wrongly routed native would silently read NULL
    * where the fallback serves real data. */
  private[sources] def unrenamed(st: StructType): Boolean = {
    def walk(dt: DataType): Boolean = dt match {
      case s: StructType =>
        s.fields.forall(f => DeltaLogReader.physName(f) == f.name && walk(f.dataType))
      case a: ArrayType => walk(a.elementType)
      case m: MapType => walk(m.keyType) && walk(m.valueType)
      case _ => true
    }
    walk(st)
  }

  /** ONE footer probe, of the OLDEST live file (minimum add-action
    * modificationTime, path as tiebreaker — add order is not preserved
    * through a checkpoint bootstrap, and the oldest file is the
    * likeliest to predate a column-mapping upgrade and so to lack ids):
    * true iff every top-level parquet field carries a field id. Driver
    * cost is a single footer read per relation creation, independent of
    * table size. Any probe I/O failure answers FALSE — the fallback
    * relation can serve what a failed native routing would crash on. */
  private[sources] def oldestFileHasFieldIds(spark: SparkSession,
                                             root: java.nio.file.Path,
                                             snap: DeltaSnapshot): Boolean =
    snap.files.nonEmpty && scala.util.Try {
      val fe = snap.files.minBy(f => (f.modTime, f.path))
      val p = new HPath(root.resolve(fe.path).toUri)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        p, spark.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val fields = reader.getFooter.getFileMetaData.getSchema.getFields
        !fields.isEmpty && fields.stream().allMatch(t => t.getId != null)
      } finally reader.close()
    }.getOrElse(false)
}
