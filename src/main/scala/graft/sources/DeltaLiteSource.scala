package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, PrunedScan, RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.vt.{DeltaLogReader, VersionedTable}
import graft.vt.DeltaLogReader.DeltaSnapshot

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

  private val mapper = new ObjectMapper()
  // metaData.partitionColumns may carry either name form in a mapped
  // table (the tolerance DeltaLogReader.readSnapshot applies): resolve
  // each against logical OR physical field names
  private val partFields: Array[StructField] =
    snap.partitionColumns.map { n =>
      snap.schema.fields.find(f => f.name == n || DeltaLogReader.physName(f) == n)
        .getOrElse(throw new IllegalArgumentException(
          s"partition column '$n' not found in the snapshot schema"))
    }.toArray
  // logical -> on-disk key for stats/partitionValues lookups: PHYSICAL
  // names in column-mapped tables (id mode goes through this index; the
  // spec keys both maps by physical name), the logical name otherwise
  private val physByLogical: Map[String, String] =
    snap.schema.fields.map(f => f.name -> DeltaLogReader.physName(f)).toMap
  private def physKey(logical: String): String =
    physByLogical.getOrElse(logical, logical)

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

  private def statsSurvive(stats: Option[String],
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
          case (colName, Left((lo, hi))) =>
            val mn = mins.path(physKey(colName)); val mx = maxs.path(physKey(colName))
            !(mn.isNumber && mx.isNumber) ||
              (mx.asDouble() >= lo && mn.asDouble() <= hi)
          case (colName, Right((lo, hi))) =>
            val mn = mins.path(physKey(colName)); val mx = maxs.path(physKey(colName))
            !(mn.isTextual && mx.isTextual) ||
              (VersionedTable.utf8Cmp(mx.asText(), lo) >= 0 &&
                VersionedTable.utf8Cmp(mn.asText(), hi) <= 0)
        }
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
        partValue(f, pv.get(physKey(f.name)).orElse(pv.get(f.name)).orNull)))
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
        group.filter(g => statsSurvive(g._1.stats, dataWins, dataNulls))
          .map(_._2).toArray)
    }
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => root.resolve(f.path).toString).toArray

  override def refresh(): Unit = () // a pinned snapshot is immutable

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum
}

/** Fallback relation for the snapshot shapes a bare file scan cannot
  * express — deletion vectors (merge-on-read), column-mapped schemas,
  * exotic partition types: delegates to [[DeltaLogReader.read]] (which
  * handles all of them) with column pruning; Spark re-applies every
  * filter above the scan, so results stay exact. */
final class DeltaLiteMorRelation(ctx: SQLContext, tableRoot: String,
                                 version: Option[Long]) extends BaseRelation with PrunedScan {
  override def sqlContext: SQLContext = ctx
  // ONE log replay per relation: the DataFrame is lazy and reusable, so
  // schema resolution and every buildScan share the same snapshot plan
  private lazy val df = DeltaLogReader.read(ctx.sparkSession, tableRoot, version)
  override def schema: StructType = df.schema
  override def buildScan(requiredColumns: Array[String]): RDD[Row] =
    (if (requiredColumns.isEmpty) df
     else df.select(requiredColumns.head, requiredColumns.tail: _*)).rdd
}

/** `spark.read.format("delta-lite")`: batch reads of a STOCK Delta table
  * without the Delta jar, planned through Spark's native file-scan
  * machinery with the log's partition values and per-file stats pruning
  * folded in ([[DeltaFileIndex]]). Options: `path` (required),
  * `versionAsOf`, `timestampAsOf` (epoch millis; mutually exclusive).
  * Snapshots with deletion vectors, column mapping, or partition types
  * beyond the primitive set fall back to a delegating relation that
  * serves them correctly through [[DeltaLogReader.read]].
  *
  * Note: as with Spark's own partitioned reads, partition columns
  * surface AFTER the data columns in the relation's schema. */
final class DeltaLite extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "delta-lite"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = SourcePaths.required(parameters, "delta-lite", "Delta table root")
    val vAsOf = parameters.get("versionAsOf").map(_.toLong)
    val tAsOf = parameters.get("timestampAsOf").map(_.toLong)
    require(vAsOf.isEmpty || tAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = vAsOf.orElse(tAsOf.map(DeltaLogReader.versionAtTimestamp(path, _)))
    val spark = sqlContext.sparkSession
    val snap = DeltaLogReader.snapshot(path, version, Some(spark))
    val mode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    val hasDv = snap.files.exists(_.dv.isDefined)
    // name mode needs a physical->logical column RENAME a bare file scan
    // cannot express; id mode stays NATIVE — Spark's own parquet field-id
    // resolution binds columns id-to-id inside the vectorized reader
    if (mode == "name" || hasDv || !DeltaLite.partTypesSupported(snap))
      new DeltaLiteMorRelation(sqlContext, path, version.orElse(Some(snap.version)))
    else {
      val root = java.nio.file.Paths.get(path).toAbsolutePath.normalize
      val dataFields = snap.schema.fields
        .filterNot(f => snap.partitionColumns.contains(f.name))
      val dataSchema =
        if (mode == "id") {
          spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
          DeltaLogReader.fieldIdSchema(StructType(dataFields))
        } else StructType(dataFields)
      val index = new DeltaFileIndex(spark, root, snap)
      HadoopFsRelation(index, index.partitionSchema, dataSchema, None,
        new ParquetFileFormat, Map.empty[String, String])(spark)
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
}
