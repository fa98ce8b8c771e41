package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.graft.{CatalystFilterPushdown, Dsv2Shim}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.vt.{Commit, VersionedTable}

/** DSv2 scan builder for DV-FREE snapshots: Spark's own
  * [[ParquetScanBuilder]] over the commit-pinned [[VtFileIndex]] (full
  * catalyst filter pushdown → commit-log stats pruning in `listFiles` AND
  * footer skipping, column pruning, vectorization), PLUS metadata-only
  * aggregate pushdown: an UNFILTERED, UNGROUPED `COUNT(*)` / `COUNT(col)`
  * / `MIN(col)` / `MAX(col)` whose answer is PROVABLE from the commit
  * log's per-file row counts / null counts / min-max stats short-circuits
  * to a [[LocalScan]] — ZERO file reads, not even footers (Spark's own
  * parquet aggregate pushdown still pays one footer GET per file; at 10⁶
  * files the driver-side fold is the only sane shape for "how big / how
  * fresh is this table?"). Anything not provable — a filter, a group-by,
  * a DV (this builder is only used DV-free), a stats-less file, a string
  * stat at the truncation limit, an int64 beyond 2⁵³ — falls through to
  * the normal scan, exactly the refusal contract of
  * [[VersionedTable.minMaxFromStats]]. */
final class VtMetaScanBuilder(spark: SparkSession, vt: VersionedTable,
                              commit: Commit, tableSchema: StructType,
                              options: CaseInsensitiveStringMap,
                              branch: String = "main")
    extends ScanBuilder with CatalystFilterPushdown
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  // ---- COLUMN MAPPING (r20): the delegate operates in PHYSICAL name
  // space — physical-named twin schema and a commit copy whose stats maps
  // are re-keyed physical (and whose schemaJson IS the physical schema, so
  // bloomLookup's translation is the identity — immune to rename swaps) —
  // while Spark, the metadata aggregates, and the runtime-filter path stay
  // LOGICAL. Rows are positional, so only NAMES translate: filters rewrite
  // their attribute names on the way into the delegate, pruning renames its
  // requested fields, and VtDfScan maps the pruned read schema back.
  private val mapped = VersionedTable.hasColumnMapping(tableSchema)
  private val physOf: Map[String, String] =
    if (!mapped) Map.empty
    else tableSchema.fields.map(f => f.name -> VersionedTable.physicalName(f)).toMap
  private val logOf: Map[String, String] = physOf.map(_.swap)
  private val physCommit: Commit =
    if (!mapped) commit
    else {
      def rekey[V](m: Map[String, Map[String, V]]): Map[String, Map[String, V]] =
        m.view.mapValues(_.map { case (k, v) => physOf.getOrElse(k, k) -> v }).toMap
      commit.copy(
        schemaJson = VersionedTable.physicalSchema(tableSchema).json,
        stats = rekey(commit.stats), strStats = rekey(commit.strStats),
        nullStats = rekey(commit.nullStats),
        bloomCols = commit.bloomCols.map(c => physOf.getOrElse(c, c)))
    }
  private def toPhys(e: Expression): Expression = e.transform {
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
        if physOf.getOrElse(a.name, a.name) != a.name =>
      a.withName(physOf(a.name))
  }
  private def toPhysSchema(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = physOf.getOrElse(f.name, f.name))))

  private val delegate =
    ParquetScanBuilder(spark, new VtFileIndex(spark, vt, physCommit),
      VersionedTable.physicalSchema(tableSchema),
      VersionedTable.physicalSchema(tableSchema), options)
  private var dataFilters: Seq[Expression] = Nil
  private var filtered = false
  private var delegateAggPushed = false
  private var meta: Option[(StructType, InternalRow)] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    filtered = filtered || filters.nonEmpty
    dataFilters = dataFilters ++ filters
    val residual = delegate.pushFilters(
      if (mapped) filters.map(toPhys) else filters)
    // mapped: the delegate's residual carries PHYSICAL names Spark cannot
    // re-resolve — return every original conjunct instead (correct; the
    // translated copies still reached the parquet readers)
    if (mapped) filters else residual
  }
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(
      if (mapped) toPhysSchema(requiredSchema) else requiredSchema)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!filtered) meta = metaAnswer(aggregation)
    // the delegate's footer-level aggregate scan reports a physical-named
    // readSchema Spark cannot bind — mapped snapshots take metadata answers
    // or the ordinary scan, never the delegate's aggregate scan
    meta.isDefined || (!mapped && {
      delegateAggPushed = delegate.pushAggregation(aggregation)
      delegateAggPushed })
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    meta.isDefined || (!mapped && delegate.supportCompletePushDown(aggregation))

  override def build(): Scan = meta match {
    case Some((schema, row)) => new VtMetaAggScan(schema, row, commit)
    // a footer-level aggregate scan owns its own whole-file partition plan
    // — serve it untouched; everything else gets the native batch (runtime
    // file skipping, commit-log statistics) around the delegate's readers
    case None if delegateAggPushed => delegate.build()
    case None =>
      new VtDfScan(spark, vt, commit, dataFilters, delegate.build(), branch,
        options, logOf)
  }

  // ---- the provable-from-metadata decision --------------------------------

  private def columnOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[StructField] = VtExact.columnOf(tableSchema, e)

  private def totalRows: Option[Long] =
    if (commit.files.forall(commit.rowCounts.contains))
      Some(commit.files.iterator.map(commit.rowCounts).sum)
    else None

  private def nonNullRows(col: String): Option[Long] =
    if (commit.files.forall(f => commit.rowCounts.contains(f) &&
          commit.nullStats.get(f).exists(_.contains(col))))
      Some(commit.files.iterator.map(f => commit.rowCounts(f) - commit.nullStats(f)(col)).sum)
    else None

  private def exactNum(d: Double, dt: DataType): Option[Any] =
    VtExact.exactNum(d, dt)

  private def minMaxOf(fld: StructField, takeMax: Boolean): Option[Any] =
    fld.dataType match {
      case StringType =>
        vt.minMaxStringFromStats(commit, fld.name) // refuses truncated bounds
          .map(mm => UTF8String.fromString(if (takeMax) mm._2 else mm._1))
      case dt =>
        vt.minMaxFromStats(commit, fld.name)
          .flatMap(mm => exactNum(if (takeMax) mm._2 else mm._1, dt))
    }

  private def metaAnswer(agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty || commit.dvFiles.nonEmpty) return None
    val answered: Array[Option[(StructField, Any)]] = agg.aggregateExpressions.map {
      case _: CountStar =>
        totalRows.map(t => (StructField("count(*)", LongType, nullable = false), t))
      case c: Count if !c.isDistinct =>
        columnOf(c.column).flatMap(f => nonNullRows(f.name)
          .map(n => (StructField(s"count(${f.name})", LongType, nullable = false), n)))
      case m: Min =>
        columnOf(m.column).flatMap(f => minMaxOf(f, takeMax = false)
          .map(v => (StructField(s"min(${f.name})", f.dataType, nullable = true), v)))
      case m: Max =>
        columnOf(m.column).flatMap(f => minMaxOf(f, takeMax = true)
          .map(v => (StructField(s"max(${f.name})", f.dataType, nullable = true), v)))
      case _ => None
    }
    if (answered.exists(_.isEmpty)) None // all-or-nothing: one scan either way
    else Some((StructType(answered.map(_.get._1)),
      new GenericInternalRow(answered.map(_.get._2))))
  }
}

/** Exactness helpers shared by the metadata-aggregate builders (clean and
  * MOR): resolve an aggregate's single-column reference against the table
  * schema, and convert a double-domain stat to the column type only where
  * exactness is PROVABLE. */
private[sources] object VtExact {

  def columnOf(schema: StructType,
               e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[StructField] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      schema.fields.find(_.name == r.fieldNames()(0))
    case _ => None
  }

  /** Double-domain stat → EXACT catalyst value of the column's type, or
    * None where exactness is not provable (int64 beyond 2⁵³, any type the
    * stats writer does not cover exactly). */
  def exactNum(d: Double, dt: DataType): Option[Any] = dt match {
    case DoubleType => Some(d)
    case FloatType => Some(d.toFloat)
    case IntegerType => Some(d.toInt)
    case ShortType => Some(d.toShort)
    case ByteType => Some(d.toByte)
    // STRICT bound: ±2^53 itself can be the rounded image of true long
    // 2^53±1 (ties-to-even), so exactness is only provable strictly inside
    case LongType if math.abs(d) < 9007199254740992.0 => Some(d.toLong) // |d| < 2^53
    case _ => None
  }
}

/** The metadata answer as a [[LocalScan]]: Spark plans it as a local
  * one-row relation — the query never launches a scan stage at all. */
final class VtMetaAggScan(schema: StructType, row: InternalRow, commit: Commit)
    extends LocalScan {
  override def rows: Array[InternalRow] = Array(row)
  override def readSchema(): StructType = schema
  override def description(): String =
    s"VtMetaAggScan v${commit.version} (commit-log metadata, zero file reads)"
}

/** Machinery shared by the native vt scans ([[VtDfScan]], [[VtMorScan]]):
  * the LIVE file list (statically stats-pruned, shrunk further by runtime
  * filters), the join-driven dynamic-file-skipping contract, memoized
  * per-file sizes, the per-file split planner, and the commit-log row
  * statistics — one implementation, so a fix to the pruning or packing
  * rules can never diverge between the two scan shapes. */
private[sources] trait VtRuntimePrunedScan
    extends Scan with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  protected def spark: SparkSession
  protected def vt: VersionedTable
  protected def commit: Commit
  /** The planning-time stats-pruned file list. */
  protected def staticFiles: Vector[String]

  // seeded on first read (never during trait init, where a subclass
  // constructor val behind staticFiles might not be assigned yet)
  @volatile private var shrunk: Vector[String] = null
  protected final def liveFiles: Vector[String] = {
    val s = shrunk
    if (s == null) staticFiles else s
  }

  /** Exposed for specs: how many files the scan will actually plan. */
  private[graft] final def plannedFileCount: Int = liveFiles.size

  // ---- join-driven DYNAMIC FILE SKIPPING (SupportsRuntimeV2Filtering) ----
  // Spark's dynamic-pruning rule hands the broadcast build side's join-key
  // values (an IN predicate) at execution time; testing them against the
  // same commit-log stats windows drops whole files BEFORE any partition
  // is planned — Delta's dynamic file pruning, driven by per-file stats
  // instead of directory partitions. Conservative by construction: an
  // untranslatable predicate or a stats-less file prunes nothing, and
  // Spark re-applies the join itself, so this is only ever a skip.
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val covered = (commit.stats.valuesIterator.flatMap(_.keys) ++
      commit.strStats.valuesIterator.flatMap(_.keys) ++
      // bloom-indexed columns skip on runtime point keys too (r19): a
      // broadcast star-join's IN list over a scattered uuid/long-id key
      // prunes whole files through the sidecar blooms
      commit.bloomCols.iterator ++
      commit.bloomStats.valuesIterator.flatMap(_.keys)).toSet
    readSchema().fieldNames.filter(covered).map(Dsv2Shim.columnRef)
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val v1 = predicates.flatMap(Dsv2Shim.toV1(_).toSeq)
    val (bounds, nulls) = StatsWindows.fromFilters(v1.toSeq)
    val probes = v1.toSeq.flatMap(StatsWindows.filterPointProbes).toList
    val bloom = if (probes.isEmpty) VtPruning.NoBloom else vt.bloomLookup(commit)
    if (bounds.nonEmpty || nulls.nonEmpty || probes.nonEmpty)
      shrunk = liveFiles.filter(VtPruning.survives(commit, _, bounds, nulls, probes, bloom))
  }

  /** Per-file byte sizes, memoized over the static list — the commit log
    * carries them, so only pre-`fileSizes` history pays a real stat call
    * (and exactly once, not per planning round). */
  protected final lazy val sizeOf: Map[String, Long] = staticFiles.map { f =>
    f -> commit.fileSizes.getOrElse(f, java.nio.file.Files.size(vt.root.resolve(f)))
  }.toMap
  protected final def totalBytes: Long = liveFiles.iterator.map(sizeOf).sum

  /** One [[PartitionedFile]] per ≤ `maxSplit` chunk of `rel` — row indexes
    * (where requested) are file-absolute, so chunking is always safe. */
  protected final def splitsOf(rel: String, maxSplit: Long): Seq[PartitionedFile] =
    VtSplits.of(vt, rel, sizeOf(rel), maxSplit)

  /** Live-row count from the commit log, when every live file logged one. */
  protected final def rowCountStat: OptionalLong =
    if (liveFiles.forall(commit.rowCounts.contains))
      OptionalLong.of(liveFiles.iterator.map(commit.rowCounts).sum)
    else OptionalLong.empty()
}

/** The one per-file split planner shared by the native batch scans, the
  * micro-batch stream ([[VtMicroBatchStream]]) and the foreign-Delta scan
  * ([[DeltaDfScan]]) — row indexes are file-absolute, so byte-range
  * chunking is always safe; a fix to the packing rule lands everywhere. */
private[sources] object VtSplits {
  def of(vt: VersionedTable, rel: String, size: Long, maxSplit: Long): Seq[PartitionedFile] =
    ofPath(vt.root.resolve(rel), size, maxSplit)

  def ofPath(abs: java.nio.file.Path, size: Long, maxSplit: Long): Seq[PartitionedFile] = {
    val path = SparkPath.fromPath(new HPath(abs.toUri))
    (0L until size by maxSplit).map(start =>
      PartitionedFile(InternalRow.empty, path, start,
        math.min(maxSplit, size - start), Array.empty, 0L, size, Map.empty))
  }
}

/** NATIVE batch for DV-FREE snapshots (r18): the delegate [[ParquetScan]]
  * supplies the reader factory — Spark's own vectorized parquet readers,
  * pushed filters, columnar batches, whole-stage codegen — while the
  * PARTITIONS are planned here from the commit log: static stats pruning
  * (the same windows `VtFileIndex.listFiles` applies), size-balanced
  * split packing via `FilePartition.getFilePartitions`, commit-log
  * [[Statistics]] for AQE, and — the reason this class exists —
  * `SupportsRuntimeV2Filtering` ([[VtRuntimePrunedScan]]): a broadcast
  * join's key values re-prune the FILE LIST at execution time through
  * the per-file stats (dynamic file pruning). Spark's own `FileScan`
  * runtime-filters only PARTITION columns, which a versioned table does
  * not have; per-file stats are its partition pruning. */
final class VtDfScan(protected val spark: SparkSession, protected val vt: VersionedTable,
                     protected val commit: Commit,
                     dataFilters: Seq[Expression], parquet: ParquetScan,
                     branch: String = "main",
                     options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
                     // physical→logical column names for mapped snapshots
                     // (r20): the delegate reads physical-named parquet;
                     // Spark binds the batch's columns POSITIONALLY against
                     // this scan's logical readSchema — only names map
                     nameMap: Map[String, String] = Map.empty)
    extends Batch with SupportsReportStatistics with VtRuntimePrunedScan {

  protected val staticFiles: Vector[String] = {
    // dataFilters and the commit are both LOGICAL-keyed here — the builder
    // keeps this scan's pruning inputs in the query's own name space
    val bounds = dataFilters.flatMap(StatsWindows.windows).toList
    val nulls = dataFilters.flatMap(StatsWindows.nullWindows).toList
    val probes = dataFilters.flatMap(StatsWindows.pointProbes).toList
    val bloom = if (probes.isEmpty) VtPruning.NoBloom else vt.bloomLookup(commit)
    commit.files.filter(VtPruning.survives(commit, _, bounds, nulls, probes, bloom))
  }

  override def readSchema(): StructType =
    if (nameMap.isEmpty) parquet.readSchema()
    else StructType(parquet.readSchema().fields.map(f =>
      f.copy(name = nameMap.getOrElse(f.name, f.name))))
  override def toBatch: Batch = this
  /** `spark.readStream.table(...)` — snapshot-then-tail over the commit
    * log ([[VtMicroBatchStream]]); this scan's pruned readSchema pins the
    * stream's column set. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new VtMicroBatchStream(spark, vt, branch, commit, readSchema(), options)
  override def description(): String =
    s"VtDfScan v${commit.version} files=${liveFiles.size}/${commit.files.size} " +
      s"PushedFilters: [${parquet.pushedFilters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val maxSplit = math.max(1L, FilePartition.maxSplitBytes(spark, totalBytes))
    val splits = liveFiles.flatMap(splitsOf(_, maxSplit))
      .sortBy(-_.length) // largest first: better bin packing (FileScan's rule)
    FilePartition.getFilePartitions(spark, splits, maxSplit).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    parquet.createReaderFactory()

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(totalBytes)
    override def numRows(): OptionalLong = rowCountStat
  }
}

/** NATIVE DSv2 scan builder for DV-carrying snapshots (r18 — replaces the
  * r17 `V1Scan`/`.rdd` bridge): catalyst filters arrive through the same
  * mixin Spark's file sources use, prune the commit's file list through
  * the stats windows, AND are pushed into the parquet readers; the Scan
  * is a real [[Batch]] whose reader factory applies the deletion vector
  * BELOW everything — see [[VtMorScan]]. Every pushed conjunct is also
  * returned as residual (the `FileScanBuilder` rule), so correctness
  * never depends on the translation. */
final class VtMorScanBuilder(spark: SparkSession, vt: VersionedTable,
                             commit: Commit, tableSchema: StructType,
                             branch: String = "main",
                             options: CaseInsensitiveStringMap =
                               CaseInsensitiveStringMap.empty())
    extends ScanBuilder with CatalystFilterPushdown
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private val rowIdx = Dsv2Shim.rowIndexField
  private val dataWithIdx = StructType(tableSchema.fields :+ rowIdx)
  private val delegate =
    ParquetScanBuilder(spark, new VtFileIndex(spark, vt, commit),
      dataWithIdx, dataWithIdx, CaseInsensitiveStringMap.empty())
  private var dataFilters: Seq[Expression] = Nil
  private var required: StructType = tableSchema
  private var meta: Option[(StructType, InternalRow)] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    dataFilters = filters
    delegate.pushFilters(filters) // translated conjuncts reach the parquet readers
    filters // ALL residual: Spark re-applies them above the DV subtraction
  }
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // normalize to table order — rows come back in dataSchema order
    val names = requiredSchema.fieldNames.toSet
    required = StructType(tableSchema.fields.filter(f => names.contains(f.name)))
  }

  /** Metadata aggregates on a MOR snapshot, from the commit log + one
    * bounded DV aggregate — never a data-file scan. `COUNT(*)` (r19): Σ
    * per-file rowCounts − Σ per-file DISTINCT deleted positions. `MIN` /
    * `MAX` (r20): deletions only REMOVE rows, so each end stays EXACTLY
    * the stats answer whenever some file ACHIEVING it has zero deletions —
    * the per-file DV cardinalities are already on the driver, so the proof
    * costs nothing extra ([[VersionedTable.minMaxNumFromStatsDv]]).
    * `COUNT(col)` stays refused under DVs: a deleted row's null-ness is
    * unknown without reading data. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (dataFilters.nonEmpty || aggregation.groupByExpressions.nonEmpty) return false
    val exprs = aggregation.aggregateExpressions
    if (exprs.isEmpty ||
        !exprs.forall(e => e.isInstanceOf[CountStar] || e.isInstanceOf[Min] ||
          e.isInstanceOf[Max])) return false
    // ONE bounded aggregate serves every expression: per-file-key counts
    // of distinct deleted positions (O(files) driver rows)
    lazy val dvCard: Map[String, Long] = VtDvStats.cardByKey(spark, vt, commit,
      commit.files.map(VersionedTable.fileKey).toSet)
    def dvFree(rel: String): Boolean =
      dvCard.getOrElse(VersionedTable.fileKey(rel), 0L) == 0L
    def minMaxOf(fld: StructField, takeMax: Boolean): Option[Any] =
      fld.dataType match {
        case StringType =>
          vt.minMaxStringFromStatsDv(commit, fld.name, takeMax, dvFree)
            .map(UTF8String.fromString)
        case dt =>
          vt.minMaxNumFromStatsDv(commit, fld.name, takeMax, dvFree)
            .flatMap(VtExact.exactNum(_, dt))
      }
    val answered: Array[Option[(StructField, Any)]] = exprs.map {
      case _: CountStar =>
        (if (commit.files.forall(commit.rowCounts.contains))
           Some(commit.files.iterator.map(commit.rowCounts).sum -
             dvCard.valuesIterator.sum)
         else None)
          .map(t => (StructField("count(*)", LongType, nullable = false), t: Any))
      case m: Min =>
        VtExact.columnOf(tableSchema, m.column).flatMap(f =>
          minMaxOf(f, takeMax = false).map(v =>
            (StructField(s"min(${f.name})", f.dataType, nullable = true), v)))
      case m: Max =>
        VtExact.columnOf(tableSchema, m.column).flatMap(f =>
          minMaxOf(f, takeMax = true).map(v =>
            (StructField(s"max(${f.name})", f.dataType, nullable = true), v)))
      case _ => None
    }
    meta =
      if (answered.exists(_.isEmpty)) None // all-or-nothing: one scan either way
      else Some((StructType(answered.map(_.get._1)),
        new GenericInternalRow(answered.map(_.get._2))))
    meta.isDefined
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    meta.isDefined

  override def build(): Scan = meta match {
    case Some((schema, row)) => new VtMetaAggScan(schema, row, commit)
    case None =>
      delegate.pruneColumns(StructType(required.fields :+ rowIdx))
      val bounds = dataFilters.flatMap(StatsWindows.windows).toList
      val nulls = dataFilters.flatMap(StatsWindows.nullWindows).toList
      val probes = dataFilters.flatMap(StatsWindows.pointProbes).toList
      val bloom = if (probes.isEmpty) VtPruning.NoBloom else vt.bloomLookup(commit)
      val pruned = commit.files.filter(VtPruning.survives(commit, _, bounds, nulls, probes, bloom))
      new VtMorScan(spark, vt, commit, pruned, required, delegate.build(),
        branch, options)
  }
}

/** Driver-side DV METADATA (r19): delegates to the ONE shared per-file-key
  * deleted-count aggregate ([[VersionedTable.dvCardByKey]] — the same
  * implementation `countRows` subtracts with, so the SQL `COUNT(*)` answer
  * and the API count can never drift). O(files-with-deletions) count rows
  * reach the driver, never positions. */
private[sources] object VtDvStats {
  def cardByKey(spark: SparkSession, vt: VersionedTable, commit: Commit,
                keys: Set[String]): Map[String, Long] =
    vt.dvCardByKey(spark, commit, keys)
}

/** Merge-on-read as a NATIVE DSv2 batch: per-file-split input partitions
  * over the stats-pruned file list; the reader factory wraps Spark's own
  * parquet readers — vectorized, filter-pushed, with the FILE-ABSOLUTE
  * row index generated by the reserved [[Dsv2Shim.rowIndexField]]
  * mechanism (correct under row-group skipping, the exact machinery
  * `_metadata.row_index` uses) — and drops rows whose position is
  * deleted with one binary search per row. No `RDD[Row]` materialization,
  * no anti-join, columnar batches intact under the row interface, and
  * AQE gets real [[Statistics]] from the commit log.
  *
  * DV loading is PER-TASK (r19): the driver computes only per-file DV
  * CARDINALITIES ([[VtDvStats]] — one small aggregate, O(files) rows
  * collected), and each reader whose file carries deletions loads ITS
  * OWN positions from the DV parquet executor-side
  * ([[DvTaskLoader.positionsFor]] — a parquet-hadoop read with the file
  * key pushed as a row-group/record filter). The driver never
  * materializes the deletion set: a 100 TB table with 1% deletions is
  * tens of GB of positions, which the r18 shape collected whole. At
  * 100 TB: a point read touches one file split, the DV subtraction costs
  * log(deletions-in-that-file) per row, and DV bytes move only to the
  * tasks that need them. */
final class VtMorScan(protected val spark: SparkSession, protected val vt: VersionedTable,
                      protected val commit: Commit,
                      pruned: Vector[String], outSchema: StructType,
                      parquet: ParquetScan,
                      branch: String = "main",
                      options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Batch with SupportsReportStatistics with VtRuntimePrunedScan {

  protected def staticFiles: Vector[String] = pruned

  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  /** `spark.readStream.table(...)` on a DV-carrying head: the stream's
    * initial snapshot applies the deletion vectors per task, then tails. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new VtMicroBatchStream(spark, vt, branch, commit, readSchema(), options)
  override def description(): String =
    s"VtMorScan v${commit.version} files=${pruned.size}/${commit.files.size} " +
      s"dv=${commit.dvFiles.size}"

  /** file key → (DISTINCT deleted-position COUNT, the DV part-files that
    * mention the key), restricted to the pruned files — counts and path
    * lists only ([[VersionedTable.dvStatsByKey]]), never positions. */
  private lazy val dvByKey: Map[String, (Long, Seq[String])] =
    vt.dvStatsByKey(spark, commit, pruned.map(VersionedTable.fileKey).toSet)

  override def planInputPartitions(): Array[InputPartition] = {
    val maxSplit = math.max(1L, FilePartition.maxSplitBytes(spark, totalBytes))
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    liveFiles.foreach { rel =>
      val key = VersionedTable.fileKey(rel)
      // deletion-free files ship an empty path list (their readers skip
      // the DV load entirely); deletion-carrying files ship ONLY the DV
      // part-files that mention their key — on a long delete history a
      // task pays for its own deletes' files, not every delete ever made
      val paths = dvByKey.get(key).map(_._2.toArray).getOrElse(Array.empty[String])
      // splits of ONE file per partition: row indexes are file-absolute,
      // so each split filters against the same per-file position set
      splitsOf(rel, maxSplit).foreach { pf =>
        parts += VtMorInputPartition(FilePartition(parts.length, Array(pf)), key, paths)
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // Spark refuses mixed row/columnar partitions, so columnar is a
    // whole-scan decision: only when NO pruned file carries deletions
    new VtMorReaderFactory(parquet.createReaderFactory(), outSchema,
      allColumnar = dvByKey.isEmpty,
      confWrapper = Dsv2Shim.serializableConf(spark.sessionState.newHadoopConf()))

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(totalBytes)
    override def numRows(): OptionalLong = {
      val base = rowCountStat
      if (!base.isPresent) base
      else OptionalLong.of(base.getAsLong - liveFiles.iterator.map(f =>
        dvByKey.get(VersionedTable.fileKey(f)).map(_._1).getOrElse(0L)).sum)
    }
  }
}

/** One single-file split + its file's KEY and the snapshot's DV parquet
  * paths (empty when the file is deletion-free) — positions are loaded by
  * the task itself, never shipped from the driver. */
private[sources] final case class VtMorInputPartition(files: FilePartition,
                                                      fileKey: String,
                                                      dvPaths: Array[String])
    extends InputPartition {
  override def preferredLocations(): Array[String] = files.preferredLocations()
}

/** EXECUTOR-side deletion-vector load: the sorted distinct deleted
  * positions of ONE file key, read from the DV parquet with the key
  * pushed as a parquet-hadoop filter — row-group statistics and
  * dictionary filtering skip non-matching groups (the MOR delete writes
  * DV parquet SORTED by (fk, pos) to make those stats tight), so a task
  * reads O(its own file's deletions) plus footers. Memoized per
  * (executor, DV set, key): every split of a file shares one load. */
private[sources] object DvTaskLoader {
  import org.apache.parquet.filter2.compat.FilterCompat
  import org.apache.parquet.filter2.predicate.FilterApi

  private val cache = new graft.vt.BoundedCache[(Seq[String], String), Array[Long]](64)

  def positionsFor(key: String, dvPaths: Array[String],
                   conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    if (dvPaths.isEmpty) return Array.emptyLongArray
    cache.get((dvPaths.toSeq, key))(load(key, dvPaths, conf))
  }

  private def load(key: String, dvPaths: Array[String],
                   conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    val pred = FilterApi.eq(FilterApi.binaryColumn("fk"),
      org.apache.parquet.io.api.Binary.fromString(key))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    dvPaths.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new HPath(p))
        .withConf(conf)
        .withFilter(FilterCompat.get(pred))
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          out += g.getLong("pos", 0)
          g = reader.read()
        }
      } finally reader.close()
    }
    out.distinct.sorted.toArray
  }
}

/** Wraps the parquet readers: emit only live rows (position not in the
  * file's deleted set — loaded BY THE TASK, [[DvTaskLoader]]), projected
  * back to the output schema (the generated row-index column is the last
  * field, ordinal `n`).
  *
  * COLUMNAR passthrough: when the stats-pruned file set carries NO
  * deletions at all (`allColumnar` — the common case for a filtered
  * point-read into clean regions of a MOR table), there is nothing to
  * subtract and every reader forwards the delegate's vectorized batches
  * intact (minus the row-index vector) — the whole scan keeps columnar
  * batches and whole-stage codegen. Any deletion anywhere drops the
  * whole scan to exact row-based subtraction (Spark refuses mixed
  * row/columnar partitions, so this is a scan-level decision). */
private[sources] final class VtMorReaderFactory(delegate: PartitionReaderFactory,
                                                outSchema: StructType,
                                                allColumnar: Boolean,
                                                confWrapper: AnyRef)
    extends PartitionReaderFactory {
  private val n = outSchema.length

  override def supportColumnarReads(partition: InputPartition): Boolean =
    allColumnar && delegate.supportColumnarReads(
      partition.asInstanceOf[VtMorInputPartition].files)

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val mp = partition.asInstanceOf[VtMorInputPartition]
    require(mp.dvPaths.isEmpty, "columnar MOR read planned for a partition with deletions")
    val inner = delegate.createColumnarReader(mp.files)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      override def next(): Boolean = inner.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = inner.get()
        // drop the generated row-index vector (last); the data vectors are
        // forwarded as-is — zero copies
        new org.apache.spark.sql.vectorized.ColumnarBatch(
          Array.tabulate(n)(b.column), b.numRows())
      }
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[VtMorInputPartition]
    val inner = delegate.createReader(mp.files)
    val proj = ProjectingInternalRow(outSchema, (0 until n).toIndexedSeq)
    new PartitionReader[InternalRow] {
      // loaded lazily INSIDE the task (never on the driver); empty for
      // deletion-free files, which skip the DV read entirely
      private lazy val deleted: Array[Long] =
        DvTaskLoader.positionsFor(mp.fileKey, mp.dvPaths, Dsv2Shim.confOf(confWrapper))
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (deleted.length == 0 ||
              java.util.Arrays.binarySearch(deleted, r.getLong(n)) < 0) {
            proj.project(r)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = proj
      override def close(): Unit = inner.close()
    }
  }
}
