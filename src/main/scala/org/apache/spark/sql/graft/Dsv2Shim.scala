package org.apache.spark.sql.graft

import org.apache.spark.sql.{sources => f}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructField

/** Public re-export of the `private[sql]` catalyst filter-pushdown mixin
  * ([[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]]),
  * so graft's DSv2 scan builders can participate in the SAME pushdown
  * negotiation Spark's own file sources use — receiving the resolved
  * catalyst conjuncts (which the commit-log stats windows understand
  * natively) instead of the lossier `sources.Filter` translation. Spark's
  * `PushDownUtils` checks this interface FIRST, so a builder mixing it in
  * gets exactly the `FileScanBuilder` treatment. The indirection is the
  * standard visibility-laundering shim (same rationale as
  * [[SessionShim]]): the parent trait is `private[sql]`, so the public
  * subtrait must be minted inside `org.apache.spark.sql`. */
trait CatalystFilterPushdown
    extends org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters

/** Small `private[sql]` bridges the DSv2 scans need. */
object Dsv2Shim {

  /** The RESERVED row-index field: a parquet read schema containing a
    * field by this TEMPORARY name makes Spark's own readers GENERATE the
    * file-absolute row index for every row (`ParquetRowIndexUtil`),
    * correct under predicate pushdown and row-group skipping — the exact
    * mechanism `_metadata.row_index` (and Delta's deletion-vector reads)
    * are built on. (`ROW_INDEX_FIELD` itself carries the FINAL
    * `row_index` name — the reader only generates under the temporary
    * one.) */
  def rowIndexField: StructField =
    org.apache.spark.sql.types.StructField(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
      org.apache.spark.sql.types.LongType,
      // NULLABLE: the column is absent from every data file (the reader's
      // row-index generator OVERWRITES the null-filled vector); a
      // non-nullable absent column fails the reader's required-column check
      nullable = true)

  /** `sources.Filter` → V2 `Predicate` (`Filter.toV2` is `private[sql]`);
    * what `pushedFilters()` must report for EXPLAIN. */
  def toV2(flt: f.Filter): Predicate = flt.toV2

  /** V2 `Predicate` → `sources.Filter` (`PredicateUtils` is
    * `private[sql]`); what a runtime filter arrives as, rendered back to
    * the vocabulary the stats windows understand. */
  def toV1(predicate: Predicate): Option[f.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicate)

  /** Column name → V2 `NamedReference` (`FieldReference` is
    * `private[sql]`); what `filterAttributes()` advertises for runtime
    * filtering. */
  def columnRef(name: String): org.apache.spark.sql.connector.expressions.NamedReference =
    org.apache.spark.sql.connector.expressions.FieldReference.column(name)

  /** A Hadoop `Configuration` wrapped for task serialization
    * (`SerializableConfiguration` is `private[spark]`) — what a reader
    * factory ships so EXECUTOR-side file access (e.g. per-task deletion-
    * vector loads) sees the session's filesystem configuration. */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration): AnyRef =
    new org.apache.spark.util.SerializableConfiguration(conf)

  def confOf(wrapped: AnyRef): org.apache.hadoop.conf.Configuration =
    wrapped.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value
}
