package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.{sources => f}

/** `sources.Filter` → `Column` translation for the merge-on-read fallback
  * relations ([[VtMorRelation]], [[DeltaLiteMorRelation]]): the inverse of
  * Spark's own `DataSourceStrategy.translateFilter`, so a pushed filter can
  * be applied to the INNER DataFrame the relation delegates to — putting
  * the predicate below the DV anti-join where parquet pushdown and footer
  * skipping see it. Semantics are exact by construction (each case maps to
  * the very Catalyst expression the filter was translated FROM), so a
  * translated filter may be declared handled; anything untranslatable is
  * reported back through `unhandledFilters` and Spark re-applies it above
  * the scan. Attribute names reach `col` verbatim — dotted names address
  * nested fields, exactly as they did in the originating plan. */
private[sources] object FilterColumns {

  def translate(flt: f.Filter): Option[Column] = flt match {
    case f.EqualTo(a, v) => Some(col(a) === lit(v))
    case f.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case f.GreaterThan(a, v) => Some(col(a) > lit(v))
    case f.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case f.LessThan(a, v) => Some(col(a) < lit(v))
    case f.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case f.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case f.IsNull(a) => Some(col(a).isNull)
    case f.IsNotNull(a) => Some(col(a).isNotNull)
    case f.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case f.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case f.StringContains(a, v) => Some(col(a).contains(v))
    case f.And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case f.Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case f.Not(c) => translate(c).map(not)
    case _: f.AlwaysTrue => Some(lit(true))
    case _: f.AlwaysFalse => Some(lit(false))
    case _ => None
  }

  /** The honest `unhandledFilters` answer: exactly the conjuncts
    * `translate` cannot express (those ARE re-applied by Spark). */
  def unhandled(filters: Array[f.Filter]): Array[f.Filter] =
    filters.filter(flt => translate(flt).isEmpty)

  /** Apply every translatable conjunct to `df` (the untranslatable rest is
    * Spark's to re-apply — see [[unhandled]]). */
  def applyAll(df: org.apache.spark.sql.DataFrame,
               filters: Array[f.Filter]): org.apache.spark.sql.DataFrame =
    filters.flatMap(translate).foldLeft(df)(_.filter(_))
}
