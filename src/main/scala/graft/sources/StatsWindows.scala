package graft.sources

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.StringType

/** Path-option normalization shared by every provider: the SQL catalog
  * hands `OPTIONS (path '…')` back as a `file:` URI, the DataFrame API as
  * a bare filesystem path — both must address the same table. */
private[sources] object SourcePaths {
  def local(raw: String): String =
    if (raw.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(raw)).toString
    else raw

  /** The mandatory, normalized `path` option — one error message shape
    * across every provider. */
  def required(params: Map[String, String], format: String, what: String): String =
    local(params.getOrElse("path", throw new IllegalArgumentException(
      s"$format needs option 'path' (the $what)")))
}

/** Shared predicate→window extraction for file-skipping [[org.apache.spark
  * .sql.execution.datasources.FileIndex]] implementations
  * ([[VtFileIndex]], [[DeltaFileIndex]]): turns a scan's DATA-filter
  * conjuncts into per-column [lower, upper] windows a file's min/max
  * stats can be tested against. Only shapes whose stats semantics are
  * EXACT are recognized — anything else prunes nothing (conservative),
  * and strict bounds relax to inclusive: stats pruning may KEEP extra
  * files, never drop a matching one. NEVER use these windows for
  * PARTITION filters: Spark strips partition-only filters from the
  * post-scan filter set, so partition pruning must evaluate the filter
  * exactly ([[DeltaFileIndex.listFiles]]), not conservatively. */
private[sources] object StatsWindows {

  /** `Left` = numeric window, `Right` = string window (compared as
    * unsigned UTF-8 bytes downstream). */
  type Window = (String, Either[(Double, Double), (String, String)])

  // open-ended string windows: "" is the true minimum; the max sentinel is
  // a run of U+10FFFF, above any realistic stats value
  val MinString = ""
  val MaxString: String = new String(Character.toChars(0x10FFFF)) * 8

  /** Null-presence demands extracted from the scan's conjuncts:
    * `(column, true)` = the filter needs NULL rows (`IS NULL`),
    * `(column, false)` = it needs NON-null rows (`IS NOT NULL`, which
    * Catalyst inserts under almost every comparison). Files whose
    * nullCount/rowCount stats prove the demand unsatisfiable are
    * skippable; unknown stats keep the file (conservative — these are
    * DATA filters, re-applied above the scan). */
  def nullWindows(e: Expression): List[(String, Boolean)] = e match {
    case And(l, r) => nullWindows(l) ++ nullWindows(r)
    case org.apache.spark.sql.catalyst.expressions.IsNull(a: AttributeReference) =>
      List(a.name -> true)
    case org.apache.spark.sql.catalyst.expressions.IsNotNull(a: AttributeReference) =>
      List(a.name -> false)
    case _ => Nil
  }

  def windows(e: Expression): List[Window] = {
    def num(l: Literal): Option[Double] = l.value match {
      case null => None
      case n: Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    def str(l: Literal): Option[String] = l.value match {
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case _ => None
    }
    def window(a: AttributeReference, l: Literal, lo: Boolean, hi: Boolean) =
      if (l.dataType == StringType)
        str(l).map(v => a.name -> Right((
          if (lo) v else MinString, if (hi) v else MaxString)))
      else
        num(l).map(v => a.name -> Left((
          if (lo) v else Double.NegativeInfinity, if (hi) v else Double.PositiveInfinity)))
    e match {
      case And(l, r) => windows(l) ++ windows(r)
      case EqualTo(a: AttributeReference, l: Literal) => window(a, l, lo = true, hi = true).toList
      case EqualTo(l: Literal, a: AttributeReference) => window(a, l, lo = true, hi = true).toList
      case EqualNullSafe(a: AttributeReference, l: Literal) => window(a, l, lo = true, hi = true).toList
      case GreaterThan(a: AttributeReference, l: Literal) => window(a, l, lo = true, hi = false).toList
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => window(a, l, lo = true, hi = false).toList
      case LessThan(a: AttributeReference, l: Literal) => window(a, l, lo = false, hi = true).toList
      case LessThanOrEqual(a: AttributeReference, l: Literal) => window(a, l, lo = false, hi = true).toList
      case GreaterThan(l: Literal, a: AttributeReference) => window(a, l, lo = false, hi = true).toList
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => window(a, l, lo = false, hi = true).toList
      case LessThan(l: Literal, a: AttributeReference) => window(a, l, lo = true, hi = false).toList
      case LessThanOrEqual(l: Literal, a: AttributeReference) => window(a, l, lo = true, hi = false).toList
      case _ => Nil
    }
  }
}
