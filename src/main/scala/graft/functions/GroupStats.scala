package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass per-group price statistics as a typed custom [[Aggregator]] —
  * the `TypedColumn` aggregation extension point (the typed counterpart to
  * the codegen'd [[FloatVecDot]] expression): Spark plans it as a regular
  * two-phase hash aggregate (partial per partition, merge after the
  * exchange), so it scales exactly like a built-in agg.
  *
  * Buffer merge order across partitions is NOT deterministic, so every
  * buffer field is chosen to be merge-order-insensitive: counts and integer
  * cents (exact associative sums), and min/max (idempotent lattice ops).
  * Summing raw doubles here would be a subtle at-scale bug — the result
  * would drift run to run with partitioning.
  */
final case class PriceStats(cnt: Long, sumCents: Long, mn: Double, mx: Double)

object GroupStats extends Aggregator[(String, Double), PriceStats, PriceStats] {
  override def zero: PriceStats =
    PriceStats(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity)
  override def reduce(b: PriceStats, a: (String, Double)): PriceStats =
    PriceStats(b.cnt + 1, b.sumCents + math.floor(a._2 * 100 + 0.5).toLong,
      math.min(b.mn, a._2), math.max(b.mx, a._2))
  override def merge(x: PriceStats, y: PriceStats): PriceStats =
    PriceStats(x.cnt + y.cnt, x.sumCents + y.sumCents,
      math.min(x.mn, y.mn), math.max(x.mx, y.mx))
  override def finish(r: PriceStats): PriceStats = r
  override def bufferEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
  override def outputEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
}
