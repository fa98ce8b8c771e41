package graft.sources

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts of the data-source plumbing: the offset floor's
  * fresh-vs-restart semantics and the predicate→window extractor's
  * conservative shapes — pinned without a SparkSession. */
class SourcesUnitSpec extends AnyFunSuite {

  test("OffsetFloor: fresh stream serves only past the option floor, rate-limited") {
    val f = new OffsetFloor(5)
    assert(f.nextEnd(head = 5, maxPerBatch = 10).isEmpty, "nothing past the floor")
    assert(f.nextEnd(head = 9, maxPerBatch = 10) === Some(9))
    assert(f.nextEnd(head = 100, maxPerBatch = 2) === Some(7), "rate limit caps")
    f.sync(7) // engine processed (5, 7]
    assert(f.nextEnd(head = 100, maxPerBatch = 2) === Some(9))
  }

  test("OffsetFloor: the engine's first checkpointed signal rebases a too-high floor") {
    // option said latest=7 (fresh-stream floor), but the checkpoint says
    // the stream had processed to 5 — the restart must serve (5, head]
    val f = new OffsetFloor(7)
    f.sync(5) // restart commit ack
    assert(f.floor === 5)
    assert(f.nextEnd(head = 7, maxPerBatch = Int.MaxValue) === Some(7),
      "versions 6..7 must be served after the rebase")
    // later signals only advance; a caught-up source keeps returning the
    // unchanged newest offset (the engine's own committed-equality check
    // is what decides "no new data"), never regressing below it
    f.sync(7)
    assert(f.floor === 5)
    assert(f.nextEnd(head = 7, maxPerBatch = Int.MaxValue) === Some(7))
  }

  test("StatsWindows: recognized shapes produce inclusive windows; others prune nothing") {
    val k = AttributeReference("k", IntegerType)()
    val s = AttributeReference("s", StringType)()
    assert(StatsWindows.windows(k > Literal(5)) ===
      List("k" -> Left((5.0, Double.PositiveInfinity))))
    assert(StatsWindows.windows(Literal(5) > k) === // 5 > k  ⇔  k < 5
      List("k" -> Left((Double.NegativeInfinity, 5.0))))
    assert(StatsWindows.windows((k >= Literal(2)) && (k <= Literal(9))) ===
      List("k" -> Left((2.0, Double.PositiveInfinity)),
        "k" -> Left((Double.NegativeInfinity, 9.0))))
    val sw = StatsWindows.windows(s === Literal("abc"))
    assert(sw === List("s" -> Right(("abc", "abc"))))
    // OR / != / IsNull are NOT window-expressible: must return Nil (the
    // conservative contract — data filters are re-applied above the scan)
    assert(StatsWindows.windows((k > Literal(5)) || (k < Literal(2))) === Nil)
    assert(StatsWindows.windows(org.apache.spark.sql.catalyst.expressions
      .Not(k === Literal(5))) === Nil)
    // null demands go through the dedicated extractor instead
    assert(StatsWindows.nullWindows(k.isNull) === List("k" -> true))
    assert(StatsWindows.nullWindows(k.isNotNull && s.isNull) ===
      List("k" -> false, "s" -> true))
    assert(StatsWindows.nullWindows(k > Literal(5)) === Nil)
  }
}
