package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** A constant `false` that DECLARES itself non-deterministic — a pure plan
  * barrier. Appended as a final `OR` disjunct to a filter condition, it is
  * never reached at runtime (the disjuncts before it either pass the row or
  * throw), but it makes the whole condition non-deterministic, so the
  * optimizer must keep the filter exactly where it was placed: no pushdown
  * through joins/projections, no reordering.
  *
  * Why an expression and not `rand() < -1`: any value-based marker is fair
  * game for semantic simplification — Spark 4's `OptimizeRand` folds
  * out-of-range rand comparisons to literals, silently removing the marker
  * and re-enabling pushdown. Non-determinism here is DECLARED, not derived
  * from a value, so no rewrite can reason it away without changing the
  * expression's contract.
  *
  * Used by the CHECK-constraint write guard
  * ([[graft.vt.VersionedTable]].guardChecks): the guard must judge exactly
  * the rows that LAND in the table — pushed below a join inside the
  * incoming frame, it would raise on rows the query was about to discard. */
case class NondeterministicFalse() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any = false
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode(code = code"", isNull = FalseLiteral,
      value = JavaCode.literal("false", BooleanType))
  override def prettyName: String = "graft_plan_barrier"
}
