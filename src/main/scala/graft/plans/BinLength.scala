package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the number of binary digits `bin(x)`
  * prints — `length(bin(x))` without materializing a string per row.
  * The sketch suite anchors cross-engine determinism on bin-length
  * arithmetic (HLL's rho, the quantile sketch's bucket MSB, whole-bit
  * surprisal), which puts a 64-char string allocation + length walk on
  * some of the hottest per-row/per-token paths in the engine; this is
  * the same integer, computed as `64 - numberOfLeadingZeros` — one
  * branch-free intrinsic inside whole-stage codegen, no allocation.
  *
  * Exact `length(bin(x))` parity for ALL longs (so the DuckDB oracles
  * keep their readable bin()-based SQL and the equality is
  * mathematical, not approximate):
  *   x = 0  -> 1   ("0")
  *   x > 0  -> 64 - nlz(x)
  *   x < 0  -> 64  (two's-complement print)
  */
case class BinLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bin_len"

  override protected def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Long]
    if (v == 0L) 1 else if (v < 0L) 64 else 64 - java.lang.Long.numberOfLeadingZeros(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(($c) == 0L ? 1 : (($c) < 0L ? 64 : 64 - java.lang.Long.numberOfLeadingZeros($c)))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinLength {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (input cast to bigint). */
  def binLen(c: Column): Column =
    ColumnBridge.column(BinLength(ColumnBridge.expression(c.cast("long"))))
}
