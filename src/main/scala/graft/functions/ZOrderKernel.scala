package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/**
 * Morton (Z-order) interleave of two int32 keys into one int64 sort key —
 * the multi-dimensional clustering primitive behind Delta/Iceberg
 * `OPTIMIZE ZORDER BY`: sorting by the interleaved key gives every
 * dimension LOCALITY in the file layout, so parquet min/max row-group
 * stats prune multi-dimensional box queries that a single-column sort
 * can only prune on its leading column. (Scale story: at 100 TB the
 * z-ordered write is one range-repartition + in-partition sort; every
 * subsequent selective scan over EITHER dimension skips most files.)
 *
 * Total-order contract: each input is bias-mapped (`x + 2^31`) to an
 * order-preserving unsigned 32-bit value, bits interleave (first key =
 * even bits, second = odd), and the top bit of the unsigned result flips
 * (`^ Long.MinValue`) so SIGNED comparisons of the output agree with
 * unsigned z-value order — negative inputs sort correctly with no range
 * restriction. Pure mask-shift arithmetic: order-preserving, codegen'd,
 * and restated verbatim by the DuckDB oracle (`Oracles.qZorder`).
 */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 needs two int32 keys, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}); " +
        "bucket wider keys to 32-bit resolution first")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.compute(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder64$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {

  /** Spread the low 32 bits of `v` to the even bit positions of an int64
   * (the standard 5-step mask-shift bit dilation). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Shared by interpreted eval and generated code. */
  def compute(a: Int, b: Int): Long =
    (spread(a + 2147483648L) | (spread(b + 2147483648L) << 1)) ^ Long.MinValue

  /** Z-order sort key of two int columns. */
  def zorder(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
