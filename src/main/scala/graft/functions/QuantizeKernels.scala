package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/**
 * Fused int8 scalar-quantization kernels (see
 * [[graft.ops.Similarity.quantizeInt8]] for the contract and the DuckDB
 * oracle restatement). The higher-order-function formulation
 * (`transform` + per-element `element_at` on literal parameter arrays +
 * a `when` chain) is interpreted per element — measured ~2.5 us/vector at
 * dim 64; these kernels run the same double math in one codegen'd loop
 * over the vector with the calibration arrays as reference objects,
 * exactly the [[L2SqTo]] shape. Bit-identical formulas:
 * `code = clamp(floor((x - mn) * (256.0 / (mx - mn))), 0, 255) - 128`
 * (degenerate dim → -128) and `xhat = mn + (code + 128.5) *
 * ((mx - mn) / 256.0)` — same literal association as the Column/oracle
 * forms, so `ann_quant` compares EXACTLY.
 */
case class QuantizeInt8Expr(child: Expression, mins: Array[Double],
    maxs: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quantize_int8"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"quantize_int8 over $t")
  }

  override protected def nullSafeEval(value: Any): Any =
    QuantizeInt8Expr.compute(value.asInstanceOf[ArrayData], mins, maxs, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("qmins", mins, "double[]")
    val mx = ctx.addReferenceObj("qmaxs", maxs, "double[]")
    val f = if (elemIsFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeInt8Expr$$.MODULE$$" +
        s".compute($c, $mn, $mx, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Expr =
    copy(child = newChild)
}

object QuantizeInt8Expr {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, mins: Array[Double], maxs: Array[Double],
      isFloat: Boolean): GenericArrayData = {
    val n = math.min(arr.numElements(), mins.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val lo = mins(i); val hi = maxs(i)
      out(i) = if (hi == lo) -128 else {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val v = math.floor((x - lo) * (256.0 / (hi - lo))).toLong
        (math.max(0L, math.min(255L, v)) - 128L).toByte
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Midpoint reconstruction of [[QuantizeInt8Expr]] codes (array<double>). */
case class DequantizeInt8Expr(child: Expression, mins: Array[Double],
    maxs: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dequantize_int8"

  override protected def nullSafeEval(value: Any): Any =
    DequantizeInt8Expr.compute(value.asInstanceOf[ArrayData], mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("dqmins", mins, "double[]")
    val mx = ctx.addReferenceObj("dqmaxs", maxs, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DequantizeInt8Expr$$.MODULE$$" +
        s".compute($c, $mn, $mx);")
  }

  override protected def withNewChildInternal(newChild: Expression): DequantizeInt8Expr =
    copy(child = newChild)
}

object DequantizeInt8Expr {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, mins: Array[Double],
      maxs: Array[Double]): GenericArrayData = {
    val n = math.min(arr.numElements(), mins.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = mins(i); val hi = maxs(i)
      out(i) = lo + (arr.getByte(i).toDouble + 128.5) * ((hi - lo) / 256.0)
      i += 1
    }
    new GenericArrayData(out)
  }
}
