package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct hashed word k-shingles of a token array, in one codegen'd pass:
 * for each window of k consecutive tokens, xxhash64 (seed 42) of the
 * space-joined shingle — bit-identical to
 * `array_distinct(transform(sequence(0, greatest(n-k, 0)),
 *    i => xxhash64(concat_ws(" ", slice(tokens, i+1, k)))))`
 * but without the HOF formulation's pathology: a non-lambda subexpression
 * inside a lambda body (the token array) is re-evaluated per element, so
 * the HOF form re-ran the upstream regex split once per shingle (~50x per
 * row, measured as the dominant cost of the MinHash pipeline).
 *
 * Output order is first occurrence (like array_distinct); n < k tokens
 * produce one short shingle (slice semantics); empty input → empty array.
 */
case class ShingleHash64(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hash64"

  override protected def nullSafeEval(value: Any): Any =
    ShingleHash64.compute(value.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("shingleKernel", ShingleHash64,
      "graft.functions.ShingleHash64$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.compute($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64 {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, k: Int): GenericArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val numShingles = math.max(n - k, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](numShingles * 2)
    var i = 0
    while (i < numShingles) {
      val len = math.min(k, n - i)
      val parts = new Array[UTF8String](len)
      var j = 0
      // concat_ws skips NULL inputs; UTF8String.concatWs does the same
      while (j < len) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val joined = UTF8String.concatWs(Space, parts: _*)
      seen.add(XXH64.hashUTF8String(joined, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
