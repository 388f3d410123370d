package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Winnowing fingerprints of a token array in one codegen'd pass
 * (Schleimer et al., SIGMOD'03): polynomial hash (base 31 mod 2^31-1 —
 * the engine's ANSI-safe, oracle-restatable arithmetic) of every
 * space-joined word k-gram, sliding-window (`w`) minima, sorted distinct
 * output. Value-identical to the HOF formulation
 * (`transform` + `aggregate` + `slice`/`array_min` — see the parity
 * spec) but the gram hash folds INCREMENTALLY over token code points
 * with no per-gram string allocation, and the whole loop runs compiled
 * instead of interpreted lambda-by-lambda (the MinHashSig lesson:
 * per-element HOF interpretation was ~50x on that pipeline).
 *
 * Contract (mirrored by the ta_winnow oracle): fewer than k tokens →
 * empty; 1..w-1 grams → the single global min; NULL-skipping matches
 * `concat_ws` (null tokens contribute nothing, separators still join
 * the surviving parts — tokenizer output never contains nulls anyway).
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1, "k-gram width must be >= 1")
  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(value: Any): Any =
    WinnowFingerprints.compute(value.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("winnowKernel", WinnowFingerprints,
      "graft.functions.WinnowFingerprints$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.compute($c, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Column wrapper over a token-array column. */
  def column(tokens: org.apache.spark.sql.Column, k: Int, w: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WinnowFingerprints(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens), k, w))

  private val P = 2147483647L

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, k: Int, w: Int): GenericArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val g = n - k + 1
    val hashes = new Array[Long](g)
    var i = 0
    while (i < g) {
      var acc = 0L
      var j = 0
      while (j < k) {
        if (j > 0) acc = (acc * 31L + 32L) % P // the joining space
        if (!tokens.isNullAt(i + j)) {
          val s = tokens.getUTF8String(i + j).toString
          var ci = 0
          while (ci < s.length) {
            val cp = s.codePointAt(ci)
            acc = (acc * 31L + cp) % P
            ci += Character.charCount(cp)
          }
        }
        j += 1
      }
      hashes(i) = acc
      i += 1
    }
    val mins =
      if (g < w) Array(hashes.min)
      else {
        val m = new Array[Long](g - w + 1)
        var s = 0
        while (s <= g - w) {
          var mn = hashes(s)
          var t = s + 1
          while (t < s + w) { if (hashes(t) < mn) mn = hashes(t); t += 1 }
          m(s) = mn
          s += 1
        }
        m
      }
    java.util.Arrays.sort(mins)
    // in-place dedup of the sorted mins
    var out = 0
    var r = 0
    while (r < mins.length) {
      if (out == 0 || mins(r) != mins(out - 1)) { mins(out) = mins(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}
