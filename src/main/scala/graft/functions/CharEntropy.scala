package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shannon entropy (bits, log2) of a string's CODE POINT distribution — the
 * classic cheap quality signal for training-data curation: binary noise
 * and base64 blobs sit near 6 bits, keyboard mashing and repeated-char
 * padding sit far below natural language's ~4.0-4.3, so a [min,max] gate
 * on char entropy is one of the standard Gopher/C4-style filters.
 *
 * Scale shape: one codegen'd projection, no shuffle. The ASCII fast path
 * counts raw UTF-8 bytes into a stack int[128] (one pass, no decode, no
 * allocation beyond the table) — the overwhelmingly common case on web
 * text; any high bit bails to the codePoints() path with a HashMap.
 *
 * An anchored expressible-in-SQL contract (`ta_entropy` oracle): DuckDB's
 * `entropy()` aggregate over `string_split(t,'')` computes the same
 * -Σ p·log2 p, and both engines agree to round-6 (the house float
 * contract). DuckDB splits grapheme clusters, this kernel counts code
 * points — identical unless text carries combining sequences, which the
 * oracle query's planted corpus deliberately avoids (NFC-normalize first
 * via [[NfcNormalize]] to collapse the difference on real data).
 */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(value: Any): Any =
    CharEntropy.compute(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  private val Log2 = java.lang.Math.log(2.0)

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Double = {
    val n = s.numBytes
    val ascii = new Array[Int](128)
    var i = 0
    while (i < n && s.getByte(i) >= 0) {
      ascii(s.getByte(i)) += 1
      i += 1
    }
    if (i == n) return fromCounts(ascii.iterator.filter(_ > 0), n.toDouble)
    // non-ASCII: decode once, count code points exactly
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var total = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      counts.computeIfAbsent(it.next(), _ => new Array[Int](1))(0) += 1
      total += 1
    }
    val cs = new scala.collection.mutable.ArrayBuffer[Int](counts.size)
    counts.values().forEach(c => cs += c(0))
    fromCounts(cs.iterator, total.toDouble)
  }

  private def fromCounts(counts: Iterator[Int], n: Double): Double = {
    if (n == 0) return 0.0
    var h = 0.0
    while (counts.hasNext) {
      val p = counts.next() / n
      h -= p * (java.lang.Math.log(p) / Log2)
    }
    h
  }

  /** Code-point Shannon entropy (bits) of a string column. */
  def entropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))
}
