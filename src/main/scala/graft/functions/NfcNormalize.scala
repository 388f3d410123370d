package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization of a string column — the first step of every
 * text-curation recipe (CCNet and friends normalize before hashing, or the
 * same visible text dedups/fingerprints to different keys depending on
 * which producer emitted composed vs decomposed accents). Canonical
 * composition is stability-guaranteed across Unicode versions, so
 * `java.text.Normalizer` (engine) and utf8proc (DuckDB `nfc_normalize`,
 * the `ta_norm` oracle) agree byte-for-byte.
 *
 * Scale shape: one codegen'd projection. The kernel's ASCII FAST PATH
 * scans the raw UTF-8 bytes and returns the input UNTOUCHED (no java
 * String materialization, no Normalizer call) when every byte is < 0x80 —
 * the overwhelmingly common case in a web corpus, making the pass nearly
 * free except where normalization can actually change something. Non-ASCII
 * strings take `Normalizer.isNormalized`-equivalent behavior via the
 * normalize-and-compare path (already-NFC text returns the original
 * UTF8String, not a copy).
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(value: Any): Any =
    NfcNormalize.compute(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    // ASCII bytes are non-negative in signed-byte land; any UTF-8
    // continuation/lead byte has the high bit set
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    val str = s.toString
    val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    if (norm == str) s else UTF8String.fromString(norm)
  }

  /** NFC-normalized copy of a string column (ASCII passes through free). */
  def normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
