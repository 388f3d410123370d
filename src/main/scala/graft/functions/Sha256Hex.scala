package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Lowercase-hex SHA-256 of a string — value-identical to Spark's
 * `sha2(col, 256)` (and DuckDB's `sha256`, which the oracles rely on),
 * but allocation-lean on the validation hot path.
 *
 * Spark's `Sha2` routes through commons-codec `DigestUtils.sha256Hex`,
 * which calls `MessageDigest.getInstance` PER ROW — a synchronized
 * provider lookup plus a fresh digest object and two intermediate
 * copies per call. Per-row identity (`content_sha256`, the input_hint
 * invariant) makes this a per-row cost on every validated row, and
 * round 2 established the pattern: per-row allocation churn throttles
 * wide (32-thread) configurations disproportionately (see
 * CharClassMatch). This kernel keeps ONE `MessageDigest` per thread
 * (thread-local, reset-by-digest), writes the 32-byte digest into a
 * reused thread-local buffer, and allocates only the escaping 64-byte
 * hex result.
 *
 * Generated code uses the static MODULE$ call, not `addReferenceObj`:
 * the kernel object holds ThreadLocals, which are not Serializable —
 * same lesson as [[Iso8601]].
 */
case class Sha256Hex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sha256_hex"

  override protected def nullSafeEval(value: Any): Any =
    Sha256Hex.compute(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sha256Hex$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Sha256Hex =
    copy(child = newChild)
}

object Sha256Hex {

  /** Column-level entry point (the codebase convention — see
   * AsciiAltMatch.columnIfSupported): wraps the kernel without every
   * call site repeating the ColumnBridge plumbing. */
  def column(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Sha256Hex(ColumnBridge.expression(c)))
  }

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("SHA-256"))
  private val digestBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](32))

  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val md = digests.get()
    val buf = digestBuf.get()
    md.update(s.getBytes) // getBytes is zero-copy when the string is exact
    md.digest(buf, 0, 32) // resets the digest for the next row
    val hex = new Array[Byte](64) // escapes into the result row
    var i = 0
    while (i < 32) {
      val b = buf(i) & 0xff
      hex(2 * i) = HexDigits(b >>> 4)
      hex(2 * i + 1) = HexDigits(b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }
}
