package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Regex strength reduction for anchored literal alternations —
 * `^(a|b|...)$` and the case-insensitive `(?i)^(a|b|...)$` — the shape of
 * the reference's Bool plugin (`(?i)^(1|true|yes|0|false|no)$`,
 * Plugin/Bool.pm:12-16) and of closed-vocabulary Str checks. RLike
 * allocates a java.util.regex Matcher per row and walks the alternation
 * NFA; this kernel is a byte compare against <=dozens of pre-folded
 * literals with zero allocation (the same per-row-allocation ceiling that
 * motivated [[CharClassMatch]]: TLAB churn throttles wide executors
 * disproportionately, hurting scaling efficiency first).
 *
 * Matching contract = java.util.regex `find()` on the anchored pattern
 * (what `rlike` runs): one final line terminator (`\r\n`, `\n`, `\r`,
 * U+0085, U+2028, U+2029) is tolerated before `$`, and `(?i)` folds ASCII
 * letters only (no UNICODE_CASE). Alternatives must be non-empty ASCII
 * literals (escaped punctuation allowed); anything else — nested groups,
 * classes, quantifiers, empty branches — returns None and the caller
 * keeps `rlike`.
 */
object AsciiAltMatch {

  /** Parse `^(a|b|...)$` / `(?i)^(a|b|...)$` into (foldedAlternatives,
   * fold). None = out of scope, caller keeps rlike. */
  def compile(pattern: String): Option[(Array[Array[Byte]], Boolean)] = {
    var p = pattern
    val fold = p.startsWith("(?i)")
    if (fold) p = p.substring(4)
    if (!(p.length >= 5 && p.startsWith("^(") && p.endsWith(")$") &&
      !p.endsWith("\\)$"))) return None
    val body = p.substring(2, p.length - 2)
    val alts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '|' =>
          if (cur.isEmpty) return None // empty branch: matches "", out of scope
          alts += cur.toArray; cur.clear(); i += 1
        case '\\' =>
          if (i + 1 >= body.length) return None
          val c = body.charAt(i + 1)
          // escaped ASCII punctuation is a literal; letter/digit escapes
          // (\d \s \1 ...) are regex constructs - out of scope. Control
          // chars (esp. \n/\r) are rejected: the matcher strips the
          // input's final line terminator, so a literal that can MATCH a
          // terminator would diverge from rlike at end-of-input.
          if (c < 128 && c >= 0x20 && !c.isLetterOrDigit) { cur += c.toByte; i += 2 }
          else return None
        case c if "()[]{}^$.|?*+".contains(c) => return None // metachar
        case c if c < 0x20 => return None // raw control char: see above
        case c if c < 128 =>
          cur += (if (fold && c >= 'A' && c <= 'Z') (c + 32) else c.toInt).toByte
          i += 1
        case _ => return None // non-ASCII literal: out of scope
      }
    }
    if (cur.isEmpty) return None
    alts += cur.toArray
    Some((alts.toArray, fold))
  }

  /** Anchored match with the java.util.regex `$` final-terminator rule
   * (shared [[CharClassMatch.effectiveLength]]). */
  def run(s: UTF8String, alts: Array[Array[Byte]], fold: Boolean): Boolean = {
    val n = CharClassMatch.effectiveLength(s)
    var a = 0
    while (a < alts.length) {
      val alt = alts(a)
      if (alt.length == n) {
        var i = 0
        var ok = true
        while (ok && i < n) {
          var b = s.getByte(i)
          if (fold && b >= 'A' && b <= 'Z') b = (b + 32).toByte
          ok = b == alt(i)
          i += 1
        }
        if (ok) return true
      }
      a += 1
    }
    false
  }

  /** Generated-code entry point (janino-side type is Object[]). */
  def runGeneric(s: UTF8String, alts: Array[AnyRef], fold: Boolean): Boolean =
    run(s, alts.asInstanceOf[Array[Array[Byte]]], fold)

  /** Column form when the pattern is in scope; None -> caller uses rlike. */
  def columnIfSupported(c: Column, pattern: String): Option[Column] =
    compile(pattern).map(_ =>
      ColumnBridge.column(AsciiAltMatch(ColumnBridge.expression(c), pattern)))
}

/** See [[AsciiAltMatch$]]. Ships only the pattern string; the folded
 * alternative set recompiles on deserialization. */
case class AsciiAltMatch(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val (alts, fold) =
    AsciiAltMatch.compile(pattern).getOrElse(
      throw new IllegalArgumentException(s"unsupported pattern $pattern"))

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ascii_alt_match"

  override protected def nullSafeEval(value: Any): Any =
    AsciiAltMatch.run(value.asInstanceOf[UTF8String], alts, fold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val altsRef = ctx.addReferenceObj("altSet", alts, "java.lang.Object[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiAltMatch$$.MODULE$$.runGeneric($c, $altsRef, $fold);")
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiAltMatch =
    copy(child = newChild)
}
