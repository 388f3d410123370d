package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Regex strength reduction for the Str validator's hot path: a
 * fully-anchored pattern made of literals and ASCII character classes —
 * the shape of nearly every real-world validation regex (`^repo_[a-z0-9_]+$`,
 * `^[0-9a-f]{40}$`, `^src[0-9]$`, the reference's MD5/UUID subtypes,
 * Types.pm:32-40) — compiles to a straight byte scan instead of a
 * java.util.regex NFA. RLike allocates a Matcher per row and walks the NFA
 * per char; this kernel is branch-per-byte with zero allocation (measured
 * ~2.4x on the three code_files field regexes over 32M rows).
 *
 * Supported: `^ ... $` (optionally prefixed by the `(?i)` ASCII-fold
 * flag, e.g. the reference's MD5 subtype `(?i)^[0-9a-f]{32}$`,
 * Types.pm:32-40) around any sequence of literal runs and classes
 * `[...]` / `\d` / `\w` with quantifiers `+ * {n} {n,} {n,m}`, where at
 * most ONE token is variable-length (so matching needs no backtracking:
 * fixed tokens match from both ends, the variable class absorbs the
 * middle). Classes must be ASCII (multi-byte UTF-8 never matches — their
 * bytes have the high bit set, same as java.util.regex on non-ASCII
 * chars vs ASCII classes). Anything else — alternation, groups, `.`,
 * negated classes, unanchored patterns, mid-pattern anchors, letter
 * escapes (`\s`, `\n`, `\S`, ...) inside or outside classes — returns
 * None and the caller keeps `rlike`. Semantics equal java.util.regex
 * (what `rlike` runs) including its `$`-before-one-final-line-terminator
 * rule — see [[run]].
 */
object CharClassMatch {

  sealed trait Tok extends Serializable
  /** Fixed literal byte run. */
  final case class Lit(bytes: Array[Byte]) extends Tok
  /** ASCII class with a repetition range; bits = 128-bit membership set.
   * max = Int.MaxValue means unbounded. */
  final case class Cls(bits: Array[Long], min: Int, max: Int) extends Tok

  private def bit(bits: Array[Long], c: Char): Unit = {
    require(c < 128, s"non-ASCII class char $c")
    bits(c >>> 6) |= 1L << (c & 63)
  }

  private def digitBits(): Array[Long] = {
    val b = new Array[Long](2); ('0' to '9').foreach(bit(b, _)); b
  }
  private def wordBits(): Array[Long] = {
    val b = new Array[Long](2)
    ('0' to '9').foreach(bit(b, _)); ('a' to 'z').foreach(bit(b, _))
    ('A' to 'Z').foreach(bit(b, _)); bit(b, '_'); b
  }

  /** Parse `[...]` body (without brackets) to a bitset; None if unsupported. */
  private def parseClass(s: String): Option[Array[Long]] = {
    if (s.isEmpty || s.startsWith("^")) return None // negation unsupported
    val bits = new Array[Long](2)
    var i = 0
    def litChar(at: Int): Option[(Char, Int)] = s.charAt(at) match {
      case '\\' if at + 1 < s.length =>
        s.charAt(at + 1) match {
          // Mirror the top-level rule: an escaped letter/digit is a regex
          // ESCAPE (`\s` `\n` `\S` `\D` `\W` `\b` `\1` ...), not a literal —
          // everything but the caller-handled \d/\w is out of scope, so the
          // whole class returns None and the caller keeps rlike. (Round-2
          // accepted any ASCII escape as a literal, silently compiling
          // `[\s]` to a scan for the LETTER 's' — a wrong answer, not a
          // fallback.)
          case c if c < 128 && !c.isLetterOrDigit => Some((c, at + 2))
          case _ => None
        }
      case c if c < 128 => Some((c, at + 1))
      case _ => None
    }
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length && s.charAt(i + 1) == 'd') {
        val d = digitBits(); bits(0) |= d(0); bits(1) |= d(1); i += 2
      } else if (s.charAt(i) == '\\' && i + 1 < s.length && s.charAt(i + 1) == 'w') {
        val w = wordBits(); bits(0) |= w(0); bits(1) |= w(1); i += 2
      } else litChar(i) match {
        case None => return None
        case Some((lo, ni)) =>
          // range lo-hi (a '-' that is the last char is a literal '-')
          if (ni < s.length - 1 && s.charAt(ni) == '-') {
            litChar(ni + 1) match {
              case Some((hi, ni2)) if hi >= lo =>
                (lo to hi).foreach(bit(bits, _)); i = ni2
              case _ => return None
            }
          } else { bit(bits, lo); i = ni }
      }
    }
    // A class able to match \n or \r (raw char, escaped control, or a
    // range spanning them) would diverge from rlike: the matcher strips
    // the input's FINAL line terminator before scanning, so such a
    // pattern must keep the real regex engine.
    if ((bits(0) & ((1L << '\n') | (1L << '\r'))) != 0) return None
    Some(bits)
  }

  /** Quantifier at position i: (min, max, nextIndex). No quantifier = (1,1). */
  private def parseQuant(s: String, i: Int): Option[(Int, Int, Int)] = {
    if (i >= s.length) return Some((1, 1, i))
    s.charAt(i) match {
      case '+' => Some((1, Int.MaxValue, i + 1))
      case '*' => Some((0, Int.MaxValue, i + 1))
      case '?' => Some((0, 1, i + 1))
      case '{' =>
        val close = s.indexOf('}', i)
        if (close < 0) return None
        val body = s.substring(i + 1, close)
        val parts = body.split(",", -1)
        try parts match {
          case Array(n) => Some((n.toInt, n.toInt, close + 1))
          case Array(n, "") => Some((n.toInt, Int.MaxValue, close + 1))
          case Array(n, m) => Some((n.toInt, m.toInt, close + 1))
          case _ => None
        } catch { case _: NumberFormatException => None }
      case _ => Some((1, 1, i))
    }
  }

  /** Compiled program: token list + whether to ASCII-case-fold (the `(?i)`
   * flag; Java's `(?i)` without UNICODE_CASE folds ASCII letters only,
   * which is exactly a byte-level a..z mapping). */
  final case class Prog(toks: Array[Tok], fold: Boolean) extends Serializable

  /** Compile a regex to a token program, or None if out of scope. */
  def compile(pattern: String): Option[Prog] = {
    val fold = pattern.startsWith("(?i)")
    val p = if (fold) pattern.substring(4) else pattern
    if (p.length < 2 || p.charAt(0) != '^' ||
      p.charAt(p.length - 1) != '$' || p.endsWith("\\$"))
      return None
    val body = p.substring(1, p.length - 1)
    val toks = ArrayBuffer.empty[Tok]
    val lit = ArrayBuffer.empty[Byte]
    def flushLit(): Unit =
      if (lit.nonEmpty) { toks += Lit(lit.toArray); lit.clear() }
    def addCls(bits: Array[Long], at: Int): Option[Int] =
      parseQuant(body, at).map { case (mn, mx, ni) =>
        flushLit(); toks += Cls(bits, mn, mx); ni
      }
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '[' =>
          // find the un-escaped closing bracket
          var j = i + 1
          while (j < body.length && body.charAt(j) != ']') {
            if (body.charAt(j) == '\\') j += 1
            j += 1
          }
          if (j >= body.length) return None
          parseClass(body.substring(i + 1, j)) match {
            case None => return None
            case Some(bits) => addCls(bits, j + 1) match {
              case None => return None
              case Some(ni) => i = ni
            }
          }
        case '\\' =>
          if (i + 1 >= body.length) return None
          body.charAt(i + 1) match {
            case 'd' => addCls(digitBits(), i + 2) match {
              case None => return None
              case Some(ni) => i = ni
            }
            case 'w' => addCls(wordBits(), i + 2) match {
              case None => return None
              case Some(ni) => i = ni
            }
            case c if c < 128 && c >= 0x20 && !c.isLetterOrDigit => // escaped punctuation
              i = quantifiedLiteral(body, c, i + 2, toks, lit, flushLit _)
                .getOrElse(return None)
            case _ => return None // \s \b \1 ...: out of scope
          }
        // '^'/'$' in the BODY are mid-pattern anchors (the outer ones were
        // stripped) — compiling them as literal bytes would silently match
        // "a$b" against `^a$b$`; reject so the caller keeps rlike.
        case c if "+*?{}()|.^$".contains(c) => return None
        // raw control chars (esp. \n/\r) as literals would diverge from
        // rlike at end-of-input (final-terminator strip) — keep rlike
        case c if c < 0x20 => return None
        case c if c < 128 =>
          i = quantifiedLiteral(body, c, i + 1, toks, lit, flushLit _)
            .getOrElse(return None)
        case _ => return None
      }
    }
    flushLit()
    // case folding: lowercase literal bytes; add the lowercase twin of any
    // letter bit in a class (input bytes are folded to lowercase at match
    // time, so upper bits simply become unreachable, never wrong)
    val out = (if (!fold) toks else toks.map[Tok] {
      case Lit(bytes) => Lit(bytes.map(b =>
        if (b >= 'A' && b <= 'Z') (b + 32).toByte else b))
      case Cls(bits, mn, mx) =>
        val nb = bits.clone()
        ('A' to 'Z').foreach { c =>
          if ((bits(c >>> 6) & (1L << (c & 63))) != 0) bit(nb, (c + 32).toChar)
        }
        Cls(nb, mn, mx)
    }).toArray
    // at most TWO variable-length tokens, and if two, the smaller span must
    // be tiny — matching then needs at most span+1 attempts, no general
    // backtracking (covers the ubiquitous `^-?\d+$` shape)
    val spans = out.collect {
      case Cls(_, mn, mx) if mn != mx =>
        if (mx == Int.MaxValue) Int.MaxValue else mx - mn
    }
    spans.length match {
      case 0 | 1 => Some(Prog(out, fold))
      case 2 if spans.min <= 8 => Some(Prog(out, fold))
      case _ => None
    }
  }

  /** A literal char at whose position `next` may hold a quantifier: plain
   * literals extend the current run; quantified ones become a single-char
   * class token with the quantifier's range. Returns the next index. */
  private def quantifiedLiteral(body: String, c: Char, next: Int,
      toks: ArrayBuffer[Tok], lit: ArrayBuffer[Byte],
      flushLit: () => Unit): Option[Int] = {
    if (next < body.length && "+*?{".contains(body.charAt(next))) {
      parseQuant(body, next).map { case (mn, mx, ni) =>
        val bits = new Array[Long](2)
        bit(bits, c)
        flushLit()
        toks += Cls(bits, mn, mx)
        ni
      }
    } else {
      lit += c.toByte
      Some(next)
    }
  }

  private def inCls(bits: Array[Long], b: Byte): Boolean =
    b >= 0 && (bits(b >>> 6) & (1L << (b & 63))) != 0

  private def foldByte(b: Byte, fold: Boolean): Byte =
    if (fold && b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Effective length under java.util.regex `$`: the byte count with ONE
   * final line terminator (`\r\n`, `\n`, `\r`, U+0085, U+2028, U+2029)
   * stripped. Shared by [[CharClassMatch]] and [[AsciiAltMatch]]. */
  def effectiveLength(s: UTF8String): Int = {
    val n = s.numBytes
    if (n >= 2 && s.getByte(n - 2) == '\r' && s.getByte(n - 1) == '\n') n - 2
    else if (n >= 1 && (s.getByte(n - 1) == '\n' || s.getByte(n - 1) == '\r')) n - 1
    else if (n >= 2 && (s.getByte(n - 2) & 0xff) == 0xc2 &&
      (s.getByte(n - 1) & 0xff) == 0x85) n - 2 // U+0085 NEL
    else if (n >= 3 && (s.getByte(n - 3) & 0xff) == 0xe2 &&
      (s.getByte(n - 2) & 0xff) == 0x80 &&
      ((s.getByte(n - 1) & 0xff) == 0xa8 || (s.getByte(n - 1) & 0xff) == 0xa9))
      n - 3 // U+2028 LS / U+2029 PS
    else n
  }

  /** Match the whole program against s[0,n) with the variable tokens at
   * vi1/vi2 assigned lengths len1/len2 (pass -1 for absent vars). */
  private def matchWith(s: UTF8String, n: Int, toks: Array[Tok], fold: Boolean,
      vi1: Int, len1: Int, vi2: Int, len2: Int): Boolean = {
    var pos = 0
    var t = 0
    while (t < toks.length) {
      toks(t) match {
        case Lit(bytes) =>
          if (pos + bytes.length > n) return false
          var i = 0
          while (i < bytes.length) {
            if (foldByte(s.getByte(pos + i), fold) != bytes(i)) return false
            i += 1
          }
          pos += bytes.length
        case Cls(bits, mn, mx) =>
          val len = if (mn == mx) mn else if (t == vi1) len1 else len2
          if (pos + len > n) return false
          var i = 0
          while (i < len) {
            if (!inCls(bits, foldByte(s.getByte(pos + i), fold))) return false
            i += 1
          }
          pos += len
      }
      t += 1
    }
    pos == n
  }

  /** Full anchored match of s against the program. Contract: identical to
   * java.util.regex (the `rlike` engine this kernel substitutes for), whose
   * `$` matches at end of input or before ONE final line terminator —
   * `\r\n` (as a unit), `\n`, `\r`, U+0085, U+2028 or U+2029. This is
   * deliberately the JAVA set, wider than Perl's `\n`-only rule: the same
   * pattern must give the same verdict whether or not it strength-reduced.
   * (The reference's Perl `$` would reject a bare trailing `\r`; its CSV
   * ingest — and ours, ManifestReader — strips CRLF before validation, so
   * the divergence is unreachable from file input and the kernel sides
   * with rlike for programmatic input.) */
  def run(s: UTF8String, prog: Prog): Boolean = {
    val toks = prog.toks
    val fold = prog.fold
    val n = effectiveLength(s)
    var fixed = 0
    var v1 = -1
    var v2 = -1
    var t = 0
    while (t < toks.length) {
      toks(t) match {
        case Lit(b) => fixed += b.length
        case Cls(_, mn, mx) =>
          if (mn == mx) fixed += mn
          else if (v1 < 0) v1 = t
          else v2 = t
      }
      t += 1
    }
    if (v1 < 0) return n == fixed && matchWith(s, n, toks, fold, -1, 0, -1, 0)
    val (mn1, mx1) = toks(v1) match { case Cls(_, a, b) => (a, b); case _ => return false }
    if (v2 < 0) {
      val mid = n - fixed
      return mid >= mn1 && mid <= mx1 && matchWith(s, n, toks, fold, v1, mid, -1, 0)
    }
    val (mn2, mx2) = toks(v2) match { case Cls(_, a, b) => (a, b); case _ => return false }
    // loop the smaller-span token's feasible lengths (compile caps it at 8)
    val span1 = if (mx1 == Int.MaxValue) Int.MaxValue else mx1 - mn1
    val span2 = if (mx2 == Int.MaxValue) Int.MaxValue else mx2 - mn2
    val (va, mnA, mxA, vb, mnB, mxB) =
      if (span1 <= span2) (v1, mn1, mx1, v2, mn2, mx2)
      else (v2, mn2, mx2, v1, mn1, mx1)
    val rest = n - fixed
    var lenA = mnA
    val hiA = math.min(mxA, rest - mnB)
    while (lenA <= hiA) {
      val lenB = rest - lenA
      if (lenB >= mnB && lenB <= mxB &&
        matchWith(s, n, toks, fold, va, lenA, vb, lenB)) return true
      lenA += 1
    }
    false
  }

  /** Generated-code entry point (janino-side reference type is Object). */
  def runGeneric(s: UTF8String, prog: AnyRef): Boolean =
    run(s, prog.asInstanceOf[Prog])

  /** Column form when the pattern is in scope; None -> caller uses rlike. */
  def columnIfSupported(c: Column, pattern: String): Option[Column] =
    compile(pattern).map(_ =>
      ColumnBridge.column(CharClassMatch(ColumnBridge.expression(c), pattern)))
}

/** See [[CharClassMatch$]]. The program recompiles from the pattern on
 * deserialization (the expression ships only the pattern string). */
case class CharClassMatch(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val program: CharClassMatch.Prog =
    CharClassMatch.compile(pattern).getOrElse(
      throw new IllegalArgumentException(s"unsupported pattern $pattern"))

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_class_match"

  override protected def nullSafeEval(value: Any): Any =
    CharClassMatch.run(value.asInstanceOf[UTF8String], program)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val progRef = ctx.addReferenceObj("ccmProgram", program, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharClassMatch$$.MODULE$$.runGeneric($c, $progRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharClassMatch =
    copy(child = newChild)
}
