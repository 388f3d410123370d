package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-literal scan — the bad-word / blocked-phrase gate of
 * web-corpus curation (C4 drops any page containing a dictionary term;
 * Gopher/RefinedWeb count hits). One pass over the raw UTF-8 BYTES finds
 * every occurrence of every dictionary literal simultaneously:
 * `struct(n_terms, n_hits)` = how many distinct literals occur, and the
 * total occurrence count under per-literal greedy non-overlapping
 * semantics (exactly `replace`-count semantics, which is what the
 * `ta_block` DuckDB oracle restates per literal).
 *
 * Why a kernel: the composable alternative is |dict| `contains`/`replace`
 * passes per row — O(|dict| · |text|), quadratic-ish for thousand-term
 * dictionaries. The automaton is O(|text| + hits) regardless of
 * dictionary size: the classic multi-pattern win (Aho & Corasick, CACM
 * 1975). Byte-level matching needs no decode and cannot misalign: a
 * valid UTF-8 byte sequence only matches on code-point boundaries (lead
 * vs continuation bytes are disjoint ranges). Matching is case-SENSITIVE;
 * pass `lower(col)` for the usual case-folded gate.
 *
 * Scale shape: one codegen'd projection, no shuffle. The expression
 * serializes only the dictionary; each executor rebuilds the DFA once on
 * first use (@transient lazy), so the task payload stays small. (For
 * multi-MB dictionaries a broadcast variant would ship terms once per
 * executor — same pattern as [[InBroadcastSet]].)
 */
case class AcMultiLiteralStats(child: Expression, dict: Seq[String])
    extends UnaryExpression {

  require(dict.nonEmpty, "empty dictionary")
  require(dict.forall(_.nonEmpty), "empty literal in dictionary")
  require(dict.distinct.size == dict.size, "duplicate literal in dictionary")

  override def dataType: DataType = new StructType()
    .add("n_terms", IntegerType, nullable = false)
    .add("n_hits", LongType, nullable = false)
  override def prettyName: String = "ac_multi_literal_stats"

  @transient private lazy val auto = new AcAutomaton(dict.toArray)

  override protected def nullSafeEval(value: Any): Any =
    auto.run(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAuto", new AcAutomaton(dict.toArray),
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $autoRef.run($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMultiLiteralStats =
    copy(child = newChild)
}

object AcMultiLiteralStats {
  /** struct(n_terms, n_hits) of dictionary literals in a string column. */
  def stats(c: Column, dict: Seq[String]): Column =
    ColumnBridge.column(AcMultiLiteralStats(ColumnBridge.expression(c), dict))
}

/**
 * Byte-level Aho–Corasick with the goto function closed into a full DFA
 * (BFS over fail links), so the match loop is one array load per input
 * byte. Serializes as the dictionary alone; the DFA rebuilds lazily.
 */
final class AcAutomaton(val dict: Array[String]) extends Serializable {

  // dfa(state * 256 + byte) = next state; out(state) = literal indices
  // ending at state (own output + fail-chain outputs, precomputed).
  @transient private lazy val (dfa, outs, patLen): (Array[Int], Array[Array[Int]], Array[Int]) = {
    val pats = dict.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // trie build over a growable node table
    var cap = 16
    var goto_ = Array.fill(cap * 256)(-1)
    var nNodes = 1
    val outLists = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    def ensure(n: Int): Unit = if (n > cap) {
      val nc = math.max(cap * 2, n)
      goto_ = java.util.Arrays.copyOf(goto_, nc * 256)
      java.util.Arrays.fill(goto_, cap * 256, nc * 256, -1)
      cap = nc
    }
    for (pi <- pats.indices) {
      var s = 0
      for (b <- pats(pi)) {
        val c = b & 0xFF
        if (goto_(s * 256 + c) < 0) {
          ensure(nNodes + 1)
          goto_(s * 256 + c) = nNodes
          outLists += scala.collection.mutable.ArrayBuffer.empty[Int]
          nNodes += 1
        }
        s = goto_(s * 256 + c)
      }
      outLists(s) += pi
    }
    // BFS: fail links + DFA closure + output merge down fail chains
    val fail = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Integer]()
    for (c <- 0 until 256) {
      val nxt = goto_(c)
      if (nxt < 0) goto_(c) = 0
      else { fail(nxt) = 0; queue.add(nxt) }
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      outLists(s) ++= outLists(fail(s))
      for (c <- 0 until 256) {
        val nxt = goto_(s * 256 + c)
        if (nxt < 0) goto_(s * 256 + c) = goto_(fail(s) * 256 + c)
        else { fail(nxt) = goto_(fail(s) * 256 + c); queue.add(nxt) }
      }
    }
    (java.util.Arrays.copyOf(goto_, nNodes * 256),
      outLists.map(_.toArray.sorted).toArray, pats.map(_.length))
  }

  /** One pass; greedy non-overlapping count per literal (== the count a
   * sequential `replace(text, lit, '')` computes), plus distinct-literal
   * count. Returns the struct row (n_terms, n_hits). */
  def run(s: UTF8String): InternalRow = {
    val d = dfa; val o = outs // force lazy once
    val n = s.numBytes
    val lastEnd = new Array[Int](dict.length) // 0 = no match yet (ends are 1-based)
    var hits = 0L
    var terms = 0
    var st = 0
    var i = 0
    while (i < n) {
      st = d(st * 256 + (s.getByte(i) & 0xFF))
      val out = o(st)
      if (out.length > 0) {
        val end = i + 1
        var j = 0
        while (j < out.length) {
          val p = out(j)
          val start = end - patLen(p)
          if (lastEnd(p) == 0) terms += 1
          if (start >= (if (lastEnd(p) == 0) 0 else lastEnd(p))) {
            hits += 1L
            lastEnd(p) = end
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](terms, hits))
  }
}
