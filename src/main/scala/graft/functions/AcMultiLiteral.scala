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
 * Byte-level Aho–Corasick. Two representations behind one match contract:
 *
 *  - DENSE (default for small dictionaries): the goto function closed into
 *    a full DFA (BFS over fail links) — one array load per input byte,
 *    but ~1 KiB of int[] per trie node.
 *  - SPARSE (above [[AcAutomaton.DenseNodeMax]] nodes): sorted per-node
 *    edge arrays + classic fail-link chasing. A 10k-term dictionary at
 *    ~10 bytes/term is ~100k nodes = ~100 MiB dense PER EXPRESSION
 *    INSTANCE per executor — the sparse automaton holds the same
 *    dictionary in a few MiB at the cost of amortized-O(1) (worst-case
 *    fail-chain) transitions. The crossover is a memory guard, not a
 *    speed choice: dense wins the hot loop, sparse wins survivability.
 *
 * Serializes as the dictionary alone; the automaton rebuilds lazily per
 * executor either way.
 */
final class AcAutomaton(val dict: Array[String],
    denseMax: Int = AcAutomaton.DenseNodeMax) extends Serializable {

  @transient private lazy val built: AcAutomaton.Built =
    AcAutomaton.build(dict, denseMax)

  /** One pass; greedy non-overlapping count per literal (== the count a
   * sequential `replace(text, lit, '')` computes), plus distinct-literal
   * count. Returns the struct row (n_terms, n_hits). The transition
   * differs between the dense and sparse automata, but the greedy
   * counting CONTRACT lives in exactly one place ([[MatchCounter]]) —
   * diverging copies would be the precise bug class the forced-sparse
   * parity test exists to catch. */
  def run(s: UTF8String): InternalRow = {
    val b = built
    val n = s.numBytes
    val m = new AcAutomaton.MatchCounter(dict.length, b.outs, b.patLen)
    var st = 0
    var i = 0
    if (b.dense != null) {
      val d = b.dense
      while (i < n) {
        st = d(st * 256 + (s.getByte(i) & 0xFF))
        m.onState(st, i)
        i += 1
      }
    } else {
      while (i < n) {
        st = b.stepSparse(st, s.getByte(i) & 0xFF)
        m.onState(st, i)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](m.terms, m.hits))
  }
}

object AcAutomaton {

  /** Greedy non-overlapping per-literal match bookkeeping, shared by the
   * dense and sparse match loops: for each automaton state reached at
   * byte position i, count ends-here literals under the sequential
   * replace-count contract (a literal's next match must start at or
   * after its previous match's end). */
  final class MatchCounter(nPats: Int, outs: Array[Array[Int]],
      patLen: Array[Int]) {
    private val lastEnd = new Array[Int](nPats) // 0 = no match yet (1-based ends)
    var hits = 0L
    var terms = 0

    def onState(st: Int, i: Int): Unit = {
      val out = outs(st)
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
    }
  }

  /** Above this trie-node count the closed DFA (256 ints = 1 KiB per
   * node) is a memory hazard — 65536 nodes = 64 MiB per expression
   * instance per executor — and the automaton switches to the sparse
   * fail-link form. */
  val DenseNodeMax: Int = 65536

  /** Built automaton: dense != null => DFA mode; otherwise the sparse
   * arrays drive [[stepSparse]]. outs/patLen are shared. */
  final class Built(
      val dense: Array[Int],
      val edgeBytes: Array[Array[Int]], // sorted byte values per node
      val edgeTo: Array[Array[Int]],    // targets aligned with edgeBytes
      val fail: Array[Int],
      val outs: Array[Array[Int]],
      val patLen: Array[Int]) {

    private def lookup(st: Int, c: Int): Int = {
      val keys = edgeBytes(st)
      var lo = 0
      var hi = keys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid)
        if (k == c) return edgeTo(st)(mid)
        else if (k < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** goto*(st, c): chase fail links until a node with an out-edge on c
     * (root misses land back at root). */
    def stepSparse(st: Int, c: Int): Int = {
      var s = st
      while (true) {
        val t = lookup(s, c)
        if (t >= 0) return t
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }
  }

  private[functions] def build(dict: Array[String], denseMax: Int): Built = {
    val pats = dict.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // sparse trie first (cheap for both modes)
    val edges = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.LinkedHashMap.empty[Int, Int])
    val outLists = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    for (pi <- pats.indices) {
      var s = 0
      for (b <- pats(pi)) {
        val c = b & 0xFF
        s = edges(s).getOrElseUpdate(c, {
          edges += scala.collection.mutable.LinkedHashMap.empty[Int, Int]
          outLists += scala.collection.mutable.ArrayBuffer.empty[Int]
          edges.size - 1
        })
      }
      outLists(s) += pi
    }
    val nNodes = edges.size
    val fail = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Integer]()

    if (nNodes <= denseMax) {
      // close the goto function into a dense DFA (the original fast path)
      val goto_ = Array.fill(nNodes * 256)(-1)
      for (s <- 0 until nNodes; (c, t) <- edges(s)) goto_(s * 256 + c) = t
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
      new Built(goto_, null, null, null,
        outLists.map(_.toArray.sorted).toArray, pats.map(_.length))
    } else {
      // sparse: fail links + output merge only; edges become sorted arrays
      val eb = new Array[Array[Int]](nNodes)
      val et = new Array[Array[Int]](nNodes)
      for (s <- 0 until nNodes) {
        val sorted = edges(s).toArray.sortBy(_._1)
        eb(s) = sorted.map(_._1)
        et(s) = sorted.map(_._2)
      }
      val pre = new Built(null, eb, et, fail, null, null)
      for ((_, t) <- edges(0)) { fail(t) = 0; queue.add(t) }
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        outLists(s) ++= outLists(fail(s))
        for ((c, t) <- edges(s)) {
          // fail(t) = goto*(fail(s), c) — BFS order guarantees fail(s)'s
          // own fail chain is already final
          fail(t) = pre.stepSparse(fail(s), c)
          queue.add(t)
        }
      }
      new Built(null, eb, et, fail,
        outLists.map(_.toArray.sorted).toArray, pats.map(_.length))
    }
  }
}
