package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Capped per-group collect of (id, signature) entries with the
 * oversized-group guard FUSED into the aggregate: the buffer retains at
 * most `cap` entries but keeps counting, and once the EXACT total for the
 * group exceeds `cap` the group evaluates to NULL (callers filter it out
 * — the same "drop degenerate buckets" semantics as a separate
 * count-pass + broadcast anti-join, from one pass instead of two).
 *
 * Why this exists (see [[graft.ops.Dedup.minhashCandidates]]): the
 * two-pass guard scans the corpus — and recomputes the shingle+minhash
 * signature pipeline, the dominant per-row cost — TWICE, once for the
 * bucket-count pass and once for the collect pass. Fusing the guard makes
 * MinHash-LSH a single scan + single shuffle. Skew stays bounded without
 * the anti-join's map-side drop because partial aggregation caps what any
 * map partition ships per bucket: a degenerate bucket moves at most
 * (#partitions x cap) entries, not its full membership, and reduce-side
 * merges short-circuit to count-only as soon as the total passes `cap`.
 *
 * Retained entries are sorted by id at eval, so the output is
 * deterministic regardless of partitioning / merge order. NULL signatures
 * are skipped (collect_list semantics); ids must be non-null longs.
 */
case class CollectSigsCapped(
    idExpr: Expression,
    sigExpr: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectSigsCapped.Buffer] {

  require(cap > 0, "capped collect needs cap > 0")

  override def children: Seq[Expression] = Seq(idExpr, sigExpr)
  override def nullable: Boolean = true // oversized groups evaluate to NULL
  override def prettyName: String = "collect_sigs_capped"

  override def dataType: DataType = ArrayType(
    new StructType()
      .add("id", LongType, nullable = false)
      .add("sig", ArrayType(LongType, containsNull = false), nullable = false),
    containsNull = false)

  override def createAggregationBuffer(): CollectSigsCapped.Buffer =
    new CollectSigsCapped.Buffer(cap)

  override def update(b: CollectSigsCapped.Buffer, input: InternalRow): CollectSigsCapped.Buffer = {
    val id = idExpr.eval(input)
    val sig = sigExpr.eval(input)
    if (id != null && sig != null)
      b.add(id.asInstanceOf[Long], sig.asInstanceOf[ArrayData].toLongArray())
    b
  }

  override def merge(b: CollectSigsCapped.Buffer, o: CollectSigsCapped.Buffer): CollectSigsCapped.Buffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: CollectSigsCapped.Buffer): Any =
    if (b.overflowed) null
    else {
      val (ids, sigs) = b.sortedById
      new GenericArrayData(ids.indices.map { i =>
        new GenericInternalRow(Array[Any](ids(i), new GenericArrayData(sigs(i))))
      }.toArray[Any])
    }

  override def serialize(b: CollectSigsCapped.Buffer): Array[Byte] = {
    // overflowed partials ship as a bare count — the retained entries were
    // already discarded the moment the cap was crossed. Each entry carries
    // its OWN signature length: the SQL surface accepts arbitrary arrays,
    // so a group may hold ragged sig widths (a uniform-width header either
    // crashed or silently truncated such groups).
    val retained = if (b.overflowed) 0 else b.size
    var bytes = 8 + 4
    var i = 0
    while (i < retained) { bytes += 4 + 8 + 8 * b.sigs(i).length; i += 1 }
    val buf = ByteBuffer.allocate(bytes)
    buf.putLong(b.total).putInt(retained)
    i = 0
    while (i < retained) {
      val s = b.sigs(i)
      buf.putInt(s.length).putLong(b.ids(i))
      var j = 0
      while (j < s.length) { buf.putLong(s(j)); j += 1 }
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectSigsCapped.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new CollectSigsCapped.Buffer(cap)
    val total = buf.getLong
    val retained = buf.getInt
    var i = 0
    while (i < retained) {
      val sigLen = buf.getInt
      val id = buf.getLong
      val s = new Array[Long](sigLen)
      var j = 0
      while (j < sigLen) { s(j) = buf.getLong; j += 1 }
      b.add(id, s)
      i += 1
    }
    b.forceTotal(total)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSigsCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSigsCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectSigsCapped =
    copy(idExpr = newChildren(0), sigExpr = newChildren(1))
}

object CollectSigsCapped {

  /** Aggregate Column: array<struct<id,sig>> of the group's members sorted
   * by id, or NULL if the group holds more than `cap` members. */
  def collect(id: Column, sig: Column, cap: Int): Column =
    ColumnBridge.column(
      CollectSigsCapped(
        ColumnBridge.expression(id.cast("long")),
        ColumnBridge.expression(sig),
        cap).toAggregateExpression())

  /** Grow-to-cap entry store with an exact running total. Once the total
   * crosses the cap the retained entries are freed and only the count
   * advances — partials and merges past the cap are O(1). */
  final class Buffer(val cap: Int) {
    var ids = new Array[Long](math.min(cap, 16))
    var sigs = new Array[Array[Long]](math.min(cap, 16))
    var size = 0
    var total = 0L

    def overflowed: Boolean = total > cap

    def add(id: Long, sig: Array[Long]): Unit = {
      total += 1
      if (overflowed) { drop(); return }
      if (size == ids.length) {
        val n = math.min(cap, ids.length * 2)
        ids = java.util.Arrays.copyOf(ids, n)
        sigs = java.util.Arrays.copyOf(sigs, n)
      }
      ids(size) = id; sigs(size) = sig; size += 1
    }

    def mergeFrom(o: Buffer): Unit = {
      val newTotal = total + o.total
      if (newTotal > cap) { total = newTotal; drop(); return }
      var i = 0
      while (i < o.size) { add(o.ids(i), o.sigs(i)); i += 1 }
      total = newTotal // add() already counted o's entries; restore exact
    }

    /** Deserialization helper: retained entries were re-added (bumping
     * total), but the wire total is authoritative — it may include
     * discarded overflow counts. */
    def forceTotal(t: Long): Unit = { total = t; if (overflowed) drop() }

    private def drop(): Unit =
      if (size > 0) { size = 0; ids = new Array[Long](0); sigs = new Array[Array[Long]](0) }

    /** (ids, sigs) sorted ascending by id — deterministic output order. */
    def sortedById: (Array[Long], Array[Array[Long]]) = {
      val idx = (0 until size).sortBy(i => ids(i))
      (idx.map(ids).toArray, idx.map(sigs).toArray)
    }
  }
}
