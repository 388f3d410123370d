package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded-memory frequent-items sketch (Misra–Gries 1982) as a mergeable
 * `TypedImperativeAggregate`: at most `capacity` (token, count) entries
 * per buffer, whatever the corpus size.
 *
 * Why not the exact word-count? At 100 TB the exact `groupBy(token)`
 * vocabulary ([[graft.ops.TextAnalysis.vocabulary]]) shuffles one partial
 * row per distinct token per map task — fine for natural-language
 * vocabularies, unbounded for open token spaces (identifiers, URLs,
 * hashes). This sketch bounds every partial buffer AND the exchange at
 * `capacity` fixed-width entries, with the classic guarantees:
 *
 *  - every item with true count > n/(capacity+1) is present (no false
 *    negatives among heavy hitters),
 *  - estimates never exceed the true count and undershoot by at most
 *    n/(capacity+1),
 *  - when the number of distinct items is <= capacity the sketch is EXACT
 *    (no decrement ever fires) and order-independent — the regime the
 *    DuckDB oracle checks; the error-bound regime is property-spec'd.
 *
 * Merge follows Agarwal et al., "Mergeable Summaries" (PODS'12): sum
 * counts, then subtract the (capacity+1)-largest count from every entry
 * and drop the non-positive ones — the result is again a valid MG
 * summary of the union stream.
 */
case class FreqItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsSketch.Buffer] {

  require(capacity > 0, "freq-items sketch needs capacity > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_sketch"

  override def dataType: DataType = ArrayType(
    new StructType().add("token", StringType).add("est_count", LongType),
    containsNull = false)

  override def createAggregationBuffer(): FreqItemsSketch.Buffer =
    new FreqItemsSketch.Buffer(capacity)

  override def update(b: FreqItemsSketch.Buffer, input: InternalRow): FreqItemsSketch.Buffer = {
    val v = child.eval(input)
    // UTF8String buffers may be reused by the row reader: copy to String.
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: FreqItemsSketch.Buffer, o: FreqItemsSketch.Buffer): FreqItemsSketch.Buffer = {
    o.counts.forEach((t, c) => b.addNoCompress(t, c))
    b.compressIfOver()
    b
  }

  override def eval(b: FreqItemsSketch.Buffer): Any = {
    val entries = new Array[(String, Long)](b.counts.size)
    var i = 0
    b.counts.forEach { (t, c) => entries(i) = (t, c); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), c: (String, Long)) =>
        a._2 > c._2 || (a._2 == c._2 && a._1 < c._1))
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(b: FreqItemsSketch.Buffer): Array[Byte] = {
    var bytes = 8
    b.counts.forEach { (t, _) =>
      bytes += 4 + t.getBytes(StandardCharsets.UTF_8).length + 8
    }
    val buf = ByteBuffer.allocate(bytes)
    buf.putInt(b.capacity).putInt(b.counts.size)
    b.counts.forEach { (t, c) =>
      val tb = t.getBytes(StandardCharsets.UTF_8)
      buf.putInt(tb.length).put(tb).putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsSketch.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new FreqItemsSketch.Buffer(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val tb = new Array[Byte](len)
      buf.get(tb)
      b.addNoCompress(new String(tb, StandardCharsets.UTF_8), buf.getLong)
      i += 1
    }
    // deserialized buffers are valid summaries already (size <= capacity)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren(0))
}

object FreqItemsSketch {

  /** Aggregate Column: array<struct<token,est_count>> sorted count DESC,
   * token ASC. `token` must be a string column. */
  def sketch(token: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqItemsSketch(
        ColumnBridge.expression(token.cast("string")), capacity)
        .toAggregateExpression())

  /** Misra–Gries summary: at most `capacity` counted entries. */
  final class Buffer(val capacity: Int) {
    val counts = new java.util.HashMap[String, Long]()

    /** One stream item (or a pre-counted batch of `c` identical items). */
    def add(t: String, c: Long): Unit = {
      addNoCompress(t, c)
      compressIfOver()
    }

    /** Merge-path insert: accumulate without the size invariant; caller
     * runs [[compressIfOver]] once at the end. */
    def addNoCompress(t: String, c: Long): Unit =
      counts.merge(t, c, (a, b) => a + b)

    /** Restore size <= capacity: subtract the (capacity+1)-largest count
     * from every entry and drop the non-positive ones (the mergeable-MG
     * compress step; for the single-item update path this decrements by
     * the new item's own count-of-1, i.e. the classic MG decrement). */
    def compressIfOver(): Unit = {
      if (counts.size <= capacity) return
      val vals = new Array[Long](counts.size)
      var i = 0
      val it = counts.values.iterator()
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (capacity + 1)) // (capacity+1)-largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nc = e.getValue - sub
        if (nc <= 0) eit.remove() else e.setValue(nc)
      }
    }
  }
}
