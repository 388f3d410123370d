package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Capped DISTINCT-value collect for strings: the group's distinct non-null
 * values, sorted (binary UTF-8 order — identical to Spark's string
 * `orderBy`), or NULL the moment the (cap+1)-th distinct value appears.
 *
 * Why this exists ([[graft.quality.ConstraintDiscovery]]): the profiling
 * passes previously paid twice for every low-cardinality decision — an
 * exact per-column `countDistinct` (which Catalyst plans as an Expand that
 * multiplies the scanned rows by the number of distinct-aggregate groups)
 * and then a SECOND full scan per Enum candidate to fetch the value list
 * (`distinct().orderBy().limit(cap+1)`). This aggregate answers both
 * questions in the one profiling pass: a non-NULL result certifies
 * `n_distinct <= cap` EXACTLY (the array's length IS the distinct count)
 * and carries the sorted value list; NULL certifies `n_distinct > cap`.
 *
 * Scale shape: the buffer never holds more than `cap` values — a
 * high-cardinality column's partials collapse to a single overflow bit as
 * soon as any map partition sees cap+1 distinct values, so reduce-side
 * merge traffic for the 10^9-distinct column is O(1), not O(n_distinct).
 * Values are copied out of their (reused) scan buffers on retention.
 */
case class CappedDistinctStrings(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedDistinctStrings.Buffer] {

  require(cap > 0, "capped distinct collect needs cap > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // overflowed groups evaluate to NULL
  override def prettyName: String = "distinct_strings_capped"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): CappedDistinctStrings.Buffer =
    new CappedDistinctStrings.Buffer(cap)

  override def update(b: CappedDistinctStrings.Buffer, input: InternalRow): CappedDistinctStrings.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: CappedDistinctStrings.Buffer, o: CappedDistinctStrings.Buffer): CappedDistinctStrings.Buffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: CappedDistinctStrings.Buffer): Any =
    if (b.overflowed) null
    else new GenericArrayData(b.sortedValues.toArray[Any])

  override def serialize(b: CappedDistinctStrings.Buffer): Array[Byte] = {
    if (b.overflowed) return Array[Byte](1)
    val vals = b.sortedValues
    var bytes = 1 + 4
    vals.foreach(v => bytes += 4 + v.numBytes())
    val buf = ByteBuffer.allocate(bytes)
    buf.put(0: Byte).putInt(vals.length)
    vals.foreach { v =>
      val vb = v.getBytes
      buf.putInt(vb.length).put(vb)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedDistinctStrings.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new CappedDistinctStrings.Buffer(cap)
    if (buf.get() == (1: Byte)) { b.forceOverflow(); return b }
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val vb = new Array[Byte](len)
      buf.get(vb)
      b.addOwned(UTF8String.fromBytes(vb))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedDistinctStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedDistinctStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedDistinctStrings =
    copy(child = newChildren(0))
}

object CappedDistinctStrings {

  /** Aggregate Column: sorted array of the group's distinct non-null
   * values, or NULL if the group holds more than `cap` distinct values. */
  def collect(value: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedDistinctStrings(
        ColumnBridge.expression(value.cast("string")),
        cap).toAggregateExpression())

  /** Distinct set bounded at `cap` entries; the first distinct value past
   * the cap frees the set and leaves only the overflow bit — partials and
   * merges past the cap are O(1). */
  final class Buffer(val cap: Int) {
    private var set = new java.util.TreeSet[UTF8String]()
    private var over = false

    def overflowed: Boolean = over

    def add(v: UTF8String): Unit = {
      if (over || set.contains(v)) return
      if (set.size >= cap) forceOverflow()
      else set.add(v.clone()) // copy out of the reused scan buffer
    }

    /** Insert a value this buffer may own outright (deserialize/merge). */
    def addOwned(v: UTF8String): Unit = {
      if (over || set.contains(v)) return
      if (set.size >= cap) forceOverflow()
      else set.add(v)
    }

    def mergeFrom(o: Buffer): Unit =
      if (o.over) forceOverflow()
      else {
        val it = o.set.iterator()
        while (it.hasNext && !over) addOwned(it.next())
      }

    def forceOverflow(): Unit = { over = true; set = new java.util.TreeSet[UTF8String]() }

    /** Ascending binary (UTF-8 byte) order — UTF8String's natural order,
     * the same collation as Spark's string `orderBy`. */
    def sortedValues: Array[UTF8String] =
      set.toArray(new Array[UTF8String](set.size))
  }
}
