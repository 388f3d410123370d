package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * KMV (k-minimum-values) distinct-count sketch as a mergeable
 * `TypedImperativeAggregate`: keeps the k smallest DISTINCT 64-bit hash
 * values (unsigned order) seen in the group, whatever the group size.
 *
 * Why not `approx_count_distinct`: Spark's HLL++ is the right default, but
 * its estimate depends on internal register layouts that no external
 * oracle can recompute. KMV (Bar-Yossef et al., RANDOM'02; the
 * "distinct sampling" estimator) is *deterministic given the hash*: the
 * k-th smallest xxhash64 of a value set is a pure function of the set, so
 * DuckDB can recompute the full sketch — hashes, k-th order statistic and
 * the estimate — from the raw data ([[graft.queries.SqlXxh64]]), making
 * this the one distinct sketch in the engine with a full-value oracle.
 * The union of two KMV sketches is the KMV of the union stream (merge =
 * set-union, re-truncate to k), so partials are mergeable map-side and the
 * exchange carries at most k longs per group — 100 TB-safe.
 *
 * Estimator: with u_k = (kth smallest unsigned hash + 1) / 2^64,
 * `est = (k-1)/u_k`; when fewer than k distinct hashes exist the buffer
 * holds ALL of them and the count is exact. Expected relative error is
 * ~1/sqrt(k-2).
 *
 * Input is the ALREADY-HASHED long column (pass `xxhash64(col)`): keeping
 * the hash in the plan lets Catalyst codegen it, keeps the sketch
 * type-agnostic, and is what the SQL oracle restates.
 */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def dataType: DataType = new StructType()
    .add("n_kept", IntegerType, nullable = false)
    .add("kth_hash", LongType, nullable = true) // null in the exact regime
    .add("est_distinct", DoubleType, nullable = false)

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(b: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvSketch.Buffer, o: KmvSketch.Buffer): KmvSketch.Buffer = {
    val it = o.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvSketch.Buffer): Any = {
    val m = b.set.size
    if (m < k) {
      new GenericInternalRow(Array[Any](m, null, m.toDouble))
    } else {
      val kth = b.set.last() // unsigned max of the k smallest
      val uk = (KmvSketch.unsignedToDouble(kth) + 1.0) / KmvSketch.Two64
      new GenericInternalRow(Array[Any](m, kth.longValue(), (k - 1).toDouble / uk))
    }
  }

  override def serialize(b: KmvSketch.Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 8 * b.set.size)
    buf.putInt(b.k).putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new KmvSketch.Buffer(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) { b.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
}

object KmvSketch {

  /** 2^64 — exactly representable as a double. */
  val Two64: Double = java.lang.Math.pow(2.0, 64)

  /** Correctly-rounded unsigned-long -> double (matches DuckDB's
   * UBIGINT::DOUBLE cast; a signed-add reconstruction can be off by an
   * ulp because it rounds twice). Called once per group at eval. */
  def unsignedToDouble(l: Long): Double =
    if (l >= 0) l.toDouble
    else new java.math.BigInteger(java.lang.Long.toUnsignedString(l)).doubleValue()

  /** Aggregate Column over an already-hashed long column (use
   * `xxhash64(col)`): struct(n_kept, kth_hash, est_distinct). */
  def sketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash.cast("long")), k)
        .toAggregateExpression())

  /** Bounded sorted set of the k smallest longs in UNSIGNED order. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))

    def add(v: Long): Unit = {
      if (set.size < k) { set.add(v); () }
      else if (java.lang.Long.compareUnsigned(v, set.last()) < 0) {
        if (set.add(v)) { set.pollLast(); () }
      }
    }
  }
}
