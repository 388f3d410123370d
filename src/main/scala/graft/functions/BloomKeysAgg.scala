package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Per-group Bloom filter over an ALREADY-HASHED long column (pass
 * `xxhash64(col)` — same input convention as [[KmvSketch]]): the
 * manifest-level point-lookup index a min/max range stat cannot provide.
 * Range bounds prune equality probes on high-cardinality identity
 * columns (the reference's MD5/UUID field types, Types.pm:32-40; the
 * engine's `commit` sha) essentially never — every file's [min,max]
 * spans the hash domain — while a Bloom filter answers
 * "definitely absent" per file in ~10 bits/key.
 *
 * Sizing is ADAPTIVE: the buffer accumulates the group's distinct
 * hashes (bounded by `maxDistinct`) and the filter is built at eval
 * sized to the ACTUAL distinct count, so a 1k-row file costs ~1.2 KB
 * instead of a worst-case pre-sized filter. A group that exceeds
 * `maxDistinct` yields NULL — the caller records no bloom and the read
 * path keeps the file (degraded skipping, never a wrong answer; the
 * same failure direction as a Bloom false positive).
 *
 * Merge is set-union (saturation is sticky), so partials combine
 * map-side and the exchange carries at most `maxDistinct` longs per
 * group.
 */
case class BloomKeysAgg(
    child: Expression,
    fpp: Double,
    maxDistinct: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomKeysAgg.Buffer] {

  require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
  require(maxDistinct >= 1, "maxDistinct must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // null when saturated
  override def prettyName: String = "bloom_keys"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomKeysAgg.Buffer =
    new BloomKeysAgg.Buffer(maxDistinct)

  override def update(b: BloomKeysAgg.Buffer, input: InternalRow): BloomKeysAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BloomKeysAgg.Buffer, o: BloomKeysAgg.Buffer): BloomKeysAgg.Buffer = {
    if (o.saturated) { b.saturated = true; b.set.clear() } // saturation is sticky; drop the dead weight
    else {
      val it = o.set.iterator()
      while (it.hasNext && !b.saturated) b.add(it.next())
    }
    b
  }

  override def eval(b: BloomKeysAgg.Buffer): Any = {
    if (b.saturated) return null
    val bf = BloomFilter.create(math.max(b.set.size.toLong, 1L), fpp)
    val it = b.set.iterator()
    while (it.hasNext) bf.putLong(it.next())
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  override def serialize(b: BloomKeysAgg.Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(9 + 8 * b.set.size)
    buf.put(if (b.saturated) 1.toByte else 0.toByte)
    buf.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomKeysAgg.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new BloomKeysAgg.Buffer(maxDistinct)
    b.saturated = buf.get() == 1
    val n = buf.getInt
    var i = 0
    while (i < n) { b.set.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomKeysAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomKeysAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomKeysAgg =
    copy(child = newChildren(0))
}

object BloomKeysAgg {

  /** Aggregate Column over an already-hashed long column (use
   * `xxhash64(col)`): serialized Bloom bytes, or NULL past `maxDistinct`
   * distinct hashes. */
  def agg(hash: Column, fpp: Double = 0.01, maxDistinct: Int = 1000000): Column =
    ColumnBridge.column(
      BloomKeysAgg(ColumnBridge.expression(hash.cast("long")), fpp, maxDistinct)
        .toAggregateExpression())

  /** Probe a serialized filter: false = the hash is DEFINITELY absent. */
  def mightContain(bloomBytes: Array[Byte], hash: Long): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes)).mightContainLong(hash)

  /** Driver-side hash of an equality-probe value, guaranteed identical to
   * what the bloom-build aggregate fed this sketch (integrals
   * canonicalized to long; Spark's default xxhash64 seed) — evaluated via
   * the Catalyst expression itself so the two can never drift. `kind` is
   * the recorded catalog kind ("long" | "string"). */
  def probeHash(kind: String, value: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val lit = kind match {
      case "long" => Literal(value.toLong)
      case _ => Literal.create(value, org.apache.spark.sql.types.StringType)
    }
    // 42L = Spark's default hash seed, what the SQL xxhash64() used at
    // bloom-build time (functions.scala `xxhash64`) bakes in
    XxHash64(Seq(lit), 42L).eval(null).asInstanceOf[Long]
  }

  /** Distinct-hash accumulator with a sticky saturation flag. */
  final class Buffer(val maxDistinct: Int) {
    val set = new java.util.HashSet[java.lang.Long]()
    var saturated: Boolean = false

    def add(v: Long): Unit = if (!saturated) {
      set.add(v)
      if (set.size > maxDistinct) { set.clear(); saturated = true }
    }
  }
}
