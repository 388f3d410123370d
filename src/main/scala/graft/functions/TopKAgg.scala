package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: keeps the k best (score, id) pairs by
 * (score DESC, id ASC), returning them as a sorted array<struct<score,id>>.
 *
 * This is the scale-safe formulation of "top-k per group". The window
 * formulation (`row_number() OVER (PARTITION BY g ORDER BY s DESC)`)
 * shuffles EVERY input row into one partition per group — with a large
 * corpus that is one reducer receiving the whole table per group. As a
 * TypedImperativeAggregate this runs inside ObjectHashAggregate with
 * map-side partial aggregation: each input partition reduces its rows to a
 * k-entry heap per group BEFORE the exchange, so the shuffle volume is
 * bounded by (#groups x #partitions x k) fixed-width entries, independent
 * of the corpus size.
 *
 * The buffer is a binary heap keyed on "worst kept entry first" so inserts
 * are O(log k) and eviction is O(log k); eval sorts the final k entries.
 */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] {

  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k)

  override def update(b: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      b.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKByScore.Buffer, o: TopKByScore.Buffer): TopKByScore.Buffer = {
    var i = 0
    while (i < o.size) { b.add(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKByScore.Buffer): Any = {
    val out = b.sortedDesc
    new GenericArrayData(out.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })
  }

  override def serialize(b: TopKByScore.Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 16 * b.size)
    buf.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKByScore.Buffer(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) { b.add(buf.getDouble, buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {

  /** Aggregate Column: array<struct<score,id>> of the k best rows by
   * (score DESC, id ASC). `id` must be castable to bigint; `score` to double. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(
        ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")),
        k).toAggregateExpression())

  /** Fixed-capacity heap whose root is the WORST kept entry (min-heap on the
   * (score DESC, id ASC) preference order), so a better incoming entry
   * replaces the root in O(log k). */
  final class Buffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** true iff entry 1 ranks WORSE than entry 2 under (score DESC, id ASC). */
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def add(s: Double, id: Long): Unit = {
      if (size < k) {
        scores(size) = s; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        siftDown()
      }
    }

    private def siftUp(from: Int): Unit = {
      var i = from
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    /** Final (score, id) pairs, best first. */
    def sortedDesc: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](size)
      var i = 0
      while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }
  }
}

/**
 * Bounded top-k aggregate with a STRING payload: keeps the k best
 * (score, token) pairs by (score DESC, token ASC binary), returning them as
 * a sorted array<struct<score,token>>. The string sibling of
 * [[TopKByScore]], built for per-group top-k over open key spaces —
 * per-document TF-IDF keywords ([[graft.ops.TextAnalysis.tfidfKeywordsJoin]])
 * where the payload is a token, not a row id.
 *
 * Same scale contract as [[TopKByScore]]: runs inside ObjectHashAggregate
 * with map-side partial aggregation, so the shuffle carries at most
 * (#groups x #partitions x k) entries regardless of how many (doc, token)
 * rows feed it — the distributed replacement for the row_number window that
 * would funnel every scored token of a group through one partition.
 * Tie order is binary UTF8String comparison — identical to Spark's
 * array_sort on struct fields and DuckDB's default BINARY collation, so
 * oracle restatements rank ties the same way.
 */
case class TopKTokens(
    scoreExpr: Expression,
    tokenExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTokens.Buffer] {

  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, tokenExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_tokens"

  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("token", StringType),
    containsNull = false)

  override def createAggregationBuffer(): TopKTokens.Buffer =
    new TopKTokens.Buffer(k)

  override def update(b: TopKTokens.Buffer, input: InternalRow): TopKTokens.Buffer = {
    val s = scoreExpr.eval(input)
    val t = tokenExpr.eval(input)
    if (s != null && t != null)
      b.add(s.asInstanceOf[Double],
        t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    b
  }

  override def merge(b: TopKTokens.Buffer, o: TopKTokens.Buffer): TopKTokens.Buffer = {
    var i = 0
    while (i < o.size) { b.add(o.scores(i), o.tokens(i)); i += 1 }
    b
  }

  override def eval(b: TopKTokens.Buffer): Any = {
    val out = b.sortedDesc
    new GenericArrayData(out.map { case (s, t) =>
      new GenericInternalRow(Array[Any](s, t))
    })
  }

  override def serialize(b: TopKTokens.Buffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < b.size) { bytes += b.tokens(i).numBytes(); i += 1 }
    val buf = ByteBuffer.allocate(8 + 12 * b.size + bytes)
    buf.putInt(b.k).putInt(b.size)
    i = 0
    while (i < b.size) {
      val tb = b.tokens(i).getBytes
      buf.putDouble(b.scores(i)).putInt(tb.length).put(tb)
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTokens.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKTokens.Buffer(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val s = buf.getDouble
      val tb = new Array[Byte](buf.getInt)
      buf.get(tb)
      b.add(s, org.apache.spark.unsafe.types.UTF8String.fromBytes(tb))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTokens =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTokens =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKTokens =
    copy(scoreExpr = newChildren(0), tokenExpr = newChildren(1))
}

object TopKTokens {
  import org.apache.spark.unsafe.types.UTF8String

  /** Aggregate Column: array<struct<score,token>> of the k best rows by
   * (score DESC, token ASC). `score` must be castable to double. */
  def topK(score: Column, token: Column, k: Int): Column =
    ColumnBridge.column(
      TopKTokens(
        ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(token.cast("string")),
        k).toAggregateExpression())

  /** Fixed-capacity heap, root = WORST kept entry under (score DESC,
   * token ASC) — the [[TopKByScore.Buffer]] layout with a string payload
   * (UTF8String binary compare replaces the long compare). */
  final class Buffer(val k: Int) {
    val scores = new Array[Double](k)
    val tokens = new Array[UTF8String](k)
    var size = 0

    /** true iff entry 1 ranks WORSE than entry 2 under (score DESC, token ASC). */
    private def worse(s1: Double, t1: UTF8String, s2: Double, t2: UTF8String): Boolean =
      s1 < s2 || (s1 == s2 && t1.compareTo(t2) > 0)

    def add(s: Double, t: UTF8String): Unit = {
      // clone ONLY when the entry is actually kept: an UnsafeRow-backed
      // UTF8String points into a buffer the aggregate iterator reuses, so
      // storing the reference across rows silently corrupts the heap
      if (size < k) {
        scores(size) = s; tokens(size) = t.clone(); size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), tokens(0), s, t)) {
        scores(0) = s; tokens(0) = t.clone()
        siftDown()
      }
    }

    private def siftUp(from: Int): Unit = {
      var i = from
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), tokens(i), scores(p), tokens(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && worse(scores(l), tokens(l), scores(m), tokens(m))) m = l
        if (r < size && worse(scores(r), tokens(r), scores(m), tokens(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val tt = tokens(a); tokens(a) = tokens(b); tokens(b) = tt
    }

    /** Final (score, token) pairs, best first. */
    def sortedDesc: Array[(Double, UTF8String)] = {
      val out = new Array[(Double, UTF8String)](size)
      var i = 0
      while (i < size) { out(i) = (scores(i), tokens(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, UTF8String), b: (Double, UTF8String)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
      out
    }
  }
}
