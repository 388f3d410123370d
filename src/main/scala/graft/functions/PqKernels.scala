package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels — the FAISS PQ compression step (Jégou,
 * Douze & Schmid, TPAMI 2011): the vector splits into `m` subspaces, each
 * quantized independently to one of `k` per-subspace centroids, so a
 * d-dim float vector becomes `m` small code integers (8 bytes at
 * m=8/k<=256 vs 256 bytes for a 64-dim float vector — a 32× scan
 * shrink), and query distance is approximated by summing per-subspace
 * lookup-table entries (ADC — asymmetric distance computation) without
 * ever touching the original floats.
 *
 * Both kernels are codegen'd shuffle-free projections. Distances use the
 * EXPANDED squared-L2 form `dot(v,v) - 2·dot(v,c) + dot(c,c)` with
 * strictly sequential accumulation — the exact arithmetic DuckDB's
 * `list_dot_product` performs, so the oracle recomputes bit-identical
 * distances and the argmin codes match exactly (ties to the lower code
 * index on both sides).
 */
object PqKernels {

  /** Flatten + precompute per-code self-dots; validates a rectangular
   * codebook. Returns (flat m*k*dsub, norms m*k, m, k, dsub). */
  private[functions] def prep(codebooks: Array[Array[Array[Double]]])
      : (Array[Double], Array[Double], Int, Int, Int) = {
    val m = codebooks.length
    require(m > 0, "empty PQ codebook")
    val k = codebooks(0).length
    require(k > 0 && codebooks.forall(_.length == k),
      "ragged PQ codebook: every subspace needs the same code count")
    val dsub = codebooks(0)(0).length
    require(dsub > 0 && codebooks.forall(_.forall(_.length == dsub)),
      "ragged PQ codebook: every code needs the same sub-dimension")
    val flat = new Array[Double](m * k * dsub)
    val norms = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val cent = codebooks(j)(c)
        val off = (j * k + c) * dsub
        var s = 0.0
        var i = 0
        while (i < dsub) {
          flat(off + i) = cent(i)
          s += cent(i) * cent(i)
          i += 1
        }
        norms(j * k + c) = s
        c += 1
      }
      j += 1
    }
    (flat, norms, m, k, dsub)
  }

  /** PQ codes (array<int>, one per subspace) of a vector column. */
  def encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  /** ADC approximate squared-L2 of a codes column against a query lookup
   * table (`lut(j*k + c)` = expanded squared-L2 of the query's subspace-j
   * slice to code c — build it with [[adcLut]]). */
  def adcScore(codes: Column, lut: Array[Double], k: Int): Column =
    ColumnBridge.column(PqAdcScore(ColumnBridge.expression(codes), lut, k))

  /** Query-side ADC lookup table, the same expanded-form arithmetic the
   * encoder uses (sequential dots), so scores reconcile with the oracle. */
  def adcLut(query: Array[Double],
      codebooks: Array[Array[Array[Double]]]): Array[Double] = {
    val (flat, norms, m, k, dsub) = prep(codebooks)
    val lut = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var qq = 0.0
      var i = 0
      while (i < dsub) {
        val q = query(j * dsub + i)
        qq += q * q
        i += 1
      }
      var c = 0
      while (c < k) {
        val off = (j * k + c) * dsub
        var cross = 0.0
        var t = 0
        while (t < dsub) {
          cross += query(j * dsub + t) * flat(off + t)
          t += 1
        }
        lut(j * k + c) = qq - 2.0 * cross + norms(j * k + c)
        c += 1
      }
      j += 1
    }
    lut
  }
}

/** PQ encoder: per-subspace argmin over the codebook, expanded-form
 * squared L2, ties to the lower code. Output is array<int> of length m. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  @transient private lazy val (flat, norms, m, k, dsub) = PqKernels.prep(codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_encode"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"pq_encode over $t")
  }

  override protected def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    // fail-fast contract (matches pqCodebooks' dim % m require): a
    // dimension-mismatched vector would otherwise encode from PARTIAL dot
    // products and yield quietly wrong codes
    if (arr.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${arr.numElements()} dims, codebook wants ${m * dsub}")
    val isFloat = elemIsFloat
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val n = dsub
      var vv = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(base + i).toDouble else arr.getDouble(base + i)
        vv += x * x
        i += 1
      }
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (j * k + c) * dsub
        var cross = 0.0
        var t = 0
        while (t < n) {
          val x = if (isFloat) arr.getFloat(base + t).toDouble else arr.getDouble(base + t)
          cross += x * flat(off + t)
          t += 1
        }
        val d = vv - 2.0 * cross + norms(j * k + c)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val codes = ctx.freshName("codes"); val j = ctx.freshName("j")
    val base = ctx.freshName("base"); val n = ctx.freshName("n")
    val vv = ctx.freshName("vv"); val i = ctx.freshName("i")
    val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
    val c = ctx.freshName("cc"); val off = ctx.freshName("off")
    val cross = ctx.freshName("cross"); val t = ctx.freshName("t")
    val d = ctx.freshName("d"); val x = ctx.freshName("x")
    nullSafeCodeGen(ctx, ev, in => s"""
      |if ($in.numElements() != ${m * dsub}) {
      |  throw new IllegalArgumentException(
      |    "pq_encode: vector has " + $in.numElements() + " dims, codebook wants ${m * dsub}");
      |}
      |int[] $codes = new int[$m];
      |for (int $j = 0; $j < $m; $j++) {
      |  int $base = $j * $dsub;
      |  int $n = $dsub;
      |  double $vv = 0.0;
      |  for (int $i = 0; $i < $n; $i++) {
      |    double $x = (double) $in.$get($base + $i);
      |    $vv += $x * $x;
      |  }
      |  int $best = 0; double $bestD = Double.MAX_VALUE;
      |  for (int $c = 0; $c < $k; $c++) {
      |    int $off = ($j * $k + $c) * $dsub;
      |    double $cross = 0.0;
      |    for (int $t = 0; $t < $n; $t++) $cross += ((double) $in.$get($base + $t)) * $flatRef[$off + $t];
      |    double $d = $vv - 2.0 * $cross + $normRef[$j * $k + $c];
      |    if ($d < $bestD) { $bestD = $d; $best = $c; }
      |  }
      |  $codes[$j] = $best;
      |}
      |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC scorer: sum of per-subspace lookup-table entries at the code
 * indices, accumulated in subspace order. */
case class PqAdcScore(child: Expression, lut: Array[Double], k: Int)
    extends UnaryExpression {

  require(k > 0 && lut.length % k == 0, "lut length must be m*k")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(value: Any): Any = {
    val codes = value.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), lut.length / k)
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      // a code produced by a DIFFERENT codebook (c >= k) must be a clear
      // error, not an ArrayIndexOutOfBounds from deep inside generated code
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"pq_adc_score: code $c at subspace $j out of range [0, $k) — " +
            "codes were produced by a different codebook")
      s += lut(j * k + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("adcLut", lut, "double[]")
    val mMax = lut.length / k
    val s = ctx.freshName("s"); val j = ctx.freshName("j")
    val m = ctx.freshName("m")
    val c = ctx.freshName("code")
    nullSafeCodeGen(ctx, ev, in => s"""
      |int $m = java.lang.Math.min($in.numElements(), $mMax);
      |double $s = 0.0;
      |for (int $j = 0; $j < $m; $j++) {
      |  int $c = $in.getInt($j);
      |  if ($c < 0 || $c >= $k) {
      |    throw new IllegalArgumentException(
      |      "pq_adc_score: code " + $c + " at subspace " + $j +
      |      " out of range [0, $k) — codes were produced by a different codebook");
      |  }
      |  $s += $lutRef[$j * $k + $c];
      |}
      |${ev.value} = $s;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}
