package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Codegen'd array kernels for the dedup/similarity hot paths.
 *
 * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
 * CodegenFallback: every element evaluation walks an interpreted expression
 * tree with boxed lambda variables. For kernels that run a tight numeric
 * loop per row — 32 MinHash permutations, 64-bit SimHash vote counting,
 * cosine over embedding pairs — that interpretation overhead dominates the
 * job by 1-2 orders of magnitude (measured ~50x on the MinHash bench).
 * Each kernel below is a plain Catalyst Expression with `doGenCode`, so it
 * compiles to a primitive Java loop inside whole-stage codegen: no boxing,
 * no virtual calls, no per-element InternalRow allocation.
 *
 * Numeric semantics are IDENTICAL to the HOF formulations they replace
 * (asserted by FunctionsSpec against the reference formulations).
 */
object VectorKernels {

  /** MinHash signature column: per row, the minima of (a_j*x + b_j) mod P
   * over all shingle hashes x, for numHashes seeded affine permutations.
   * NULL for NULL/empty shingle arrays. */
  def minhashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSig.make(ColumnBridge.expression(shingles), numHashes, seed))

  /** Pack SimHash votes over token-hash arrays into one int64: bit b is set
   * iff more token hashes have bit b set than clear. NULL for NULL/empty. */
  def simhashPack(tokenHashes: Column): Column =
    ColumnBridge.column(SimHashPack(ColumnBridge.expression(tokenHashes)))

  /** Cosine similarity of two float/double array columns, accumulated in
   * double precision. NULL if either side is NULL or lengths differ. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 distance of a float/double vector column to a constant
   * centroid (fused loop; the IVF assignment kernel). */
  def l2sqTo(vec: Column, centroid: Array[Double]): Column =
    ColumnBridge.column(L2SqTo(ColumnBridge.expression(vec), centroid))

  /** Count of positions where two bigint arrays agree — the MinHash
   * signature-agreement Jaccard estimator's numerator. */
  def sigAgreement(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreement(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Distinct xxhash64'd word k-shingles of a token-array column. */
  def shingleHash64(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHash64(ColumnBridge.expression(tokens), k))

  /** Sign-of-projection LSH bucket id over a float/double vector column:
   * bit b set iff dot(vec, planes(b)) > 0. One fused loop over the vector
   * for all planes. */
  def hyperplaneLsh(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(HyperplaneLshBucket(ColumnBridge.expression(vec), planes))
}

/** See [[VectorKernels.minhashSig]]. One pass over the shingle array keeps
 * all numHashes running minima — O(n*k) primitive ops, no allocation until
 * the result array. */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var x = arr.getLong(i) % MinHashSig.Prime
        if (x < 0) x += MinHashSig.Prime
        var j = 0
        while (j < k) {
          val h = (x * as(j) + bs(j)) % MinHashSig.Prime
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val p = MinHashSig.Prime
    // every local via ctx.freshName: when the child is non-nullable,
    // nullSafeCodeGen emits this body UNBRACED into the enclosing codegen
    // method, so two kernel instances in one stage would otherwise
    // redeclare the same Java locals (janino "Redefinition of local
    // variable" -> silent interpreted fallback; seen in round 1 on annIvf).
    val n = ctx.freshName("n"); val k = ctx.freshName("k")
    val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    nullSafeCodeGen(ctx, ev, c => s"""
      |int $n = $c.numElements();
      |if ($n == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  int $k = $aRef.length;
      |  long[] $mins = new long[$k];
      |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
      |  for (int $i = 0; $i < $n; $i++) {
      |    if (!$c.isNullAt($i)) {
      |      long $x = $c.getLong($i) % ${p}L;
      |      if ($x < 0) $x += ${p}L;
      |      for (int $j = 0; $j < $k; $j++) {
      |        long $h = ($x * $aRef[$j] + $bRef[$j]) % ${p}L;
      |        if ($h < $mins[$j]) $mins[$j] = $h;
      |      }
      |    }
      |  }
      |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Mersenne prime 2^31-1: keeps every a*x+b product under 2^62. */
  val Prime = 2147483647L

  /** Seeded affine-permutation coefficients from (numHashes, seed) — shared
   * with [[graft.queries.Oracles]], whose DuckDB oracle inlines the same
   * pairs so both sides use identical permutations. */
  def coefficients(numHashes: Int, seed: Long = 42L): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((1L + rnd.nextLong(Prime - 1), rnd.nextLong(Prime)))
  }

  def make(child: Expression, numHashes: Int, seed: Long = 42L): MinHashSig = {
    val ab = coefficients(numHashes, seed)
    MinHashSig(child, ab.map(_._1), ab.map(_._2))
  }
}

/** See [[VectorKernels.simhashPack]]: 64 vote counters over the token-hash
 * bits, packed to the sign vector. */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) packed |= (1L << b); b += 1 }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName every local — see MinHashSig.doGenCode for why.
    val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
    val i = ctx.freshName("i"); val h = ctx.freshName("h")
    val b = ctx.freshName("b"); val b2 = ctx.freshName("b2")
    val packed = ctx.freshName("packed")
    nullSafeCodeGen(ctx, ev, c => s"""
      |int $n = $c.numElements();
      |if ($n == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  int[] $votes = new int[64];
      |  for (int $i = 0; $i < $n; $i++) {
      |    if (!$c.isNullAt($i)) {
      |      long $h = $c.getLong($i);
      |      for (int $b = 0; $b < 64; $b++) {
      |        if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
      |      }
      |    }
      |  }
      |  long $packed = 0L;
      |  for (int $b2 = 0; $b2 < 64; $b2++) if ($votes[$b2] > 0) $packed |= (1L << $b2);
      |  ${ev.value} = $packed;
      |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

/** See [[VectorKernels.cosine]]: single fused loop for dot product and both
 * norms; accepts array<float> or array<double> children. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"cosine over $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, isFloat: Boolean): String =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    // freshName every local — see MinHashSig.doGenCode for why.
    val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $n = $a.numElements();
      |if ($n != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
      |  for (int $i = 0; $i < $n; $i++) {
      |    double $x = ${get(a, i, fa)};
      |    double $y = ${get(b, i, fb)};
      |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      |  }
      |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** See [[VectorKernels.l2sqTo]]: dims beyond min(len, centroid.length) are
 * ignored, mirroring zip_with truncation. */
case class L2SqTo(child: Expression, centroid: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "l2sq_to"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"l2sq_to over $t")
  }

  override protected def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), centroid.length)
    val isFloat = elemIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - centroid(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroid", centroid, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    // freshName every local — this kernel is instantiated k times inside a
    // single least(struct(...)) filter in annIvf; the round-1 bare names
    // collided there (janino "Redefinition of local variable i") and the
    // whole stage fell back to interpreted execution (9.5s of the bench).
    val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
    val i = ctx.freshName("i"); val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, c => s"""
      |int $n = java.lang.Math.min($c.numElements(), $cRef.length);
      |double $acc = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $d = ((double) $c.$get($i)) - $cRef[$i];
      |  $acc += $d * $d;
      |}
      |${ev.value} = $acc;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): L2SqTo =
    copy(child = newChild)
}

/** See [[VectorKernels.hyperplaneLsh]]: planes are laid out row-major in one
 * flat double[] so the generated loop is cache-linear; dims beyond the
 * vector's length contribute 0 (and vice versa — dot truncates to the
 * shorter of vector/plane, matching zip_with semantics). */
case class HyperplaneLshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private val bits = planes.length
  private val dim = if (planes.isEmpty) 0 else planes(0).length
  private val flat: Array[Double] = planes.flatten

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_lsh_bucket"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"hyperplane_lsh over $t")
  }

  override protected def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val isFloat = elemIsFloat
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      val off = b * dim
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * flat(off + i)
        i += 1
      }
      if (dot > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    // freshName every local — see MinHashSig.doGenCode for why.
    val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
    val b = ctx.freshName("b"); val dot = ctx.freshName("dot")
    val off = ctx.freshName("off"); val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c => s"""
      |int $n = java.lang.Math.min($c.numElements(), $dim);
      |long $bucket = 0L;
      |for (int $b = 0; $b < $bits; $b++) {
      |  double $dot = 0.0;
      |  int $off = $b * $dim;
      |  for (int $i = 0; $i < $n; $i++) $dot += ((double) $c.$get($i)) * $planesRef[$off + $i];
      |  if ($dot > 0) $bucket |= (1L << $b);
      |}
      |${ev.value} = $bucket;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}

/** See [[VectorKernels.sigAgreement]]. */
case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_agreement"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) return null
    var agree = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName every local — see MinHashSig.doGenCode for why.
    val n = ctx.freshName("n"); val agree = ctx.freshName("agree")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $n = $a.numElements();
      |if ($n != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  int $agree = 0;
      |  for (int $i = 0; $i < $n; $i++) if ($a.getLong($i) == $b.getLong($i)) $agree++;
      |  ${ev.value} = $agree;
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreement =
    copy(left = l, right = r)
}
