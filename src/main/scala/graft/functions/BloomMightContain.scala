package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Codegen'd probe of a broadcast Bloom filter over long keys — the
 * membership scale-path PAST [[InBroadcastSet]]: an exact broadcast set
 * over 10^8 dimension keys costs gigabytes per executor, while a Bloom
 * filter at 1% false-positive rate costs ~1.2 bits/key (~120 MB for 10^8)
 * and still answers "definitely absent" exactly — the one-sided guarantee
 * a semi-join reduction needs. This is the explicit-operator form of
 * Spark's own runtime bloom-filter join pruning
 * (spark.sql.optimizer.runtime.bloomFilter.*), usable where the optimizer
 * can't inject it (multi-stage pipelines, checks against out-of-plan
 * dimensions).
 *
 * Determinism: [[BloomFilter]] is a fixed-seed hash family over a bit
 * array whose merge is bitwise OR — the built filter (and so every probe
 * verdict) is a pure function of the inserted key SET, independent of
 * partitioning, insertion order or cluster size. Queries built on it stay
 * oracle-checkable as long as the final answer is exact (see
 * [[graft.quality.Referential.bloomViolations]]: bloom prune + exact
 * confirm).
 *
 * The generated code calls `mightContainLong` directly on the
 * executor-resolved filter — no boxing, no UDF, stays inside
 * whole-stage codegen.
 */
case class BloomMightContain(child: Expression, bcast: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(value: Any): Any =
    bcast.value.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastRef = ctx.addReferenceObj("bcastBloom", bcast,
      classOf[Broadcast[BloomFilter]].getName)
    val bfCls = classOf[BloomFilter].getName
    val bfTerm = ctx.addMutableState(bfCls, "resolvedBloom",
      v => s"$v = ($bfCls) $bcastRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfTerm.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  /**
   * Build a Bloom filter over `df.keyCol` (cast to long) and broadcast it.
   * `expectedItems` sizes the bit array for the target false-positive
   * rate — undersizing degrades `fpp`, never correctness. The build is one
   * aggregation over the dimension (mergeable partials, no shuffle of the
   * data rows themselves).
   */
  def broadcastBloom(df: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Broadcast[BloomFilter] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    require(expectedItems > 0, s"expectedItems must be positive")
    val bf = df.select(
      org.apache.spark.sql.functions.col(keyCol).cast("long").as(keyCol))
      .stat.bloomFilter(keyCol, expectedItems, fpp)
    df.sparkSession.sparkContext.broadcast(bf)
  }

  /** Probe predicate: true when `col` MIGHT be in the filter (exactly true
   * for every inserted key; spuriously true for ~fpp of absent keys). */
  def mightContain(col: Column, bcast: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(col.cast("long")), bcast))
}
