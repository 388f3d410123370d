package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark's DataFrame API lacks as primitives,
 * composed from built-ins the Catalyst way rather than as custom physical
 * plans: an as-of join is ONE union + ONE window over (key, time) — a
 * single shuffle on the key, an in-partition sort, and a carry-forward
 * aggregate that whole-stage-codegens. (kdb `aj`, pandas `merge_asof`,
 * DuckDB `ASOF JOIN` are the reference semantics.)
 */
object Joins {

  /**
   * Backward as-of join: for every left row, attach the LATEST right row
   * of the same key whose `rightTs <= leftTs` (inclusive — the DuckDB
   * `ASOF JOIN ... ON l.ts >= r.ts` contract). Left rows with no prior
   * right row (or a NULL timestamp) keep NULL right columns; right rows
   * with NULL timestamps never match. Among right rows tying on
   * (key, rightTs), the one with the lexicographically LARGEST remaining
   * column tuple wins — a total, deterministic order, stable across
   * partitionings.
   *
   * HOW: tag-union both sides on (key, ts), window per key ordered by
   * (ts, side) with right rows sorting BEFORE left rows at equal ts, and
   * carry `max(right-row struct)` forward over ROWS UNBOUNDED
   * PRECEDING..CURRENT ROW. The struct's first field is `rightTs`, so the
   * running max IS the latest prior right row; aggregate max ignores the
   * NULL struct that left rows contribute. One exchange (hash by key),
   * one sort — the minimal distributed as-of; a sort-merge join
   * formulation would shuffle both sides the same amount and then still
   * need the per-key scan.
   *
   * Scale notes: a hot key serializes into one partition's sort — the
   * standard mitigation is compound-key chunking (append a coarse time
   * bucket to the partition key and replicate each bucket's last right
   * row into the next bucket), which preserves semantics because the
   * carry-forward state is exactly one row. Left and right column names
   * must be disjoint apart from the key (enforced); timestamps compare at
   * microsecond precision.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == keyCol).toSeq
    require(rightPayload.contains(rightTsCol),
      s"right side must contain its timestamp column '$rightTsCol'")
    val leftCols = left.columns.toSeq
    val clash = rightPayload.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"left/right column names must be disjoint apart from '$keyCol'; " +
        s"clashing: ${clash.mkString(", ")}")

    // right-row struct: ts FIRST (the carry-forward max ranks on it),
    // then the remaining payload columns as the deterministic tiebreak
    val rStructNames = rightTsCol +: rightPayload.filterNot(_ == rightTsCol)
    val rStructCols = rStructNames.map(col)
    val rTagged = right.filter(col(rightTsCol).isNotNull).select(
      col(keyCol), col(rightTsCol).as("__ts"), lit(0).as("__side"),
      struct(rStructCols: _*).as("__r"))
    val rType = rTagged.schema("__r").dataType
    val lTagged = left.select(
      col(keyCol), col(leftTsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rType).as("__r"), struct(leftCols.map(col): _*).as("__l"))

    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.withColumn("__l", lit(null).cast(lTagged.schema("__l").dataType))
      .unionByName(lTagged)
      .withColumn("__best", max(col("__r")).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map(c => col(s"__l.$c").as(c))
    val outRight = rStructNames.map(c => col(s"__best.$c").as(c))
    carried.select(outLeft ++ outRight: _*)
  }
}
