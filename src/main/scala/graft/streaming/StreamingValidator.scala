package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.compile.ChecklistCompiler
import graft.engine.Validator
import graft.model.Checklist

/**
 * Structured Streaming form of the validation pass. Because the compiled
 * checklist is a pure stateless projection, the SAME expression tree that
 * validates a batch DataFrame validates a stream — `readStream` in,
 * `writeStream` out, no state, no watermark needed for the verdict itself.
 *
 * Windowed violation-rate monitoring (violations per rule per event-time
 * window) is the stateful companion: watermarked tumbling windows over the
 * violation stream.
 */
object StreamingValidator {

  /** Add violations/passed/error to a streaming DataFrame. Stateless —
   * works under any output mode, no shuffle. */
  def validateStream(stream: DataFrame, checklist: Checklist,
      rowIdCol: String): DataFrame = {
    val compiled = ChecklistCompiler.compile(checklist)
    stream
      .withColumn(Validator.ViolationsCol, compiled.violations)
      .withColumn(Validator.PassedCol, size(col(Validator.ViolationsCol)) === 0)
      .withColumn(Validator.ErrorCol, compiled.errorString(col(rowIdCol)))
  }

  /** Exploded violation stream (row_id, field, rule_id, message) — same
   * contract as the batch violations sink. */
  def violationStream(validated: DataFrame, rowIdCol: String): DataFrame =
    validated
      .filter(!col(Validator.PassedCol))
      .select(col(rowIdCol).as("row_id"), col("*"))
      .withColumn("v", explode(col(Validator.ViolationsCol)))
      .select(col("row_id"), col("v.field").as("field"),
        col("v.rule_id").as("rule_id"), col("v.message").as("message"))

  /** Violation counts per (rule_id, field) per tumbling event-time window,
   * watermarked so state is bounded. */
  def violationRates(validated: DataFrame, rowIdCol: String, tsCol: String,
      window_ : String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    validated
      .filter(!col(Validator.PassedCol))
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(col(Validator.ViolationsCol)).as("v"))
      .groupBy(window(col(tsCol), window_), col("v.rule_id").as("rule_id"),
        col("v.field").as("field"))
      .agg(count(lit(1)).as("n_violations"))
}
