package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Validator
import graft.sources.CodeFiles

/**
 * Benchmark main. Prints ONE JSON line:
 * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *  "validate_rows_per_sec":N,"bench_rows":N}
 *
 * Two parts:
 *  1. per-query wall time over SPARK_GRAFT_SF_DIR (driver contract)
 *  2. the BASELINE.json headline: validated rows/sec (pass/fail verdict +
 *     violation count) over the synthetic code_files table, read from
 *     parquet (materialized once), CPU-bound on regex + sha256.
 */
object Bench {

  def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Materialize the synthetic code_files table once per (rows, seed). */
  def codeFilesParquet(spark: SparkSession, rows: Long): String = {
    val path = s"/tmp/graft_bench/code_files_$rows"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      CodeFiles.generate(spark, rows)
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** The headline job: full validation pass + violation-row count.
   * Returns (rows, invalid, violations, seconds). */
  def validateBench(spark: SparkSession, path: String): (Long, Long, Long, Double) = {
    val df = spark.read.parquet(path)
    val validated = Validator.validate(df, CodeFiles.checklist,
      Validator.Options(rowIdCol = Some("id"), contentCol = Some("content")))
    val (counts, sec) = timeIt {
      validated.agg(
        count(lit(1)),
        count(when(!col(Validator.PassedCol), 1)),
        sum(size(col(Validator.ViolationsCol)))).collect().head
    }
    (counts.getLong(0), counts.getLong(1), counts.getLong(2), sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results: Seq[(String, Double)] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val (_, sec) = timeIt {
          try fn(spark, sfDir).count()
          catch { case _: Throwable => -1L }
        }
        name -> sec
    }

    // headline: validated rows/sec on code_files (warm: one untimed pass)
    val path = codeFilesParquet(spark, benchRows)
    validateBench(spark, path) // warm-up (JIT + page cache)
    val runs = (1 to 3).map(_ => validateBench(spark, path))
    val med = runs.map(_._4).sorted.apply(1)
    val rps = runs.head._1 / med

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum + med}%.3f"
    val medS = f"$med%.3f"
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","validate_rows_per_sec":${rps.toLong},"bench_rows":$benchRows,"bench_invalid":${runs.head._2},"bench_violations":${runs.head._3},"validate_sec":$medS}""")
    spark.stop()
  }
}
