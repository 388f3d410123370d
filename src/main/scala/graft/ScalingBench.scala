package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (north_rule: throughput scaling
 * efficiency >= 0.8 between N and 4N executors; sandbox proxy per the
 * driver instruction: the same job at local[N] vs local[4N] on identical
 * input).
 *
 * Measures the headline validation job (graft.Bench.validateBench) at ONE
 * core count per JVM — run it twice via tools/run_scaling.sh, which pins
 * the JVM's visible processors (SPARK_GRAFT_JVMPROCS) so the small-N run
 * is a faithful small-node proxy, then computes
 * efficiency = rps(4N) / (4 * rps(N)).
 *
 * Protocol per run: materialized parquet input, one warm-up pass, median
 * of 3 timed passes.
 */
object ScalingBench {

  def rpsAt(cores: Int, rows: Long): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val path = Bench.codeFilesParquet(spark, rows)
      Bench.validateBench(spark, path) // warm-up (JIT, codegen, page cache)
      val runs = (1 to 3).map(_ => Bench.validateBench(spark, path))
      val med = runs.map(_._4).sorted.apply(1)
      (runs.head._1, runs.head._1 / med)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "8000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_CORES",
      sys.env.getOrElse("SPARK_GRAFT_N", "8")).toInt
    val (total, rps) = rpsAt(cores, rows)
    println(
      s"""{"metric":"validate_rows_per_sec","cores":$cores,"rows":$total,"rows_per_sec":${rps.toLong}}""")
  }
}
