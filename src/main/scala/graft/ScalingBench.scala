package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (north_rule: throughput scaling
 * efficiency >= 0.8 between N and 4N executors; sandbox proxy per the
 * driver instruction: the same job at local[N] vs local[4N] on identical
 * input).
 *
 * Runs the headline validation job (graft.Bench.validateBench) on the same
 * materialized code_files parquet at two core counts, sequential sessions,
 * median of 3 timed runs each after a warm-up. Prints one JSON line with
 * both throughputs and efficiency = T(4N) / (4 * T(N)).
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
      Bench.validateBench(spark, path) // warm-up
      val runs = (1 to 3).map(_ => Bench.validateBench(spark, path))
      val med = runs.map(_._4).sorted.apply(1)
      (runs.head._1, runs.head._1 / med)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val n4 = n * 4
    val (total, rpsSmall) = rpsAt(n, rows)
    val (_, rpsBig) = rpsAt(n4, rows)
    val eff = rpsBig / (4.0 * rpsSmall)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"n_cores":$n,"n4_cores":$n4,"rows":$total,"rows_per_sec_n":${rpsSmall.toLong},"rows_per_sec_4n":${rpsBig.toLong}}""")
  }
}
