package graft

import org.apache.spark.sql.SparkSession

/** One-arm PageRank timing probe over a pre-materialized scaledGraph
 * parquet (see [[SfScalingBench.scaledGraph]]) — for A/B-ing the
 * iteration shape at the 44M-edge scale without re-running the full
 * sf-scaling suite. Usage: runMain graft.PrArm [n] */
object PrArm {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("6400000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = SfScalingBench.scaledGraph(spark, n)
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = graft.ops.Graph.pageRankFixedPoint(
        spark.read.parquet(path), "src", "dst", iterations = 3).count()
      println(f"[prarm] pass=$pass rows=$out sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
