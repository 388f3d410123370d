package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-inspection utility: runs one named catalog query, prints its
 * formatted physical plan and a timed count, twice (cold + warm), so plan
 * problems (missed broadcast, unexpected shuffle, codegen fallback) and
 * fixed overheads (Janino compile, scan init) can be told apart from real
 * per-row cost.
 *
 * Usage: sbt 'runMain graft.Explain <queryName> [sfDir]'
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    df.explain("formatted")
    for (pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[explain] pass=$pass rows=$n sec=$sec%.2f")
    }
    // With AQE the interesting plan is the FINAL one: exchange/stage reuse
    // only materializes at runtime, so re-run the query and print the
    // adaptive plan after execution (ReusedExchange / table-cache hits show
    // up here, not in the static explain above).
    // collect() (not count(): that builds a NEW query execution over an
    // added aggregate, leaving this one un-finalized) so the printed
    // AdaptiveSparkPlan is isFinalPlan=true.
    val ran = fn(spark, sfDir)
    println(s"[explain] final-plan run rows=${ran.collect().length}")
    println("=== final adaptive plan ===")
    println(ran.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
