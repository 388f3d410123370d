package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-evidence dumper for the optimization rounds: writes
 * `df.explain("formatted")` output for the named catalog queries (or all of
 * them) to `<outDir>/<query>_<tag>.txt`, without executing the queries.
 *
 * Usage: sbt 'runMain graft.PlanDump <tag> <outDir> [q1,q2,...|all] [sfDir]'
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse(sys.error("usage: PlanDump <tag> <outDir> [queries] [sfDir]"))
    val outDir = args.lift(1).getOrElse("plans/r06")
    val which = args.lift(2).getOrElse("all")
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (which == "all") SparkEntry.queries.keys.toSeq.sorted
      else which.split(",").toSeq
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"[plandump] wrote $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
