package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Per-JOB time breakdown for one or more catalog queries — guide §1
 * measurement tooling (the frozen `Bench` harness times whole queries;
 * this extra main answers WHERE inside an iterative operator the wall
 * time goes: how many driver jobs, and how long each one ran). Not part
 * of the driver contract; `Bench.scala` untouched.
 *
 * Usage: runMain graft.JobProfile <query>[,<query>...]
 * Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
 *
 * Each query runs twice (the first pass absorbs codegen/JVM warm-up, the
 * second is reported); jobs are listed with their wall time and the
 * call-site description Spark captured.
 */
object JobProfile {

  final case class JobRec(id: Int, desc: String, started: Long,
      var ended: Long = -1L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("dd_clusters"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.ended = je.time
      }
    })

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up pass
      jobs.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give job-end events a moment to drain
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      println(f"== $name rows=$n wall=$wall%.3f s jobs=${recs.size}")
      var covered = 0.0
      for (r <- recs) {
        val d = if (r.ended > 0) (r.ended - r.started) / 1e3 else -1.0
        if (d > 0) covered += d
        println(f"  job ${r.id}%3d ${d}%7.3f s  ${r.desc.take(110)}")
      }
      println(f"  (sum of job times $covered%.3f s; gaps = driver/planning time)")
    }
    spark.stop()
  }
}
