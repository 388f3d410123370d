package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-size scaling evidence for the round-4/5 operator additions
 * (`q_taxtree_dist`, `dd_spanrm`, `q_mi`, `q_bm25_batch` — the four the
 * round-4 verdict flagged as having only sf0.1 records — plus the
 * round-5 event-analytics family `ev_funnel`/`ev_cohort`/`ev_resample`
 * over a user-population-scaled event stream and `q_pagerank` over
 * synthetic graphs of 0.8M→51M edges), plus driver-roundtrip (Spark
 * job) counts for the iterative ops.
 *
 * Protocol (the clean-window discipline of `Bench`):
 *  - documents scale by deterministic replication: copy c of a row keeps
 *    the text plus a per-copy suffix token, `doc_id + c*10^7`. Original
 *    cross-document duplicate 3-grams stay duplicated (site counts grow
 *    with the multiplier — the realistic stress for span removal), while
 *    each copy also contributes fresh spans; inputs are materialized to
 *    parquet so every arm measures a real scan.
 *  - the hierarchy scales as a synthetic fanout-8 tree (parent(i) = i/8),
 *    so size grows 8x per arm while height grows by ONE level — the claim
 *    under test is rounds ∝ height, not size.
 *  - per (op, arm): planning outside the timer, 1 warm-up pass, then the
 *    min of 2 timed passes; Spark jobs counted per timed pass (a
 *    stand-in for driver round-trips: every count()/collect()/localCheckpoint
 *    the op issues is one job).
 *  - host-window telemetry (steal + external cores) recorded around the
 *    whole run so the record defends itself.
 *
 * Output: one JSON line per (op, arm) appended into
 * `BENCH/sf_scaling_r5.json` plus a summary line on stdout.
 */
object SfScalingBench {

  final case class Arm(op: String, scale: String, inputRows: Long,
      outRows: Long, sec: Double, jobs: Int)

  private def jobCounter(spark: SparkSession): () => Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    })
    () => n.get()
  }

  /** Replicated documents, materialized once per multiplier. */
  def scaledDocs(spark: SparkSession, sfDir: String, mult: Int): String = {
    val path = s"/tmp/graft_bench/sfscale_docs_m$mult"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      d.select(explode(sequence(lit(0), lit(mult - 1))).as("__c"),
          col("doc_id"), col("text"), col("lang"), col("source"))
        .select(
          (col("doc_id") + col("__c") * 10000000L).as("doc_id"),
          when(col("__c") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" copyv"), col("__c")))
            .as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Organic scaled corpus for the dedup-family arms: exact replication
   * would make every doc a near-dup of its copies, growing the PAIR GRAPH
   * quadratically with the multiplier — a property of that input, not of
   * the operator. Instead: deterministic 40-token word salad from a fixed
   * 800-word vocabulary (near-dup rate ~0 and scale-independent), plus a
   * planted clone for every 50th doc so components grow linearly. */
  def organicDocs(spark: SparkSession, mult: Int): String = {
    val path = s"/tmp/graft_bench/sfscale_organic_m$mult"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val vocabCol = array((0 until 800).map(i => lit("w" + i)): _*)
      val base = spark.range(5000L * mult).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)), i =>
          element_at(vocabCol,
            (pmod(xxhash64(col("id") * 1009 + i), lit(800)) + 1)
              .cast("int")))).as("text"))
      base.unionByName(
          base.filter(col("doc_id") % 50 === 0).select(
            (col("doc_id") + 1000000000L).as("doc_id"),
            concat(col("text"), lit(" qqtail")).as("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Replicated events for the event-analytics arms: copy c shifts the
   * user population (`user_id + c*10^4`) so the user-keyed shuffles grow
   * with the multiplier (the real stress — a funnel over 10x events on
   * the SAME users would just deepen per-user lists), and shifts
   * event_id to stay unique; timestamps/types/values keep the original
   * distribution so window/bucket semantics are unchanged. */
  def scaledEvents(spark: SparkSession, sfDir: String, mult: Int): String = {
    val path = s"/tmp/graft_bench/sfscale_events_m$mult"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      // the +c*10^4 shift only keeps copy populations disjoint if the
      // source ids fit under it — assert instead of silently colliding
      // (collided copies would stop the user-keyed shuffle from growing)
      val maxUser = spark.read.parquet(s"$sfDir/events.parquet")
        .agg(max("user_id")).head.getLong(0)
      require(maxUser < 10000L,
        s"scaledEvents assumes user_id < 10000, got max $maxUser")
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(explode(sequence(lit(0), lit(mult - 1))).as("__c"),
          col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .select(
          (col("event_id") + col("__c") * 1000000000L).as("event_id"),
          col("ts"),
          (col("user_id") + col("__c") * 10000L).as("user_id"),
          col("event_type"), col("value"))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Synthetic directed graph for the PageRank arms: ~8 out-edges per
   * non-dangling node, dst hash-derived (deterministic). Every 7th node
   * emits NO out-edges, so ~1/7 of the nodes are genuinely dangling and
   * the per-iteration dangling aggregate (the anti-join + mass
   * redistribution path) processes real rows at every size — a
   * uniform-src graph would leave it empty and the arm would not
   * exercise it. The claim under test: JOBS stay flat as the graph grows
   * (fixed iteration count, no convergence probes) and runtime grows
   * ~linearly. */
  def scaledGraph(spark: SparkSession, n: Long): String = {
    val path = s"/tmp/graft_bench/sfscale_graph_n$n"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      spark.range(8L * n)
        .select(pmod(col("id"), lit(n)).as("src"),
          pmod(xxhash64(col("id") * 2654435761L + 17L), lit(n)).as("dst"))
        .filter(pmod(col("src"), lit(7)) =!= 0)
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Synthetic fanout-8 hierarchy: ids 1..n, parent(i) = max(1, i/8),
   * root 1 self-parents (the build contract). Height ~ log8(n). */
  def scaledTree(spark: SparkSession, n: Long): (String, String) = {
    val nPath = s"/tmp/graft_bench/sfscale_tree_nodes_$n"
    val mPath = s"/tmp/graft_bench/sfscale_tree_names_$n"
    if (!new java.io.File(nPath + "/_SUCCESS").exists()) {
      val ids = spark.range(1, n + 1).select(col("id").as("tax_id"),
        greatest(lit(1L), col("id") / 8).as("parent_tax_id"),
        lit("node").as("rank"))
      ids.repartition(32).write.mode("overwrite").parquet(nPath)
      spark.range(1, n + 1).select(col("id").as("tax_id"),
          concat(lit("n"), col("id")).as("name"))
        .repartition(32).write.mode("overwrite").parquet(mPath)
    }
    (nPath, mPath)
  }

  /** One measured arm: warm-up pass, then min of 2 timed passes with the
   * per-pass job count taken from the faster pass.
   *
   * The timer wraps CONSTRUCTION + execution: the iterative ops
   * (buildDistributed, connectedComponents, bpeTrain) run their rounds
   * eagerly via per-round localCheckpoints while the result frame is
   * being built, so excluding construction would exclude the work under
   * test. Job counts therefore cover the whole op — every per-round
   * action/checkpoint is one driver round-trip (AQE sub-jobs included). */
  def measure(spark: SparkSession, op: String, scale: String,
      inputRows: Long, jobs: () => Int)(mk: => DataFrame): Arm = {
    def onePass(): (Long, Double, Int) = {
      val j0 = jobs()
      val t0 = System.nanoTime()
      val n = mk.count()
      (n, (System.nanoTime() - t0) / 1e9, jobs() - j0)
    }
    onePass() // warm-up (codegen, parquet reader init)
    val a = onePass(); val b = onePass()
    val best = if (a._2 <= b._2) a else b
    System.err.println(f"[sfscale] $op%-16s $scale%-8s in=$inputRows%9d " +
      f"out=${best._1}%9d sec=${best._2}%7.2f jobs=${best._3}%3d")
    Arm(op, scale, inputRows, best._1, best._2, best._3)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.getOrElse("SPARK_GRAFT_SF_MULTS", "1,5,10")
      .split(",").map(_.trim.toInt).toSeq
    val treeSizes = sys.env.getOrElse("SPARK_GRAFT_TREE_SIZES",
      "10000,80000,640000").split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = jobCounter(spark)

    val (arms, window) = Bench.WindowProbe.around {
      val docArms = mults.flatMap { m =>
        val path = scaledDocs(spark, sfDir, m)
        val docs = spark.read.parquet(path)
        val rows = docs.count()
        val bmQueries = Seq(
          (1L, "hash"), (1L, "join"), (1L, "spark"),
          (2L, "data"), (2L, "scan"), (3L, "the")).toDF("query_id", "term")
        Seq(
          measure(spark, "dd_spanrm", s"x$m", rows, jobs) {
            graft.ops.Dedup.removeDupSpans(
              spark.read.parquet(path), "doc_id", "text", k = 3)
          },
          measure(spark, "q_mi", s"x$m", rows, jobs) {
            graft.quality.ColumnStats.association(spark.read.parquet(path),
              Seq(("lang", "source"), ("source", "lang"), ("lang", "lang")))
          },
          measure(spark, "q_bm25_batch", s"x$m", rows, jobs) {
            graft.ops.TextAnalysis.bm25SearchJoin(spark.read.parquet(path),
              "doc_id", "text", bmQueries, "query_id", "term", k = 10)
          },
          // iterative ops (VERDICT r4 item 8 asks for driver-roundtrip
          // counts): connected components over the real MinHash pair
          // graph, and corpus-scale BPE at a fixed merge budget — rounds
          // must stay flat while data grows. Both run on the ORGANIC
          // scaled corpus (constant near-dup rate; see organicDocs).
          measure(spark, "dd_clusters", s"x$m",
              spark.read.parquet(organicDocs(spark, m)).count(), jobs) {
            val edges = graft.ops.Dedup.minhashCandidates(
              spark.read.parquet(organicDocs(spark, m)), "doc_id", "text")
            graft.ops.Clustering.connectedComponents(edges, "id_a", "id_b")
          },
          measure(spark, "ta_bpe", s"x$m",
              spark.read.parquet(organicDocs(spark, m)).count(), jobs) {
            graft.ops.TextAnalysis.bpeTrain(
              spark.read.parquet(organicDocs(spark, m)), "text", 12)
          })
      }
      val treeArms = treeSizes.map { n =>
        val (nPath, mPath) = scaledTree(spark, n)
        measure(spark, "q_taxtree_dist", s"n$n", n, jobs) {
          graft.sources.TaxTree.buildDistributed(
            spark.read.parquet(nPath), spark.read.parquet(mPath))
        }
      }
      // round-5 event-analytics + link-analysis additions: user-keyed
      // funnel/cohort shuffles grow with the (scaled) user population;
      // resample's cost is the bucket-aggregate scan (its grid is
      // generated, bounded by keys x span); pagerank jobs must stay flat
      val evArms = mults.flatMap { m =>
        val path = scaledEvents(spark, sfDir, m)
        val rows = spark.read.parquet(path).count()
        Seq(
          measure(spark, "ev_funnel", s"x$m", rows, jobs) {
            graft.ops.EventAnalytics.funnelCounts(
              spark.read.parquet(path), Seq("user_id"), "ts", "event_type",
              Seq("view", "click", "purchase"), windowSeconds = 6L * 3600L)
          },
          measure(spark, "ev_cohort", s"x$m", rows, jobs) {
            graft.ops.EventAnalytics.cohortRetention(
              spark.read.parquet(path), Seq("user_id"), "ts")
          },
          measure(spark, "ev_resample", s"x$m", rows, jobs) {
            graft.ops.EventAnalytics.resample(
              spark.read.parquet(path), Seq("event_type"), "ts", "hour",
              round(sum("value"), 6))
          })
      }
      val prArms = Seq(100000L, 800000L, 6400000L).map { n =>
        val path = scaledGraph(spark, n)
        val edgeRows = spark.read.parquet(path).count()
        measure(spark, "q_pagerank", s"n$n", edgeRows, jobs) {
          graft.ops.Graph.pageRankFixedPoint(
            spark.read.parquet(path), "src", "dst", iterations = 3)
        }
      }
      docArms ++ treeArms ++ evArms ++ prArms
    }

    val armJson = arms.map(a =>
      s"""{"op":"${a.op}","scale":"${a.scale}","input_rows":${a.inputRows},""" +
      f""""out_rows":${a.outRows},"sec":${a.sec}%.3f,"jobs":${a.jobs}}""")
      .mkString("[", ",", "]")
    val json = s"""{"metric":"sf_scaling","sf":"$sfDir","cpus":$cpus,""" +
      s""""arms":$armJson,"window":${window.json}}"""
    println(json)
    new java.io.File("BENCH").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH/sf_scaling_r5.json"), json)
    spark.stop()
  }
}
