package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.compile.ChecklistCompiler.{isEmptyCell, stripQuotes, typePredicate}
import graft.model.FieldType

/**
 * Plan evidence for the q_checkinfer optimization. `checklistProfile`
 * executes its profiling aggregate EAGERLY (the catalog query's own plan is
 * just the LocalTableScan of the finished result), so the interesting plan
 * is the internal one. This main dumps:
 *
 *  - `q_checkinfer_profile_after.txt` — the live
 *    [[graft.quality.ConstraintDiscovery.inferProfileFrame]] plan (single
 *    pass, capped distinct collect, no Expand);
 *  - `q_checkinfer_profile_before.txt` — a faithful reconstruction of the
 *    round-5 profiling aggregate (per-column exact `countDistinct`, the
 *    expression list of the pre-optimization `inferFields`) over the SAME
 *    input frame, so the Expand the optimization removed is visible.
 *
 * Same story for the wave-5 dd_clusters pair generation (the component
 * loop executes eagerly, so the catalog plan is just the final labels
 * scan): when `pairsDir` (arg 3, default the `graft.SfReplica 30`
 * output) exists, dumps the EDGE-building plans over its documents —
 *  - `dd_clusters_pairs_allpairs.txt`: the block self-join that scores
 *    every in-block pair (quadratic in block occupancy);
 *  - `dd_clusters_pairs_prefix.txt`: the prefix-filtered candidate join
 *    (explode prefix shingles → equi-join on (block, shingle) → dedupe →
 *    exact scoring of candidates only). At that occupancy the dispatch
 *    picks this branch, so the dumped plan is the live one.
 *
 * Usage: sbt 'runMain graft.ProfilePlanDump [outDir] [sfDir] [pairsDir]'
 */
object ProfilePlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the same derived frame qCheckinfer profiles
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val frame = o.select(
      col("o_orderkey").cast("string").as("okey"),
      when(col("o_orderkey") % 7 === 0, lit(""))
        .otherwise((col("o_orderkey") % 2).cast("string")).as("flag"),
      when(col("o_orderkey") % 3 === 0, lit("yes"))
        .when(col("o_orderkey") % 3 === 1, lit("TRUE"))
        .otherwise(lit("no")).as("b"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
      col("o_orderpriority").as("pri"),
      col("o_totalprice").cast("string").as("cmt"))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), txt)
      println(s"[profileplandump] wrote $outDir/$name.txt")
    }

    dump("q_checkinfer_profile_after",
      graft.quality.ConstraintDiscovery.inferProfileFrame(frame, 16))

    // round-5 reconstruction: identical expression list except the
    // cardinality test is a per-column exact countDistinct (and the Enum
    // value fetch was a SECOND scan per candidate, not shown here)
    val names = frame.schema.fields.map(_.name).toSeq
    def v(n: String) = stripQuotes(col(n).cast(StringType))
    def nonEmpty(n: String) = !isEmptyCell(col(n).cast(StringType))
    def countIf(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val aggsBefore = names.flatMap { n =>
      val ne = nonEmpty(n)
      Seq(
        countIf(ne).as(s"${n}__ne"),
        countIf(ne && typePredicate(FieldType.BoolT, v(n))).as(s"${n}__bool"),
        countIf(ne && typePredicate(FieldType.IntT(None, None), v(n))).as(s"${n}__int"),
        countIf(ne && typePredicate(FieldType.DateTimeT, v(n))).as(s"${n}__iso"),
        countDistinct(when(ne, v(n))).as(s"${n}__nd"),
        min(when(ne && typePredicate(FieldType.IntT(None, None), v(n)),
          v(n).cast(DecimalType(38, 0)))).as(s"${n}__min"),
        max(when(ne && typePredicate(FieldType.IntT(None, None), v(n)),
          v(n).cast(DecimalType(38, 0)))).as(s"${n}__max"))
    } :+ count(lit(1)).as("__rows")
    dump("q_checkinfer_profile_before",
      frame.agg(aggsBefore.head, aggsBefore.tail: _*))

    val pairsDir = args.lift(2).getOrElse("/tmp/graft_bench/sfx30_v1")
    if (new java.io.File(s"$pairsDir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$pairsDir/documents.parquet")
      dump("dd_clusters_pairs_allpairs",
        graft.ops.Dedup.blockedNgramPairs(docs, "doc_id", "text",
          Seq("lang", "n_chars"), k = 3, maxBlockSize = 1000)
          .filter(col("jaccard") >= 0.5))
      dump("dd_clusters_pairs_prefix",
        graft.ops.Dedup.blockedNgramPairs(docs, "doc_id", "text",
          Seq("lang", "n_chars"), k = 3, maxBlockSize = 1000,
          minJaccard = Some(0.5)))
    } else println(s"[profileplandump] $pairsDir missing — " +
      "run `runMain graft.SfReplica 30` first; pairs plans skipped")

    spark.stop()
  }
}
