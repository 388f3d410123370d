package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Builds a deterministic 10x replica of the sf0.1 fixture directory — the
 * "sf1" input for the full-catalog data-size scaling run (VERDICT item 8:
 * per-query sf0.1 → sf1 exponents, no query super-linear). Extra bench
 * tooling only: the frozen `Bench` harness is pointed at the output dir
 * via SPARK_GRAFT_SF_DIR; nothing here touches the driver contract.
 *
 * Replication scheme (copy c = 0 is the identity; c = 1..M-1):
 *  - TPC-H star: every key column shifts by c*1e6 (all keys < 1e6), so
 *    FK relationships and join fan-outs are preserved copy-locally —
 *    join/aggregate input grows 10x with output growing 10x;
 *  - region/nation: fixed dimensions, copied as-is (like TPC-H itself);
 *  - events: user_id += c*1e4, event_id += c*1e9 (the SfScalingBench
 *    scaledEvents pattern — the user population grows, so user-keyed
 *    shuffles grow, instead of just deepening per-user lists);
 *  - documents: originals kept; extra docs are fresh token salad drawn
 *    from the SAME 31-word vocabulary with the SAME 10-100 token-count
 *    band (hash-seeded, deterministic) — organic near-dup rate stays at
 *    the corpus's own ~0 level (replicating texts verbatim would make
 *    every copy a near-dup of its source: quadratic pair growth that is
 *    a property of THAT input, not of the operators — the
 *    SfScalingBench organicDocs lesson). New doc_ids start at 1e9 with
 *    stride 3: the catalog's planted-clone offsets (+100000 ≡ 1 mod 3,
 *    +200000 ≡ 2 mod 3) can never collide with a base id (0 mod 3);
 *  - embeddings: originals kept; extra vectors are fresh deterministic
 *    pseudo-random 64-dim UNIT vectors (xxhash64-seeded) — random unit
 *    vectors at dim 64 have pairwise |cos| >= 0.9 with probability ~0,
 *    so organic near-dup structure again stays flat while the planted
 *    %25 / %40 clone rules scale linearly. Labels uniform 0..9 like the
 *    original.
 *
 * Usage: runMain graft.SfReplica [mult] [outDir]
 */
object SfReplica {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val out = args.lift(1).getOrElse(s"/tmp/graft_bench/sfx${mult}_v1")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    def copies: org.apache.spark.sql.Column =
      explode(sequence(lit(0), lit(mult - 1)))

    def write(name: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[sfreplica] $name done")
    }

    def rd(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    val K = 1000000L // key shift per copy; every sf0.1 key is < 1e6

    // fixed dimensions
    write("region", rd("region"))
    write("nation", rd("nation"))

    write("customer", rd("customer").select(copies.as("__c"), col("*"))
      .select((col("c_custkey") + col("__c") * K).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))

    write("supplier", rd("supplier").select(copies.as("__c"), col("*"))
      .select((col("s_suppkey") + col("__c") * K).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal")))

    write("part", rd("part").select(copies.as("__c"), col("*"))
      .select((col("p_partkey") + col("__c") * K).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")))

    write("orders", rd("orders").select(copies.as("__c"), col("*"))
      .select((col("o_orderkey") + col("__c") * K).as("o_orderkey"),
        (col("o_custkey") + col("__c") * K).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")))

    write("lineitem", rd("lineitem").select(copies.as("__c"), col("*"))
      .select((col("l_orderkey") + col("__c") * K).as("l_orderkey"),
        (col("l_partkey") + col("__c") * K).as("l_partkey"),
        (col("l_suppkey") + col("__c") * K).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")))

    write("events", rd("events").select(copies.as("__c"), col("*"))
      .select((col("event_id") + col("__c") * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("__c") * 10000L).as("user_id"),
        col("event_type"), col("value"), col("props")))

    // documents: originals + family-matched fresh token salad
    val d0 = rd("documents")
    val vocab = d0.select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").distinct().orderBy("t")
      .collect().map(_.getString(0))
    val langs = d0.groupBy("lang").count().orderBy(col("count").desc)
      .collect().map(_.getString(0))
    val sources = d0.select("source").distinct().orderBy("source")
      .collect().map(_.getString(0))
    println(s"[sfreplica] vocab=${vocab.length} langs=${langs.length} " +
      s"sources=${sources.length}")
    val vocabCol = array(vocab.map(lit(_)): _*)
    val langCol = array(langs.map(lit(_)): _*)
    val srcCol = array(sources.map(lit(_)): _*)
    val nOrig = d0.count()
    val extra = spark.range((mult - 1) * nOrig).select(
      (lit(1000000000L) + col("id") * 3L).as("doc_id"))
      .select(col("doc_id"),
        // 10-100 tokens, like the original band
        concat_ws(" ", transform(
          sequence(lit(1),
            (pmod(xxhash64(col("doc_id"), lit(7L)), lit(91)) + 10).cast("int")),
          i => element_at(vocabCol,
            (pmod(xxhash64(col("doc_id") * 131L + i, lit(11L)),
              lit(vocab.length)) + 1).cast("int")))).as("text"),
        element_at(langCol,
          (pmod(xxhash64(col("doc_id"), lit(13L)), lit(langs.length)) + 1)
            .cast("int")).as("lang"),
        element_at(srcCol,
          (pmod(xxhash64(col("doc_id"), lit(17L)), lit(sources.length)) + 1)
            .cast("int")).as("source"))
      .withColumn("n_chars", length(col("text")))
    write("documents", d0.unionByName(extra))

    // embeddings: originals + fresh deterministic random unit vectors
    val e0 = rd("embeddings")
    val dim = e0.select(size(col("embedding"))).head().getInt(0)
    val nVec = e0.count()
    val rawVec = transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(col("vec_id") * 8191L + i, lit(23L)), lit(2000001L))
        .cast("double") / lit(1000000.5) - lit(1.0)))
    val extraV = spark.range((mult - 1) * nVec).select(
      (lit(1000000000L) + col("id") * 3L).as("vec_id"))
      .withColumn("__raw", rawVec)
      .withColumn("__norm",
        sqrt(aggregate(col("__raw"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("__raw"), x => (x / col("__norm")).cast("float"))
          .as("embedding"),
        pmod(xxhash64(col("vec_id"), lit(29L)), lit(10)).cast("int")
          .as("label"))
    write("embeddings", e0.unionByName(extraV))

    // _DONE marker like the fixture dirs
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_DONE"), "")
    spark.stop()
  }
}
