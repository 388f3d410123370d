package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** SQL-surface registration: every kernel callable from spark.sql with
 * results identical to the Column API. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("is_iso8601 from SQL") {
    val got = spark.sql(
      "SELECT is_iso8601('2014-W49-3'), is_iso8601('2014-13-04'), is_iso8601(NULL)")
      .collect().head
    assert(got.getBoolean(0) === true)
    assert(got.getBoolean(1) === false)
    assert(got.isNullAt(2))
  }

  test("cosine_sim / sig_agreement / simhash_pack from SQL") {
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        |  cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c2,
        |  sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agree,
        |  simhash_pack(array(5L)) AS sh""".stripMargin).collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
    assert(r.getInt(2) === 2)
    assert(r.getLong(3) === 5L) // single hash: sign vector == the hash itself
  }

  test("shingle_hash64 + minhash_sig from SQL match the Column API") {
    val df = Seq("alpha beta gamma delta", "one two three").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT minhash_sig(shingle_hash64(split(text, ' '), 2), 8) AS sig
        |FROM ext_docs""".stripMargin)
      .collect().map(_.getSeq[Long](0))
    val api = df.select(graft.functions.VectorKernels.minhashSig(
      graft.functions.VectorKernels.shingleHash64(split($"text", " "), 2), 8).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sql.toSeq === api.toSeq)
  }

  test("top_k_by_score works as a SQL aggregate with partial aggregation") {
    val got = spark.sql(
      """SELECT g, top_k_by_score(s, id, 2) AS tk
        |FROM VALUES (1, 0.5D, 10L), (1, 0.9D, 4L), (1, 0.7D, 1L),
        |            (2, 0.1D, 7L), (2, 0.3D, 9L) AS t(g, s, id)
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
    assert(got.toSeq === Seq(
      1 -> Seq((0.9, 4L), (0.7, 1L)),
      2 -> Seq((0.3, 9L), (0.1, 7L))))
  }

  test("winnow_fingerprints from SQL matches the Column API") {
    val got = spark.sql(
      """SELECT winnow_fingerprints(split('a b a', ' '), 1, 2) AS f""")
      .collect().head.getSeq[Long](0)
    assert(got === Seq(97L)) // hashes [97,98,97] -> window mins [97,97]
  }

  test("freq_items_sketch works as a SQL aggregate (exact regime)") {
    val got = spark.sql(
      """SELECT freq_items_sketch(t, 8) AS sk
        |FROM VALUES ('a'), ('b'), ('a'), ('c'), ('a'), ('b') AS v(t)""".stripMargin)
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(got.toSeq === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("kmv_distinct works as a SQL aggregate and casts int input") {
    val got = spark.sql(
      """SELECT kmv_distinct(xxhash64(v), 8) AS s
        |FROM VALUES (1), (2), (3), (2), (1) AS t(v)""".stripMargin)
      .select("s.n_kept", "s.est_distinct").collect().head
    assert(got.getInt(0) === 3)
    assert(got.getDouble(1) === 3.0)
  }

  test("top_k_by_score casts int score/id like the Column API (no runtime CCE)") {
    val got = spark.sql(
      """SELECT top_k_by_score(s, id, 2) AS tk
        |FROM VALUES (5, 10), (9, 4), (7, 1) AS t(s, id)""".stripMargin)
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(got === Seq((9.0, 4L), (7.0, 1L)))
  }

  test("collect_sigs_capped from SQL: capped group NULLs out, kept group sorted by id") {
    val got = spark.sql(
      """SELECT g, collect_sigs_capped(id, sig, 2) AS m
        |FROM VALUES (1, 5L, array(1L, 2L)), (1, 3L, array(9L)),
        |            (2, 1L, array(0L)), (2, 2L, array(0L)), (2, 3L, array(0L))
        |     AS t(g, id, sig)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    // group 1 (2 members, sorted by id) kept; group 2 (3 > cap) is NULL
    val m1 = got(0).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getSeq[Long](1)))
    assert(m1 === Seq((3L, Seq(9L)), (5L, Seq(1L, 2L))))
    assert(got(1).isNullAt(1))
  }

  test("is_blank + char_class_match from SQL") {
    val r = spark.sql(
      """SELECT is_blank(''), is_blank(' \t'), is_blank('x'),
        |  char_class_match('abc123', '^[a-z]{3}[0-9]+$'),
        |  char_class_match('abc', '^[a-z]{3}[0-9]+$')""".stripMargin).collect().head
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    // unsupported pattern -> clear error, not silent misbehavior
    val e = intercept[Exception] {
      spark.sql("SELECT char_class_match('a', '^(a|b)$')").collect()
    }
    assert(e.getMessage.contains("supported"))
  }

  test("zorder64 from SQL matches the Column API (int args cast like it)") {
    val r = spark.sql(
      "SELECT zorder64(3, 5) AS z1, zorder64(-1, CAST(7 AS BIGINT)) AS z2, " +
        "zorder64(NULL, 1) AS z3").collect().head
    assert(r.getLong(0) === graft.functions.ZOrder64.compute(3, 5))
    assert(r.getLong(1) === graft.functions.ZOrder64.compute(-1, 7))
    assert(r.isNullAt(2))
  }

  test("nfc_normalize from SQL matches the Column API") {
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS a, nfc_normalize('plain') AS b, " +
        "nfc_normalize(NULL) AS c").collect().head
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getString(1) === "plain")
    assert(r.isNullAt(2))
  }

  test("ac_multi_literal_stats + char_entropy from SQL match the Column API") {
    val r = spark.sql(
      "SELECT ac_multi_literal_stats('aba bad abab', array('ab', 'bad')) AS s, " +
        "round(char_entropy('aabb'), 6) AS h, " +
        "ac_multi_literal_stats(NULL, array('x')) AS n").collect().head
    val s = r.getStruct(0)
    assert(s.getInt(0) === 2)  // both literals present
    assert(s.getLong(1) === 4L) // 'ab' x3 (greedy non-overlap) + 'bad' x1
    assert(r.getDouble(1) === 1.0)
    assert(r.isNullAt(2))
    // non-literal dictionary is an analysis-time error, not a runtime one
    val err = intercept[Exception] {
      spark.sql("SELECT ac_multi_literal_stats('x', array(cast(rand() AS string)))")
        .collect()
    }
    assert(err.getMessage.contains("literal array") ||
      err.getMessage.contains("foldable"))
  }

  test("GraftExtensions injector applies cleanly (config-time path)") {
    // full end-to-end needs a fresh session with spark.sql.extensions set
    // (getOrCreate reuses the test session), but the injector itself must
    // accept the extension points without throwing
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
