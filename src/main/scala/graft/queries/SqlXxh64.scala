package graft.queries

/**
 * xxHash64 re-expressed as a single-statement DuckDB SQL CTE chain, so the
 * driver's oracle can value-check the MinHash/SimHash pipelines end to end
 * (their signatures are xxhash64-based — previously `no_oracle`).
 *
 * Following the reference's own verification pattern of publishing the
 * lookup computation instead of trusting the engine (Plugin/Ontology.pm:63-69),
 * this publishes the HASH ALGORITHM itself: XXH64 is pure 64-bit arithmetic
 * (public spec, Yann Collet; Spark's XXH64 is bit-identical — verified
 * against org.apache.spark.sql.catalyst.expressions.XXH64 over the full
 * sf0.01 shingle corpus plus multibyte/stripe edge cases, see
 * tools/xxh64_sql_proto.py), so DuckDB can recompute every signature from
 * the raw text with no Spark-side data smuggled across.
 *
 * Mechanics: DuckDB has no 64-bit unsigned overflow arithmetic, so products
 * are computed in HUGEINT via 32-bit limb splitting and reduced mod 2^64;
 * rotations become (x * 2^r mod 2^64) + (x >> 64-r) on UBIGINT (disjoint
 * bits). Sequential hash states are staged through nested subqueries — one
 * dependency level per projection — because DuckDB inlines lateral aliases
 * by substitution and the binder's expression-depth cap (128) cannot hold
 * the full avalanche chain in one expression. The 32-byte stripe loop is a
 * recursive CTE; the tail (<=3 words, one 4-byte step, <=3 bytes) unrolls
 * into guarded stages exactly as the spec orders them.
 */
object SqlXxh64 {

  private val M64 = "18446744073709551616"
  private val Mask = BigInt("FFFFFFFFFFFFFFFF", 16)
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** (a * b) mod 2^64 via 32-bit limbs in HUGEINT (a*b itself can reach
   * 2^128 and overflow HUGEINT). */
  def mul64(a: String, b: BigInt): String = mul64(a, b.toString)
  def mul64(a: String, b: String): String = {
    val ah = s"($a::HUGEINT)"; val bh = s"($b::HUGEINT)"
    s"CAST((($ah % 4294967296) * ($bh % 4294967296) + " +
      s"((($ah // 4294967296) * ($bh % 4294967296) + " +
      s"($ah % 4294967296) * ($bh // 4294967296)) % 4294967296) * 4294967296) " +
      s"% $M64 AS UBIGINT)"
  }

  def add64(a: String, b: BigInt): String = add64(a, b.toString)
  def add64(a: String, b: String): String =
    s"CAST((($a::HUGEINT + $b::HUGEINT) % $M64) AS UBIGINT)"

  /** Left-rotate by r (r <= 31 keeps x * 2^r within HUGEINT). `a` must be a
   * short column reference: it is emitted twice. */
  def rot(a: String, r: Int): String = {
    require(r <= 31, s"rot $r would overflow the HUGEINT product")
    s"CAST((($a::HUGEINT * ${1L << r}) % $M64 + ($a >> ${64 - r})) AS UBIGINT)"
  }

  def xor64(a: String, b: String): String = s"xor($a, $b)"

  /** 8-byte little-endian word from the 1-based UBIGINT byte list `by` at
   * 0-based byte offset `off0` (sums of disjoint byte ranges never overflow
   * UBIGINT). */
  private def u64le(by: String, off0: String): String =
    (0 until 8).map(j => s"$by[($off0) + ${j + 1}] * ${1L << (8 * j)}::UBIGINT")
      .mkString("(", " + ", ")")

  private def u32le(by: String, off0: String): String =
    (0 until 4).map(j => s"$by[($off0) + ${j + 1}] * ${1L << (8 * j)}::UBIGINT")
      .mkString("(", " + ", ")")

  /** Emit dependency-leveled nested subqueries: each stage lands one
   * projection above the deepest stage it references, so no single
   * expression exceeds the binder's depth cap. */
  def stagesSql(stages: Seq[(String, String)], from: String, keep: Seq[String]): String = {
    val levelOf = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val levels = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(String, String)]]
    for ((n, e) <- stages) {
      val deps = levelOf.collect {
        case (m, lv) if ("\\b" + java.util.regex.Pattern.quote(m) + "\\b").r
          .findFirstIn(e).isDefined => lv
      }
      val lv = if (deps.isEmpty) 0 else deps.max + 1
      levelOf(n) = lv
      while (levels.size <= lv) levels += scala.collection.mutable.ArrayBuffer.empty
      levels(lv) += ((n, e))
    }
    var sql = s"SELECT ${keep.mkString(", ")} FROM $from"
    for (lv <- levels) {
      val defs = lv.map { case (n, e) => s"$e AS $n" }.mkString(",\n      ")
      sql = s"SELECT *,\n      $defs\n    FROM (\n    $sql\n    ) "
    }
    sql
  }

  /**
   * CTE chain computing h = XXH64(utf8(s), seed) for each row (sid, s) of
   * CTE `src`. Emits CTEs prefixed `pre`; the final one, `{pre}done`, has
   * columns (sid, s, h UBIGINT). The enclosing statement must open with
   * WITH RECURSIVE (the stripe loop is a recursive CTE).
   */
  def xxh64Cte(src: String, pre: String, seed: Long): String = {
    val s = BigInt(seed)
    val v1i = (s + P1 + P2) & Mask
    val v2i = (s + P2) & Mask
    val v3i = s & Mask
    val v4i = (s - P1) & Mask
    val hSmall = (s + P5) & Mask

    val prep = s"""${pre}prep AS (
  SELECT sid, s,
    octet_length(encode(s)) AS n,
    list_transform(generate_series(1, octet_length(encode(s))),
      i -> (strpos('0123456789ABCDEF', substr(hex(encode(s)), 2*i-1, 1)) * 16
          + strpos('0123456789ABCDEF', substr(hex(encode(s)), 2*i, 1)) - 17)::UBIGINT) AS by
  FROM $src
)"""

    val rounds = (0 until 4).flatMap { lane =>
      Seq(
        (s"l$lane", u64le("by", s"32*(i) + ${8 * lane}")),
        (s"t${lane}a", mul64(s"l$lane", P2)),
        (s"t${lane}b", add64(s"v${lane + 1}", s"t${lane}a")),
        (s"t${lane}c", rot(s"t${lane}b", 31)),
        (s"v${lane + 1}n", mul64(s"t${lane}c", P1)))
    }
    val rec = s"""${pre}rec AS (
  SELECT sid, n, by, n // 32 AS ns, 0 AS i,
         $v1i::UBIGINT AS v1, $v2i::UBIGINT AS v2,
         $v3i::UBIGINT AS v3, $v4i::UBIGINT AS v4
  FROM ${pre}prep
  UNION ALL
  SELECT sid, n, by, ns, i + 1, v1n, v2n, v3n, v4n FROM (
    ${stagesSql(rounds, s"${pre}rec WHERE i < ns",
      Seq("sid", "n", "by", "ns", "i", "v1", "v2", "v3", "v4"))}
  ) q
)"""

    val st = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    st += (("r1", rot("v1", 1))); st += (("r2", rot("v2", 7)))
    st += (("r3", rot("v3", 12))); st += (("r4", rot("v4", 18)))
    st += (("m0a", add64("r1", "r2"))); st += (("m0b", add64("m0a", "r3")))
    st += (("m0c", add64("m0b", "r4")))
    var h = "m0c"
    for (i <- 1 to 4) {
      st += ((s"mr${i}a", mul64(s"v$i", P2)))
      st += ((s"mr${i}b", rot(s"mr${i}a", 31)))
      st += ((s"mr${i}c", mul64(s"mr${i}b", P1)))
      st += ((s"mr${i}d", xor64(h, s"mr${i}c")))
      st += ((s"mr${i}e", mul64(s"mr${i}d", P1)))
      st += ((s"mr${i}f", add64(s"mr${i}e", P4)))
      h = s"mr${i}f"
    }
    st += (("h0", s"CASE WHEN ns = 0 THEN $hSmall::UBIGINT ELSE $h END"))
    st += (("h1", add64("h0", "n::UBIGINT")))
    st += (("tp", "32 * ns")); st += (("nw", "(n - 32 * ns) // 8"))
    h = "h1"
    for (w <- 0 until 3) {
      st += ((s"w$w", u64le("by", s"tp + ${8 * w}")))
      st += ((s"w${w}a", mul64(s"w$w", P2)))
      st += ((s"w${w}b", rot(s"w${w}a", 31)))
      st += ((s"w${w}c", mul64(s"w${w}b", P1)))
      st += ((s"w${w}d", xor64(h, s"w${w}c")))
      st += ((s"w${w}e", rot(s"w${w}d", 27)))
      st += ((s"w${w}f", mul64(s"w${w}e", P1)))
      st += ((s"w${w}g", add64(s"w${w}f", P4)))
      st += ((s"h${2 + w}", s"CASE WHEN nw >= ${w + 1} THEN w${w}g ELSE $h END"))
      h = s"h${2 + w}"
    }
    st += (("fp", "tp + 8 * nw")); st += (("has4", "(n - tp - 8 * nw) >= 4"))
    st += (("f0", u32le("by", "fp")))
    st += (("f0a", mul64("f0", P1)))
    st += (("f0b", xor64(h, "f0a")))
    st += (("f0c", rot("f0b", 23)))
    st += (("f0d", mul64("f0c", P2)))
    st += (("f0e", add64("f0d", P3)))
    st += (("h5", s"CASE WHEN has4 THEN f0e ELSE $h END"))
    h = "h5"
    st += (("bp", "fp + CASE WHEN has4 THEN 4 ELSE 0 END"))
    st += (("nb", "n - bp"))
    for (b <- 0 until 3) {
      st += ((s"b$b", s"by[bp + $b + 1]"))
      st += ((s"b${b}a", mul64(s"b$b", P5)))
      st += ((s"b${b}b", xor64(h, s"b${b}a")))
      st += ((s"b${b}c", rot(s"b${b}b", 11)))
      st += ((s"b${b}d", mul64(s"b${b}c", P1)))
      st += ((s"h${6 + b}", s"CASE WHEN nb >= ${b + 1} THEN b${b}d ELSE $h END"))
      h = s"h${6 + b}"
    }
    st += (("a0", xor64(h, s"$h >> 33")))
    st += (("a1", mul64("a0", P2)))
    st += (("a2", xor64("a1", "a1 >> 29")))
    st += (("a3", mul64("a2", P3)))
    st += (("a4", xor64("a3", "a3 >> 32")))

    val tail = s"""${pre}tail AS (
  ${stagesSql(st.toSeq, s"${pre}rec WHERE i = ns",
      Seq("sid", "n", "by", "ns", "i", "v1", "v2", "v3", "v4"))}
)"""
    val done = s"""${pre}done AS (
  SELECT p.sid, p.s, t.a4 AS h
  FROM ${pre}prep p JOIN ${pre}tail t USING (sid)
)"""
    Seq(prep, rec, tail, done).mkString(",\n")
  }

  /** Spark XXH64.hashLong(l, seed) — the 8-byte path — as stages ending in
   * alias `lb4`. `lExpr` must be a NON-NEGATIVE bigint expression (it is
   * cast to UBIGINT directly; a negative id would need the two's-complement
   * fold first). Spark's `xxhash64(bigint_col)` is exactly this with
   * seed 42. Validated bit-equal to the reference xxh64 over the 8 LE
   * bytes before landing (tools/xxh64_ref.py). */
  def hashLongStages(lExpr: String, seed: Long): Seq[(String, String)] = Seq(
    ("lk1", mul64(s"($lExpr)::UBIGINT", P2)),
    ("lk2", rot("lk1", 31)),
    ("lk3", mul64("lk2", P1)),
    ("lh1", xor64(s"${(BigInt(seed) + P5 + 8) & Mask}::UBIGINT", "lk3")),
    ("lh2", rot("lh1", 27)),
    ("lh3", mul64("lh2", P1)),
    ("lh4", add64("lh3", P4)),
    ("la5", xor64("lh4", "lh4 >> 33")),
    ("la6", mul64("la5", P2)),
    ("la7", xor64("la6", "la6 >> 29")),
    ("la8", mul64("la7", P3)),
    ("lb4", xor64("la8", "la8 >> 32")))

  /** Spark XXH64.hashInt(i, seed) — the 4-byte path — as stages ending in
   * alias `ib4`. Mirrors the integer-seed fold Spark's xxhash64(str, int)
   * applies after the string hash. */
  def hashIntStages(iExpr: String, seedCol: String): Seq[(String, String)] = Seq(
    ("ih0", add64(seedCol, (P5 + 4) & Mask)),
    ("ig1", mul64(s"($iExpr)::UBIGINT", P1)),
    ("ig2", xor64("ih0", "ig1")),
    ("ig3", rot("ig2", 23)),
    ("ig4", mul64("ig3", P2)),
    ("ig5", add64("ig4", P3)),
    ("ia0", xor64("ig5", "ig5 >> 33")),
    ("ia1", mul64("ia0", P2)),
    ("ia2", xor64("ia1", "ia1 >> 29")),
    ("ia3", mul64("ia2", P3)),
    ("ib4", xor64("ia3", "ia3 >> 32")))

  /** UBIGINT column -> the signed BIGINT Spark stores. */
  def signed(col: String): String =
    s"CAST(CASE WHEN $col >= 9223372036854775808::UBIGINT " +
      s"THEN $col::HUGEINT - $M64 ELSE $col::HUGEINT END AS BIGINT)"
}
