package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.FunctionBridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/**
 * SQL surface for the engine's custom Catalyst kernels, so `spark.sql`
 * users get the same codegen'd hot paths as the Column API:
 *
 *   is_iso8601(str)                         -> boolean
 *   cosine_sim(arr, arr)                    -> double
 *   sig_agreement(arr<bigint>, arr<bigint>) -> int
 *   simhash_pack(arr<bigint>)               -> bigint
 *   shingle_hash64(arr<string>, k)          -> arr<bigint>
 *   minhash_sig(arr<bigint>, numHashes[, seed]) -> arr<bigint>
 *   top_k_by_score(score, id, k)            -> AGGREGATE: arr<struct<score,id>>
 *   freq_items_sketch(token, capacity)      -> AGGREGATE: arr<struct<token,est_count>>
 *   kmv_distinct(hash, k)                   -> AGGREGATE: struct<n_kept,kth_hash,est_distinct>
 *
 * Two registration paths:
 *  - config-time: `--conf spark.sql.extensions=graft.GraftExtensions`
 *    (the standard [[SparkSessionExtensions]] injector)
 *  - runtime: `GraftFunctions.register(spark)` on a live session
 *
 * Kernels parameterized by non-literal driver data (centroid arrays,
 * hyperplane matrices, broadcast sets) stay Column-API-only by design: a
 * SQL literal form would embed megabytes of doubles in the query text.
 */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression): (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""), builder)

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("is_iso8601", "_FUNC_(str) - true iff str is a valid ISO-8601 date/time " +
      "(full family; two-digit-year form rejected)") { args =>
      require(args.size == 1, "is_iso8601(str)")
      Iso8601Valid(args.head)
    },
    fn("cosine_sim", "_FUNC_(a, b) - cosine similarity of two float/double arrays") { args =>
      require(args.size == 2, "cosine_sim(a, b)")
      CosineSim(args(0), args(1))
    },
    fn("sig_agreement", "_FUNC_(a, b) - count of agreeing positions of two bigint arrays") { args =>
      require(args.size == 2, "sig_agreement(a, b)")
      SigAgreement(args(0), args(1))
    },
    fn("simhash_pack", "_FUNC_(hashes) - 64-bit SimHash of a bigint hash array") { args =>
      require(args.size == 1, "simhash_pack(hashes)")
      SimHashPack(args.head)
    },
    fn("shingle_hash64", "_FUNC_(tokens, k) - distinct xxhash64'd word k-shingles") { args =>
      require(args.size == 2, "shingle_hash64(tokens, k)")
      ShingleHash64(args(0), intArg(args(1), "k"))
    },
    fn("minhash_sig", "_FUNC_(shingles, numHashes[, seed]) - MinHash signature") { args =>
      require(args.size == 2 || args.size == 3, "minhash_sig(shingles, numHashes[, seed])")
      val seed = if (args.size == 3) longArg(args(2), "seed") else 42L
      MinHashSig.make(args(0), intArg(args(1), "numHashes"), seed)
    },
    fn("top_k_by_score", "_FUNC_(score, id, k) - aggregate: k best (score,id) " +
      "pairs by (score DESC, id ASC), bounded map-side partial aggregation") { args =>
      require(args.size == 3, "top_k_by_score(score, id, k)")
      // cast like the Column API (TopKByScore.topK) does: without these an
      // int-typed score/id from SQL hits update()'s asInstanceOf mid-job
      TopKByScore(Cast(args(0), DoubleType), Cast(args(1), LongType),
        intArg(args(2), "k"))
    },
    fn("winnow_fingerprints", "_FUNC_(tokens, k, w) - winnowing (MOSS) " +
      "fingerprints of a token array: sorted distinct sliding-window minima " +
      "of polynomial word-k-gram hashes") { args =>
      require(args.size == 3, "winnow_fingerprints(tokens, k, w)")
      WinnowFingerprints(args(0), intArg(args(1), "k"), intArg(args(2), "w"))
    },
    fn("freq_items_sketch", "_FUNC_(token, capacity) - aggregate: bounded " +
      "Misra-Gries frequent-items summary as arr<struct<token,est_count>> " +
      "(count DESC, token ASC); exact when distinct <= capacity") { args =>
      require(args.size == 2, "freq_items_sketch(token, capacity)")
      FreqItemsSketch(Cast(args(0), StringType), intArg(args(1), "capacity"))
    },
    fn("char_entropy", "_FUNC_(str) - Shannon entropy (bits, log2) of the " +
      "string's code-point distribution; 0.0 for empty") { args =>
      require(args.size == 1, "char_entropy(str)")
      CharEntropy(Cast(args(0), StringType))
    },
    fn("ac_multi_literal_stats", "_FUNC_(str, array('a','b',...)) - " +
      "struct(n_terms, n_hits): distinct dictionary literals present and " +
      "total greedy non-overlapping hits, one Aho-Corasick pass") { args =>
      require(args.size == 2, "ac_multi_literal_stats(str, dict_array)")
      require(args(1).foldable,
        "ac_multi_literal_stats: the dictionary must be a literal array " +
          "(it compiles into the scan automaton)")
      val arr = Cast(args(1),
          org.apache.spark.sql.types.ArrayType(StringType)).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr != null && arr.numElements() > 0, "empty dictionary")
      val dict = (0 until arr.numElements()).map { i =>
        require(!arr.isNullAt(i), "null literal in dictionary")
        arr.getUTF8String(i).toString
      }
      AcMultiLiteralStats(Cast(args(0), StringType), dict)
    },
    fn("kmv_distinct", "_FUNC_(hash, k) - aggregate: KMV distinct-count " +
      "sketch over an already-hashed bigint (pass xxhash64(col)): " +
      "struct(n_kept, kth_hash, est_distinct); exact when distinct < k") { args =>
      require(args.size == 2, "kmv_distinct(hash, k)")
      KmvSketch(Cast(args(0), LongType), intArg(args(1), "k"))
    },
    fn("collect_sigs_capped", "_FUNC_(id, sig, cap) - aggregate: " +
      "array<struct<id,sig>> of the group sorted by id, NULL once the group " +
      "exceeds cap members (fused oversized-bucket guard, capped partials)") { args =>
      require(args.size == 3, "collect_sigs_capped(id, sig, cap)")
      // cast BOTH args like the Column API would: a raw array<int> sig
      // would hit toLongArray's 8-byte loads on 4-byte slots at runtime
      CollectSigsCapped(Cast(args(0), LongType),
        Cast(args(1), org.apache.spark.sql.types.ArrayType(LongType)),
        intArg(args(2), "cap"))
    },
    fn("sha256_hex", "_FUNC_(str) - lowercase-hex sha256, value-identical to " +
      "sha2(str, 256) but with a per-thread digest (no per-row getInstance)") { args =>
      require(args.size == 1, "sha256_hex(str)")
      Sha256Hex(Cast(args.head, org.apache.spark.sql.types.StringType))
    },
    fn("nfc_normalize", "_FUNC_(str) - Unicode NFC normalization " +
      "(ASCII fast path returns the input untouched)") { args =>
      require(args.size == 1, "nfc_normalize(str)")
      NfcNormalize(Cast(args.head, StringType))
    },
    fn("zorder64", "_FUNC_(a, b) - Morton (Z-order) interleave of two int32 " +
      "keys into one order-preserving int64 sort key") { args =>
      require(args.size == 2, "zorder64(a, b)")
      ZOrder64(Cast(args(0), IntegerType), Cast(args(1), IntegerType))
    },
    fn("is_blank", "_FUNC_(str) - true iff str is empty or whitespace-only " +
      "([ \\t\\n\\r\\f])") { args =>
      require(args.size == 1, "is_blank(str)")
      IsBlank(args.head)
    },
    fn("char_class_match", "_FUNC_(str, pattern) - anchored literal/char-class " +
      "regex match via byte scan; pattern must be a supported literal") { args =>
      require(args.size == 2, "char_class_match(str, pattern)")
      val pattern = args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"pattern must be a string literal, got $other")
      }
      require(CharClassMatch.compile(pattern).isDefined,
        s"pattern not in the supported anchored char-class family: $pattern")
      CharClassMatch(args(0), pattern)
    },
    fn("ascii_alt_match", "_FUNC_(str, pattern) - anchored literal-alternation " +
      "regex match (^(a|b)$ / (?i)^(a|b)$) via byte compare") { args =>
      require(args.size == 2, "ascii_alt_match(str, pattern)")
      val pattern = args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"pattern must be a string literal, got $other")
      }
      require(AsciiAltMatch.compile(pattern).isDefined,
        s"pattern not in the supported anchored literal-alternation family: $pattern")
      AsciiAltMatch(args(0), pattern)
    }
  )

  /** Register on a live session (tests, notebooks, existing jobs). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      FunctionBridge.register(spark, name, info, builder)
    }
}
