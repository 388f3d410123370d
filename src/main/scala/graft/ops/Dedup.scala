package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, from exact to
 * near-duplicate. All candidate generation is bucket-local (hash groupBy or
 * LSH band join) — never an all-pairs cross join — so the shapes survive a
 * 100x scale-up: the only shuffles are on the bucket keys, and pair
 * verification happens inside buckets whose size is controlled by the
 * banding parameters.
 */
object Dedup {

  // --- exact ---------------------------------------------------------------

  /** Exact duplicate groups by normalized-content fingerprint: one row per
   * group with the kept (minimal) id, the group size and member ids.
   * Single hash-shuffle on the 32-byte fingerprint — the cheapest possible
   * key at 100 TB (shuffles hashes, not content). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("group_size"),
        sort_array(collect_list(idCol)).as("member_ids"))
      .filter(col("group_size") > 1)

  /** Exact-dedup survivors: distinct-by-fingerprint keeping min id. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
    fp.groupBy("fingerprint").agg(min(idCol).as(idCol)).drop("fingerprint")
  }

  // --- shingling + MinHash + LSH ------------------------------------------

  /** Word k-shingles of the lowercased text as distinct strings (the
   * oracle-friendly form; [[shingleHashes]] is the fixed-width scale form). */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    when(text.isNull || trim(text) === "", array().cast("array<string>"))
      .otherwise(
        array_distinct(transform(sequence(lit(0), greatest(n - k, lit(0))),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
  }

  /** Word k-shingles of the lowercased text as distinct int64 hashes.
   * Hashing shingles to 64-bit ints immediately (xxhash64) keeps the rest
   * of the pipeline fixed-width — no string arrays shuffling around. */
  def shingleHashes(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    when(text.isNull || trim(text) === "", array().cast("array<bigint>"))
      .otherwise(
        array_distinct(transform(sequence(lit(0), greatest(n - k, lit(0))),
          i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k)))))))
  }

  /** Mersenne prime 2^31-1: the affine-permutation modulus. Keeping every
   * product under 2^62 makes the expressions ANSI-safe (no wrapping
   * arithmetic, which Spark 4's default ANSI mode rejects). */
  val MinhashPrime = 2147483647L

  /** Deterministic affine MinHash permutation parameters (seeded),
   * a in [1, P), b in [0, P). */
  private def perms(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (1L + rnd.nextLong(MinhashPrime - 1), rnd.nextLong(MinhashPrime)))
  }

  /** MinHash signature (array of numHashes minima of (a*x+b) mod P) over a
   * column of shingle-hash arrays. Pure higher-order functions —
   * codegen'd, no UDF. */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val ps = perms(numHashes, seed)
    val sig = array(ps.map { case (a, b) =>
      array_min(transform(shingles,
        s => pmod(pmod(s, lit(MinhashPrime)) * a + b, lit(MinhashPrime))))
    }: _*)
    when(size(shingles) === 0, lit(null).cast(s"array<bigint>")).otherwise(sig)
  }

  /** LSH band keys: signature split into `bands` rows of `rowsPerBand`,
   * each band hashed to one int64 bucket key. Documents sharing ANY band
   * bucket become candidate pairs. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        slice(signature, b * rowsPerBand + lit(1), lit(rowsPerBand))), b))

  /**
   * MinHash-LSH candidate pairs: explode band keys, self-join within
   * buckets (id ordering avoids dup/self pairs), dedup pairs found in
   * multiple bands. The join key is (band bucket), so the shuffle volume is
   * rows x bands fixed-width keys; bucket sizes are tunable via
   * bands/rowsPerBand. Returns (id_a, id_b, est_jaccard) with the
   * signature-agreement estimate.
   */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 200): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sigs = df
      .select(col(idCol).as("id"),
        minhashSignature(shingleHashes(col(textCol), k), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val banded0 = sigs.select(col("id"), col("sig"),
      explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bucket"))
    // Drop oversized buckets: a bucket shared by >maxBucketSize docs is
    // non-discriminative (degenerate band) and would go quadratic in the
    // self-join. The oversized-bucket list is tiny by construction, so it
    // broadcasts into an anti-join — the standard LSH-at-scale guard.
    val oversized = banded0.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucketSize).select("bucket")
    val banded = banded0.join(broadcast(oversized), Seq("bucket"), "left_anti")
    val a = banded.select(col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          (x => x))).cast("double") / lit(numHashes)).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard similarity for candidate pairs: joins the pairs
   * back to per-id shingle sets (broadcast-sized at test scale; co-hashed
   * join at cluster scale) and computes |A∩B| / |A∪B| with array ops. */
  def ngramJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, k: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), k).as("sh"))
    val withA = pairs.join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
    val withB = withA.join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withB.withColumn("jaccard",
      round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))), 6))
      .select(pairs.columns.map(col).toSeq :+ col("jaccard"): _*)
  }

  // --- SimHash -------------------------------------------------------------

  /**
   * 64-bit SimHash over whitespace tokens: each token's xxhash64 votes +1/-1
   * per bit; the sign vector packs into one int64. Near-dups = small
   * Hamming distance. Pure HOF expression tree (64-wide inner transform).
   */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(lower(trim(text)), "\\s+"))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, bit) => a + when(call_function("shiftright", h, bit.cast("int")).bitwiseAND(lit(1L)) === 1L,
            lit(1L)).otherwise(lit(-1L)))
      })
    val packed = aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    when(text.isNull || trim(text) === "", lit(null).cast("long")).otherwise(packed)
  }

  /** Hamming distance between two packed 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup candidate pairs within Hamming distance `maxDist`,
   * blocked on 16-bit quarters of the hash (pigeonhole: any pair within
   * Hamming distance 3 shares at least one exact quarter — so for
   * maxDist <= 3 blocking is lossless). Shuffle key = (quarter index,
   * quarter value): fixed-width, bucket sizes bounded by data similarity.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .filter(col("sh").isNotNull)
    val blocked = hashed.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        q => struct(q.as("q"),
          call_function("shiftright", col("sh"), (q * 16).cast("int")).bitwiseAND(lit(0xFFFFL)).as("v"))))
        .as("block"))
    val a = blocked.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  // --- embedding near-dup --------------------------------------------------

  /** Cosine similarity between two float-array columns, computed in double
   * precision (zip_with dot product + norms; codegen'd). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /**
   * Embedding near-duplicate pairs with cosine >= threshold, blocked by a
   * coarse partition key (e.g. a cluster/label id) so the pairwise check is
   * block-local, never a global cross join. At cluster scale the blocking
   * key comes from an ANN index pass (see [[Similarity.lshBuckets]]).
   */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(vecCol).as("vec"))
    val a = v.select(col("block"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = v.select(col("block"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
