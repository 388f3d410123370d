package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling and partitioning — the split/quota steps
 * of a training-data pipeline.
 *
 * Both operators are REPRODUCIBLE BY CONSTRUCTION: assignment is a pure
 * function of row content (a hash of the id, a rank within a group), never
 * of RNG state, partition layout or cluster size — `df.randomSplit` gives
 * a different corpus split whenever the partitioning changes, which is
 * exactly what a 1000-executor re-run does. Hash-based assignment also
 * keeps the split STABLE UNDER APPEND: adding new documents never moves an
 * existing document across splits (the train/test contamination hazard of
 * ratio-based resplitting).
 */
object Sampling {

  /**
   * Split label for an id: bucket `pmod(xxhash64(id), granularity)` mapped
   * through the cumulative weight thresholds. Weights are relative (they
   * need not sum to 1); labels take effect in declaration order.
   */
  def splitLabel(id: Column, weights: Seq[(String, Double)],
      granularity: Int = 10000): Column = {
    require(weights.nonEmpty, "need at least one split label")
    require(weights.forall(_._2 > 0), "split weights must be positive")
    val total = weights.map(_._2).sum
    var acc = 0.0
    val thresholds = weights.map { case (label, w) =>
      acc += w
      (label, math.round(acc / total * granularity).toInt)
    }
    val bucket = pmod(xxhash64(id), lit(granularity))
    thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((label, t), els) => when(bucket < t, lit(label)).otherwise(els)
    }
  }

  /**
   * Deterministic per-stratum fractional sampling — `df.sampleBy` without
   * the RNG: keep a row iff `pmod(xxhash64(id), granularity) <
   * floor(frac * granularity)` for its stratum's fraction (strata absent
   * from `fractions` default to 0.0 — dropped, matching `sampleBy`).
   * Down-weighting over-represented sources ("keep 10% of crawl, 100% of
   * books") is the canonical use.
   *
   * Like [[splitLabel]], membership is a pure function of the id: the
   * sample is identical across runs, partitionings and cluster sizes, and
   * STABLE UNDER APPEND — new rows never flip existing rows in or out,
   * where `sampleBy`'s per-partition RNG streams reshuffle membership on
   * any repartition. The threshold uses `floor`, not round, so the engine
   * and a SQL oracle truncate identical IEEE doubles identically. One
   * codegen'd filter, no shuffle; the same id-hash as splitLabel means a
   * stratified pre-sample composes with a later hashSplit (both see the
   * bucket, not disjoint RNG draws).
   */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], granularity: Int = 10000): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val bucket = pmod(xxhash64(col(idCol)), lit(granularity))
    // declaration-order fold keeps the emitted plan deterministic
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((stratum, f), els) =>
        when(col(strataCol) === stratum,
          lit(math.floor(f * granularity).toInt)).otherwise(els)
      }
    df.filter(bucket < threshold)
  }

  /**
   * Deterministic WEIGHTED sampling without replacement (Efraimidis–
   * Spirakis A-ES, "Weighted random sampling with a reservoir", IPL 2006):
   * every row draws `key = u^(1/w)` with `u` uniform in (0,1); the k
   * LARGEST keys are exactly a weighted sample without replacement —
   * quality-weighted corpus selection ("prefer long/high-score docs but
   * keep diversity") in one pass.
   *
   * The uniform is hash-derived, not RNG: `u = (bucket + 0.5) / g` with
   * `bucket = pmod(xxhash64(id), g)` — reproducible across runs,
   * partitionings and cluster sizes like every sampler here, and
   * restatable in SQL (the `q_wsample` oracle recomputes the hash via
   * [[graft.queries.SqlXxh64]] and the identical float expression). The
   * top-k reduction is the bounded [[graft.functions.TopKByScore]]
   * aggregate (map-side k-heaps, no Window, no global sort). Rows with
   * NULL or non-positive weights are excluded (their key is undefined).
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, granularity: Int = 1 << 20): DataFrame = {
    require(k > 0, "sample size must be positive")
    require(granularity > 1, "granularity must exceed 1")
    val bucket = pmod(xxhash64(col(idCol)), lit(granularity))
    val u = (bucket.cast("double") + lit(0.5)) / lit(granularity.toDouble)
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.filter(col(weightCol).isNotNull && col(weightCol).cast("double") > 0)
      .agg(graft.functions.TopKByScore.topK(key, col(idCol), k).as("tk"))
      .select(posexplode(col("tk")).as(Seq("__r", "__e")))
      .select((col("__r") + 1).cast("int").as("rank"),
        col("__e.id").as(idCol), round(col("__e.score"), 6).as("key"))
  }

  /** `df` plus a `split` column assigned by [[splitLabel]] — one codegen'd
   * projection, no shuffle, no RNG. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], granularity: Int = 10000): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), weights, granularity))

  /**
   * Deterministic mixture resampling — the "source x weight" step of a
   * training-mix recipe: every row of a source with weight w appears
   * floor(w) times, plus once more for a hash-selected frac(w) fraction
   * of its rows (w = 2.3 -> every row twice, 30% of rows a third time;
   * w = 0.25 -> 25% of rows once; w = 0 -> source dropped). Sources
   * absent from `weights` default to 1.0.
   *
   * Assignment is a pure function of the id — reproducible across runs,
   * partitionings and cluster sizes, and stable under append, exactly
   * like [[splitLabel]]. The selection hash is `xxhash64(~id)` (the
   * bitwise complement), DECORRELATED from splitLabel's `xxhash64(id)`
   * so mixture membership never biases split assignment. The fractional
   * threshold is computed as `floor(w * granularity) - floor(w) *
   * granularity` — floor, not cast/round, so the engine and the DuckDB
   * oracle truncate identical IEEE doubles identically.
   *
   * Output: `df`'s columns plus `copy` (0..k-1), one row per emitted
   * copy; a plain projection + generator, no shuffle.
   */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], granularity: Int = 10000): DataFrame = {
    require(weights.values.forall(w => w >= 0 && !w.isNaN && !w.isInfinite),
      "mixture weights must be finite and non-negative")
    // Small recipes inline as a when-chain (plan-readable, constant-folded);
    // a large source taxonomy would embed thousands of literals in the plan
    // (the `isin` pathology, see InBroadcastSet) — past 32 entries the map
    // ships ONCE as a broadcast and the codegen'd lookup kernel probes it.
    val wCol =
      if (weights.size <= 32)
        weights.foldRight(lit(1.0): Column) {
          case ((s, w), els) => when(col(sourceCol) === s, lit(w)).otherwise(els)
        }
      else
        coalesce(graft.functions.BroadcastMapLookup.lookup(col(sourceCol),
          graft.functions.BroadcastMapLookup.broadcastMap(
            df.sparkSession, weights)), lit(1.0))
    val base = floor(wCol).cast("int")
    val thresh = floor(wCol * granularity) - floor(wCol) * granularity
    val bucket = pmod(
      xxhash64(bitwise_not(col(idCol).cast("long"))), lit(granularity))
    val copies = base + when(bucket < thresh, 1).otherwise(0)
    df.withColumn("copy",
      explode(when(copies <= 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), copies - 1))))
  }

  /**
   * Per-group quota: keep at most `quota` rows per group — the best by
   * (score DESC, id ASC) — the "cap documents per domain/source" step of
   * web-scale curation. Runs as the bounded [[graft.functions.TopKByScore]]
   * aggregate: map-side k-heaps per group, shuffle volume
   * #partitions x #groups x quota, independent of group size — the
   * scale-safe form of `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
   * (whose window exchange ships EVERY row of a hot group to one reducer).
   * Returns (groupCols..., idCol, scoreCol); ids must be numeric (they
   * ride the aggregate as longs — [[graft.ops.Similarity.knnJoin]]'s
   * surrogate-id advice applies).
   */
  def quotaSample(df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(graft.functions.TopKByScore.topK(
        col(scoreCol), col(idCol), quota).as("kept"))
      .select(g :+ explode(col("kept")).as("e"): _*)
      .select(g :+ col("e.id").as(idCol) :+ col("e.score").as(scoreCol): _*)
  }

  /**
   * Concatenate-and-chunk sequence packing — the "pack documents into
   * fixed-size training sequences" step of a pretraining pipeline:
   * within each group, documents concatenate in id order and split into
   * chunks of exactly `budget` tokens; a document may straddle a chunk
   * boundary (the standard causal-LM packing, where an EOS token — not a
   * chunk boundary — separates documents). Emits, per document:
   * `chunk_first`/`chunk_last` (the chunk range its tokens land in) and
   * `chunk_offset` (its first token's position within `chunk_first`) —
   * everything a writer needs to emit the packed sequences.
   *
   * Pure integer arithmetic over a per-group running token total:
   * deterministic, and restated verbatim by the DuckDB oracle. Zero-token
   * documents get `chunk_last = chunk_first` (they occupy no slot but
   * keep a well-formed range).
   *
   * Scale shape: one window (hash-shuffle on `groupCols`, in-partition
   * sort by id) — the cumulative sum is the only sequential dependency,
   * and it is per-GROUP, so parallelism = #groups. Packing a single
   * giant group at 100 TB shards it first (group = (source, hash-bucket))
   * — packing quality is unaffected because chunk layout only needs a
   * consistent order WITHIN each emitted shard, and determinism is
   * preserved because the shard key is content-derived, exactly the
   * [[splitLabel]] argument.
   */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      groupCols: Seq[String], budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(groupCols.nonEmpty,
      "packing needs grouping columns (shard a global pack by hash bucket)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val n = coalesce(col(tokensCol).cast("long"), lit(0L))
    df.select(groupCols.map(col) :+ col(idCol) :+ n.as("n_tokens"): _*)
      .withColumn("__ca", sum(col("n_tokens")).over(w))
      .select(groupCols.map(col) :+ col(idCol) :+ col("n_tokens") :+
        floor((col("__ca") - col("n_tokens")) / budget).cast("long").as("chunk_first") :+
        greatest(floor((col("__ca") - col("n_tokens")) / budget),
          floor((col("__ca") - 1) / budget)).cast("long").as("chunk_last") :+
        ((col("__ca") - col("n_tokens")) % budget).cast("long").as("chunk_offset"): _*)
  }

  /**
   * Deterministic uniform sample of exactly `k` rows: the k SMALLEST
   * `xxhash64(id)` values win (bottom-k-by-hash — the classic mergeable
   * uniform-sample construction: a hash-uniform order statistic selects a
   * uniform subset, reproducibly). Runs on the bounded
   * [[graft.functions.TopKByScore]] aggregate — each partition reduces to
   * a k-entry heap before the single-row exchange, so sampling 1000 rows
   * from 10^12 never sorts or shuffles the corpus (contrast
   * `df.orderBy(hash).limit(k)`, whose global TakeOrdered still scans
   * per-partition heaps the same way but is not composable as an
   * aggregate, and `df.sample(fraction)`, which is neither exact-k nor
   * reproducible across partitionings).
   *
   * The heap ranks by score DESC on `-toDouble(hash)` — the double cast
   * loses low bits for |hash| > 2^53, so ties break by id ASC; the DuckDB
   * oracle restates the same cast and tie order, keeping both engines'
   * selections identical by construction. Returns (rank 1..k, idCol).
   */
  def uniformSample(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    // ids ride the TopKByScore heap as longs — a non-numeric id would
    // cast to NULL and be dropped, silently returning an EMPTY "sample";
    // fail fast instead (string ids: attach a surrogate long first, the
    // same contract as knnJoin's probe ids)
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"uniformSample needs a numeric id column; '$idCol' is " +
        s"${df.schema(idCol).dataType.simpleString}")
    val score = xxhash64(col(idCol).cast("long")).cast("double") * -1
    df.agg(graft.functions.TopKByScore.topK(score, col(idCol), k).as("kept"))
      .select(posexplode(col("kept")).as(Seq("__r", "__e")))
      .select((col("__r") + 1).cast("int").as("rank"),
        col("__e.id").as(idCol))
  }
}
