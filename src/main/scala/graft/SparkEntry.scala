package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Catalog, Oracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.vVerdict(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_verdict" -> (Catalog.vVerdict _),
    "v_violations" -> (Catalog.vViolations _),
    "q_colstats" -> (Catalog.qColstats _),
    "q_hist" -> (Catalog.qHist _),
    "q_drift" -> (Catalog.qDrift _),
    "q_unique" -> (Catalog.qUnique _),
    "q_dedup_keys" -> (Catalog.qDedupKeys _),
    "q_ri_user" -> (Catalog.qRiUser _),
    "q_ri_lang" -> (Catalog.qRiLang _),
    "q_ri_bloom" -> (Catalog.qRiBloom _),
    "q_asof" -> (Catalog.qAsof _),
    "ev_sessions" -> (Catalog.evSessions _),
    "q_pack" -> (Catalog.qPack _),
    "ta_features" -> (Catalog.taFeatures _),
    "ta_extras" -> (Catalog.taExtras _),
    "dd_exact" -> (Catalog.ddExact _),
    "dd_minhash" -> (Catalog.ddMinhash _),
    "dd_ngram" -> (Catalog.ddNgram _),
    "dd_simhash" -> (Catalog.ddSimhash _),
    "dd_clusters" -> (Catalog.ddClusters _),
    "q_split" -> (Catalog.qSplit _),
    "q_quota" -> (Catalog.qQuota _),
    "ta_repetition" -> (Catalog.taRepetition _),
    "q_contam" -> (Catalog.qContam _),
    "dd_lines" -> (Catalog.ddLines _),
    "ta_pii" -> (Catalog.taPii _),
    "ta_urls" -> (Catalog.taUrls _),
    "ta_vocab" -> (Catalog.taVocab _),
    "ta_keywords" -> (Catalog.taKeywords _),
    "ta_heavy" -> (Catalog.taHeavy _),
    "ta_winnow" -> (Catalog.taWinnow _),
    "q_sample" -> (Catalog.qSample _),
    "q_topvals" -> (Catalog.qTopvals _),
    "q_mixture" -> (Catalog.qMixture _),
    "dd_cos_pairs" -> (Catalog.ddCosPairs _),
    "dd_cos_lsh" -> (Catalog.ddCosLsh _),
    "ann_topk" -> (Catalog.annTopK _),
    "ann_lsh" -> (Catalog.annLsh _),
    "ann_ivf" -> (Catalog.annIvf _),
    "ann_knn_join" -> (Catalog.annKnnJoin _),
    "mm_meta" -> (Catalog.mmMeta _),
    "mm_features" -> (Catalog.mmFeatures _),
    "mm_frames" -> (Catalog.mmFrames _),
    "dep_verdict" -> (Catalog.depVerdict _),
    "dep_rule_counts" -> (Catalog.depRuleCounts _),
    "v_datetime" -> (Catalog.vDatetime _),
    "v_bool" -> (Catalog.vBool _),
    "v_taxonomy" -> (Catalog.vTaxonomy _),
    "q_taxtree" -> (Catalog.qTaxtree _),
    "q_tax_desc" -> (Catalog.qTaxDesc _),
    "ev_window" -> (Catalog.evWindow _),
    "q_range" -> (Catalog.qRange _),
    "q_salted" -> (Catalog.qSalted _),
    "q_strat" -> (Catalog.qStrat _),
    "ann_quant" -> (Catalog.annQuant _),
    "q_zorder" -> (Catalog.qZorder _),
    "q_pct" -> (Catalog.qPct _),
    "ta_norm" -> (Catalog.taNorm _),
    "dd_inc" -> (Catalog.ddInc _),
    "q_bm25" -> (Catalog.qBm25 _),
    "q_moments" -> (Catalog.qMoments _),
    "q_wsample" -> (Catalog.qWsample _),
    "q_kmv" -> (Catalog.qKmv _),
    "ta_entropy" -> (Catalog.taEntropy _),
    "q_lm" -> (Catalog.qLm _),
    "ta_block" -> (Catalog.taBlock _),
    "dd_semantic" -> (Catalog.ddSemantic _),
    "ta_boiler" -> (Catalog.taBoiler _),
    "ta_pmi" -> (Catalog.taPmi _),
    "ann_pq" -> (Catalog.annPq _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "v_verdict" -> Oracles.vVerdict,
    "v_violations" -> Oracles.vViolations,
    "q_colstats" -> Oracles.qColstats,
    "q_hist" -> Oracles.qHist,
    "q_drift" -> Oracles.qDrift,
    "q_unique" -> Oracles.qUnique,
    "q_dedup_keys" -> Oracles.qDedupKeys,
    "q_ri_user" -> Oracles.qRiUser,
    "q_ri_lang" -> Oracles.qRiLang,
    "q_ri_bloom" -> Oracles.qRiBloom,
    "q_asof" -> Oracles.qAsof,
    "ev_sessions" -> Oracles.evSessions,
    "q_pack" -> Oracles.qPack,
    "ta_features" -> Oracles.taFeatures,
    "ta_extras" -> Oracles.taExtras,
    "dd_exact" -> Oracles.ddExact,
    "dd_ngram" -> Oracles.ddNgram,
    "dd_clusters" -> Oracles.ddClusters,
    "q_split" -> Oracles.qSplit,
    "q_quota" -> Oracles.qQuota,
    "ta_repetition" -> Oracles.taRepetition,
    "q_contam" -> Oracles.qContam,
    "dd_lines" -> Oracles.ddLines,
    "ta_pii" -> Oracles.taPii,
    "ta_urls" -> Oracles.taUrls,
    "ta_vocab" -> Oracles.taVocab,
    "ta_keywords" -> Oracles.taKeywords,
    "ta_heavy" -> Oracles.taHeavy,
    "ta_winnow" -> Oracles.taWinnow,
    "q_sample" -> Oracles.qSample,
    "q_topvals" -> Oracles.qTopvals,
    "q_mixture" -> Oracles.qMixture,
    "dd_cos_pairs" -> Oracles.ddCosPairs,
    "ann_topk" -> Oracles.annTopK,
    "ann_knn_join" -> Oracles.annKnnJoin,
    "mm_meta" -> Oracles.mmMeta,
    "dep_verdict" -> Oracles.depVerdict,
    "dep_rule_counts" -> Oracles.depRuleCounts,
    "v_datetime" -> Oracles.vDatetime,
    "v_bool" -> Oracles.vBool,
    "v_taxonomy" -> Oracles.vTaxonomy,
    "q_taxtree" -> Oracles.qTaxtree,
    "q_tax_desc" -> Oracles.qTaxDesc,
    "ev_window" -> Oracles.evWindow,
    "mm_features" -> Oracles.mmFeatures,
    "mm_frames" -> Oracles.mmFrames,
    // dd_minhash / dd_simhash gained full-value oracles in round 3:
    // XXH64 is pure 64-bit arithmetic, so the oracle recomputes the
    // signatures from raw text via a DuckDB SQL formulation of the hash
    // (queries/SqlXxh64.scala) — nothing engine-derived crosses over.
    "dd_minhash" -> Oracles.ddMinhash,
    "dd_simhash" -> Oracles.ddSimhash,
    "q_range" -> Oracles.qRange,
    "q_salted" -> Oracles.qSalted,
    "q_strat" -> Oracles.qStrat,
    "ann_quant" -> Oracles.annQuant,
    "q_zorder" -> Oracles.qZorder,
    "q_pct" -> Oracles.qPct,
    "ta_norm" -> Oracles.taNorm,
    "dd_inc" -> Oracles.ddInc,
    "q_bm25" -> Oracles.qBm25,
    "q_moments" -> Oracles.qMoments,
    "q_wsample" -> Oracles.qWsample,
    "q_kmv" -> Oracles.qKmv,
    "ta_entropy" -> Oracles.taEntropy,
    "q_lm" -> Oracles.qLm,
    "ta_block" -> Oracles.taBlock,
    "ta_boiler" -> Oracles.taBoiler,
    "ta_pmi" -> Oracles.taPmi
  ) ++
    // ann_ivf's oracle inlines the centroid table the query just computed,
    // and ann_lsh's regenerates the seeded planes at the fixture's actual
    // embedding dim — both exist only after the query ran (Verify runs
    // queries first, then dumps oracleSql — the ordering this depends on).
    Catalog.lastIvfCentroids.map(c => "ann_ivf" -> Oracles.annIvf(c)).toMap ++
    Catalog.lastSemCentroids.map(c => "dd_semantic" -> Oracles.ddSemantic(c)).toMap ++
    Catalog.lastPqCodebooks.map(c => "ann_pq" -> Oracles.annPq(c)).toMap ++
    Map("ann_lsh" -> Oracles.annLsh(Catalog.lastLshDim.getOrElse(64)),
      "dd_cos_lsh" -> Oracles.ddCosLsh(Catalog.lastCosLshDim.getOrElse(64)))
}
