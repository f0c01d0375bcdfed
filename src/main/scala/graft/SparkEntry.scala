package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY §2's inventory
  * (or a north-star extension), expressed Spark-first. Each key with a
  * DuckDB-expressible equivalent has a matching `oracleSql` entry whose
  * output columns/values hash-match the Spark result (decimal-exact
  * aggregation, string-formatted timestamps, deterministic ORDER BY —
  * see graft.functions.Deterministic).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReportJob.run(Tables.events(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference-surface parity (SURVEY §2.1-§2.5) ---
    "q_report_agg" -> ((s, d) => ReportJob.run(Tables.events(s, d))),
    "q_late_split" -> ((s, d) =>
      ReportJob.lateSplit(ReportJob.parse(ReportJob.eventsAsAuditLog(Tables.events(s, d))))),
    "q_clean_enrich" -> ((s, d) => CleanJob.run(s, Tables.events(s, d))),
    "q_clean_json" -> ((s, d) => CleanJob.runJson(s, Tables.events(s, d))),
    // --- relational fill-out (SURVEY §7 Phase 1.3) ---
    "q1_pricing" -> (Relational.q1Pricing _),
    "q6_revenue" -> (Relational.q6Revenue _),
    "q3_top_orders" -> (Relational.q3TopOrders _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_window_topn" -> (Relational.qWindowTopN _),
    "q_running_total" -> (Relational.qRunningTotal _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_setops" -> (Relational.qSetOps _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_join_skew_audit" -> (Relational.qJoinSkewAudit _),
    "q_scalar_funcs" -> (Relational.qScalarFuncs _),
    "q_date_funcs" -> (Relational.qDateFuncs _),
    "q_json_props" -> (Relational.qJsonProps _),
    "q_higher_order" -> (Relational.qHigherOrder _),
    "q_case_agg" -> (Relational.qCaseAgg _),
    "q_lead_lag" -> (Relational.qLeadLag _),
    "q_sessionize" -> (Relational.qSessionize _),
    "q_event_funnel" -> (Relational.qEventFunnel _),
    "q_retention" -> (Relational.qRetention _),
    "q_session_window" -> (Relational.qSessionWindow _),
    "q_event_anomaly" -> (Relational.qEventAnomaly _),
    "q_event_transitions" -> (Relational.qEventTransitions _),
    "q_pagerank" -> (graft.operators.Graph.qPageRank _),
    "q_full_outer" -> (Relational.qFullOuter _),
    "q_profile" -> (Relational.qProfile _),
    "q_pivot" -> (Relational.qPivot _),
    "q_percentiles" -> (Relational.qPercentiles _),
    "q_sql_interface" -> (Relational.qSqlInterface _),
    "q_setops_all" -> (Relational.qSetOpsAll _),
    "q_array_funcs" -> (Relational.qArrayFuncs _),
    "q_map_funcs" -> (Relational.qMapFuncs _),
    "q_string_funcs2" -> (Relational.qStringFuncs2 _),
    "q_scalar_subquery" -> (Relational.qScalarSubquery _),
    "q_asof_last_error" -> (Relational.qAsofLastError _),
    "q_price_band_join" -> (RangeJoin.qPriceBandJoin _),
    "q_skew_join" -> (SkewJoin.qSkewJoin _),
    "q_interval_join" -> (IntervalJoin.qIntervalJoin _),
    "q_interval_join_outer" -> (IntervalJoin.qIntervalJoinOuter _),
    "q_approx_quantile" -> (Relational.qApproxQuantile _),
    "q7_volume_shipping" -> (Relational.q7VolumeShipping _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q10_returned_items" -> (Relational.q10ReturnedItems _),
    "q13_order_distribution" -> (Relational.q13OrderDistribution _),
    "q14_promo_revenue" -> (Relational.q14PromoRevenue _),
    "q17_small_qty_revenue" -> (Relational.q17SmallQtyRevenue _),
    "q2_min_cost_supplier" -> (Relational.q2MinCostSupplier _),
    "q9_product_profit" -> (Relational.q9ProductProfit _),
    "q11_important_stock" -> (Relational.q11ImportantStock _),
    "q16_parts_supplier" -> (Relational.q16PartsSupplier _),
    "q20_potential_promo" -> (Relational.q20PotentialPromo _),
    "q4_late_orders" -> (Relational.q4LateOrders _),
    "q12_priority_ship" -> (Relational.q12PriorityShip _),
    "q18_large_orders" -> (Relational.q18LargeOrders _),
    "q19_disjunctive" -> (Relational.q19Disjunctive _),
    "q21_waiting_supplier" -> (Relational.q21WaitingSupplier _),
    "q15_top_supplier" -> (Relational.q15TopSupplier _),
    "q22_idle_customers" -> (Relational.q22IdleCustomers _),
    "q_range_frame" -> (Relational.qRangeFrame _),
    "q_rank_stats" -> (Relational.qRankStats _),
    "q_first_nth" -> (Relational.qFirstNth _),
    "q_null_funcs" -> (Relational.qNullFuncs _),
    "q_date_arith" -> (Relational.qDateArith _),
    // --- text analysis (north-star extensions) ---
    "q_token_stats" -> (TextAnalysis.qTokenStats _),
    "q_word_count" -> (TextAnalysis.qWordCount _),
    "q_bpe_pairs" -> (TextAnalysis.qBpePairs _),
    "q_bpe_merges" -> (TextAnalysis.qBpeMerges _),
    "q_bpe_vocab" -> (TextAnalysis.qBpeVocab _),
    "q_bm25" -> (Retrieval.qBm25 _),
    "q_rm3_expansion" -> (Retrieval.qRm3Expansion _),
    "q_bm25_rm3" -> (Retrieval.qBm25Rm3 _),
    "q_hybrid_rm3" -> (Retrieval.qHybridRm3 _),
    "q_hybrid_search" -> (Retrieval.qHybridSearch _),
    "q_hybrid_ivfpq" -> (Retrieval.qHybridIvfPq _),
    "q_hybrid_recall" -> (Retrieval.qHybridRecall _),
    "q_bpe_encode" -> (TextAnalysis.qBpeEncode _),
    "q_typo_pairs" -> (TextAnalysis.qTypoPairs _),
    "q_heavy_hitters" -> (TextAnalysis.qHeavyHitters _),
    "q_kmv_overlap" -> (TextAnalysis.qKmvOverlap _),
    "q_kmv_stream" -> (graft.streaming.KmvGate.qKmvStream _),
    "q_priority_stream" -> (graft.streaming.SampleGate.qPriorityStream _),
    "q_cms_stream" -> (graft.streaming.CmsGate.qCmsStream _),
    "q_fuzzy_link" -> (TextAnalysis.qFuzzyLink _),
    "q_text_quality" -> (TextAnalysis.qTextQuality _),
    "q_tfidf_topk" -> (TextAnalysis.qTfIdfTopK _),
    "q_lang_id" -> (TextAnalysis.qLangId _),
    "q_lang_id_eval" -> (TextAnalysis.qLangIdEval _),
    "q_fingerprint" -> (TextAnalysis.qFingerprint _),
    "q_pii_scrub" -> (TextAnalysis.qPiiScrub _),
    "q_subtoken_count" -> (TextAnalysis.qSubTokenCount _),
    "q_doc_chunks" -> (TextAnalysis.qDocChunks _),
    "q_seq_pack" -> (TextAnalysis.qSeqPack _),
    "q_pack_shards" -> (TextAnalysis.qPackShards _),
    "q_repetition" -> (TextAnalysis.qRepetition _),
    "q_contamination" -> (TextAnalysis.qContamination _),
    "q_perplexity" -> (TextAnalysis.qPerplexity _),
    "q_perplexity3" -> (TextAnalysis.qPerplexity3 _),
    "q_bloom_decontam" -> (TextAnalysis.qBloomDecontam _),
    "q_mixture_sample" -> (TextAnalysis.qMixtureSample _),
    "q_dsir_weights" -> (TextAnalysis.qDsirWeights _),
    "q_dsir_sample" -> (TextAnalysis.qDsirSample _),
    "q_dsir_shift" -> (TextAnalysis.qDsirShift _),
    "q_dsir_gate" -> (graft.streaming.DsirGate.qDsirGate _),
    "q_dsir_gate_disk" -> (graft.streaming.DsirGate.qDsirGateDisk _),
    "q_quality_clf" -> (graft.operators.QualityClf.qQualityClf _),
    "q_quality_clf_eval" -> (graft.operators.QualityClf.qQualityClfEval _),
    "q_quality_clf_gate" -> (graft.streaming.QualityClfGate.qQualityClfGate _),
    "q_quality_clf_gate_disk" -> (graft.streaming.QualityClfGate.qQualityClfGateDisk _),
    "q_quality_clf_drift" -> (graft.streaming.QualityClfGate.qQualityClfDrift _),
    "q_ppl_buckets" -> (TextAnalysis.qPplBuckets _),
    "q_ppl_cutoffs" -> (TextAnalysis.qPplCutoffs _),
    "q_priority_sample" -> (TextAnalysis.qPrioritySample _),
    "q_zorder_prune" -> (Layout.qZorderPrune _),
    "q_mixture_weights" -> (TextAnalysis.qMixtureWeights _),
    "q_data_split" -> (TextAnalysis.qDataSplit _),
    "q_source_quota" -> (TextAnalysis.qSourceQuota _),
    "q_token_budget" -> (TextAnalysis.qTokenBudgetSample _),
    "q_filter_funnel" -> (TextAnalysis.qFilterFunnel _),
    "q_corpus_report" -> (TextAnalysis.qCorpusReport _),
    "q_curation_e2e" -> (Curation.qCurationE2e _),
    "q_embed_quantize" -> (Similarity.qEmbedQuantize _),
    // --- dedup ---
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_dedup_content" -> (Dedup.qDedupContent _),
    "q_ngram_jaccard" -> (Dedup.qNgramJaccard _),
    "q_minhash_lsh" -> (Dedup.qMinhashLsh _),
    "q_dedup_gate" -> (graft.streaming.DedupGate.qDedupGate _),
    "q_dedup_gate_disk" -> (graft.streaming.DedupGate.qDedupGateDisk _),
    "q_span_gate" -> (graft.streaming.SpanGate.qSpanGate _),
    "q_span_gate_disk" -> (graft.streaming.SpanGate.qSpanGateDisk _),
    "q_quality_gate" -> (graft.streaming.QualityGate.qQualityGate _),
    "q_quality_gate_disk" -> (graft.streaming.QualityGate.qQualityGateDisk _),
    "q_quality3_gate" -> (graft.streaming.QualityGate.qQuality3Gate _),
    "q_ann_ingest" -> (graft.streaming.AnnIngest.qAnnIngest _),
    "q_ann_rebuild" -> (graft.streaming.AnnIngest.qAnnRebuild _),
    "q_ann_search_rebuilt" -> (graft.streaming.AnnIngest.qAnnSearchRebuilt _),
    "q_telemetry" -> (graft.streaming.TelemetryMonitor.qTelemetry _),
    "q_telemetry_disk" -> (graft.streaming.TelemetryMonitor.qTelemetryDisk _),
    "q_ingest_funnel" -> (graft.streaming.IngestPipeline.qIngestFunnel _),
    "q_embed_gate" -> (graft.streaming.DedupGate.qEmbedGate _),
    "q_embed_gate_disk" -> (graft.streaming.DedupGate.qEmbedGateDisk _),
    "q_embed_gate_strict" -> (graft.streaming.DedupGate.qEmbedGateStrict _),
    "q_embed_gate_deep" -> (graft.streaming.DedupGate.qEmbedGateDeep _),
    // q_simhash stays the xxhash64 signature/banding query the bench
    // baseline priced (rows-only — DuckDB has no xxhash64); the
    // oracle-verified md5 full near-dup pipeline carries its own name
    // (round-16, VERDICT r15 #5: never redefine a priced query in
    // place)
    "q_simhash" -> (Dedup.qSimhashXx _),
    "q_simhash_neardup" -> (Dedup.qSimhash _),
    "q_simhash_md5" -> (Dedup.qSimhashMd5 _),
    "q_embed_neardup" -> (Dedup.qEmbedNearDup _),
    "q_embed_neardup_lsh" -> (Dedup.qEmbedNearDupLsh _),
    "q_embed_neardup_strict" -> (Dedup.qEmbedNearDupStrict _),
    "q_embed_neardup_deep" -> (Dedup.qEmbedNearDupDeep _),
    "q_embed_neardup_auto" -> (Dedup.qEmbedNearDupAuto _),
    "q_dedup_clusters" -> (Dedup.qDedupClusters _),
    "q_dedup_keep_best" -> (Dedup.qDedupKeepBest _),
    "q_split_leakfree" -> (Dedup.qSplitLeakfree _),
    "q_split_leakage" -> (Dedup.qSplitLeakage _),
    "q_dedup_stats" -> (Dedup.qDedupStats _),
    "q_span_dedup" -> (Dedup.qSpanDedupScore _),
    "q_span_scrub" -> (Dedup.qSpanScrub _),
    "q_span_hotspots" -> (Dedup.qSpanHotspots _),
    "q_semantic_contamination" -> (Dedup.qSemanticContamination _),
    "q_embed_clusters" -> (Dedup.qEmbedClusters _),
    "q_semdedup" -> (Dedup.qSemDedup _),
    "q_embed_prune" -> (Similarity.qEmbedPrune _),
    "q_embed_prune_stats" -> (Similarity.qEmbedPruneStats _),
    // --- similarity search ---
    "q_knn_brute" -> (Similarity.qKnnBrute _),
    "q_ann_params" -> (Similarity.qAnnParams _),
    "q_kmeans_centroids" -> (Similarity.qKmeansCentroids _),
    "q_pca_power" -> (Similarity.qPcaPower _),
    "q_pca_basis" -> (Similarity.qPcaBasis _),
    "q_second_moment" -> (Similarity.qSecondMoment _),
    "q_whiten" -> (Similarity.qWhiten _),
    "q_pca_project" -> (Similarity.qPcaProject _),
    "q_knn_ivf" -> (Similarity.qKnnIvf _),
    "q_knn_ivf_int8" -> (Similarity.qKnnIvfInt8 _),
    "q_ivf_recall" -> (Similarity.qIvfRecall _),
    "q_ivf_int8_recall" -> (Similarity.qIvfInt8Recall _),
    "q_pq_codes" -> (Similarity.qPqCodes _),
    "q_knn_pq" -> (Similarity.qKnnPq _),
    "q_pq_recall" -> (Similarity.qPqRecall _),
    "q_opq_rotate" -> (Similarity.qOpqRotate _),
    "q_knn_opq" -> (Similarity.qKnnOpq _),
    "q_opq_recall" -> (Similarity.qOpqRecall _),
    "q_knn_ivfpq" -> (Similarity.qKnnIvfPq _),
    "q_ivfpq_recall" -> (Similarity.qIvfPqRecall _),
    "q_knn_ivfpq_res" -> (Similarity.qKnnIvfPqR _),
    "q_ivfpq_res_recall" -> (Similarity.qIvfPqRRecall _),
    "q_embed_classify" -> (Similarity.qEmbedClassify _),
    "q_clean_corpus" -> (Dedup.qCleanCorpus _),
    // --- multimodal ---
    "q_media_meta" -> (Multimodal.qMediaMeta _),
    "q_frame_sample" -> (Multimodal.qFrameSample _),
    "q_media_decode" -> (Multimodal.qMediaDecode _),
    "q_audio_features" -> (Multimodal.qAudioFeatures _),
    "q_media_resample" -> (Multimodal.qMediaResample _),
    "q_media_quarantine" -> (Multimodal.qMediaQuarantine _),
    "q_image_decode" -> (Multimodal.qImageDecode _),
    "q_image_features" -> (Multimodal.qImageFeatures _),
    "q_image_resize" -> (Multimodal.qImageResize _),
    "q_image_dhash" -> (Multimodal.qImageDhash _),
    "q_image_neardup" -> (Multimodal.qImageNeardup _),
    "q_audio_fingerprint" -> (Multimodal.qAudioFingerprint _),
    "q_audio_neardup" -> (Multimodal.qAudioNeardup _),
    "q_video_meta" -> (Multimodal.qVideoMeta _),
    "q_video_frames" -> (Multimodal.qVideoFrames _),
    "q_video_thin" -> (Multimodal.qVideoThin _),
    "q_video_motion" -> (Multimodal.qVideoMotion _),
    "q_video_quarantine" -> (Multimodal.qVideoQuarantine _),
    "q_video_fingerprint" -> (Multimodal.qVideoFingerprint _),
    "q_video_neardup" -> (Multimodal.qVideoNeardup _),
  )

  /** Shared DuckDB SQL fragments for the oracle side. */
  private val tokSql = "string_split_regex(trim(lower(text)), '\\s+')"
  private val shingleCte =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-2),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
       |    FROM (SELECT doc_id, $tokSql AS toks FROM documents)
       |    WHERE len(toks) >= 3))""".stripMargin
  /** Exact decimal squared-norm subquery over an embedding list. */
  private def n2Sql(e: String) =
    s"(CAST((SELECT sum(CAST(floor(CAST(u.x AS DOUBLE)*CAST(u.x AS DOUBLE)*1e12 + 0.5) AS BIGINT)) FROM unnest($e) u(x)) AS DOUBLE)/1e12)"
  /** Mirror of TextAnalysis.qPrioritySample: priority = one integer
    * floor division (DuckDB // = Scala Long / on non-negatives), u
    * from the 6-hex-digit md5 prefix (+1 so it is never zero), tau =
    * the (K+1)-th priority, w_hat = max(w, tau) — priority is w/u in
    * WEIGHT units (the 2^24 cancels against u's denominator). Shared
    * verbatim by q_priority_stream: the streaming sketch's closure
    * makes incremental == one-shot the entire correctness claim. */
  private val prioritySampleSql: String = {
    val k = graft.operators.TextAnalysis.SampleK
    s"""WITH p AS (SELECT doc_id, n_chars,
       |    (n_chars * 16777216) // (CAST(('0x' ||
       |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) + 1)
       |      AS priority
       |  FROM documents),
       |r AS (SELECT doc_id, n_chars, priority,
       |    row_number() OVER (ORDER BY priority DESC, doc_id) AS rnk FROM p),
       |tau AS (SELECT coalesce(max(CASE WHEN rnk = ${k + 1} THEN priority END), 0)
       |    AS tau FROM r)
       |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars, priority,
       |  greatest(n_chars, tau.tau) AS w_hat
       |FROM r, tau WHERE rnk <= $k ORDER BY rnk""".stripMargin
  }

  /** Mirror of Similarity.qPcaPower: the same unrolled power-iteration
    * chain in fixed-point — inputs quantized once to millis, per-round
    * exact integer aggregations (HUGEINT ≡ Decimal(38,0)), signed
    * truncating shift (both engines truncate on the |y| form), and the
    * identical double expression for the re-scale. Emits the final
    * round as `v{PcaRounds}(pos, v, norm_shifted)` over CTEs `xq`,
    * `v0..`; callers append their SELECT. */
  private def pcaChainSql: String = pcaChainSqlFor("", None)

  /** One unrolled power chain with CTE names suffixed by `sfx`;
    * `deflateAgainst` names the final direction CTE of a previous
    * chain, mirroring Similarity.powerChain's division-free exact
    * deflation (y' = y·‖v1‖² − (v1·y)·v1, shifted by the deflated
    * constant). Emits `v{PcaRounds}{sfx}(pos, v, norm_shifted)`. */
  private def pcaChainSqlFor(sfx: String, deflateAgainst: Option[String]): String = {
    import graft.operators.Similarity.{PcaRounds, PcaQuant, PcaShift, PcaShiftDeflated}
    val shift = if (deflateAgainst.isDefined) PcaShiftDeflated else PcaShift
    val sb = new StringBuilder(
      if (sfx.isEmpty)
        s"""xq AS MATERIALIZED (SELECT vec_id, pos,
           |    CAST(floor(CAST(embedding[pos+1] AS DOUBLE) * $PcaQuant + 0.5) AS BIGINT) AS xq
           |  FROM (SELECT vec_id, embedding,
           |      unnest(generate_series(0, len(embedding)-1)) AS pos FROM embeddings)),
           |v0 AS MATERIALIZED (SELECT DISTINCT pos, 1000000 AS v FROM xq)""".stripMargin
      else s"v0$sfx AS MATERIALIZED (SELECT DISTINCT pos, 1000000 AS v FROM xq)")
    for (i <- 1 to PcaRounds) {
      sb ++= s""",
         |s$i$sfx AS MATERIALIZED (SELECT x.vec_id, sum(x.xq * v.v) AS s
         |  FROM xq x JOIN v${i - 1}$sfx v ON x.pos = v.pos GROUP BY 1),
         |ya$i$sfx AS MATERIALIZED (SELECT x.pos,
         |    sum(CAST(s.s AS HUGEINT) * x.xq) AS y
         |  FROM xq x JOIN s$i$sfx s ON x.vec_id = s.vec_id GROUP BY 1)""".stripMargin
      val yIn = deflateAgainst match {
        case None => s"ya$i$sfx"
        case Some(v1) =>
          sb ++= s""",
             |dp$i$sfx AS MATERIALIZED (SELECT sum(y.y * CAST(v1.v AS HUGEINT)) AS p,
             |    (SELECT sum(CAST(v * v AS HUGEINT)) FROM $v1) AS v1sq
             |  FROM ya$i$sfx y JOIN $v1 v1 ON y.pos = v1.pos),
             |yd$i$sfx AS MATERIALIZED (SELECT y.pos, y.y * d.v1sq - d.p * v1.v AS y
             |  FROM ya$i$sfx y JOIN $v1 v1 ON y.pos = v1.pos, dp$i$sfx d)""".stripMargin
          s"yd$i$sfx"
      }
      sb ++= s""",
         |ys$i$sfx AS MATERIALIZED (SELECT pos, CASE WHEN y < 0 THEN -((-y) // $shift)
         |    ELSE y // $shift END AS ys FROM $yIn),
         |n$i$sfx AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(ys AS HUGEINT) * ys) AS DOUBLE)) AS nrm
         |  FROM ys$i$sfx),
         |v$i$sfx AS MATERIALIZED (SELECT pos,
         |    CAST(floor(CAST(ys AS DOUBLE) / nrm * 1e6 + 0.5) AS BIGINT) AS v,
         |    CAST(floor(nrm) AS BIGINT) AS norm_shifted FROM ys$i$sfx, n$i$sfx)""".stripMargin
    }
    sb.toString
  }

  /** Mirror of TextAnalysis.qHeavyHitters' verdict surface: exact
    * top-K anchor; the sketch verdicts must both hold (the count-min
    * one-sided + eps·N guarantees). Shared verbatim by q_cms_stream. */
  private val heavyHittersSql: String =
    s"""WITH toks AS (SELECT unnest($tokSql) AS w FROM documents),
       |cnts AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
       |  FROM toks GROUP BY 1)
       |SELECT w, exact_cnt, TRUE AS ge_exact, TRUE AS within_eps
       |FROM cnts ORDER BY exact_cnt DESC, w
       |LIMIT ${graft.operators.TextAnalysis.HeavyHittersK}""".stripMargin

  private val jaccardSql =
    s"""WITH $shingleCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |sp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared,
       |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
       |FROM sp JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  /** Mirror of SpanGate.novelty over the %4 batch/corpus split: batch
    * positional 8-word span md5s LEFT-joined against the corpus's
    * DISTINCT span-hash set, integer-exact admit verdict. */
  /** Mirror of QualityGate.score over the %4 batch/corpus split: the
    * q_perplexity fixed-point LM arithmetic (capped add-one bigram
    * model) with the integer cross-multiplied admit verdict. */
  /** Telemetry-monitor batch analog: frozen per-type stats from the
    * 3/4 corpus, z verdicts over the 1/4 "stream" — the same
    * decimal-exact-sums + fixed IEEE chain as q_event_anomaly, so the
    * mem and disk paths share one ground truth. */
  private val telemetrySql =
    """WITH st AS (SELECT event_type,
      |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
      |    count(*) AS n
      |  FROM events WHERE event_id % 4 <> 0 GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  (e.value - st.s1 / st.n) / sqrt((st.s2 - st.s1 * st.s1 / st.n) / st.n) AS z
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE e.event_id % 4 = 0
      |  AND st.n >= 2 AND (st.s2 - st.s1 * st.s1 / st.n) / st.n > 0
      |  AND abs((e.value - st.s1 / st.n) / sqrt((st.s2 - st.s1 * st.s1 / st.n) / st.n)) > 3
      |ORDER BY e.event_id""".stripMargin

  private val qualityGateSql =
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |bg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM t WHERE len(toks) >= 2),
       |bgc AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c_pair
       |  FROM bg WHERE doc_id % 4 <> 0 GROUP BY 1, 2
       |  ORDER BY c_pair DESC, prev, w LIMIT ${graft.operators.TextAnalysis.LmMaxBigrams}),
       |ctx AS (SELECT prev, CAST(sum(c_pair) AS BIGINT) AS c_ctx FROM bgc GROUP BY 1),
       |vv AS (SELECT count(DISTINCT tok) AS v
       |  FROM (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 4 <> 0)),
       |sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN bgc.c_pair IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
       |    CAST(sum(CAST(round(ln(CAST(COALESCE(ctx.c_ctx, 0) + vv.v AS DOUBLE))*1e6) AS BIGINT)
       |           - CAST(round(ln(CAST(COALESCE(bgc.c_pair, 0) + 1 AS DOUBLE))*1e6) AS BIGINT)) AS BIGINT)
       |      AS surprisal_x1e6
       |  FROM bg b CROSS JOIN vv
       |  LEFT JOIN bgc ON b.prev = bgc.prev AND b.w = bgc.w
       |  LEFT JOIN ctx ON b.prev = ctx.prev
       |  WHERE b.doc_id % 4 = 0
       |  GROUP BY 1)
       |SELECT doc_id, n_bigrams, n_unseen, surprisal_x1e6,
       |  round(surprisal_x1e6/1e6/n_bigrams, 4) AS avg_nats,
       |  CAST(CASE WHEN surprisal_x1e6 <= ${graft.streaming.QualityGate.AdmitMaxNatsX1e6} * n_bigrams
       |       THEN 1 ELSE 0 END AS BIGINT) AS admit
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Mirror of IngestPipeline.qIngestFunnel: the quality-gate and
    * span-gate verdict chains composed over the SAME %4 split, rolled
    * into the sequential stage-attrition report (span drops counted
    * among quality survivors only). Bypass convention: a doc too short
    * for a stage's verdict passes that stage (COALESCE(admit, 1)). */
  private val ingestFunnelSql =
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |bg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM t WHERE len(toks) >= 2),
       |bgc AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c_pair
       |  FROM bg WHERE doc_id % 4 <> 0 GROUP BY 1, 2
       |  ORDER BY c_pair DESC, prev, w LIMIT ${graft.operators.TextAnalysis.LmMaxBigrams}),
       |ctx AS (SELECT prev, CAST(sum(c_pair) AS BIGINT) AS c_ctx FROM bgc GROUP BY 1),
       |vv AS (SELECT count(DISTINCT tok) AS v
       |  FROM (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 4 <> 0)),
       |qa AS (SELECT b.doc_id,
       |    CASE WHEN CAST(sum(CAST(round(ln(CAST(COALESCE(ctx.c_ctx, 0) + vv.v AS DOUBLE))*1e6) AS BIGINT)
       |           - CAST(round(ln(CAST(COALESCE(bgc.c_pair, 0) + 1 AS DOUBLE))*1e6) AS BIGINT)) AS BIGINT)
       |         <= ${graft.streaming.QualityGate.AdmitMaxNatsX1e6} * count(*)
       |         THEN 1 ELSE 0 END AS q_admit
       |  FROM bg b CROSS JOIN vv
       |  LEFT JOIN bgc ON b.prev = bgc.prev AND b.w = bgc.w
       |  LEFT JOIN ctx ON b.prev = ctx.prev
       |  WHERE b.doc_id % 4 = 0 GROUP BY 1),
       |sp AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-7),
       |    i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
       |  FROM t WHERE len(toks) >= 8),
       |corp AS (SELECT DISTINCT h FROM sp WHERE doc_id % 4 <> 0),
       |sa AS (SELECT n.doc_id,
       |    CASE WHEN count(c.h) * 2 <= count(*) THEN 1 ELSE 0 END AS s_admit
       |  FROM sp n LEFT JOIN corp c ON n.h = c.h
       |  WHERE n.doc_id % 4 = 0 GROUP BY n.doc_id),
       |j AS (SELECT b.doc_id, COALESCE(qa.q_admit, 1) AS q, COALESCE(sa.s_admit, 1) AS sn
       |  FROM (SELECT doc_id FROM t WHERE doc_id % 4 = 0) b
       |  LEFT JOIN qa ON b.doc_id = qa.doc_id
       |  LEFT JOIN sa ON b.doc_id = sa.doc_id),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS total,
       |    CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN q = 1 AND sn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d2
       |  FROM j)
       |SELECT CAST(1 AS BIGINT) AS stage, 'quality_lm' AS rule,
       |  total AS n_in, d1 AS n_dropped, total - d1 AS n_out FROM a
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), 'span_novelty', total - d1, d2, total - d1 - d2 FROM a
       |ORDER BY stage""".stripMargin

  /** Fixed-point PageRank oracle (mirror of [[graft.operators.Graph
    * .qPageRank]]): the same integer micro-unit iterations, unrolled
    * one CTE per round from the SAME iteration-count and mass
    * constants so the two sides cannot drift. All arithmetic is
    * BIGINT `//` — exact in both engines. */
  private val pageRankSql: String = {
    val M = graft.operators.Graph.PrMassMicro
    val rounds = (1 to graft.operators.Graph.PrIterations).map { k =>
      val prev = if (k == 1) "r0" else s"it${k - 1}"
      s"""it$k AS (SELECT d.src AS node,
         |    (($M * 15 // 100) // n.n_nodes)
         |      + ((85 * COALESCE(s.contrib, 0)) // 100) AS pr
         |  FROM deg d CROSS JOIN n
         |  LEFT JOIN (SELECT e.dst, sum(r.pr // dg.outdeg) AS contrib
         |      FROM edges e JOIN $prev r ON e.src = r.node
         |      JOIN deg dg ON e.src = dg.src
         |      GROUP BY e.dst) s ON d.src = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS sup
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, sup AS dst FROM e0
       |  UNION ALL SELECT sup AS src, c AS dst FROM e0),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |n AS (SELECT count(*) AS n_nodes FROM deg),
       |r0 AS (SELECT src AS node, $M // n_nodes AS pr FROM deg, n),
       |$rounds
       |SELECT node, substring(node, 1, 1) AS kind, CAST(pr AS BIGINT) AS pr_micro
       |FROM it${graft.operators.Graph.PrIterations}
       |ORDER BY pr_micro DESC, node LIMIT ${graft.operators.Graph.PrTopK}""".stripMargin
  }

  /** Shared DSIR weight CTE chain (mirror of TextAnalysis dsirTrain +
    * dsirScore): bigram fan-out over the `trainCond` pool and its
    * `lang='en'` target slice, the deterministic capped feature vocab,
    * the three totals, a scoring fan-out over the `scoreCond` docs,
    * and the per-doc fixed-point importance weight — ending in
    * `sc(doc_id, n_feats, n_oov, logw_x1e6)`. ONE definition consumed
    * by the weights, sample, shift, and gate oracles so the smoothing
    * arithmetic cannot drift between them. */
  private def dsirCtes(trainCond: String, scoreCond: String): String =
    s"""bg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM (SELECT doc_id, $tokSql AS toks FROM documents WHERE $trainCond)
       |  WHERE len(toks) >= 2),
       |bgt AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM (SELECT doc_id, $tokSql AS toks FROM documents
       |    WHERE lang = 'en' AND ($trainCond))
       |  WHERE len(toks) >= 2),
       |sbg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM (SELECT doc_id, $tokSql AS toks FROM documents WHERE $scoreCond)
       |  WHERE len(toks) >= 2),
       |rawc AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c_raw
       |  FROM bg GROUP BY 1, 2
       |  ORDER BY c_raw DESC, prev, w LIMIT ${graft.operators.TextAnalysis.DsirMaxFeatures}),
       |tgtc AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c_tgt
       |  FROM bgt GROUP BY 1, 2),
       |feats AS (SELECT r.prev, r.w, r.c_raw, COALESCE(t.c_tgt, 0) AS c_tgt
       |  FROM rawc r LEFT JOIN tgtc t ON r.prev = t.prev AND r.w = t.w),
       |tot AS (SELECT CAST(sum(c_tgt) AS BIGINT) AS t_tot,
       |    CAST(sum(c_raw) AS BIGINT) AS r_tot,
       |    CAST(count(*) AS BIGINT) AS v FROM feats),
       |sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(CASE WHEN f.c_raw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    CAST(sum(
       |      (CAST(round(ln(CAST(COALESCE(f.c_tgt, 0) + 1 AS DOUBLE))*1e6) AS BIGINT)
       |       - CAST(round(ln(CAST(tot.t_tot + tot.v AS DOUBLE))*1e6) AS BIGINT))
       |      - (CAST(round(ln(CAST(COALESCE(f.c_raw, 0) + 1 AS DOUBLE))*1e6) AS BIGINT)
       |       - CAST(round(ln(CAST(tot.r_tot + tot.v AS DOUBLE))*1e6) AS BIGINT))
       |    ) AS BIGINT) AS logw_x1e6
       |  FROM sbg b CROSS JOIN tot
       |  LEFT JOIN feats f ON b.prev = f.prev AND b.w = f.w
       |  GROUP BY 1)""".stripMargin

  /** The batch-family instantiation: the model is trained on the same
    * pool it scores. */
  private val dsirCtesAll = dsirCtes("TRUE", "TRUE")

  /** Unrolled CTE mirror of [[graft.operators.QualityClf]] — the
    * trained hard-sigmoid logistic classifier over hashed bigram
    * features, replayed round by round (the pca_power/bpe_merges
    * unrolled-iteration discipline). Ends in `qsc(doc_id, y, n_feats,
    * z, p_x1e6, admit)`. Signed truncating divisions mirror the Spark
    * side exactly; gradient sums ride DuckDB's HUGEINT. */
  private def qclfCtes(trainCond: String, scoreCond: String): String = {
    val B = graft.operators.QualityClf.Buckets
    val upd = graft.operators.QualityClf.UpdateDiv
    require(B == 4096L, "bucket fold below is the 3-hex-digit fold")
    def bucket(h: String) =
      s"""((strpos('0123456789abcdef', substring($h, 1, 1)) - 1) * 256
         | + (strpos('0123456789abcdef', substring($h, 2, 1)) - 1) * 16
         | + (strpos('0123456789abcdef', substring($h, 3, 1)) - 1))""".stripMargin
    def sdiv(v: String, s: String) =
      s"CASE WHEN $v >= 0 THEN CAST(($v) // ($s) AS BIGINT) ELSE -CAST((-($v)) // ($s) AS BIGINT) END"
    def p(z: String) =
      s"LEAST(GREATEST(${sdiv(z, "4")} + 500000, 0), 1000000)"
    val en = graft.functions.TextFunctions.stopwords("en")
      .map(w => s"'$w'").mkString(", ")
    // Every CTE below is MATERIALIZED: DuckDB inlines plain CTEs, and
    // this chain re-references ft and qw{t-1} on EVERY boosting round
    // (plus qsc twice in the drift analog) — the same doubly-referenced
    // shape that made q_whiten re-evaluate exponentially (27 min →
    // seconds once materialized, SURVEY §2.8). Without these hints the
    // drift oracle alone costs ~10-15 min of DuckDB wall at sf0.01.
    def docCtes(name: String, cond: String) =
      s"""qc$name AS MATERIALIZED (SELECT doc_id, n_chars, toks
         |  FROM (SELECT doc_id, n_chars, $tokSql AS toks FROM documents WHERE $cond)
         |  WHERE len(toks) >= 2),
         |f$name AS MATERIALIZED (SELECT doc_id, ${bucket("md5(prev || ' ' || w)")} AS b,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM (SELECT doc_id,
         |      unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
         |      unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
         |    FROM qc$name)
         |  GROUP BY 1, 2
         |  UNION ALL SELECT doc_id, $B AS b, CAST(1 AS BIGINT) AS x FROM qc$name),
         |l$name AS MATERIALIZED (SELECT doc_id,
         |    CASE WHEN n_chars BETWEEN 100 AND 100000
         |      AND tl BETWEEN nt * 4 AND nt * 10
         |      AND ns * 20 >= nt
         |      AND nd * 10 >= nt * 3 THEN 1 ELSE 0 END AS y
         |  FROM (SELECT doc_id, n_chars,
         |      CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS BIGINT) AS tl,
         |      CAST(len(toks) AS BIGINT) AS nt,
         |      CAST(len(list_filter(toks, t -> t IN ($en))) AS BIGINT) AS ns,
         |      CAST(len(list_distinct(toks)) AS BIGINT) AS nd
         |    FROM qc$name))""".stripMargin
    // round 1 folds w0 = 0: the error is the constant 500000 - 1e6*y
    val round1 =
      s"""qg1 AS MATERIALIZED (SELECT f.b, sum(f.x * (500000 - 1000000 * l.y)) AS g
         |  FROM ft f JOIN lt l USING (doc_id) GROUP BY 1),
         |qw1 AS MATERIALIZED (SELECT b, CAST(0 - ${sdiv("g", s"n * $upd")} AS BIGINT) AS w
         |  FROM qg1 CROSS JOIN qn)""".stripMargin
    val laterRounds = (2 to graft.operators.QualityClf.Rounds).map { t =>
      s"""qz$t AS MATERIALIZED (SELECT f.doc_id, CAST(sum(f.x * COALESCE(w.w, 0)) AS BIGINT) AS z
         |  FROM ft f LEFT JOIN qw${t - 1} w ON f.b = w.b GROUP BY 1),
         |qe$t AS MATERIALIZED (SELECT z.doc_id, ${p("z.z")} - 1000000 * l.y AS e
         |  FROM qz$t z JOIN lt l USING (doc_id)),
         |qg$t AS MATERIALIZED (SELECT f.b, sum(f.x * e.e) AS g
         |  FROM ft f JOIN qe$t e USING (doc_id) GROUP BY 1),
         |qw$t AS MATERIALIZED (SELECT g.b,
         |    CAST(COALESCE(w.w, 0) - ${sdiv("g.g", s"n * $upd")} AS BIGINT) AS w
         |  FROM qg$t g LEFT JOIN qw${t - 1} w ON g.b = w.b CROSS JOIN qn)""".stripMargin
    }.mkString(",\n")
    val wFinal = s"qw${graft.operators.QualityClf.Rounds}"
    s"""${docCtes("t", trainCond)},
       |${docCtes("s", scoreCond)},
       |qn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM lt),
       |$round1,
       |$laterRounds,
       |qzs AS MATERIALIZED (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(f.x * COALESCE(w.w, 0)) AS BIGINT) AS z
       |  FROM fs f LEFT JOIN $wFinal w ON f.b = w.b GROUP BY 1),
       |qsc AS MATERIALIZED (SELECT z.doc_id, CAST(l.y AS BIGINT) AS y, z.n_feats, z.z,
       |    CAST(${p("z.z")} AS BIGINT) AS p_x1e6,
       |    CAST(CASE WHEN ${p("z.z")} >= ${graft.operators.QualityClf.AdmitMinPX1e6}
       |      THEN 1 ELSE 0 END AS BIGINT) AS admit
       |  FROM qzs z JOIN ls l USING (doc_id))""".stripMargin
  }

  private val qclfSqlAll =
    s"""WITH ${qclfCtes("TRUE", "TRUE")}
       |SELECT doc_id, y, n_feats, z, p_x1e6, admit FROM qsc ORDER BY doc_id""".stripMargin

  private val qclfEvalSql =
    s"""WITH ${qclfCtes("TRUE", "TRUE")}
       |SELECT y, admit, CAST(count(*) AS BIGINT) AS n
       |FROM qsc GROUP BY 1, 2 ORDER BY y, admit""".stripMargin

  private val qclfGateSql =
    s"""WITH ${qclfCtes("doc_id % 4 <> 0", "doc_id % 4 = 0")}
       |SELECT doc_id, y, n_feats, z, p_x1e6, admit FROM qsc ORDER BY doc_id""".stripMargin

  /** Shared add-one bigram-LM perplexity CTE chain (mirror of
    * TextAnalysis perplexityFrame), ending in `sc(doc_id, split,
    * n_bigrams, n_unseen, surprisal_x1e6)` — ONE definition consumed
    * by the perplexity oracle and the CCNet bucketing oracles. */
  private val pplCtes =
    s"""t AS (SELECT doc_id, $tokSql AS toks,
       |    CASE WHEN (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 13 THEN 'train'
       |         WHEN (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 15 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |bg AS (SELECT doc_id, split,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM t WHERE len(toks) >= 2),
       |bgc AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c_pair
       |  FROM bg WHERE split = 'train' GROUP BY 1, 2
       |  ORDER BY c_pair DESC, prev, w LIMIT ${graft.operators.TextAnalysis.LmMaxBigrams}),
       |ctx AS (SELECT prev, CAST(sum(c_pair) AS BIGINT) AS c_ctx FROM bgc GROUP BY 1),
       |vv AS (SELECT count(DISTINCT tok) AS v
       |  FROM (SELECT unnest(toks) AS tok FROM t WHERE split = 'train')),
       |sc AS (SELECT b.doc_id, b.split, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN bgc.c_pair IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
       |    CAST(sum(CAST(round(ln(CAST(COALESCE(ctx.c_ctx, 0) + vv.v AS DOUBLE))*1e6) AS BIGINT)
       |           - CAST(round(ln(CAST(COALESCE(bgc.c_pair, 0) + 1 AS DOUBLE))*1e6) AS BIGINT)) AS BIGINT)
       |      AS surprisal_x1e6
       |  FROM bg b CROSS JOIN vv
       |  LEFT JOIN bgc ON b.prev = bgc.prev AND b.w = bgc.w
       |  LEFT JOIN ctx ON b.prev = ctx.prev
       |  GROUP BY 1, 2)""".stripMargin

  /** The tercile machinery on top of [[pplCtes]]: the per-doc integer
    * ratio with lang, the per-(lang, ratio) value histogram, and the
    * exact order-statistic cutoffs c1 = ceil(n/3)-th smallest, c2 =
    * ceil(2n/3)-th — integer k via (n+2)//3, no float ceil. */
  private val pplBucketCtes =
    s"""base AS (SELECT s.doc_id, d.lang,
       |    CAST(s.surprisal_x1e6 // s.n_bigrams AS BIGINT) AS ratio_x1e6
       |  FROM sc s JOIN documents d ON s.doc_id = d.doc_id),
       |hist AS (SELECT lang, ratio_x1e6, CAST(count(*) AS BIGINT) AS c
       |  FROM base GROUP BY 1, 2),
       |cum AS (SELECT lang, ratio_x1e6,
       |    sum(c) OVER (PARTITION BY lang ORDER BY ratio_x1e6) AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS n FROM hist),
       |cut AS (SELECT lang,
       |    min(CASE WHEN cum >= (n + 2) // 3 THEN ratio_x1e6 END) AS c1,
       |    min(CASE WHEN cum >= (2 * n + 2) // 3 THEN ratio_x1e6 END) AS c2
       |  FROM cum GROUP BY 1)""".stripMargin

  /** The gate instantiation (the %4 batch/corpus split): model on the
    * corpus slice, scores on the batch slice, plus the admit verdict
    * and the signed-truncating per-feature weight. */
  private val dsirGateSql =
    s"""WITH ${dsirCtes("doc_id % 4 <> 0", "doc_id % 4 = 0")}
       |SELECT doc_id, n_feats, n_oov, logw_x1e6,
       |  CAST(CASE WHEN logw_x1e6 >= 0 THEN logw_x1e6 // n_feats
       |       ELSE -((-logw_x1e6) // n_feats) END AS BIGINT) AS avg_x1e6,
       |  CAST(CASE WHEN logw_x1e6 >= ${graft.streaming.DsirGate.AdmitMinX1e6} * n_feats
       |    THEN 1 ELSE 0 END AS BIGINT) AS admit
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Shared chunk→bucket→pack CTE chain (mirror of TextAnalysis
    * qDocChunks + qSeqPack), ending in `packs(bucket, pack_id,
    * n_chunks, n_tokens, n_docs)` — ONE definition consumed by both
    * the pack oracle and the shard-manifest oracle so the bucket and
    * prefix-sum arithmetic cannot drift between them. */
  private val seqPackCtes =
    s"""t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |c AS (SELECT doc_id, toks,
       |    unnest(generate_series(0, CAST(floor((len(toks)-1)/40.0) AS INT))) AS chunk_id
       |  FROM t WHERE len(toks) > 0),
       |ch AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |    CAST(least(50, len(toks) - chunk_id*40) AS BIGINT) AS n_tok
       |  FROM c),
       |nb AS (SELECT greatest(COALESCE(CAST(ceil(sum(n_tok)
       |      / ${graft.operators.TextAnalysis.TargetBucketTokens}.0) AS BIGINT), 1), 1)
       |    AS n_buckets FROM ch),
       |b AS (SELECT ch.*, (
       |    (strpos('0123456789abcdef', substring(md5(CAST(ch.doc_id AS VARCHAR)), 1, 1)) - 1) * 1048576
       |  + (strpos('0123456789abcdef', substring(md5(CAST(ch.doc_id AS VARCHAR)), 2, 1)) - 1) * 65536
       |  + (strpos('0123456789abcdef', substring(md5(CAST(ch.doc_id AS VARCHAR)), 3, 1)) - 1) * 4096
       |  + (strpos('0123456789abcdef', substring(md5(CAST(ch.doc_id AS VARCHAR)), 4, 1)) - 1) * 256
       |  + (strpos('0123456789abcdef', substring(md5(CAST(ch.doc_id AS VARCHAR)), 5, 1)) - 1) * 16
       |  + (strpos('0123456789abcdef', substring(md5(CAST(ch.doc_id AS VARCHAR)), 6, 1)) - 1)
       |  ) % nb.n_buckets AS bucket
       |  FROM ch, nb),
       |p AS (SELECT bucket, doc_id, n_tok,
       |    COALESCE(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM b),
       |packs AS (SELECT CAST(bucket AS BIGINT) AS bucket,
       |    CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
       |    count(*) AS n_chunks, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |    count(DISTINCT doc_id) AS n_docs
       |  FROM p GROUP BY 1, 2)""".stripMargin

  private val spanGateSql =
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |sp AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-7),
       |    i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
       |  FROM t WHERE len(toks) >= 8),
       |corp AS (SELECT DISTINCT h FROM sp WHERE doc_id % 4 <> 0),
       |new_sp AS (SELECT doc_id, h FROM sp WHERE doc_id % 4 = 0),
       |per AS (SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |    CAST(count(c.h) AS BIGINT) AS dup_spans
       |  FROM new_sp n LEFT JOIN corp c ON n.h = c.h GROUP BY n.doc_id)
       |SELECT doc_id, n_spans, dup_spans,
       |  CAST(dup_spans AS DOUBLE)/n_spans AS dup_frac,
       |  CAST(CASE WHEN dup_spans*2 <= n_spans THEN 1 ELSE 0 END AS BIGINT) AS admit
       |FROM per ORDER BY doc_id""".stripMargin
  /** Mirror of Dedup.simhashMd5Signatures: distinct tokens, uint32
    * from the first 8 md5 hex chars, 32 bit-majority weights, ties ->
    * 0. Core (no ORDER BY) shared by the signature query and the
    * banded near-dup primary. */
  private val simhashMd5CoreSql = {
    val w = (0 until 32).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS w$j")
      .mkString(",\n    ")
    val sh = (0 until 32).map(j =>
      s"(CASE WHEN w$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, t AS token FROM (
       |    SELECT doc_id, unnest($tokSql) AS t FROM documents) WHERE t <> ''),
       |h AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h FROM tok),
       |w AS (SELECT doc_id,
       |    $w
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($sh AS BIGINT) AS simhash32 FROM w""".stripMargin
  }

  private val simhashMd5Sql =
    s"$simhashMd5CoreSql\nORDER BY doc_id"

  /** Mirror of Dedup.qSimhash: 4 x 8-bit bands over the md5 32-bit
    * signature, bucket self-join, hamming <= 3 via bit_count(xor). */
  private val simhashNearDupSql =
    s"""WITH sig AS ($simhashMd5CoreSql),
       |bands AS (SELECT doc_id, simhash32, k AS band_id,
       |    (simhash32 >> (8*k)) & 255 AS band_val
       |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS k)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(bit_count(xor(x.simhash32, y.simhash32)) AS BIGINT) AS hamming
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_val = y.band_val
       |    AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM cand
       |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin

  /** Shared dHash CTE chain (mirror of BmpCodec.dhashBands over the
    * imageTable geometry): source-byte pixels, 8x9 box means as exact
    * floor divisions, horizontal gradient bits, four 16-bit bands —
    * ending in `dsig(doc_id, width, height, b0..b3)`. */
  private val imageDhashCtes =
    s"""s AS (SELECT doc_id,
       |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
       |    doc_id % 29 + 3 AS w FROM documents),
       |g AS (SELECT doc_id, bs, w, len(bs) // w AS h FROM s
       |  WHERE len(bs) // w >= 8 AND w >= 9),
       |ci AS (SELECT doc_id, bs, w, h, unnest(generate_series(0, 7)) AS i FROM g),
       |cij AS (SELECT doc_id, bs, w, h, i, unnest(generate_series(0, 8)) AS j FROM ci),
       |cr AS (SELECT doc_id, bs, w, i, j,
       |    (j*w)//9 AS c0, ((j+1)*w)//9 - 1 AS c1,
       |    unnest(generate_series((i*h)//8, ((i+1)*h)//8 - 1)) AS r FROM cij),
       |cc AS (SELECT doc_id, i, j, r, bs, w,
       |    unnest(generate_series(c0, c1)) AS c FROM cr),
       |gm AS (SELECT doc_id, i, j,
       |    CAST(sum(bs[r*w + c + 1]) AS BIGINT) // CAST(count(*) AS BIGINT) AS gv
       |  FROM cc GROUP BY 1, 2, 3),
       |dbits AS (SELECT a.doc_id, a.i, a.j,
       |    CASE WHEN a.gv < b.gv THEN 1 ELSE 0 END AS bit
       |  FROM gm a JOIN gm b ON a.doc_id = b.doc_id AND a.i = b.i AND b.j = a.j + 1
       |  WHERE a.j < 8),
       |dbands AS (SELECT doc_id, i // 2 AS band,
       |    CAST(sum(bit * (1 << ((i % 2) * 8 + j))) AS BIGINT) AS val
       |  FROM dbits GROUP BY 1, 2),
       |dsig AS (SELECT g.doc_id, CAST(g.w AS BIGINT) AS width,
       |    CAST(g.h AS BIGINT) AS height,
       |    max(CASE WHEN band = 0 THEN val END) AS b0,
       |    max(CASE WHEN band = 1 THEN val END) AS b1,
       |    max(CASE WHEN band = 2 THEN val END) AS b2,
       |    max(CASE WHEN band = 3 THEN val END) AS b3
       |  FROM g JOIN dbands ON g.doc_id = dbands.doc_id
       |  GROUP BY 1, 2, 3)""".stripMargin

  /** Shared video-fingerprint CTE chain (mirror of AviCodec
    * .dhashBands over the videoTable geometry): source-byte frame
    * luminance (the engine side must recover the same stream through
    * the idx1 seek + stride strip + bottom-up inversion), 9 box-mean
    * segments per frame as exact floor divisions, 8 gradient bits per
    * frame at positions k*8+j, four SHAPE-AWARE bands of 2·n_frames
    * present bits each (bands a short video doesn't reach coalesce
    * to 0, matching the engine's zero-init) — ending in
    * `vsig(doc_id, n_frames, b0..b3)`. */
  private val videoDhashCtes =
    """vs AS (SELECT doc_id,
      |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
      |    doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h
      |  FROM documents),
      |vg AS (SELECT doc_id, bs, w*h AS npx,
      |    least(len(bs) // (w*h*3), 8) AS n
      |  FROM vs WHERE w*h >= 9 AND len(bs) // (w*h*3) >= 1),
      |vfk AS (SELECT doc_id, bs, npx, n,
      |    unnest(generate_series(0, CAST(n - 1 AS INT))) AS k FROM vg),
      |vsj AS (SELECT doc_id, bs, npx, n, k,
      |    unnest(generate_series(0, 8)) AS j FROM vfk),
      |vsp AS (SELECT doc_id, npx, n, k, j, bs,
      |    unnest(generate_series((j*npx)//9, ((j+1)*npx)//9 - 1)) AS p FROM vsj),
      |vseg AS (SELECT doc_id, any_value(n) AS n, k, j,
      |    CAST(sum((bs[k*npx*3 + 3*p + 1] + bs[k*npx*3 + 3*p + 2]
      |              + bs[k*npx*3 + 3*p + 3]) // 3) AS BIGINT)
      |      // CAST(count(*) AS BIGINT) AS gv
      |  FROM vsp GROUP BY doc_id, k, j),
      |vbit AS (SELECT a.doc_id, a.n, a.k*8 + a.j AS bpos,
      |    CASE WHEN a.gv < b.gv THEN 1 ELSE 0 END AS bit_v
      |  FROM vseg a JOIN vseg b ON a.doc_id = b.doc_id AND a.k = b.k
      |    AND b.j = a.j + 1
      |  WHERE a.j < 8),
      |vband AS (SELECT doc_id, any_value(n) AS n, bpos // (2*n) AS band,
      |    CAST(sum(bit_v * (1 << (bpos % (2*n)))) AS BIGINT) AS val
      |  FROM vbit GROUP BY doc_id, bpos // (2*n)),
      |vsig AS (SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_frames,
      |    COALESCE(max(CASE WHEN band = 0 THEN val END), 0) AS b0,
      |    COALESCE(max(CASE WHEN band = 1 THEN val END), 0) AS b1,
      |    COALESCE(max(CASE WHEN band = 2 THEN val END), 0) AS b2,
      |    COALESCE(max(CASE WHEN band = 3 THEN val END), 0) AS b3
      |  FROM vband GROUP BY doc_id)""".stripMargin

  /** Shared audio-fingerprint CTE chain (mirror of WavCodec
    * .fingerprint over the wavTable byte stream): 4-sample window
    * energies as exact integer sums, 64 LAG-2 gradient bits, four
    * 16-bit bands — ending in `asig(doc_id, n_samples, b0..b3)`. */
  private val audioFpCtes = {
    import graft.operators.Multimodal.{AfpWindow, AfpWindows, AfpLag}
    s"""s AS (SELECT doc_id,
       |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs
       |  FROM documents),
       |g AS (SELECT doc_id, bs, CAST(len(bs) AS BIGINT) AS n FROM s
       |  WHERE len(bs) >= ${(AfpWindows + AfpLag) * AfpWindow}),
       |aw AS (SELECT doc_id, bs, n,
       |    unnest(generate_series(0, ${AfpWindows + AfpLag - 1})) AS w FROM g),
       |ak AS (SELECT doc_id, n, w, bs[w*$AfpWindow + k + 1] AS v
       |  FROM (SELECT doc_id, bs, n, w,
       |      unnest(generate_series(0, ${AfpWindow - 1})) AS k FROM aw)),
       |aen AS (SELECT doc_id, any_value(n) AS n, w,
       |    CAST(sum((v - 128) * (v - 128)) AS BIGINT) AS e
       |  FROM ak GROUP BY doc_id, w),
       |abit AS (SELECT a.doc_id, a.n, a.w,
       |    CASE WHEN a.e < b.e THEN 1 ELSE 0 END AS bit
       |  FROM aen a JOIN aen b ON a.doc_id = b.doc_id AND b.w = a.w + $AfpLag
       |  WHERE a.w < $AfpWindows),
       |aband AS (SELECT doc_id, w // 16 AS band, any_value(n) AS n,
       |    CAST(sum(bit * (1 << (w % 16))) AS BIGINT) AS val
       |  FROM abit GROUP BY 1, 2),
       |asig AS (SELECT doc_id, any_value(n) AS n_samples,
       |    max(CASE WHEN band = 0 THEN val END) AS b0,
       |    max(CASE WHEN band = 1 THEN val END) AS b1,
       |    max(CASE WHEN band = 2 THEN val END) AS b2,
       |    max(CASE WHEN band = 3 THEN val END) AS b3
       |  FROM aband GROUP BY doc_id)""".stripMargin
  }

  private val langScoreSql = {
    val profiles = graft.functions.TextFunctions.stopwords.toSeq.sortBy(_._1)
    val scores = profiles.map { case (lg, ws) =>
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(toks, t -> t IN ($set))) AS DOUBLE)/len(toks) AS score_$lg"
    }.mkString(",\n    ")
    val langs = profiles.map(_._1)
    val m = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val guess = langs.map(l => s"WHEN score_$l = $m THEN '$l'").mkString(" ")
    s"""SELECT doc_id, lang, CASE $guess END AS lang_guess,
       |  score_en, score_de, score_es, score_fr, score_zh
       |FROM (SELECT doc_id, lang,
       |    $scores
       |  FROM (SELECT doc_id, lang, $tokSql AS toks FROM documents))""".stripMargin
  }

  private val embedNearDupSql =
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
       |p AS (SELECT a.vec_id AS va, b.vec_id AS vb, a.n2 AS n2a, b.n2 AS n2b,
       |             a.embedding AS ea, b.embedding AS eb
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id),
       |z AS (SELECT va, vb, n2a, n2b, unnest(list_zip(ea, eb)) AS z FROM p),
       |dots AS (SELECT va, vb, any_value(n2a) AS n2a, any_value(n2b) AS n2b,
       |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
       |  FROM z GROUP BY va, vb)
       |SELECT va, vb, dot/(sqrt(n2a)*sqrt(n2b)) AS cosine FROM dots
       |WHERE dot/(sqrt(n2a)*sqrt(n2b)) >= 0.4 ORDER BY va, vb""".stripMargin

  /** The SRP weight matrix as a DuckDB list-of-lists literal — the
    * SAME `java.util.Random(7)` draws the Spark expression bakes into
    * codegen (graft.functions.expressions.SrpLsh), so signatures are
    * bit-identical across engines by construction. */
  private def srpWeightsSqlLiteral: String =
    srpWeightsSqlLiteralFor(graft.functions.expressions.SrpLsh.Seed)

  /** One hash family's Rademacher matrix as a SQL literal — the
    * seeded form backs the multi-family deep chain. */
  private def srpWeightsSqlLiteralFor(seed: Long): String = {
    import graft.functions.expressions.SrpLsh
    val w = SrpLsh.flatWeightsFor(seed)
    (0 until SrpLsh.Bits).map { j =>
      (0 until SrpLsh.Dim).map(p => w(j * SrpLsh.Dim + p)).mkString("[", ",", "]")
    }.mkString("[", ",", "]")
  }

  /** Clean-pipeline source CTEs shared by q_clean_enrich and
    * q_clean_json (one definition so the event→payload mapping cannot
    * drift between the column and JSON oracle forms). Mirrors
    * CleanJob.eventsAsCleanInput + the explode. */
  private val cleanExplodedCte =
    """src AS (
      |  SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
      |         ['US','TW','HK','PK','KW','SA','IN','JP'][CAST(user_id % 8 + 1 AS INT)] AS countryCode,
      |         event_id, value
      |  FROM events
      |), exploded AS (
      |  SELECT dt, countryCode,
      |         's' || CAST(event_id % 5 + 1 AS VARCHAR) AS type,
      |         value AS score,
      |         ['A','A+','B','C','D'][CAST(event_id % 5 + 1 AS INT)] AS level
      |  FROM src
      |  UNION ALL
      |  SELECT dt, countryCode,
      |         's' || CAST((event_id + 1) % 5 + 1 AS VARCHAR) AS type,
      |         value * 0.5 AS score,
      |         ['A','A+','B','C','D'][CAST((event_id + 1) % 5 + 1 AS INT)] AS level
      |  FROM src
      |)""".stripMargin

  /** The CleanJob.areasFixture lookup with the Scala-side "other"
    * default, as oracle SQL. */
  private val areaCaseSql =
    """CASE WHEN countryCode = 'US' THEN 'AREA_US'
      |            WHEN countryCode IN ('TW','HK') THEN 'AREA_CT'
      |            WHEN countryCode IN ('PK','KW','SA') THEN 'AREA_AR'
      |            WHEN countryCode = 'IN' THEN 'AREA_IN'
      |            ELSE 'other' END""".stripMargin

  /** Shared SRP-LSH mirror chain over a (vec_id, embedding) relation:
    * fixed-point projections -> sign bits -> 4-bit bands [-> optional
    * wide re-banding, exactly Dedup.srpWideBands] -> bucket self-join
    * -> exact-cosine verify at `threshold` — the same stages as
    * Dedup.qEmbedNearDupLsh / qEmbedNearDupStrict. ONE definition so
    * the bit-identical cross-engine contract (1e6/1e12 quantization,
    * weight literal, verify formula) cannot drift between the two
    * oracle paths. `prefix` holds any source-building CTEs (must end
    * with a comma when non-empty); `source` is the relation the chain
    * reads. */
  private def srpChainSql(
      prefix: String, source: String, group: Int, threshold: Double,
      offsets: Seq[Int] = Seq(0),
      seeds: Seq[Long] = Seq(graft.functions.expressions.SrpLsh.Seed)): String = {
    import graft.functions.expressions.SrpLsh
    // One pipeline per hash family k (independent weight literal per
    // seed — graft.functions.expressions.SrpBands(seed) mirror), each
    // wide-re-banded over every offset layout: original quarter j
    // lands in rotated position rid = (j - off) mod Bands, wide band
    // rid // group, weight 16^(rid % group) — exactly
    // Dedup.srpWideBands(sig, group, off) per layout. Family id and
    // layout are both folded into the bucket join key, so the union
    // over (families x layouts) still feeds ONE self-join — the same
    // key fold the Spark side uses (Dedup.bandedCandidates,
    // DedupGate.embedBands). With group=1/offsets=[0]/one seed this
    // degenerates to the original narrow 40x4-bit chain (the re-band
    // group-by is the identity), so every SRP oracle — narrow, strict,
    // deep, and the three gate restrictions — shares this ONE
    // definition and the bit-identical cross-engine contract
    // (1e6/1e12 quantization, weight literals, verify formula) cannot
    // drift between paths.
    val rid = s"((band_id + ${SrpLsh.Bands} - off) % ${SrpLsh.Bands})"
    val perSeed = seeds.zipWithIndex.map { case (seed, k) =>
      s"""s$k AS (SELECT ve.vec_id, js.j,
         |    sum(CAST(floor(ve.x*1e6 + 0.5) AS BIGINT) * (${srpWeightsSqlLiteralFor(seed)})[js.j+1][ve.pos+1]) AS s
         |  FROM ve CROSS JOIN (SELECT unnest(generate_series(0, ${SrpLsh.Bits - 1})) AS j) js
         |  GROUP BY 1, 2),
         |bands$k AS (SELECT vec_id, j // ${SrpLsh.BandBits} AS band_id,
         |    sum(CASE WHEN s >= 0 THEN 1 << (j % ${SrpLsh.BandBits}) ELSE 0 END) AS band_val
         |  FROM s$k GROUP BY 1, 2),
         |wide$k AS (SELECT vec_id, $k AS sig_id, off AS layout, $rid // $group AS band_id,
         |    sum(band_val * (1 << (${SrpLsh.BandBits} * ($rid % $group)))) AS band_val
         |  FROM bands$k CROSS JOIN (SELECT unnest([${offsets.mkString(",")}]) AS off)
         |  GROUP BY 1, 2, 3, 4)""".stripMargin
    }.mkString(",\n")
    val unionAll = seeds.indices.map(k => s"SELECT * FROM wide$k").mkString(" UNION ALL ")
    s"""WITH ${prefix}n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM $source),
       |ve AS MATERIALIZED (SELECT vec_id, pos, CAST(embedding[pos+1] AS DOUBLE) AS x FROM (
       |    SELECT vec_id, embedding,
       |      unnest(generate_series(0, len(embedding)-1)) AS pos
       |    FROM $source)),
       |$perSeed,
       |allb AS ($unionAll),
       |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM allb a JOIN allb b ON a.sig_id = b.sig_id AND a.layout = b.layout
       |    AND a.band_id = b.band_id AND a.band_val = b.band_val
       |    AND a.vec_id < b.vec_id),
       |cz AS (SELECT c.va, c.vb, an.n2 AS n2a, bn.n2 AS n2b,
       |    unnest(list_zip(an.embedding, bn.embedding)) AS z
       |  FROM cand c JOIN n an ON c.va = an.vec_id JOIN n bn ON c.vb = bn.vec_id),
       |dots AS (SELECT va, vb, any_value(n2a) AS n2a, any_value(n2b) AS n2b,
       |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
       |  FROM cz GROUP BY va, vb)
       |SELECT va, vb, dot/(sqrt(n2a)*sqrt(n2b)) AS cosine FROM dots
       |WHERE dot/(sqrt(n2a)*sqrt(n2b)) >= $threshold ORDER BY va, vb""".stripMargin
  }

  private def srpNearDupLshSql: String =
    srpChainSql("", "embeddings", 1, graft.operators.Dedup.CosineThreshold)

  /** The planted-near-dup augmentation CTEs (mirror of
    * Dedup.augmentedEmbeddings — zeroed coordinates, no float
    * arithmetic, bit-identical corpora); shared by the strict and
    * deep chains. Ends with a comma (srpChainSql prefix contract). */
  private def srpAugPrefixSql: String = {
    import graft.operators.Dedup
    s"""pl AS (
       |  SELECT vec_id, pos,
       |    CASE WHEN (pos + vec_id) % ${Dedup.PlantZeroMod} = 0
       |         THEN CAST(0 AS REAL) ELSE embedding[pos+1] END AS x
       |  FROM (SELECT vec_id, embedding,
       |          unnest(generate_series(0, len(embedding)-1)) AS pos
       |        FROM embeddings WHERE vec_id % ${Dedup.PlantStride} = 0)),
       |aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + ${Dedup.PlantIdOffset} AS vec_id,
       |         list(x ORDER BY pos) AS embedding
       |  FROM pl GROUP BY vec_id),
       |""".stripMargin
  }

  /** Strict-threshold mirror (Dedup.qEmbedNearDupStrict): plant
    * deterministic near-dup copies, then run the shared chain with
    * 8-bit wide bands at the realistic 0.7 threshold. */
  private def srpStrictSql: String = {
    import graft.operators.Dedup
    srpChainSql(srpAugPrefixSql, "aug", Dedup.StrictBandGroup,
      Dedup.StrictThreshold, Dedup.StrictBandOffsets)
  }

  /** DEEP-config mirror (Dedup.qEmbedNearDupDeep): the shared chain
    * at 16-bit bands, 4 rotation layouts, and one weight-matrix
    * literal per [[graft.operators.Dedup.DeepSeeds]] hash family. */
  private def srpDeepSql: String = {
    import graft.operators.Dedup
    srpChainSql(srpAugPrefixSql, "aug", Dedup.DeepBandGroup,
      Dedup.StrictThreshold, Dedup.DeepBandOffsets, Dedup.DeepSeeds)
  }

  /** Exact connected components (mirrors Dedup.connectedComponents'
    * fixpoint) over any (doc_a, doc_b) pair query: recursive
    * reachability closure, cluster id = min reachable vertex (incl.
    * self). Diameter-independent, like the Spark side's convergent
    * propagation — the UNION dedup bounds the recursion. */
  /** Connected-components CTE chain over a (doc_a, doc_b) pair query:
    * recursive reachability closure, min label per component, emitted
    * as `cc($outId, cluster_id)`. ONE definition shared by every
    * cluster-consuming oracle (q_dedup_clusters, q_embed_clusters,
    * q_dedup_keep_best, q_semdedup) so the closure cannot drift.
    * Callers prefix `WITH RECURSIVE`. */
  private def ccCtes(pairsSql: String, outId: String): String =
    // pr/ed MATERIALIZED: ed references pr twice and the recursive
    // closure scans ed every iteration — DuckDB inlines plain CTEs,
    // so an expensive pairsSql (the shingle self-join) would otherwise
    // re-evaluate per reference (the q_whiten lesson, SURVEY §2.8)
    s"""pr AS MATERIALIZED ($pairsSql),
       |ed AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pr
       |       UNION ALL SELECT doc_b, doc_a FROM pr),
       |reach(v, u) AS (
       |  SELECT a, a FROM ed
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN ed e ON r.u = e.a),
       |cc AS MATERIALIZED (SELECT v AS $outId, min(u) AS cluster_id FROM reach GROUP BY v)""".stripMargin

  private def ccSql(pairsSql: String, outId: String): String =
    s"""WITH RECURSIVE ${ccCtes(pairsSql, outId)}
       |SELECT $outId, cluster_id FROM cc ORDER BY $outId""".stripMargin

  // ------------------------------------------------------------------
  // Corpus-derived ANN parameterization as SQL scalar subqueries — the
  // mirrors of Similarity.numQueriesFor / cellsFor / nprobeFor /
  // shortlistFor (round-20, VERDICT r19 #1/#2). Each derives from
  // count(*) over the SAME universe the Spark side counts; the
  // rebuild/drift oracles textually re-root `FROM embeddings` at their
  // drift CTE, which re-roots these derivations identically (the Spark
  // side derives from the drifted frame's count there). floor(sqrt())
  // of a correctly-rounded IEEE sqrt is engine-identical, and // is
  // the same floor division as Scala Long `/` on non-negatives.
  // ------------------------------------------------------------------
  private val nqSql =
    s"(SELECT greatest(${Similarity.MinQueries}, count(*) // ${Similarity.QueryDiv}) FROM embeddings)"
  private val cellsExprSql =
    s"greatest(${Similarity.MinCells}, least(${Similarity.MaxCells}, " +
      "CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)))"
  private val seedStrideSql =
    s"(SELECT greatest(1, count(*) // $cellsExprSql) FROM embeddings)"
  /** Probe width from the TRAINED quantizer cardinality (cells can die
    * in Lloyd rounds) — a scalar over the final centroid CTE. */
  private def nprobeSql =
    s"(SELECT greatest(2, count(DISTINCT cent_id) // 2) FROM c${KmIters + 1})"
  private val shortlistSql =
    s"(SELECT greatest(${Similarity.K * Similarity.PqRerankFactor}, (count(*) * 2) // 5) FROM embeddings)"

  private val knnBruteSql =
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2 FROM n WHERE vec_id < $nqSql),
         |p AS (SELECT qid, vec_id AS cid, qn2, n2 AS cn2, unnest(list_zip(qe, embedding)) AS z
         |      FROM q JOIN n ON qid <> vec_id),
         |dots AS (SELECT qid, cid, any_value(qn2) AS qn2, any_value(cn2) AS cn2,
         |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM p GROUP BY qid, cid),
         |ranked AS (SELECT qid, cid, dot/(sqrt(qn2)*sqrt(cn2)) AS cosine,
         |    row_number() OVER (PARTITION BY qid ORDER BY dot/(sqrt(qn2)*sqrt(cn2)) DESC, cid) AS rn
         |  FROM dots)
         |SELECT qid, cid, cosine, rn FROM ranked WHERE rn <= 10 ORDER BY qid, rn""".stripMargin
  /** K-means CTE chain mirroring Similarity.trainCentroids: fixed
    * Lloyd rounds in fixed-point arithmetic — bit-identical to the
    * Spark side by construction. Expects CTEs `n` (vec_id, embedding,
    * n2) and `ve` (vec_id, pos, x DOUBLE) upstream; emits long-form
    * trained centroids as c{iters+1}. */
  private val KmIters = 3
  private def kmeansChainSql: String = {
    val sb = new StringBuilder(
      // derived-cardinality seed mirror (Similarity.seedStride):
      // stride = greatest(1, n // cellsFor(n))
      s"c1 AS (SELECT vec_id AS cent_id, pos, x FROM ve WHERE vec_id % " +
        s"$seedStrideSql = 0)")
    for (i <- 1 to KmIters) sb ++= s""",
         |cn$i AS (SELECT cent_id,
         |    CAST(sum(CAST(floor(x*x*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS n2
         |  FROM c$i GROUP BY 1),
         |d$i AS (SELECT ve.vec_id, c.cent_id,
         |    CAST(sum(CAST(floor(ve.x*c.x*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM ve JOIN c$i c ON ve.pos = c.pos GROUP BY 1, 2),
         |a$i AS (SELECT vec_id, cent_id AS cell FROM (
         |    SELECT d.vec_id, d.cent_id,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY d.dot/(sqrt(vn.n2)*sqrt(cn.n2)) DESC, d.cent_id) AS rn
         |    FROM d$i d JOIN n vn ON d.vec_id = vn.vec_id
         |    JOIN cn$i cn ON d.cent_id = cn.cent_id) t
         |  WHERE rn = 1),
         |c${i + 1} AS (SELECT a.cell AS cent_id, ve.pos,
         |    CAST(CAST(CAST(sum(CAST(floor(ve.x*1e6 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / (count(*) * 1e6) AS REAL) AS DOUBLE) AS x
         |  FROM a$i a JOIN ve ON a.vec_id = ve.vec_id GROUP BY 1, 2)"""
    sb.toString
  }
  private val veSql =
    """ve AS MATERIALIZED (SELECT vec_id, pos, CAST(embedding[pos+1] AS DOUBLE) AS x FROM (
      |    SELECT vec_id, embedding,
      |      unnest(generate_series(0, len(embedding)-1)) AS pos
      |    FROM embeddings))""".stripMargin
  private val kmeansSql =
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql
         |SELECT cent_id, CAST(pos AS BIGINT) AS pos, x AS val
         |FROM c${KmIters + 1} ORDER BY cent_id, pos""".stripMargin
  /** Per-subspace PQ chain mirror (Similarity.pqTrain/pqAssign): L2
    * Lloyd rounds where assignment ranks the ALL-INTEGER score
    * 2*dot_fx - ||c||²_fx (ties -> lowest cent_id) and the update is
    * the shared fixed-point mean. Emits pd{m}_{F} (final raw-integer
    * dots, the LUT source) and pa{m}_{F} (final codes), F = iters+1. */
  private def pqChainCtes(m: Int): String = pqChainCtesOver(m, "ve", "")

  /** The per-subspace chain over any (vec_id, pos, x) source view,
    * with a CTE-name prefix so the raw and RESIDUAL chains coexist in
    * one query. */
  private def pqChainCtesOver(m: Int, src: String, p: String): String = {
    val lo = m * Similarity.PqSubDim
    val hi = lo + Similarity.PqSubDim
    val sb = new StringBuilder(
      s"""${p}sve$m AS (SELECT vec_id, pos - $lo AS pos, x FROM $src WHERE pos >= $lo AND pos < $hi),
         |${p}pc${m}_1 AS (SELECT vec_id AS cent_id, pos, x FROM ${p}sve$m
         |  WHERE vec_id % (SELECT greatest(1, count(*) // ${Similarity.PqK}) FROM embeddings) = 0)""".stripMargin)
    for (i <- 1 to KmIters + 1) {
      sb ++= s""",
         |${p}pcn${m}_$i AS (SELECT cent_id, CAST(sum(CAST(floor(x*x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS n2fx
         |  FROM ${p}pc${m}_$i GROUP BY 1),
         |${p}pd${m}_$i AS (SELECT v.vec_id, c.cent_id,
         |    CAST(sum(CAST(floor(v.x*c.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
         |  FROM ${p}sve$m v JOIN ${p}pc${m}_$i c ON v.pos = c.pos GROUP BY 1, 2),
         |${p}pa${m}_$i AS (SELECT vec_id, cent_id AS code FROM (
         |    SELECT d.vec_id, d.cent_id,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY 2*d.dfx - cn.n2fx DESC, d.cent_id) AS rn
         |    FROM ${p}pd${m}_$i d JOIN ${p}pcn${m}_$i cn ON d.cent_id = cn.cent_id) t
         |  WHERE rn = 1)""".stripMargin
      if (i <= KmIters) sb ++= s""",
         |${p}pc${m}_${i + 1} AS (SELECT a.code AS cent_id, v.pos,
         |    CAST(CAST(CAST(sum(CAST(floor(v.x*1e6 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / (count(*) * 1e6) AS REAL) AS DOUBLE) AS x
         |  FROM ${p}pa${m}_$i a JOIN ${p}sve$m v ON a.vec_id = v.vec_id GROUP BY 1, 2)""".stripMargin
    }
    sb.toString
  }

  /** Shared PQ CTE prefix: the subspace view + all four chains +
    * unioned code and LUT frames — ONE definition for the encode,
    * search, and recall oracles. */
  /** The four PQ chains + unioned code/LUT frames WITHOUT the `ve`
    * view — composable after a chain that already defines `ve` (the
    * IVF-PQ oracle). */
  private def pqChainsCtes: String = {
    val f = KmIters + 1
    val codes = (0 until Similarity.PqM)
      .map(m => s"SELECT vec_id, CAST($m AS BIGINT) AS m, code FROM pa${m}_$f")
      .mkString(" UNION ALL ")
    val lut = (0 until Similarity.PqM)
      .map(m => s"SELECT vec_id AS qid, CAST($m AS BIGINT) AS m, cent_id AS code, dfx " +
        s"FROM pd${m}_$f WHERE vec_id < $nqSql")
      .mkString(" UNION ALL ")
    s"""${(0 until Similarity.PqM).map(pqChainCtes).mkString(",\n")},
       |pqcodes AS ($codes),
       |pqlut AS ($lut)""".stripMargin
  }

  private def pqCtes: String =
    s"""$veSql,
       |$pqChainsCtes""".stripMargin

  private def pqAdcCtes: String =
    s"""adc AS (SELECT l.qid, c.vec_id AS cid, CAST(sum(l.dfx) AS BIGINT) AS adc_fx
       |  FROM pqcodes c JOIN pqlut l ON c.m = l.m AND c.code = l.code
       |  WHERE c.vec_id <> l.qid GROUP BY 1, 2),
       |prk AS (SELECT qid, cid, adc_fx,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_fx DESC, cid) AS rn
       |  FROM adc)""".stripMargin

  private def pqCodesSql: String =
    s"""WITH $pqCtes
       |SELECT vec_id, m, code FROM pqcodes ORDER BY vec_id, m""".stripMargin

  /** ADC shortlist (rn <= K*PqRerankFactor) -> exact-dot rerank over
    * the survivors only — the mirror of qKnnPq's two stages. */
  private def knnPqSql: String =
    s"""WITH $pqCtes,
       |$pqAdcCtes,
       |short AS (SELECT qid, cid FROM prk
       |  WHERE rn <= $shortlistSql),
       |rer AS (SELECT s.qid, s.cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM short s JOIN ve a ON s.qid = a.vec_id
       |  JOIN ve b ON s.cid = b.vec_id AND a.pos = b.pos
       |  GROUP BY 1, 2),
       |rrk AS (SELECT qid, cid, dfx,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM rer)
       |SELECT qid, cid, CAST(dfx AS DOUBLE)/1e12 AS dot, CAST(rn AS BIGINT) AS rn
       |FROM rrk WHERE rn <= ${Similarity.K} ORDER BY qid, rn""".stripMargin

  private def pqRecallSql: String =
    s"""WITH $pqCtes,
       |$pqAdcCtes,
       |short AS (SELECT qid, cid FROM prk
       |  WHERE rn <= $shortlistSql),
       |rer AS (SELECT s.qid, s.cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM short s JOIN ve a ON s.qid = a.vec_id
       |  JOIN ve b ON s.cid = b.vec_id AND a.pos = b.pos
       |  GROUP BY 1, 2),
       |rrk AS (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM rer),
       |pqr AS (SELECT qid, cid FROM rrk WHERE rn <= ${Similarity.K}),
       |bd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM ve a JOIN ve b ON a.pos = b.pos
       |  WHERE a.vec_id < $nqSql AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |brk AS (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM bd),
       |br AS (SELECT qid, cid FROM brk WHERE rn <= ${Similarity.K})
       |SELECT br.qid, CAST(count(*) AS BIGINT) AS k,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS recall
       |FROM br LEFT JOIN pqr p ON br.qid = p.qid AND br.cid = p.cid
       |GROUP BY 1 ORDER BY br.qid""".stripMargin

  /** Composed IVF-PQ chain: the knnIvfSql coarse stages (kmeans,
    * assignment, probes), the PQ chains, then ADC restricted to the
    * PRUNED candidate set and the exact-dot rerank — the mirror of
    * Similarity.qKnnIvfPq stage for stage. Emits `rrk`. */
  private def ivfPqChain: String =
    s"""n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
       |$veSql,
       |$kmeansChainSql,
       |$ivfAssignCtes,
       |probes AS (SELECT qid, cell FROM (
       |    SELECT vec_id AS qid, cent_id AS cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dot/(sqrt(n2)*sqrt(cn2)) DESC, cent_id) AS rn
       |    FROM adots WHERE vec_id < $nqSql) t WHERE rn <= $nprobeSql),
       |$pqChainsCtes,
       |cand AS (SELECT p.qid, a.vec_id AS cid FROM probes p JOIN assign a ON p.cell = a.cell
       |         WHERE a.vec_id <> p.qid),
       |adc AS (SELECT x.qid, x.cid, CAST(sum(l.dfx) AS BIGINT) AS adc_fx
       |  FROM cand x JOIN pqcodes c ON x.cid = c.vec_id
       |  JOIN pqlut l ON l.qid = x.qid AND l.m = c.m AND l.code = c.code
       |  GROUP BY 1, 2),
       |prk AS (SELECT qid, cid, adc_fx,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_fx DESC, cid) AS rn
       |  FROM adc),
       |short AS (SELECT qid, cid FROM prk
       |  WHERE rn <= $shortlistSql),
       |rer AS (SELECT s.qid, s.cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM short s JOIN ve a ON s.qid = a.vec_id
       |  JOIN ve b ON s.cid = b.vec_id AND a.pos = b.pos
       |  GROUP BY 1, 2),
       |rrk AS (SELECT qid, cid, dfx,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM rer)""".stripMargin

  /** OPQ-lite Householder construction + rotated-corpus CTEs — the
    * mirror of Similarity.opqHouseholders/opqRotatedMillis: both PCA
    * chains (v1 = v{r}, v2 = v{r}b in micro units), u1/q1 from v1
    * (sign chosen to avoid cancellation), w = H1(v2) with its e0
    * component zeroed, u2/q2 from w, then each vector's two
    * reflections as 128-bit numerators with ONE signed truncating
    * division each. Emits `hb` (vec_id, pos, xr — rotated millis). */
  private def opqHouseholderCtes: String = {
    val r = graft.operators.Similarity.PcaRounds
    s"""${pcaChainSqlFor("", None)},
       |${pcaChainSqlFor("b", Some(s"v$r"))},
       |hn1 AS (SELECT CAST(floor(sqrt(CAST(sum(v*v) AS DOUBLE))) AS BIGINT) AS n1,
       |    CASE WHEN (SELECT v FROM v$r WHERE pos = 0) >= 0 THEN 1 ELSE -1 END AS s1
       |  FROM v$r),
       |hu1 AS (SELECT pos, v + CASE WHEN pos = 0 THEN s1*n1 ELSE 0 END AS u
       |  FROM v$r, hn1),
       |hq1 AS (SELECT sum(u*u) AS q FROM hu1),
       |hp12 AS (SELECT sum(u1.u * v2.v) AS p
       |  FROM hu1 u1 JOIN v${r}b v2 ON u1.pos = v2.pos),
       |hwn AS (SELECT u.pos,
       |    CAST(v2.v AS HUGEINT) * q.q - 2 * CAST(p.p AS HUGEINT) * u.u AS num
       |  FROM hu1 u JOIN v${r}b v2 ON u.pos = v2.pos, hq1 q, hp12 p),
       |hw AS (SELECT pos, CASE WHEN pos = 0 THEN 0
       |    WHEN num < 0 THEN -CAST((-num) // q AS BIGINT)
       |    ELSE CAST(num // q AS BIGINT) END AS w FROM hwn, hq1),
       |hn2 AS (SELECT CAST(floor(sqrt(CAST(sum(w*w) AS DOUBLE))) AS BIGINT) AS n2,
       |    CASE WHEN (SELECT w FROM hw WHERE pos = 1) >= 0 THEN 1 ELSE -1 END AS s2
       |  FROM hw),
       |hu2 AS (SELECT pos, w + CASE WHEN pos = 1 THEN s2*n2 ELSE 0 END AS u
       |  FROM hw, hn2),
       |hq2 AS (SELECT sum(u*u) AS q FROM hu2),
       |hpa AS (SELECT x.vec_id, sum(x.xq * u.u) AS p
       |  FROM xq x JOIN hu1 u ON x.pos = u.pos GROUP BY 1),
       |han AS (SELECT x.vec_id, x.pos,
       |    CAST(x.xq AS HUGEINT) * q.q - 2 * CAST(p.p AS HUGEINT) * u.u AS num
       |  FROM xq x JOIN hu1 u ON x.pos = u.pos
       |  JOIN hpa p ON x.vec_id = p.vec_id, hq1 q),
       |ha AS (SELECT vec_id, pos, CASE WHEN num < 0 THEN -CAST((-num) // q AS BIGINT)
       |    ELSE CAST(num // q AS BIGINT) END AS a FROM han, hq1),
       |hpb AS (SELECT a.vec_id, sum(a.a * u.u) AS p
       |  FROM ha a JOIN hu2 u ON a.pos = u.pos GROUP BY 1),
       |hbn AS (SELECT a.vec_id, a.pos,
       |    CAST(a.a AS HUGEINT) * q.q - 2 * CAST(p.p AS HUGEINT) * u.u AS num
       |  FROM ha a JOIN hu2 u ON a.pos = u.pos
       |  JOIN hpb p ON a.vec_id = p.vec_id, hq2 q),
       |hb AS MATERIALIZED (SELECT vec_id, pos,
       |    CASE WHEN num < 0 THEN -CAST((-num) // q AS BIGINT)
       |    ELSE CAST(num // q AS BIGINT) END AS xr FROM hbn, hq2)""".stripMargin
  }

  private def opqRotateSql: String =
    s"""WITH $opqHouseholderCtes
       |SELECT vec_id, pos, xr FROM hb ORDER BY vec_id, pos""".stripMargin

  /** Rotated view + PQ chains over it (prefix `o`) + ADC + exact-dot
    * rerank over the ORIGINAL vectors — Similarity.qKnnOpq stage for
    * stage. Emits `orrk`. */
  private def opqSearchCtes: String = {
    val f = KmIters + 1
    val codes = (0 until Similarity.PqM)
      .map(m => s"SELECT vec_id, CAST($m AS BIGINT) AS m, code FROM opa${m}_$f")
      .mkString(" UNION ALL ")
    val lut = (0 until Similarity.PqM)
      .map(m => s"SELECT vec_id AS qid, CAST($m AS BIGINT) AS m, cent_id AS code, dfx " +
        s"FROM opd${m}_$f WHERE vec_id < $nqSql")
      .mkString(" UNION ALL ")
    s"""$opqHouseholderCtes,
       |ove AS MATERIALIZED (SELECT vec_id, pos,
       |    CAST(CAST(CAST(xr AS DOUBLE)/1000.0 AS REAL) AS DOUBLE) AS x FROM hb),
       |$veSql,
       |${(0 until Similarity.PqM).map(m => pqChainCtesOver(m, "ove", "o")).mkString(",\n")},
       |ocodes AS ($codes),
       |olut AS ($lut),
       |oadc AS (SELECT l.qid, c.vec_id AS cid, CAST(sum(l.dfx) AS BIGINT) AS adc_fx
       |  FROM ocodes c JOIN olut l ON c.m = l.m AND c.code = l.code
       |  WHERE c.vec_id <> l.qid GROUP BY 1, 2),
       |oprk AS (SELECT qid, cid, adc_fx,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_fx DESC, cid) AS rn
       |  FROM oadc),
       |oshort AS (SELECT qid, cid FROM oprk
       |  WHERE rn <= $shortlistSql),
       |orer AS (SELECT s.qid, s.cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM oshort s JOIN ve a ON s.qid = a.vec_id
       |  JOIN ve b ON s.cid = b.vec_id AND a.pos = b.pos
       |  GROUP BY 1, 2),
       |orrk AS (SELECT qid, cid, dfx,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM orer)""".stripMargin
  }

  private def knnOpqSql: String =
    s"""WITH $opqSearchCtes
       |SELECT qid, cid, CAST(dfx AS DOUBLE)/1e12 AS dot, CAST(rn AS BIGINT) AS rn
       |FROM orrk WHERE rn <= ${Similarity.K} ORDER BY qid, rn""".stripMargin

  private def opqRecallSql: String =
    s"""WITH $opqSearchCtes,
       |opqr AS (SELECT qid, cid FROM orrk WHERE rn <= ${Similarity.K}),
       |obd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM ve a JOIN ve b ON a.pos = b.pos
       |  WHERE a.vec_id < $nqSql AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |obrk AS (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM obd),
       |obr AS (SELECT qid, cid FROM obrk WHERE rn <= ${Similarity.K})
       |SELECT obr.qid, CAST(count(*) AS BIGINT) AS k,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS recall
       |FROM obr LEFT JOIN opqr p ON obr.qid = p.qid AND obr.cid = p.cid
       |GROUP BY 1 ORDER BY obr.qid""".stripMargin

  private def knnIvfPqSql: String =
    s"""WITH $ivfPqChain
       |SELECT qid, cid, CAST(dfx AS DOUBLE)/1e12 AS dot, CAST(rn AS BIGINT) AS rn
       |FROM rrk WHERE rn <= ${Similarity.K} ORDER BY qid, rn""".stripMargin

  /** RESIDUAL IVF-PQ chain (Similarity.qKnnIvfPqR): the same coarse
    * stages, the residual view rve (float-rounded v − centroid, in
    * doubles), prefix-r PQ chains trained over rve, raw-query LUTs
    * against the residual codebooks, the exact integer ⟨q,c⟩ base
    * term per probed cell, and the shared shortlist/rerank tail. */
  private def ivfPqRChain: String = {
    val f = KmIters + 1
    val rcodes = (0 until Similarity.PqM)
      .map(m => s"SELECT vec_id, CAST($m AS BIGINT) AS m, code FROM rpa${m}_$f")
      .mkString(" UNION ALL ")
    val rlut = (0 until Similarity.PqM).map { m =>
      val lo = m * Similarity.PqSubDim
      val hi = lo + Similarity.PqSubDim
      s"""SELECT v.vec_id AS qid, CAST($m AS BIGINT) AS m, c.cent_id AS code,
         |    CAST(sum(CAST(floor((v.x)*c.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
         |  FROM (SELECT vec_id, pos - $lo AS pos, x FROM ve
         |        WHERE vec_id < $nqSql AND pos >= $lo AND pos < $hi) v
         |  JOIN rpc${m}_$f c ON v.pos = c.pos GROUP BY 1, 3""".stripMargin
    }.mkString(" UNION ALL ")
    s"""n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
       |$veSql,
       |$kmeansChainSql,
       |$ivfAssignCtes,
       |probes AS (SELECT qid, cell FROM (
       |    SELECT vec_id AS qid, cent_id AS cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dot/(sqrt(n2)*sqrt(cn2)) DESC, cent_id) AS rn
       |    FROM adots WHERE vec_id < $nqSql) t WHERE rn <= $nprobeSql),
       |rve AS MATERIALIZED (SELECT ve.vec_id, ve.pos, CAST(CAST(ve.x - c.x AS REAL) AS DOUBLE) AS x
       |  FROM ve JOIN assign a ON ve.vec_id = a.vec_id
       |  JOIN c$f c ON a.cell = c.cent_id AND ve.pos = c.pos),
       |${(0 until Similarity.PqM).map(m => pqChainCtesOver(m, "rve", "r")).mkString(",\n")},
       |rcodes AS ($rcodes),
       |rlut AS ($rlut),
       |qcfx AS (SELECT ve.vec_id AS qid, c.cent_id AS cell,
       |    CAST(sum(CAST(floor(ve.x*c.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS base_fx
       |  FROM ve JOIN c$f c ON ve.pos = c.pos
       |  WHERE ve.vec_id < $nqSql GROUP BY 1, 2),
       |cand AS (SELECT p.qid, a.vec_id AS cid, a.cell FROM probes p JOIN assign a ON p.cell = a.cell
       |         WHERE a.vec_id <> p.qid),
       |adc AS (SELECT x.qid, x.cid, qc.base_fx + CAST(sum(l.dfx) AS BIGINT) AS adc_fx
       |  FROM cand x JOIN rcodes c ON x.cid = c.vec_id
       |  JOIN rlut l ON l.qid = x.qid AND l.m = c.m AND l.code = c.code
       |  JOIN qcfx qc ON qc.qid = x.qid AND qc.cell = x.cell
       |  GROUP BY 1, 2, qc.base_fx),
       |prk AS (SELECT qid, cid, adc_fx,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_fx DESC, cid) AS rn
       |  FROM adc),
       |short AS (SELECT qid, cid FROM prk
       |  WHERE rn <= $shortlistSql),
       |rer AS (SELECT s.qid, s.cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM short s JOIN ve a ON s.qid = a.vec_id
       |  JOIN ve b ON s.cid = b.vec_id AND a.pos = b.pos
       |  GROUP BY 1, 2),
       |rrk AS (SELECT qid, cid, dfx,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM rer)""".stripMargin
  }

  private def knnIvfPqRSql: String =
    s"""WITH $ivfPqRChain
       |SELECT qid, cid, CAST(dfx AS DOUBLE)/1e12 AS dot, CAST(rn AS BIGINT) AS rn
       |FROM rrk WHERE rn <= ${Similarity.K} ORDER BY qid, rn""".stripMargin

  private def ivfPqRRecallSql: String =
    s"""WITH $ivfPqRChain,
       |pqr AS (SELECT qid, cid FROM rrk WHERE rn <= ${Similarity.K}),
       |bd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM ve a JOIN ve b ON a.pos = b.pos
       |  WHERE a.vec_id < $nqSql AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |brk AS (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM bd),
       |br AS (SELECT qid, cid FROM brk WHERE rn <= ${Similarity.K})
       |SELECT br.qid, CAST(count(*) AS BIGINT) AS k,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS recall
       |FROM br LEFT JOIN pqr p ON br.qid = p.qid AND br.cid = p.cid
       |GROUP BY 1 ORDER BY br.qid""".stripMargin

  private def ivfPqRecallSql: String =
    s"""WITH $ivfPqChain,
       |pqr AS (SELECT qid, cid FROM rrk WHERE rn <= ${Similarity.K}),
       |bd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    CAST(sum(CAST(floor(a.x*b.x*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS dfx
       |  FROM ve a JOIN ve b ON a.pos = b.pos
       |  WHERE a.vec_id < $nqSql AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |brk AS (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dfx DESC, cid) AS rn
       |  FROM bd),
       |br AS (SELECT qid, cid FROM brk WHERE rn <= ${Similarity.K})
       |SELECT br.qid, CAST(count(*) AS BIGINT) AS k,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN p.cid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS recall
       |FROM br LEFT JOIN pqr p ON br.qid = p.qid AND br.cid = p.cid
       |GROUP BY 1 ORDER BY br.qid""".stripMargin

  /** Final-centroid nearest-cell assignment CTEs (expects `n`, `ve`,
    * and the kmeans chain upstream; emits `assign(vec_id, cell)`) —
    * the mirror of Similarity.assignCells over trainedCentroids,
    * shared by the IVF search chain and the SemDeDup oracle so the
    * assignment arithmetic cannot drift between them. */
  private def ivfAssignCtes: String =
    s"""centl AS (SELECT cent_id, list(x ORDER BY pos) AS cent_e
         |          FROM c${KmIters + 1} GROUP BY 1),
         |cent AS (SELECT cent_id, cent_e, ${n2Sql("cent_e")} AS cent_n2 FROM centl),
         |az AS (SELECT a.vec_id, c.cent_id, a.n2, c.cent_n2, unnest(list_zip(a.embedding, c.cent_e)) AS z
         |       FROM n a CROSS JOIN cent c),
         |adots AS (SELECT vec_id, cent_id, any_value(n2) AS n2, any_value(cent_n2) AS cn2,
         |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM az GROUP BY vec_id, cent_id),
         |assign AS (SELECT vec_id, cent_id AS cell FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dot/(sqrt(n2)*sqrt(cn2)) DESC, cent_id) AS rn
         |    FROM adots) t WHERE rn = 1)""".stripMargin

  /** Mirror of Similarity.qEmbedPrune: the winning cosine per vector
    * off the shared assignment chain (rn = 1 of the adots ranking —
    * the same value [[nearestFit]]'s argmax produces), quantized with
    * the floor(x*1e6 + 0.5) convention, then the global decile cutoff
    * as a value-histogram order statistic (the q_ppl_buckets
    * machinery, global flavor). */
  private def embedPruneCtes: String =
    s"""afit AS (SELECT vec_id, cent_id AS cell, fit_x1e6 FROM (
       |    SELECT vec_id, cent_id,
       |      CAST(floor(dot/(sqrt(n2)*sqrt(cn2))*1e6 + 0.5) AS BIGINT) AS fit_x1e6,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY dot/(sqrt(n2)*sqrt(cn2)) DESC, cent_id) AS rn
       |    FROM adots) t WHERE rn = 1),
       |fhist AS (SELECT fit_x1e6, CAST(count(*) AS BIGINT) AS c FROM afit GROUP BY 1),
       |fcum AS (SELECT fit_x1e6, sum(c) OVER (ORDER BY fit_x1e6) AS cum,
       |    sum(c) OVER () AS nn FROM fhist),
       |fcut AS (SELECT min(CASE WHEN cum >= (nn + ${Similarity.PruneDecile - 1}) // ${Similarity.PruneDecile}
       |    THEN fit_x1e6 END) AS cut FROM fcum)""".stripMargin

  private val knnIvfSql =
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql,
         |$ivfAssignCtes,
         |probes AS (SELECT qid, cell FROM (
         |    SELECT vec_id AS qid, cent_id AS cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dot/(sqrt(n2)*sqrt(cn2)) DESC, cent_id) AS rn
         |    FROM adots WHERE vec_id < $nqSql) t WHERE rn <= $nprobeSql),
         |cand AS (SELECT p.qid, a.vec_id AS cid FROM probes p JOIN assign a ON p.cell = a.cell
         |         WHERE a.vec_id <> p.qid),
         |cz AS (SELECT c.qid, c.cid, qn.n2 AS qn2, cn.n2 AS cn2,
         |        unnest(list_zip(qn.embedding, cn.embedding)) AS z
         |  FROM cand c JOIN n qn ON c.qid = qn.vec_id JOIN n cn ON c.cid = cn.vec_id),
         |cdots AS (SELECT qid, cid, any_value(qn2) AS qn2, any_value(cn2) AS cn2,
         |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM cz GROUP BY qid, cid),
         |ranked AS (SELECT qid, cid, dot/(sqrt(qn2)*sqrt(cn2)) AS cosine,
         |    row_number() OVER (PARTITION BY qid ORDER BY dot/(sqrt(qn2)*sqrt(cn2)) DESC, cid) AS rn
         |  FROM cdots)
         |SELECT qid, cid, cosine, rn FROM ranked WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** Mirror of Dedup.qSemDedup: the IVF assignment chain, exact-cosine
    * pairs restricted to same-cell (the embedNearDupSql arithmetic with
    * cluster blocking), the recursive component closure of ccSql, and
    * a min-id representative per component. One flat chain so the
    * kmeans/assignment CTEs are computed once. */
  private def semDedupSql =
    s"""WITH RECURSIVE n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql,
         |$ivfAssignCtes,
         |p AS (SELECT a.vec_id AS va, b.vec_id AS vb, na.n2 AS n2a, nb.n2 AS n2b,
         |             na.embedding AS ea, nb.embedding AS eb
         |      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      JOIN n na ON a.vec_id = na.vec_id JOIN n nb ON b.vec_id = nb.vec_id),
         |z AS (SELECT va, vb, n2a, n2b, unnest(list_zip(ea, eb)) AS z FROM p),
         |dots AS (SELECT va, vb, any_value(n2a) AS n2a, any_value(n2b) AS n2b,
         |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM z GROUP BY va, vb),
         |${ccCtes(
            s"""SELECT va AS doc_a, vb AS doc_b FROM dots
               |       WHERE dot/(sqrt(n2a)*sqrt(n2b)) >= ${Dedup.SemDedupThreshold}""".stripMargin,
            "vec_id")}
         |SELECT a.vec_id, a.cell, coalesce(c.cluster_id, a.vec_id) AS rep,
         |       (coalesce(c.cluster_id, a.vec_id) = a.vec_id) AS keep
         |FROM assign a LEFT JOIN cc c ON a.vec_id = c.vec_id ORDER BY a.vec_id""".stripMargin

  /** Int8-index IVF search mirror of Similarity.qKnnIvfInt8: the
    * knnIvfSql chain up to probes, then the q_embed_quantize
    * quantization per vector, an INTEGER dot product over the
    * quantized lists for the shortlist (top 30 per query by the
    * int-derived approximate cosine), and the exact fixed-point fp32
    * rerank on the shortlist only. */
  private val knnIvfInt8Sql =
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql,
         |$ivfAssignCtes,
         |probes AS (SELECT qid, cell FROM (
         |    SELECT vec_id AS qid, cent_id AS cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dot/(sqrt(n2)*sqrt(cn2)) DESC, cent_id) AS rn
         |    FROM adots WHERE vec_id < $nqSql) t WHERE rn <= $nprobeSql),
         |q8 AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) *
         |      (CASE WHEN mx > 0 THEN 127.0/mx ELSE 0.0 END) + 0.5) AS BIGINT)) AS qe
         |  FROM (SELECT vec_id, embedding,
         |      list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |    FROM embeddings)),
         |qn8 AS (SELECT vec_id, qe,
         |    CAST((SELECT sum(u.v*u.v) FROM unnest(qe) u(v)) AS BIGINT) AS qn2i FROM q8),
         |cand AS (SELECT p.qid, a.vec_id AS cid FROM probes p JOIN assign a ON p.cell = a.cell
         |         WHERE a.vec_id <> p.qid),
         |z8 AS (SELECT c.qid, c.cid, qa.qn2i AS qan, qb.qn2i AS qbn,
         |        unnest(list_zip(qa.qe, qb.qe)) AS z
         |  FROM cand c JOIN qn8 qa ON c.qid = qa.vec_id JOIN qn8 qb ON c.cid = qb.vec_id),
         |s8 AS (SELECT qid, cid, any_value(qan) AS qan, any_value(qbn) AS qbn,
         |    CAST(sum(z[1]*z[2]) AS BIGINT) AS adot
         |  FROM z8 GROUP BY qid, cid),
         |short AS (SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |        ORDER BY (CASE WHEN qan > 0 AND qbn > 0
         |          THEN CAST(adot AS DOUBLE)/(sqrt(CAST(qan AS DOUBLE))*sqrt(CAST(qbn AS DOUBLE)))
         |          ELSE 0.0 END) DESC, cid) AS rn
         |    FROM s8) t WHERE rn <= 30),
         |cz AS (SELECT s.qid, s.cid, qn.n2 AS qn2, cn.n2 AS cn2,
         |        unnest(list_zip(qn.embedding, cn.embedding)) AS z
         |  FROM short s JOIN n qn ON s.qid = qn.vec_id JOIN n cn ON s.cid = cn.vec_id),
         |cdots AS (SELECT qid, cid, any_value(qn2) AS qn2, any_value(cn2) AS cn2,
         |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM cz GROUP BY qid, cid),
         |ranked AS (SELECT qid, cid, dot/(sqrt(qn2)*sqrt(cn2)) AS cosine,
         |    row_number() OVER (PARTITION BY qid ORDER BY dot/(sqrt(qn2)*sqrt(cn2)) DESC, cid) AS rn
         |  FROM cdots)
         |SELECT qid, cid, cosine, rn FROM ranked WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** Trigram stupid-backoff CTE chain shared by the q_perplexity3 and
    * q_quality3_gate mirrors (one definition, so the two cannot
    * drift): capped trigram/bigram/unigram tables over the rows where
    * `trainCond` holds, context sums, the pinned ln(0.4) integer, and
    * the per-doc fixed-point surprisal CTE `sc` over the rows where
    * `scoreCond` holds. */
  private def trigram3Ctes(trainCond: String, scoreCond: String): String = {
    val cap = graft.operators.TextAnalysis.LmMaxBigrams
    s"""t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |tg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-2), i -> toks[i])) AS w1,
       |    unnest(list_transform(generate_series(1, len(toks)-2), i -> toks[i+1])) AS w2,
       |    unnest(list_transform(generate_series(1, len(toks)-2), i -> toks[i+2])) AS w3
       |  FROM t WHERE len(toks) >= 3),
       |tgc AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c_tri
       |  FROM tg WHERE $trainCond GROUP BY 1, 2, 3
       |  ORDER BY c_tri DESC, w1, w2, w3 LIMIT $cap),
       |ctx3 AS (SELECT w1, w2, CAST(sum(c_tri) AS BIGINT) AS c_12 FROM tgc GROUP BY 1, 2),
       |bg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS prev,
       |    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i+1])) AS w
       |  FROM t WHERE len(toks) >= 2),
       |bgc AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c_pair
       |  FROM bg WHERE $trainCond GROUP BY 1, 2
       |  ORDER BY c_pair DESC, prev, w LIMIT $cap),
       |ctx2 AS (SELECT prev, CAST(sum(c_pair) AS BIGINT) AS c_ctx FROM bgc GROUP BY 1),
       |toku AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_uni FROM toku
       |  WHERE $trainCond GROUP BY 1
       |  ORDER BY c_uni DESC, tok LIMIT $cap),
       |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_toks, count(DISTINCT tok) AS v
       |  FROM toku WHERE $trainCond),
       |sc AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       |    CAST(sum(CASE WHEN tgc.c_tri IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hit,
       |    CAST(sum(CASE WHEN tgc.c_tri IS NULL AND bgc.c_pair IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_hit,
       |    CAST(sum(CASE WHEN tgc.c_tri IS NULL AND bgc.c_pair IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
       |    CAST(sum(CASE WHEN tgc.c_tri IS NOT NULL THEN
       |        CAST(round(ln(CAST(ctx3.c_12 AS DOUBLE))*1e6) AS BIGINT)
       |          - CAST(round(ln(CAST(tgc.c_tri AS DOUBLE))*1e6) AS BIGINT)
       |      WHEN bgc.c_pair IS NOT NULL THEN
       |        ${-graft.operators.TextAnalysis.LmBackoffLnX1e6}
       |          + CAST(round(ln(CAST(ctx2.c_ctx AS DOUBLE))*1e6) AS BIGINT)
       |          - CAST(round(ln(CAST(bgc.c_pair AS DOUBLE))*1e6) AS BIGINT)
       |      ELSE
       |        ${-2L * graft.operators.TextAnalysis.LmBackoffLnX1e6}
       |          + CAST(round(ln(CAST(nv.n_toks + nv.v AS DOUBLE))*1e6) AS BIGINT)
       |          - CAST(round(ln(CAST(COALESCE(uni.c_uni, 0) + 1 AS DOUBLE))*1e6) AS BIGINT)
       |      END) AS BIGINT) AS surprisal_x1e6
       |  FROM tg g CROSS JOIN nv
       |  LEFT JOIN tgc ON g.w1 = tgc.w1 AND g.w2 = tgc.w2 AND g.w3 = tgc.w3
       |  LEFT JOIN ctx3 ON g.w1 = ctx3.w1 AND g.w2 = ctx3.w2
       |  LEFT JOIN bgc ON bgc.prev = g.w2 AND bgc.w = g.w3
       |  LEFT JOIN ctx2 ON ctx2.prev = g.w2
       |  LEFT JOIN uni ON uni.tok = g.w3
       |  WHERE $scoreCond
       |  GROUP BY 1)""".stripMargin
  }

  /** Unrolled iterative-BPE chain mirroring TextAnalysis.bpeTrain:
    * the same chr(31)-doubled-separator symbol strings, per-round pair
    * count + LIMIT-1 argmax + literal replace() rewrite. Emits bb1..R
    * (the rules) and bs{R+1} (the fully-rewritten table); DuckDB
    * prunes CTEs a query never references, so the shared chain costs
    * each consumer only what it reads. */
  private def bpeChainCtes: String = {
    val rounds = graft.operators.TextAnalysis.BpeMergeRounds
    val sb = new StringBuilder(
      s"""bw AS (SELECT w, CAST(count(*) AS BIGINT) AS wcnt
         |  FROM (SELECT unnest($tokSql) AS w FROM documents)
         |  WHERE length(w) >= 2 GROUP BY 1),
         |bs1 AS (SELECT w, chr(31) || array_to_string(
         |    list_transform(generate_series(1, length(w)), i -> w[i]),
         |    chr(31) || chr(31)) || chr(31) AS seq, wcnt FROM bw)""".stripMargin)
    for (i <- 1 to rounds) {
      sb ++= s""",
         |by$i AS (SELECT wcnt, unnest(list_zip(sy[1:len(sy)-1], sy[2:len(sy)])) AS z
         |  FROM (SELECT wcnt, string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy FROM bs$i)),
         |bb$i AS (SELECT z[1] AS l, z[2] AS r, CAST(sum(wcnt) AS BIGINT) AS cnt
         |  FROM by$i WHERE z[2] IS NOT NULL GROUP BY 1, 2
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |bs${i + 1} AS (SELECT w, replace(seq,
         |    chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
         |    chr(31) || b.l || b.r || chr(31)) AS seq, wcnt FROM bs$i, bb$i b)""".stripMargin
    }
    sb.toString
  }

  private def bpeMergesSql: String = {
    val rounds = graft.operators.TextAnalysis.BpeMergeRounds
    s"""WITH $bpeChainCtes
       |SELECT * FROM (${(1 to rounds).map(i =>
        s"SELECT CAST($i AS BIGINT) AS merge_round, l, r, l || r AS merged, cnt FROM bb$i")
        .mkString(" UNION ALL ")})
       |ORDER BY merge_round""".stripMargin
  }

  private def bpeVocabSql: String = {
    val rounds = graft.operators.TextAnalysis.BpeMergeRounds
    s"""WITH $bpeChainCtes,
       |fin AS (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy, wcnt
       |  FROM bs${rounds + 1}),
       |sw AS (SELECT unnest(sy) AS subword, wcnt FROM fin)
       |SELECT subword, CAST(sum(wcnt) AS BIGINT) AS cnt FROM sw GROUP BY 1
       |ORDER BY cnt DESC, subword LIMIT ${graft.operators.TextAnalysis.BpeVocabTopK}""".stripMargin
  }

  private def bpeEncodeSql: String = {
    val rounds = graft.operators.TextAnalysis.BpeMergeRounds
    s"""WITH $bpeChainCtes,
       |enc AS (SELECT w, CAST(len(string_split(trim(seq, chr(31)), chr(31) || chr(31))) AS BIGINT) AS n_sub
       |  FROM bs${rounds + 1}),
       |edt AS (SELECT doc_id, unnest($tokSql) AS w FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(COALESCE(enc.n_sub, 1)) AS BIGINT) AS n_subwords
       |FROM edt LEFT JOIN enc ON edt.w = enc.w
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** BM25 mirror (Retrieval.qBm25): inverted-index aggregates, the
    * Lucene positive-idf ln-of-integer form, and the 10·T-cleared
    * integer saturation division — exact in both engines. */
  /** One per-key block of the join-skew audit mirror: same struct-max
    * tie order (min key among the heaviest) and the HUGEINT skew
    * ratio. */
  private def skewAuditSql(table: String, key: String): String =
    s"""SELECT '$key' AS key_col, n_rows, n_keys, max_cnt,
       |  (SELECT min($key) FROM (SELECT $key, count(*) AS cnt FROM $table GROUP BY 1) t2
       |   WHERE t2.cnt = s.max_cnt) AS top_key,
       |  CAST(CAST(max_cnt AS HUGEINT) * n_keys * 1000000 // n_rows AS BIGINT) AS skew_x1e6
       |FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |        CAST(count(*) AS BIGINT) AS n_keys,
       |        CAST(max(cnt) AS BIGINT) AS max_cnt
       |      FROM (SELECT $key, count(*) AS cnt FROM $table GROUP BY 1)) s""".stripMargin

  /** Shared BM25 CTE chain ending in `brnk(qid, doc_id, score_x1e6,
    * rn)` — consumed by the plain query, the hybrid fusions, and the
    * RM3 chain. */
  private def bm25Ctes: String = {
    import graft.operators.Retrieval.{NumTextQueries, QueryLen}
    s"""dt AS MATERIALIZED (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       |btf AS MATERIALIZED (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM dt GROUP BY 1, 2),
       |bdl AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM dt GROUP BY 1),
       |bdf AS MATERIALIZED (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM dt GROUP BY 1),
       |bnt AS MATERIALIZED (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |    CAST(count(*) AS BIGINT) AS t_toks FROM dt),
       |bq AS MATERIALIZED (SELECT DISTINCT doc_id AS qid, unnest(toks[1:$QueryLen]) AS term
       |  FROM (SELECT doc_id, $tokSql AS toks FROM documents)
       |  WHERE doc_id < $NumTextQueries),
       |bsc AS MATERIALIZED (SELECT bq.qid, btf.doc_id,
       |    CAST(sum((CAST(CAST(round(ln(CAST(2*bnt.n_docs + 2 AS DOUBLE))*1e6) AS BIGINT)
       |             - CAST(round(ln(CAST(2*bdf.df + 1 AS DOUBLE))*1e6) AS BIGINT) AS HUGEINT)
       |          * 22 * btf.tf * bnt.t_toks)
       |        // (CAST(10 AS HUGEINT) * bnt.t_toks * btf.tf + 3 * bnt.t_toks + 9 * bdl.dl * bnt.n_docs)) AS BIGINT)
       |      AS score_x1e6
       |  FROM btf JOIN bq ON btf.term = bq.term
       |  JOIN bdl ON btf.doc_id = bdl.doc_id
       |  JOIN bdf ON btf.term = bdf.term
       |  CROSS JOIN bnt
       |  GROUP BY 1, 2),
       |brnk AS MATERIALIZED (SELECT qid, doc_id, score_x1e6,
       |    row_number() OVER (PARTITION BY qid ORDER BY score_x1e6 DESC, doc_id) AS rn
       |  FROM bsc)""".stripMargin
  }

  private def bm25Sql: String = {
    import graft.operators.Retrieval.TopK
    s"""WITH $bm25Ctes
       |SELECT qid, doc_id, score_x1e6, CAST(rn AS BIGINT) AS rn
       |FROM brnk WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin
  }

  /** RM3 mirror (Retrieval.rm3Expansion / qBm25Rm3): feedback docs
    * from brnk, integer relevance-model term weights, the
    * deterministic top-E expansion minus original terms, then the
    * weighted second pass at 7:3 // 10. Ends in `re` (expansion) and
    * `rrnk` (final ranking). */
  private def bm25Rm3Ctes: String = {
    import graft.operators.Retrieval._
    s"""rfd AS MATERIALIZED (SELECT qid, doc_id, score_x1e6 AS s1 FROM brnk
       |  WHERE rn <= $RmFeedbackDocs),
       |rw AS MATERIALIZED (SELECT r.qid, t.term,
       |    sum((CAST(r.s1 AS HUGEINT) * t.tf) // l.dl) AS w
       |  FROM rfd r JOIN btf t ON r.doc_id = t.doc_id
       |  JOIN bdl l ON t.doc_id = l.doc_id
       |  GROUP BY 1, 2),
       |re AS MATERIALIZED (SELECT qid, term, rn, w FROM (
       |    SELECT rw.qid, rw.term, rw.w,
       |      row_number() OVER (PARTITION BY rw.qid ORDER BY rw.w DESC, rw.term) AS rn
       |    FROM rw LEFT JOIN bq ON rw.qid = bq.qid AND rw.term = bq.term
       |    WHERE bq.term IS NULL) t WHERE rn <= $RmExpandTerms),
       |q2 AS (SELECT qid, term, $RmOrigWeight AS wq FROM bq
       |  UNION ALL SELECT qid, term, $RmExpWeight AS wq FROM re),
       |rsc AS (SELECT q2.qid, btf.doc_id,
       |    CAST(sum(CAST(q2.wq AS HUGEINT)
       |        * ((CAST(CAST(round(ln(CAST(2*bnt.n_docs + 2 AS DOUBLE))*1e6) AS BIGINT)
       |             - CAST(round(ln(CAST(2*bdf.df + 1 AS DOUBLE))*1e6) AS BIGINT) AS HUGEINT)
       |            * 22 * btf.tf * bnt.t_toks)
       |          // (CAST(10 AS HUGEINT) * bnt.t_toks * btf.tf + 3 * bnt.t_toks + 9 * bdl.dl * bnt.n_docs)))
       |      // 10 AS BIGINT) AS score_x1e6
       |  FROM btf JOIN q2 ON btf.term = q2.term
       |  JOIN bdl ON btf.doc_id = bdl.doc_id
       |  JOIN bdf ON btf.term = bdf.term
       |  CROSS JOIN bnt
       |  GROUP BY 1, 2),
       |rrnk AS (SELECT qid, doc_id, score_x1e6,
       |    row_number() OVER (PARTITION BY qid ORDER BY score_x1e6 DESC, doc_id) AS rn
       |  FROM rsc)""".stripMargin
  }

  /** RRF fusion mirror: 1e6 // (60 + rank) per list entry, summed per
    * (query, doc) over the BM25 and exact-cosine lists. */
  private def hybridSearchSql: String = hybridSqlWith(knnBruteSql)

  /** Same fusion chain over any ANN list SQL (exact-cosine for the
    * reference point, the composed IVF-PQ index for the
    * production-index variant). */
  private def hybridSqlWith(annSql: String): String =
    hybridSqlOver(bm25Sql, annSql)

  /** The q_bm25_rm3 result as a self-contained subquery — the RM3
    * text leg for the fused stack. */
  private def bm25Rm3Sql: String =
    s"""WITH $bm25Ctes,
       |$bm25Rm3Ctes
       |SELECT qid, doc_id, score_x1e6, CAST(rn AS BIGINT) AS rn
       |FROM rrnk WHERE rn <= ${graft.operators.Retrieval.TopK}""".stripMargin

  /** The fusion chain over any (text list, ANN list) SQL pair. */
  private def hybridSqlOver(textSql: String, annSql: String): String = {
    import graft.operators.Retrieval.{RrfK, TopK}
    s"""WITH hb AS MATERIALIZED (SELECT qid, doc_id AS id, rn FROM ($textSql)),
       |ha AS (SELECT qid, cid AS id, rn FROM ($annSql)),
       |hu AS (SELECT qid, id, 1000000 // ($RrfK + rn) AS fx
       |  FROM (SELECT * FROM hb UNION ALL SELECT * FROM ha)),
       |hf AS (SELECT qid, id, CAST(sum(fx) AS BIGINT) AS rrf_x1e6,
       |    CAST(count(*) AS BIGINT) AS n_lists FROM hu GROUP BY 1, 2),
       |hr AS (SELECT qid, id, rrf_x1e6, n_lists,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf_x1e6 DESC, id) AS rn
       |  FROM hf)
       |SELECT qid, id AS doc_id, rrf_x1e6, n_lists, CAST(rn AS BIGINT) AS rn
       |FROM hr WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin
  }

  /** The derived partsupp parquet for the ORACLE's scale factor: the
    * driver's DuckDB gate always runs at sf0.01 (harness contract), so
    * the oracle SQL pins that dir's table — written by the Verify run
    * itself ([[graft.Tables.partsupp]]) before DuckDB reads it. */
  private val PartsuppOracleGlob =
    graft.Tables.partsuppPath("/root/testdata/sf0.01") + "/*.parquet"

  def oracleSql: Map[String, String] = Map(
    "q_report_agg" ->
      """WITH parsed AS (
        |  SELECT date_trunc('second', ts) AS ts, event_type AS type,
        |         'AREA_' || CAST(user_id % 5 AS VARCHAR) AS area
        |  FROM events
        |)
        |SELECT strftime(time_bucket(INTERVAL '30 seconds', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       type, area, count(*) AS cnt,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS time
        |FROM parsed GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_late_split" ->
      """WITH parsed AS (
        |  SELECT date_trunc('second', ts) AS ts, event_type AS type,
        |         'AREA_' || CAST(user_id % 5 AS VARCHAR) AS area
        |  FROM events
        |), wm AS (
        |  SELECT to_timestamp(CAST(floor(epoch(max(ts))) AS BIGINT) - 40) AT TIME ZONE 'UTC' AS wm FROM parsed
        |)
        |SELECT CASE WHEN ts < wm THEN 'late' ELSE 'ontime' END AS tag,
        |       type, area, count(*) AS cnt
        |FROM parsed, wm GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_clean_enrich" ->
      s"""WITH $cleanExplodedCte
        |SELECT dt, countryCode, type, score, level,
        |       $areaCaseSql AS area
        |FROM exploded ORDER BY dt, countryCode, type, score""".stripMargin,
    // same pipeline, JSON sink payload — score canonicalized to %.6f
    // fixed-point so the JSON string is bit-identical across engines
    "q_clean_json" ->
      s"""WITH $cleanExplodedCte
        |SELECT to_json(struct_pack(
        |    type := type,
        |    score := printf('%.6f', floor(score*1e6 + 0.5)/1e6),
        |    level := level,
        |    area := $areaCaseSql,
        |    dt := dt)) AS value
        |FROM exploded ORDER BY 1""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q6_revenue" ->
      """SELECT CAST(sum(CAST((l_extendedprice * l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_topn" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY 1, 2""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q_setops" ->
      """SELECT * FROM (
        |  SELECT 'click_not_error' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'click'
        |    EXCEPT SELECT user_id FROM events WHERE event_type = 'error')
        |  UNION ALL
        |  SELECT 'click_and_purchase' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'click'
        |    INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase')
        |  UNION ALL
        |  SELECT 'signup_or_error' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'signup'
        |    UNION SELECT user_id FROM events WHERE event_type = 'error')
        |) ORDER BY tag, user_id""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // bounded-error verdicts: the sketch values are engine-specific,
    // so the Spark side emits exact anchors + boolean bound checks and
    // the oracle expects TRUE — a hash match IS the error-bound proof
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  count(*) AS cnt, TRUE AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_skew_audit" ->
      Seq("lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
        "lineitem" -> "l_suppkey", "orders" -> "o_custkey",
        "events" -> "user_id")
        .map { case (t, k) => skewAuditSql(t, k) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_col"),
    "q_approx_quantile" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        |  substr(p_name, 1, 8) AS name8, CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  CAST(p_size % 7 AS BIGINT) AS size_mod,
        |  abs(p_retailprice - 950.0) AS price_dev,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  round(p_retailprice / 7, 2) AS price_div_round,
        |  sqrt(p_retailprice) AS price_sqrt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_higher_order" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  sqrt(CAST((SELECT sum(CAST(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE) AS DECIMAL(38,12)))
        |             FROM unnest(embedding) AS u(x)) AS DOUBLE)) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_case_agg" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lead_lag" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
        |  o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  o_totalprice - lag(o_totalprice, 1) OVER w AS delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |fc AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1),
        |a AS (SELECT f.cohort, CAST(ud.day - f.cohort AS BIGINT) AS day_offset,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM ud JOIN fc f ON ud.user_id = f.user_id GROUP BY 1, 2),
        |c0 AS (SELECT cohort, n_users AS cohort_size FROM a WHERE day_offset = 0)
        |SELECT a.cohort AS cohort_date, a.day_offset, a.n_users, c0.cohort_size,
        |  CAST(a.n_users AS DOUBLE) / c0.cohort_size AS retention
        |FROM a JOIN c0 ON a.cohort = c0.cohort
        |ORDER BY cohort_date, day_offset""".stripMargin,
    // Mean/variance from decimal-exact sums; the z chain is then a
    // fixed IEEE op sequence both engines evaluate identically.
    "q_event_anomaly" ->
      """WITH st AS (SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
        |    count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  (e.value - st.s1 / st.n) / sqrt((st.s2 - st.s1 * st.s1 / st.n) / st.n) AS z
        |FROM events e JOIN st ON e.event_type = st.event_type
        |WHERE st.n >= 2 AND (st.s2 - st.s1 * st.s1 / st.n) / st.n > 0
        |  AND abs((e.value - st.s1 / st.n) / sqrt((st.s2 - st.s1 * st.s1 / st.n) / st.n)) > 3
        |ORDER BY e.event_id""".stripMargin,
    "q_pagerank" -> pageRankSql,
    // lag window per user, session-gap filter, |types|^2 matrix; the
    // probability is one IEEE division of exact integer counts
    "q_event_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         |l AS (SELECT event_type, lag(event_type) OVER w AS prev_type,
         |    us - lag(us) OVER w AS gap
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |c AS (SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
         |  FROM l WHERE prev_type IS NOT NULL AND gap <= ${graft.operators.Relational.SessionGapUs}
         |  GROUP BY 1, 2),
         |t AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
         |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
         |  CAST(c.n AS DOUBLE) / t.n_from AS p
         |FROM c JOIN t ON c.from_type = t.from_type
         |ORDER BY 1, 2""".stripMargin,
    // Strictly-ordered stage times: each CTE joins the previous
    // stage's first-reach and keeps only later events — the carried t1
    // makes sum_delta_us exact integer microseconds.
    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |a1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |a2 AS (SELECT e.user_id, min(e.us) AS t_click, min(a1.t1) AS t1
        |       FROM e JOIN a1 ON e.user_id = a1.user_id
        |       WHERE e.event_type = 'click' AND e.us > a1.t1 GROUP BY 1),
        |a3 AS (SELECT e.user_id, min(e.us) AS t_signup, min(a2.t1) AS t1
        |       FROM e JOIN a2 ON e.user_id = a2.user_id
        |       WHERE e.event_type = 'signup' AND e.us > a2.t_click GROUP BY 1),
        |a4 AS (SELECT e.user_id, min(e.us) AS t_purchase, min(a3.t1) AS t1
        |       FROM e JOIN a3 ON e.user_id = a3.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > a3.t_signup GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
        |  CAST(count(*) AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS sum_delta_us FROM a1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT),
        |  CAST(COALESCE(sum(t_click - t1), 0) AS BIGINT) FROM a2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'signup', CAST(count(*) AS BIGINT),
        |  CAST(COALESCE(sum(t_signup - t1), 0) AS BIGINT) FROM a3
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT),
        |  CAST(COALESCE(sum(t_purchase - t1), 0) AS BIGINT) FROM a4
        |ORDER BY stage""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN us - lag(us, 1) OVER w > 1800000000
        |         OR lag(us, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), numbered AS (
        |  SELECT user_id, event_type, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  (max(us) - min(us)) // 1000000 AS duration_sec,
        |  count(DISTINCT event_type) AS n_types
        |FROM numbered GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_profile" -> {
      def p(name: String, minV: String, maxV: String) =
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $name) AS n_distinct, $minV AS min_v, $maxV AS max_v
           |FROM lineitem""".stripMargin
      Seq(
        p("l_orderkey", "CAST(min(l_orderkey) AS VARCHAR)", "CAST(max(l_orderkey) AS VARCHAR)"),
        p("l_quantity", "CAST(min(l_quantity) AS VARCHAR)", "CAST(max(l_quantity) AS VARCHAR)"),
        p("l_returnflag", "min(l_returnflag)", "max(l_returnflag)"),
        p("l_shipdate", "strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q12_priority_ship" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 150)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_rev
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE rev = (SELECT max(rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_idle_customers" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT) AS bal_fp
        |  FROM customer),
        |pos AS (SELECT sum(CAST(bal_fp AS HUGEINT)) AS sum_fp, count(*) AS n_pos
        |        FROM c WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
        |FROM c, pos
        |WHERE CAST(bal_fp AS HUGEINT) * n_pos > sum_fp
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS click_day, count(*) AS n_click
        |           FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT strftime(ts, '%Y-%m-%d') AS purchase_day, count(*) AS n_purchase
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(click_day, purchase_day) AS day,
        |  coalesce(n_click, 0) AS n_clicks,
        |  coalesce(n_purchase, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON click_day = purchase_day
        |ORDER BY day""".stripMargin,
    // boundary mirrors session_window: events exactly gap apart MERGE
    // (empirically: [ts, ts+gap) windows touching at the edge merge),
    // so only a gap STRICTLY > 30 min starts a new session
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts, us,
        |    CASE WHEN us - lag(us, 1) OVER w > 1800000000
        |         OR lag(us, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), numbered AS (
        |  SELECT user_id, ts, us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  count(*) AS n_events
        |FROM numbered GROUP BY user_id, sess_id ORDER BY user_id, sess_start""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_unspec,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sql_interface" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_rev,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_setops_all" ->
      """SELECT tag, event_type, count(*) AS cnt FROM (
        |  SELECT 'intersect_all' AS tag, event_type FROM (
        |    SELECT event_type FROM events WHERE user_id % 2 = 0
        |    INTERSECT ALL SELECT event_type FROM events WHERE user_id % 2 = 1)
        |  UNION ALL
        |  SELECT 'except_all' AS tag, event_type FROM (
        |    SELECT event_type FROM events WHERE user_id % 2 = 0
        |    EXCEPT ALL SELECT event_type FROM events WHERE user_id % 2 = 1)
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5_sorted,
        |  array_to_string(list_reverse(toks)[1:3], ',') AS last3_reversed,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  list_contains(toks, 'spark') AS has_spark,
        |  CAST(coalesce(list_position(toks, 'query'), 0) AS BIGINT) AS query_pos
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT user_id, event_type, count(*) AS cnt FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_lpad,
        |  rpad(p_brand, 12, '.') AS brand_rpad,
        |  translate(p_type, 'AEIOU', 'aeiou') AS type_lowvowel,
        |  reverse(p_name) AS name_rev,
        |  repeat(substr(p_brand, 1, 2), 3) AS brand_rep,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
        |  CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT) AS palindromicity
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  (SELECT max(o2.o_totalprice) FROM orders o2
        |   WHERE o2.o_custkey = o.o_custkey) AS cust_max,
        |  o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                  WHERE o2.o_custkey = o.o_custkey) AS is_biggest
        |FROM orders o ORDER BY o_orderkey""".stripMargin,
    "q_asof_last_error" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
        |SELECT event_id, user_id, event_type, us,
        |  last_value(CASE WHEN event_type = 'error' THEN us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_us,
        |  CAST((us - last_value(CASE WHEN event_type = 'error' THEN us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) // 1000000 AS BIGINT) AS sec_since_error
        |FROM e ORDER BY event_id""".stripMargin,
    "q_price_band_join" ->
      """WITH bands AS (
        |  SELECT i AS band_id, 900 + 10*i AS lo_d, 909 + 10*i AS hi_d
        |  FROM (SELECT unnest(generate_series(0, 9)) AS i)
        |), parts AS (
        |  SELECT p_partkey, p_retailprice,
        |         CAST(floor(p_retailprice) AS BIGINT) AS price_d
        |  FROM part)
        |SELECT band_id, count(*) AS n_parts,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM parts JOIN bands ON price_d BETWEEN lo_d AND hi_d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle runs the PLAIN join — salting must be invisible in
    // the result, which is exactly the property under test
    "q_skew_join" ->
      """SELECT n_name, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM (SELECT CASE WHEN event_type = 'click' THEN 0
        |             ELSE user_id % 25 END AS sk, value FROM events) e
        |JOIN nation ON e.sk = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_interval_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id AS user_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 600 SECOND
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q_interval_join_outer" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id AS user_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 600 SECOND
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_2'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'LARGE' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT 100.0 *
        |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH pf AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13' AND p_size < 15),
        |th AS (
        |  SELECT l_partkey AS tp,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity) * 0.2 AS qty_thresh
        |  FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM pf)
        |  GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN pf ON l_partkey = p_partkey
        |JOIN th ON l_partkey = tp
        |WHERE l_quantity < qty_thresh""".stripMargin,
    // ---- partsupp-dependent TPC-H shapes: the table is DERIVED
    // (Tables.partsupp — deterministic, written by the Verify run) and
    // the oracle reads the SAME parquet by absolute path, so both
    // engines see one identical table. The driver's oracle runs at
    // sf0.01; the path below pins that dir.
    "q2_min_cost_supplier" ->
      s"""WITH partsupp AS (SELECT * FROM read_parquet('$PartsuppOracleGlob')),
         |eu AS (SELECT n_nationkey, n_name FROM nation
         |       JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
         |sup_eu AS (SELECT ps_partkey, ps_suppkey, ps_supplycost,
         |             s_acctbal, s_name, n_name
         |           FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |           JOIN eu ON s_nationkey = n_nationkey),
         |mc AS (SELECT ps_partkey AS mc_partkey, min(ps_supplycost) AS mc_cost
         |       FROM sup_eu GROUP BY 1)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         |  ps_supplycost, ps_suppkey AS s_suppkey
         |FROM sup_eu
         |JOIN part ON ps_partkey = p_partkey AND p_size = 15
         |JOIN mc ON ps_partkey = mc_partkey AND ps_supplycost = mc_cost
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
         |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      s"""WITH partsupp AS (SELECT * FROM read_parquet('$PartsuppOracleGlob'))
         |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
         |    - ps_supplycost * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      s"""WITH partsupp AS (SELECT * FROM read_parquet('$PartsuppOracleGlob')),
         |pp AS (SELECT ps_partkey,
         |         CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6))) AS DOUBLE) AS value
         |       FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |       JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
         |       GROUP BY 1),
         |tot AS (SELECT CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total FROM pp),
         |np AS (SELECT count(*) AS n_part FROM part)
         |SELECT ps_partkey, value FROM pp, tot, np
         |WHERE value * n_part > total * 2.0
         |ORDER BY value DESC, ps_partkey""".stripMargin,
    "q16_parts_supplier" ->
      s"""WITH partsupp AS (SELECT * FROM read_parquet('$PartsuppOracleGlob'))
         |SELECT p_brand, p_type, p_size,
         |  count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
         |  AND p_size IN (1, 4, 7, 10, 14, 23, 45, 49)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_potential_promo" ->
      s"""WITH partsupp AS (SELECT * FROM read_parquet('$PartsuppOracleGlob')),
         |q97 AS (SELECT l_partkey, l_suppkey,
         |          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
         |        FROM lineitem
         |        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |        GROUP BY 1, 2),
         |excess AS (SELECT DISTINCT ps_suppkey FROM partsupp
         |           JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
         |           JOIN q97 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |           WHERE ps_availqty > qty * 0.5)
         |SELECT s_suppkey, s_name FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
         |JOIN excess ON s_suppkey = ps_suppkey
         |ORDER BY s_name, s_suppkey""".stripMargin,
    "q_range_frame" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |  count(*) OVER w AS n_within_10k,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_within_10k
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents
        |             RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rank_stats" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(rank() OVER w AS BIGINT) AS rk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drk
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q_first_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS latest_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_null_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_line,
        |  nullif(l_discount, 0.0) AS disc_or_null,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_defaulted,
        |  greatest(l_quantity, l_discount * 100, l_tax * 100) AS g,
        |  least(l_quantity, l_discount * 100, l_tax * 100) AS l
        |FROM lineitem ORDER BY l_orderkey, l_line""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_token_stats" ->
      s"""SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
         |  CAST(sum(length(tok)) AS BIGINT) AS sum_tok_len,
         |  CAST(max(length(tok)) AS BIGINT) AS max_tok_len
         |FROM (SELECT doc_id, unnest($tokSql) AS tok FROM documents)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_word_count" ->
      s"""SELECT tok, count(*) AS cnt
         |FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |GROUP BY 1 ORDER BY cnt DESC, tok""".stripMargin,
    // Pair counting over the word-frequency table (the BPE trainer
    // shape) — integer-exact end to end.
    "q_bpe_pairs" ->
      s"""WITH toks AS (SELECT unnest($tokSql) AS w FROM documents),
         |w AS (SELECT w, count(*) AS wcnt FROM toks WHERE length(w) >= 2 GROUP BY 1),
         |p AS (SELECT substr(w, i, 2) AS pair, wcnt
         |  FROM (SELECT w, wcnt, unnest(generate_series(1, length(w)-1)) AS i FROM w))
         |SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt FROM p GROUP BY 1
         |ORDER BY cnt DESC, pair LIMIT ${graft.operators.TextAnalysis.BpeTopK}""".stripMargin,
    // Unrolled per-round CTE chain (the PageRank convention): each
    // round = pair count over the symbol strings, LIMIT-1 argmax,
    // literal replace() rewrite — the doubled-separator encoding makes
    // scan-order replace identical to the greedy merge in both engines
    "q_bpe_merges" -> bpeMergesSql,
    // Same chain, read at bs{R+1}: the segmented corpus's subword
    // frequency table — the vocabulary the trained tokenizer uses
    "q_bpe_vocab" -> bpeVocabSql,
    "q_bm25" -> bm25Sql,
    "q_rm3_expansion" ->
      s"""WITH $bm25Ctes,
         |$bm25Rm3Ctes
         |SELECT qid, CAST(rn AS BIGINT) AS rn, term, CAST(w AS BIGINT) AS w
         |FROM re ORDER BY qid, rn""".stripMargin,
    "q_bm25_rm3" -> s"$bm25Rm3Sql\nORDER BY qid, rn",
    // the production fused stack with the RM3 text leg: same RRF
    // chain, better first-stage retriever
    "q_hybrid_rm3" -> hybridSqlOver(bm25Rm3Sql, knnIvfPqSql),
    "q_hybrid_search" -> hybridSearchSql,
    "q_hybrid_ivfpq" -> hybridSqlWith(knnIvfPqSql),
    // composed-stack recall: the production hybrid (IVF-PQ leg)
    // scored against the exact fusion, the q_ivf_int8_recall pattern
    // one level up the stack
    "q_hybrid_recall" ->
      s"""SELECT qid, k, n_hit, CAST(n_hit AS DOUBLE)/k AS recall FROM (
         |  SELECT e.qid, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(CASE WHEN a.adoc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM ($hybridSearchSql) e
         |  LEFT JOIN (SELECT qid AS aqid, doc_id AS adoc
         |             FROM (${hybridSqlWith(knnIvfPqSql)})) a
         |    ON e.qid = a.aqid AND e.doc_id = a.adoc
         |  GROUP BY 1) t ORDER BY qid""".stripMargin,
    "q_bpe_encode" -> bpeEncodeSql,
    // SymSpell deletion-neighborhood candidates + exact levenshtein
    // verify — the oracle runs the same blocked join, not the naive
    // |vocab|^2 form, so the blocking's completeness is itself under test
    "q_typo_pairs" ->
      s"""WITH toks0 AS (SELECT unnest($tokSql) AS w FROM documents),
         |can AS (SELECT substr(w, 2) AS w FROM
         |  (SELECT w, count(*) AS cnt FROM toks0
         |   WHERE length(w) >= ${graft.operators.TextAnalysis.TypoMinLen + 1}
         |   GROUP BY 1 ORDER BY cnt DESC, w LIMIT 1)),
         |toks AS (SELECT w FROM toks0 UNION ALL SELECT w FROM can),
         |v AS (SELECT w, count(*) AS cnt FROM toks
         |  WHERE length(w) >= ${graft.operators.TextAnalysis.TypoMinLen} GROUP BY 1),
         |k AS (SELECT w, cnt,
         |    CASE WHEN i = 0 THEN w ELSE substr(w, 1, i-1) || substr(w, i+1) END AS k
         |  FROM (SELECT w, cnt, unnest(generate_series(0, length(w))) AS i FROM v)),
         |cand AS (SELECT DISTINCT a.w AS w1, b.w AS w2, a.cnt AS cnt1, b.cnt AS cnt2
         |  FROM k a JOIN k b ON a.k = b.k WHERE a.w < b.w)
         |SELECT w1, w2, cnt1, cnt2 FROM cand
         |WHERE levenshtein(w1, w2) = 1
         |ORDER BY w1, w2""".stripMargin,
    // sketch convention (q_approx_distinct's): exact top-K anchor +
    // TRUE error-bound verdicts — the estimates themselves are
    // engine-specific, the guarantees are not
    "q_heavy_hitters" -> heavyHittersSql,
    // the additive sketch's streaming absorb: cell-wise additivity
    // makes incremental == one-shot, and the exactly-once batch-id
    // marker makes the lifecycle's deliberate replay invisible — so
    // the oracle is q_heavy_hitters' verbatim
    "q_cms_stream" -> heavyHittersSql,
    // KMV: every column — including the estimates and the bound
    // verdict — is recomputed from the same md5-hash domain with
    // HUGEINT floor division, so the WHOLE sketch algebra (not just
    // its guarantees) is hash-checked cross-engine. The oracle's
    // one-level bottom-K equals the Spark side's sharded two-level
    // form by KMV's closure property.
    "q_kmv_overlap" -> {
      val K = graft.operators.TextAnalysis.KmvK
      val space = graft.operators.TextAnalysis.KmvSpace
      val bound = graft.operators.TextAnalysis.KmvBoundX1e6
      s"""WITH sh AS (
         |  SELECT DISTINCT source, shingle FROM (
         |    SELECT source, unnest(list_transform(generate_series(1, len(toks)-2),
         |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
         |    FROM (SELECT source, $tokSql AS toks FROM documents)
         |    WHERE len(toks) >= 3)),
         |h AS (SELECT DISTINCT source,
         |    CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) + 1 AS h FROM sh),
         |n AS (SELECT source, count(*) AS n_hashes FROM h GROUP BY 1),
         |sk AS (SELECT source, h FROM (
         |    SELECT source, h,
         |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h)
         |  WHERE rn <= $K),
         |ps AS (SELECT source, max(h) AS h_k, count(*) AS n_sk FROM sk GROUP BY 1),
         |pse AS (SELECT ps.source, n.n_hashes,
         |    CASE WHEN n_sk < $K THEN n.n_hashes
         |         ELSE CAST(CAST(${K - 1} AS HUGEINT) * $space // h_k AS BIGINT)
         |    END AS est
         |  FROM ps JOIN n ON ps.source = n.source),
         |pairs AS (SELECT a.source AS src_a, b.source AS src_b
         |  FROM n a JOIN n b ON a.source < b.source),
         |tagged AS (
         |  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
         |    SELECT p.src_a, p.src_b, sk.h, 1 AS in_a, 0 AS in_b
         |    FROM pairs p JOIN sk ON sk.source = p.src_a
         |    UNION ALL
         |    SELECT p.src_a, p.src_b, sk.h, 0, 1
         |    FROM pairs p JOIN sk ON sk.source = p.src_b)
         |  GROUP BY 1, 2, 3),
         |us AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
         |    FROM tagged)
         |  WHERE rn <= $K),
         |pa AS (SELECT src_a, src_b, max(h) AS h_k, count(*) AS n_sk,
         |    sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS matched
         |  FROM us GROUP BY 1, 2),
         |ei AS (SELECT a.source AS src_a, b.source AS src_b,
         |    count(*) AS exact_inter
         |  FROM h a JOIN h b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
         |base AS (
         |  SELECT pa.src_a, pa.src_b, na.n_hashes AS n_a, nb.n_hashes AS n_b,
         |    COALESCE(ei.exact_inter, 0) AS exact_inter,
         |    ea.est AS est_a, eb.est AS est_b, pa.matched, pa.n_sk,
         |    CASE WHEN pa.n_sk < $K THEN pa.n_sk
         |         ELSE CAST(CAST(${K - 1} AS HUGEINT) * $space // pa.h_k AS BIGINT)
         |    END AS est_union
         |  FROM pa
         |  LEFT JOIN ei ON pa.src_a = ei.src_a AND pa.src_b = ei.src_b
         |  JOIN n na ON pa.src_a = na.source
         |  JOIN n nb ON pa.src_b = nb.source
         |  JOIN pse ea ON pa.src_a = ea.source
         |  JOIN pse eb ON pa.src_b = eb.source)
         |SELECT src_a, src_b, n_a, n_b, exact_inter,
         |  n_a + n_b - exact_inter AS exact_union,
         |  est_a, est_b, est_union, CAST(matched AS BIGINT) AS matched,
         |  CAST(CAST(matched AS HUGEINT) * est_union // n_sk AS BIGINT) AS est_inter,
         |  CAST(CAST(matched AS HUGEINT) * 1000000 // n_sk AS BIGINT) AS jaccard_x1e6,
         |  CAST(abs(est_union - (n_a + n_b - exact_inter)) AS HUGEINT) * 1000000
         |    <= CAST(n_a + n_b - exact_inter AS HUGEINT) * $bound AS union_ok
         |FROM base ORDER BY src_a, src_b""".stripMargin
    },
    // streaming KMV absorb: the oracle is the ONE-SHOT sketch over
    // ALL documents — the incremental (init + two absorbs) result
    // must equal it hash-for-hash by bottom-K closure, which is the
    // entire claim of the gate
    "q_kmv_stream" -> {
      val K = graft.operators.TextAnalysis.KmvK
      val space = graft.operators.TextAnalysis.KmvSpace
      s"""WITH sh AS (
         |  SELECT DISTINCT source, shingle FROM (
         |    SELECT source, unnest(list_transform(generate_series(1, len(toks)-2),
         |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
         |    FROM (SELECT source, $tokSql AS toks FROM documents)
         |    WHERE len(toks) >= 3)),
         |h AS (SELECT DISTINCT source,
         |    CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) + 1 AS h FROM sh),
         |sk AS (SELECT source, h FROM (
         |    SELECT source, h,
         |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h)
         |  WHERE rn <= $K),
         |ps AS (SELECT source, count(*) AS n_sk, max(h) AS h_k FROM sk GROUP BY 1)
         |SELECT source, n_sk, h_k,
         |  CASE WHEN n_sk < $K THEN n_sk
         |       ELSE CAST(CAST(${K - 1} AS HUGEINT) * $space // h_k AS BIGINT)
         |  END AS est
         |FROM ps ORDER BY source""".stripMargin
    },
    // NAIVE vocab x vocab scan on purpose: matching the Spark side's
    // SymSpell-blocked join proves the depth-2 deletion blocking is
    // COMPLETE over the real corpus, not just internally consistent
    "q_fuzzy_link" ->
      s"""WITH dt AS MATERIALIZED (SELECT unnest($tokSql) AS w FROM documents),
         |dv AS (SELECT w AS dw, count(*) AS doc_cnt FROM dt
         |  WHERE length(w) >= ${graft.operators.TextAnalysis.TypoMinLen} GROUP BY 1),
         |pt AS (SELECT unnest(${tokSql.replace("text", "p_name")}) AS w FROM part),
         |pv AS (SELECT DISTINCT w AS pw FROM pt
         |  WHERE length(w) >= ${graft.operators.TextAnalysis.TypoMinLen})
         |SELECT pw AS cat_word, dw AS doc_word,
         |  CAST(levenshtein(pw, dw) AS BIGINT) AS dist, doc_cnt
         |FROM pv JOIN dv ON levenshtein(pw, dw) <= ${graft.operators.TextAnalysis.FuzzyMaxEdit}
         |ORDER BY cat_word, doc_word""".stripMargin,
    "q_text_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop,
         |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
         |  FROM (SELECT doc_id, lang, n_chars, text, $tokSql AS toks FROM documents))
         |SELECT doc_id, lang, n_chars, n_tokens,
         |  CAST(n_chars AS DOUBLE)/n_tokens AS chars_per_tok,
         |  CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
         |  CAST(n_punct AS DOUBLE)/n_chars AS punct_ratio,
         |  least(CAST(n_tokens AS DOUBLE)/100.0, 1.0) * (1.0 - CAST(n_stop AS DOUBLE)/n_tokens) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    // TF-IDF keywords: score = tf*N/df as ONE double division of
    // exact integers (no ln() — transcendental last-ulp behavior
    // differs across engines and a one-ulp flip inside a ranking
    // changes rows); monotone-equivalent to raw-frequency TF-IDF at
    // fixed N, ties broken by token
    "q_tfidf_topk" ->
      s"""WITH dt AS MATERIALIZED (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM dt GROUP BY 1, 2),
         |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM dt GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |    CAST(tf.tf * n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
         |  FROM tf JOIN df USING (tok) CROSS JOIN n),
         |ranked AS (SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk FROM scored)
         |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, tf, df, score
         |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q_lang_id" -> (langScoreSql + "\nORDER BY doc_id"),
    "q_lang_id_eval" ->
      s"""SELECT lang, count(*) AS n,
         |  CAST(sum(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         |FROM ($langScoreSql)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_fingerprint" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pii_scrub" -> {
      import graft.operators.TextAnalysis
      s"""WITH inj AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR) ||
         |    '.0.1 call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
         |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS scrub_md5
         |FROM inj ORDER BY doc_id""".stripMargin
    },
    "q_subtoken_count" ->
      s"""WITH t AS (SELECT lang,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_sub,
         |    CAST(len($tokSql) AS BIGINT) AS n_ws
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_sub) AS BIGINT) AS total_subtokens,
         |  CAST(sum(n_ws) AS BIGINT) AS total_wstokens,
         |  CAST(sum(CAST(CAST(n_sub AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)/count(n_sub) AS avg_subtokens
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY lang, source, n_chars ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_content" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) AS n_unique
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ngram_jaccard" -> jaccardSql,
    // LSH path verified against the same exact ground truth: murmur3
    // signatures are deterministic, and at these band parameters every
    // >=0.5 pair in the corpus is recalled (empirically exact here;
    // recall probability at j=0.5 is 1-(1-0.5^2)^16 ~ 0.99).
    "q_minhash_lsh" -> jaccardSql,
    // engine-portable SimHash (md5-hashed 32-bit variant): the one
    // hash family both engines share, so the bit-majority construction
    // itself is oracle-verified; the banded near-dup primary too.
    // (q_simhash itself — the xxhash64 production signature — is
    // rows-only by necessity: no xxhash64 in DuckDB.)
    "q_simhash_neardup" -> simhashNearDupSql,
    "q_simhash_md5" -> simhashMd5Sql,
    // gate ground truth: exact-Jaccard pairs touching the new side —
    // crossing pairs oriented (new, corpus) PLUS new-new pairs (the
    // intra-batch population) oriented (higher, lower) = keep-lowest-id.
    // jaccardSql canonicalizes doc_a < doc_b, so for a new-new pair the
    // newcomer-to-flag is doc_b. LSH ≡ exact at these band parameters
    // (same argument as q_minhash_lsh).
    "q_dedup_gate" ->
      s"""SELECT CASE WHEN doc_b % 4 = 0 THEN doc_b ELSE doc_a END AS new_doc,
         |  CASE WHEN doc_b % 4 = 0 THEN doc_a ELSE doc_b END AS dup_of,
         |  jaccard
         |FROM ($jaccardSql)
         |WHERE (doc_a % 4 = 0) OR (doc_b % 4 = 0)
         |ORDER BY new_doc, dup_of""".stripMargin,
    // disk-backed gate: SAME ground truth as q_dedup_gate — the
    // bucketed on-disk verify path must be semantics-preserving
    "q_dedup_gate_disk" ->
      s"""SELECT CASE WHEN doc_b % 4 = 0 THEN doc_b ELSE doc_a END AS new_doc,
         |  CASE WHEN doc_b % 4 = 0 THEN doc_a ELSE doc_b END AS dup_of,
         |  jaccard
         |FROM ($jaccardSql)
         |WHERE (doc_a % 4 = 0) OR (doc_b % 4 = 0)
         |ORDER BY new_doc, dup_of""".stripMargin,
    // span-novelty gate: batch (%4=0) positional spans vs the corpus
    // (%4<>0) DISTINCT span-hash set; same integer-exact admit rule as
    // q_span_dedup's keep. Disk form is the same ground truth.
    "q_span_gate" -> spanGateSql,
    "q_span_gate_disk" -> spanGateSql,
    "q_quality_gate" -> qualityGateSql,
    "q_quality_gate_disk" -> qualityGateSql,
    "q_telemetry" -> telemetrySql,
    "q_telemetry_disk" -> telemetrySql,
    "q_ingest_funnel" -> ingestFunnelSql,
    "q_embed_neardup" -> embedNearDupSql,
    "q_embed_neardup_lsh" -> srpNearDupLshSql,
    "q_embed_neardup_strict" -> srpStrictSql,
    "q_embed_neardup_deep" -> srpDeepSql,
    // The adaptive default is judged against the exact all-pairs
    // ground truth over the augmented corpus — NOT against either
    // index — so the oracle proves the branch choice is answer-
    // invisible (whichever index the density probe picks must still
    // produce exactly the >= 0.7 pair set).
    "q_embed_neardup_auto" ->
      s"""WITH ${srpAugPrefixSql}n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM aug),
         |p AS (SELECT a.vec_id AS va, b.vec_id AS vb, a.n2 AS n2a, b.n2 AS n2b,
         |             a.embedding AS ea, b.embedding AS eb
         |      FROM n a JOIN n b ON a.vec_id < b.vec_id),
         |z AS (SELECT va, vb, n2a, n2b, unnest(list_zip(ea, eb)) AS z FROM p),
         |dots AS (SELECT va, vb, any_value(n2a) AS n2a, any_value(n2b) AS n2b,
         |    CAST(sum(CAST(floor(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM z GROUP BY va, vb)
         |SELECT va, vb, dot/(sqrt(n2a)*sqrt(n2b)) AS cosine FROM dots
         |WHERE dot/(sqrt(n2a)*sqrt(n2b)) >= ${graft.operators.Dedup.StrictThreshold}
         |ORDER BY va, vb""".stripMargin,
    // embedding gate ground truth: the full SRP chain restricted to
    // pairs touching the new side — crossing pairs oriented (new,
    // corpus) plus new-new pairs oriented (higher, lower); the chain
    // canonicalizes va < vb, so the new-new newcomer is vb
    "q_embed_gate" ->
      s"""SELECT CASE WHEN vb % 4 = 0 THEN vb ELSE va END AS new_vec,
         |  CASE WHEN vb % 4 = 0 THEN va ELSE vb END AS dup_of,
         |  cosine
         |FROM (${srpChainSql("", "embeddings", 1, graft.operators.Dedup.CosineThreshold)})
         |WHERE (va % 4 = 0) OR (vb % 4 = 0)
         |ORDER BY new_vec, dup_of""".stripMargin,
    // disk-backed embed gate: same ground truth as q_embed_gate
    "q_embed_gate_disk" ->
      s"""SELECT CASE WHEN vb % 4 = 0 THEN vb ELSE va END AS new_vec,
         |  CASE WHEN vb % 4 = 0 THEN va ELSE vb END AS dup_of,
         |  cosine
         |FROM (${srpChainSql("", "embeddings", 1, graft.operators.Dedup.CosineThreshold)})
         |WHERE (va % 4 = 0) OR (vb % 4 = 0)
         |ORDER BY new_vec, dup_of""".stripMargin,
    // strict-banding embed gate: the strict SRP chain (augmented
    // corpus, wide bands, 0.7 — exactly srpStrictSql) restricted to
    // pairs touching the new side, with the same %4 orientation as
    // q_embed_gate. PlantIdOffset % 4 == 0, so planted ids inherit
    // their source's batch assignment in both engines.
    "q_embed_gate_strict" ->
      s"""SELECT CASE WHEN vb % 4 = 0 THEN vb ELSE va END AS new_vec,
         |  CASE WHEN vb % 4 = 0 THEN va ELSE vb END AS dup_of,
         |  cosine
         |FROM ($srpStrictSql)
         |WHERE (va % 4 = 0) OR (vb % 4 = 0)
         |ORDER BY new_vec, dup_of""".stripMargin,
    // deep-banding embed gate: the deep multi-family SRP chain
    // (exactly srpDeepSql) restricted to pairs touching the new side
    "q_embed_gate_deep" ->
      s"""SELECT CASE WHEN vb % 4 = 0 THEN vb ELSE va END AS new_vec,
         |  CASE WHEN vb % 4 = 0 THEN va ELSE vb END AS dup_of,
         |  cosine
         |FROM ($srpDeepSql)
         |WHERE (va % 4 = 0) OR (vb % 4 = 0)
         |ORDER BY new_vec, dup_of""".stripMargin,
    "q_embed_clusters" -> ccSql(
      s"SELECT va AS doc_a, vb AS doc_b FROM ($embedNearDupSql)", "vec_id"),
    "q_semdedup" -> semDedupSql,
    "q_embed_prune" ->
      s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql,
         |$ivfAssignCtes,
         |$embedPruneCtes
         |SELECT a.vec_id, a.cell, a.fit_x1e6, a.fit_x1e6 <= c.cut AS prune
         |FROM afit a CROSS JOIN fcut c ORDER BY a.vec_id""".stripMargin,
    "q_embed_prune_stats" ->
      s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql,
         |$ivfAssignCtes,
         |$embedPruneCtes
         |SELECT a.cell, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(CASE WHEN a.fit_x1e6 <= c.cut THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         |  min(a.fit_x1e6) AS min_fit, max(a.fit_x1e6) AS max_fit
         |FROM afit a CROSS JOIN fcut c
         |GROUP BY 1 ORDER BY a.cell""".stripMargin,
    "q_knn_brute" -> knnBruteSql,
    // the derived-parameterization surface: the oracle RE-DERIVES every
    // serving knob from count(*) + the trained chain — a drift between
    // the two engines' derivation arithmetic fails here first
    "q_ann_params" ->
      s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql
         |SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vecs,
         |  CAST($nqSql AS BIGINT) AS n_queries,
         |  CAST((SELECT $cellsExprSql FROM embeddings) AS BIGINT) AS cells_target,
         |  CAST($seedStrideSql AS BIGINT) AS seed_stride,
         |  CAST((SELECT count(DISTINCT cent_id) FROM c${KmIters + 1}) AS BIGINT) AS n_cells_trained,
         |  CAST($nprobeSql AS BIGINT) AS nprobe,
         |  CAST($shortlistSql AS BIGINT) AS shortlist""".stripMargin,
    "q_kmeans_centroids" -> kmeansSql,
    "q_pca_power" -> {
      val r = graft.operators.Similarity.PcaRounds
      s"""WITH $pcaChainSql
         |SELECT pos, v AS v_x1e6, norm_shifted FROM v$r ORDER BY pos""".stripMargin
    },
    // mirror of Similarity.qSecondMoment: same quantization, same
    // upper-triangle pair fan-out, exact integer sum
    "q_second_moment" -> {
      val q = graft.operators.Similarity.PcaQuant
      s"""SELECT j, k, CAST(sum(m) AS BIGINT) AS m FROM (
         |  SELECT CAST(j AS BIGINT) AS j, CAST(k AS BIGINT) AS k,
         |    CAST(floor(CAST(embedding[j+1] AS DOUBLE) * $q + 0.5) AS BIGINT) *
         |    CAST(floor(CAST(embedding[k+1] AS DOUBLE) * $q + 0.5) AS BIGINT) AS m
         |  FROM (
         |    SELECT embedding, j, unnest(generate_series(j, len(embedding)-1)) AS k
         |    FROM (SELECT embedding, unnest(generate_series(0, len(embedding)-1)) AS j
         |          FROM embeddings)))
         |GROUP BY j, k ORDER BY j, k""".stripMargin
    },
    "q_pca_basis" -> {
      val r = graft.operators.Similarity.PcaRounds
      s"""WITH ${pcaChainSqlFor("", None)},
         |${pcaChainSqlFor("b", Some(s"v$r"))}
         |SELECT CAST(1 AS BIGINT) AS comp, pos, v AS v_x1e6, norm_shifted FROM v$r
         |UNION ALL
         |SELECT 2, pos, v, norm_shifted FROM v${r}b
         |ORDER BY comp, pos""".stripMargin
    },
    // mirror of Similarity.qWhiten: both chains, shifted projections
    // (signed truncating //), HUGEINT second moments, integer verdicts
    "q_whiten" -> {
      val r = graft.operators.Similarity.PcaRounds
      s"""WITH ${pcaChainSqlFor("", None)},
         |${pcaChainSqlFor("b", Some(s"v$r"))},
         |pa AS (SELECT x.vec_id, sum(x.xq * v.v) AS p
         |  FROM xq x JOIN v$r v ON x.pos = v.pos GROUP BY 1),
         |pas AS (SELECT vec_id, CASE WHEN p < 0 THEN -((-p) // 1000000)
         |    ELSE p // 1000000 END AS p1 FROM pa),
         |pb AS (SELECT x.vec_id, sum(x.xq * v.v) AS p
         |  FROM xq x JOIN v${r}b v ON x.pos = v.pos GROUP BY 1),
         |pbs AS (SELECT vec_id, CASE WHEN p < 0 THEN -((-p) // 1000000)
         |    ELSE p // 1000000 END AS p2 FROM pb),
         |m AS (SELECT count(*) AS n_vecs,
         |    sum(CAST(p1 AS HUGEINT) * p1) AS var1,
         |    sum(CAST(p2 AS HUGEINT) * p2) AS var2,
         |    sum(CAST(p1 AS HUGEINT) * p2) AS cr
         |  FROM pas JOIN pbs USING (vec_id))
         |SELECT n_vecs, CAST(var1 AS BIGINT) AS var1_shifted,
         |  CAST(var2 AS BIGINT) AS var2_shifted,
         |  CAST(cr AS BIGINT) AS cross_shifted,
         |  var1 >= var2 AS var_order_ok,
         |  cr * cr * 25 <= var1 * var2 AS decorr_ok
         |FROM m""".stripMargin
    },
    "q_pca_project" -> {
      val r = graft.operators.Similarity.PcaRounds
      s"""WITH $pcaChainSql,
         |proj AS (SELECT x.vec_id, sum(x.xq * v.v) AS proj
         |  FROM xq x JOIN v$r v ON x.pos = v.pos GROUP BY 1),
         |rk AS (SELECT vec_id, proj,
         |    row_number() OVER (ORDER BY abs(proj) DESC, vec_id) AS rnk FROM proj)
         |SELECT CAST(rnk AS BIGINT) AS rnk, vec_id, CAST(proj AS BIGINT) AS proj
         |FROM rk WHERE rnk <= 20 ORDER BY rnk""".stripMargin
    },
    // same fixed-point class-mean + argmax chain as Similarity.qEmbedClassify
    "q_embed_classify" ->
      s"""WITH ve AS MATERIALIZED (SELECT vec_id, label, pos, CAST(embedding[pos+1] AS DOUBLE) AS x FROM (
         |    SELECT vec_id, label, embedding,
         |      unnest(generate_series(0, len(embedding)-1)) AS pos FROM embeddings)),
         |vn AS (SELECT vec_id, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |lc AS (SELECT label AS cent_id, pos,
         |    CAST(CAST(CAST(sum(CAST(floor(x*1e6 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / (count(*) * 1e6) AS REAL) AS DOUBLE) AS x
         |  FROM ve GROUP BY 1, 2),
         |cn AS (SELECT cent_id,
         |    CAST(sum(CAST(floor(x*x*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS n2
         |  FROM lc GROUP BY 1),
         |dd AS (SELECT ve.vec_id, c.cent_id,
         |    CAST(sum(CAST(floor(ve.x*c.x*1e12 + 0.5) AS BIGINT)) AS DOUBLE)/1e12 AS dot
         |  FROM ve JOIN lc c ON ve.pos = c.pos GROUP BY 1, 2),
         |pred AS (SELECT vec_id, cent_id AS pred FROM (
         |    SELECT dd.vec_id, dd.cent_id,
         |      row_number() OVER (PARTITION BY dd.vec_id
         |        ORDER BY dd.dot/(sqrt(vn.n2)*sqrt(cn.n2)) DESC, dd.cent_id) AS rn
         |    FROM dd JOIN vn ON dd.vec_id = vn.vec_id
         |    JOIN cn ON dd.cent_id = cn.cent_id) t WHERE rn = 1)
         |SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n,
         |  CAST(sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  CAST(sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS acc
         |FROM embeddings e JOIN pred p ON e.vec_id = p.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same exact components as Dedup.qDedupClusters (recursive
    // closure), over the exact-Jaccard pair set (≡ LSH pairs at these
    // params)
    "q_dedup_clusters" -> ccSql(s"SELECT doc_a, doc_b FROM ($jaccardSql)", "doc_id"),
    // mirror of Dedup.qDedupKeepBest: same component closure, then the
    // longest-member (ties -> min doc_id) representative per cluster
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE ${ccCtes(s"SELECT doc_a, doc_b FROM ($jaccardSql)", "doc_id")},
         |m AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
         |      FROM documents d LEFT JOIN cc c ON d.doc_id = c.doc_id),
         |best AS (SELECT cluster_id, doc_id AS rep FROM (
         |    SELECT cluster_id, doc_id, row_number() OVER (
         |        PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM m) t WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, b.rep, (b.rep = m.doc_id) AS keep
         |FROM m JOIN best b ON m.cluster_id = b.cluster_id
         |ORDER BY m.doc_id""".stripMargin,
    // mirror of Dedup.qSplitLeakfree: same closure, split key = the
    // cluster id (coalesced to self), buckets = the shared md5 13/2/1
    "q_split_leakfree" ->
      s"""WITH RECURSIVE ${ccCtes(s"SELECT doc_a, doc_b FROM ($jaccardSql)", "doc_id")},
         |asg AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN cc c ON d.doc_id = c.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 13 THEN 'train' WHEN b < 15 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |    strpos('0123456789abcdef',
         |      substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1 AS b
         |  FROM asg)
         |ORDER BY doc_id""".stripMargin,
    // mirror of Dedup.qSplitLeakage: the `pr` pair CTE from the
    // closure chain is the pair set; both schemes' cross-split counts
    // fold into one row, unpivoted per scheme — the cluster_aware row
    // must be zero and the oracle CHECKS it rather than trusting the
    // by-construction argument
    "q_split_leakage" ->
      s"""WITH RECURSIVE ${ccCtes(s"SELECT doc_a, doc_b FROM ($jaccardSql)", "doc_id")},
         |asg AS (SELECT doc_id,
         |    CASE WHEN nb < 13 THEN 'train' WHEN nb < 15 THEN 'val'
         |         ELSE 'test' END AS naive_split,
         |    CASE WHEN ab < 13 THEN 'train' WHEN ab < 15 THEN 'val'
         |         ELSE 'test' END AS aware_split
         |  FROM (SELECT d.doc_id,
         |      strpos('0123456789abcdef',
         |        substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1 AS nb,
         |      strpos('0123456789abcdef',
         |        substring(md5(CAST(coalesce(c.cluster_id, d.doc_id)
         |          AS VARCHAR)), 1, 1)) - 1 AS ab
         |    FROM documents d LEFT JOIN cc c ON d.doc_id = c.doc_id) t),
         |j AS (SELECT a.naive_split AS na, a.aware_split AS aa,
         |    b.naive_split AS nb2, b.aware_split AS ab2
         |  FROM pr JOIN asg a ON pr.doc_a = a.doc_id
         |          JOIN asg b ON pr.doc_b = b.doc_id),
         |agg AS (SELECT count(*) AS n_pairs,
         |    coalesce(CAST(sum(CASE WHEN na <> nb2 THEN 1 ELSE 0 END)
         |      AS BIGINT), 0) AS naive_cross,
         |    coalesce(CAST(sum(CASE WHEN aa <> ab2 THEN 1 ELSE 0 END)
         |      AS BIGINT), 0) AS aware_cross
         |  FROM j)
         |SELECT 'cluster_aware' AS scheme, n_pairs, aware_cross AS cross_pairs
         |FROM agg
         |UNION ALL
         |SELECT 'naive', n_pairs, naive_cross FROM agg
         |ORDER BY scheme""".stripMargin,
    // mirror of Dedup.qDedupStats: same closure, cluster-size histogram
    "q_dedup_stats" ->
      s"""WITH RECURSIVE ${ccCtes(s"SELECT doc_a, doc_b FROM ($jaccardSql)", "doc_id")},
         |m AS (SELECT coalesce(c.cluster_id, d.doc_id) AS cluster_id
         |      FROM documents d LEFT JOIN cc c ON d.doc_id = c.doc_id),
         |sz AS (SELECT cluster_id, count(*) AS sz FROM m GROUP BY 1)
         |SELECT sz AS cluster_size, count(*) AS n_clusters,
         |  CAST(sz * count(*) AS BIGINT) AS n_docs,
         |  CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
         |FROM sz GROUP BY sz ORDER BY cluster_size""".stripMargin,
    // mirror of Dedup.qSpanDedupScore: positional 8-word span md5s,
    // cross-doc duplication via HAVING count(DISTINCT doc_id) >= 2,
    // integer-exact keep verdict
    "q_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sp AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-7),
         |    i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
         |  FROM t WHERE len(toks) >= 8),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |per AS (SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(count(dup.h) AS BIGINT) AS dup_spans
         |  FROM sp LEFT JOIN dup ON sp.h = dup.h GROUP BY sp.doc_id)
         |SELECT doc_id, n_spans, dup_spans,
         |  CAST(dup_spans AS DOUBLE)/n_spans AS dup_frac,
         |  CAST(CASE WHEN dup_spans*2 <= n_spans THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM per ORDER BY doc_id""".stripMargin,
    // mirror of Dedup.qSpanScrub: duplicated-span start positions ->
    // covered-token mask -> excise -> md5 of the cleaned canonical
    // form. coalesce on BOTH the covered list (docs with no dup
    // spans) and the cleaned string (all-covered docs: DuckDB's
    // array_to_string of an all-NULL-filtered list is NULL where
    // Spark's array_join is '') so the md5s agree at the edges.
    "q_span_scrub" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sp AS (SELECT doc_id, i, md5(array_to_string(toks[i:i+7], ' ')) AS h
         |  FROM t, unnest(generate_series(1, len(toks)-7)) AS u(i)
         |  WHERE len(toks) >= 8),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |starts AS (SELECT sp.doc_id, list(sp.i) AS st
         |  FROM sp JOIN dup ON sp.h = dup.h GROUP BY sp.doc_id),
         |cov AS (SELECT t.doc_id, toks,
         |    coalesce(list_distinct(flatten(list_transform(st, s -> generate_series(s, s+7)))), []) AS covered
         |  FROM t LEFT JOIN starts ON t.doc_id = starts.doc_id),
         |cl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(covered) AS BIGINT) AS n_removed,
         |    array_to_string(
         |      list_filter(list_transform(generate_series(1, len(toks)),
         |        j -> CASE WHEN NOT list_contains(covered, j) THEN toks[j] END), x -> x IS NOT NULL),
         |      ' ') AS cleaned
         |  FROM cov)
         |SELECT doc_id, n_tokens, n_removed, md5(coalesce(cleaned, '')) AS cleaned_md5
         |FROM cl ORDER BY doc_id""".stripMargin,
    // mirror of Dedup.qSpanHotspots: top-20 cross-doc duplicated spans,
    // span text as the final tiebreak so the LIMIT edge is deterministic
    "q_span_hotspots" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sp AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-7),
         |    i -> array_to_string(toks[i:i+7], ' '))) AS span
         |  FROM t WHERE len(toks) >= 8)
         |SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occ
         |FROM sp GROUP BY span HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, span LIMIT 20""".stripMargin,
    // mirror of Dedup.qSemanticContamination: exact-cosine pair set
    // (≡ SRP-LSH pairs at this threshold, the q_embed_clusters
    // equivalence), md5 split tags, test-vs-train restriction
    "q_semantic_contamination" ->
      s"""WITH pr AS (SELECT va AS doc_a, vb AS doc_b FROM ($embedNearDupSql)),
         |sym AS (SELECT doc_a AS vec_id, doc_b AS other FROM pr
         |        UNION ALL SELECT doc_b, doc_a FROM pr),
         |t AS (SELECT vec_id, other,
         |    strpos('0123456789abcdef', substring(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1 AS b1,
         |    strpos('0123456789abcdef', substring(md5(CAST(other AS VARCHAR)), 1, 1)) - 1 AS b2
         |  FROM sym)
         |SELECT vec_id, count(*) AS n_train_matches, min(other) AS contaminated_by
         |FROM t WHERE b1 >= 15 AND b2 < 13
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q_doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |    unnest(generate_series(0, CAST(floor((len(toks)-1)/40.0) AS INT))) AS chunk_id
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(least(50, len(toks) - chunk_id*40) AS BIGINT) AS n_tok,
         |  array_to_string(toks[chunk_id*40+1 : chunk_id*40+50], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_mixture_sample" -> {
      val rateCase = graft.operators.TextAnalysis.MixtureRates256
        .map { case (lg, r) => s"WHEN lang = '$lg' THEN $r" }.mkString(" ")
      s"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(sampled) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN sampled = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_sampled
         |FROM (
         |  SELECT lang, source, n_chars,
         |    CASE WHEN (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |            + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
         |         < CASE $rateCase ELSE 0 END
         |    THEN 1 ELSE 0 END AS sampled
         |  FROM documents)
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin
    },
    // mirror of Layout.qZorderPrune: same quantization (// = div),
    // same generated bit-interleave, same per-file min/max boxes and
    // box-intersect pruning counts
    "q_zorder_prune" -> {
      import graft.operators.Layout._
      val w = 1L << Bits
      val zSql = (0 until Bits).map(i =>
        s"((xq >> $i) & 1) * ${1L << (2 * i)} + ((yq >> $i) & 1) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      val touch = s"mx_x >= $BoxLo AND mn_x <= $BoxHi AND mx_y >= $BoxLo AND mn_y <= $BoxHi"
      s"""WITH o AS (SELECT o_custkey AS x,
         |    CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS y FROM orders),
         |b AS (SELECT min(x) AS mnx, max(x) AS mxx,
         |             min(y) AS mny, max(y) AS mxy FROM o),
         |q AS (SELECT ((x - mnx) * $w) // (mxx - mnx + 1) AS xq,
         |             ((y - mny) * $w) // (mxy - mny + 1) AS yq FROM o, b),
         |zv AS (SELECT xq, yq, $zSql AS z FROM q),
         |t AS (SELECT 'linear_cust' AS layout, xq // ${1L << FileShiftLinear} AS file, xq, yq FROM zv
         |  UNION ALL SELECT 'linear_date', yq // ${1L << FileShiftLinear}, xq, yq FROM zv
         |  UNION ALL SELECT 'zorder', z // ${1L << FileShiftZ}, xq, yq FROM zv),
         |pf AS (SELECT layout, file, count(*) AS cnt,
         |    min(xq) AS mn_x, max(xq) AS mx_x, min(yq) AS mn_y, max(yq) AS mx_y,
         |    sum(CASE WHEN xq BETWEEN $BoxLo AND $BoxHi
         |             AND yq BETWEEN $BoxLo AND $BoxHi THEN 1 ELSE 0 END) AS matched
         |  FROM t GROUP BY 1, 2)
         |SELECT layout, count(*) AS n_files,
         |  CAST(sum(CASE WHEN $touch THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
         |  CAST(sum(CASE WHEN $touch THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CAST(sum(matched) AS BIGINT) AS rows_matched
         |FROM pf GROUP BY layout ORDER BY layout""".stripMargin
    },
    "q_priority_sample" -> prioritySampleSql,
    // the streaming absorb's entire claim: incremental == one-shot.
    // The oracle IS q_priority_sample's — the sketch closure makes
    // the two queries answer-identical by construction.
    "q_priority_stream" -> prioritySampleSql,
    "q_repetition" ->
      s"""SELECT doc_id, n_shingles, n_distinct,
         |  1.0 - CAST(n_distinct AS DOUBLE) / n_shingles AS rep_ratio
         |FROM (
         |  SELECT doc_id, CAST(len(toks)-2 AS BIGINT) AS n_shingles,
         |    CAST(len(list_distinct(list_transform(generate_series(1, len(toks)-2),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS BIGINT) AS n_distinct
         |  FROM (SELECT doc_id, $tokSql AS toks FROM documents)
         |  WHERE len(toks) >= 3)
         |ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      s"""WITH ds AS (SELECT doc_id, text,
         |    CASE WHEN bucket < 13 THEN 'train' WHEN bucket < 15 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text,
         |      strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bucket
         |    FROM documents)),
         |sh AS (SELECT DISTINCT doc_id, split, shingle FROM (
         |  SELECT doc_id, split, unnest(list_transform(generate_series(1, len(toks)-4),
         |      i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4])) AS shingle
         |  FROM (SELECT doc_id, split, $tokSql AS toks FROM ds)
         |  WHERE len(toks) >= 5)),
         |tr AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
         |ev AS (SELECT doc_id, split, count(*) AS n_shingles
         |       FROM sh WHERE split <> 'train' GROUP BY 1, 2),
         |ht AS (SELECT s.doc_id, count(*) AS n_hit
         |       FROM sh s JOIN tr ON s.shingle = tr.shingle
         |       WHERE s.split <> 'train' GROUP BY 1)
         |SELECT ev.doc_id, ev.split, ev.n_shingles,
         |  COALESCE(ht.n_hit, 0) AS n_hit,
         |  CAST(COALESCE(ht.n_hit, 0) AS DOUBLE) / ev.n_shingles AS contam_ratio
         |FROM ev LEFT JOIN ht ON ev.doc_id = ht.doc_id
         |ORDER BY ev.doc_id""".stripMargin,
    // sqrt is IEEE-correctly-rounded in both engines, so the
    // fixed-point numerators are exact with no empirical caveat; the
    // normalization is one division of exactly-represented integers.
    "q_mixture_weights" ->
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(toks)) AS BIGINT) AS n_tokens
         |  FROM (SELECT source, $tokSql AS toks FROM documents) GROUP BY 1),
         |f AS (SELECT source, n_docs, n_tokens,
         |    CAST(round(sqrt(CAST(n_docs AS DOUBLE))*1e6) AS BIGINT) AS sqrt_x1e6
         |  FROM s),
         |t AS (SELECT CAST(sum(sqrt_x1e6) AS BIGINT) AS tot_x1e6 FROM f)
         |SELECT source, n_docs, n_tokens, sqrt_x1e6,
         |  CAST(sqrt_x1e6 AS DOUBLE) / tot_x1e6 AS weight
         |FROM f, t ORDER BY source""".stripMargin,
    // The oracle recomputes the scrub list WITHOUT the bloom prefilter
    // — proving the bloom+exact-verify chain never changes the result.
    "q_bloom_decontam" ->
      s"""WITH ds AS (SELECT doc_id, text,
         |    CASE WHEN bucket < 13 THEN 'train' WHEN bucket < 15 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text,
         |      strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bucket
         |    FROM documents)),
         |sh AS (SELECT DISTINCT doc_id, split, shingle FROM (
         |  SELECT doc_id, split, unnest(list_transform(generate_series(1, len(toks)-4),
         |      i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4])) AS shingle
         |  FROM (SELECT doc_id, split, $tokSql AS toks FROM ds)
         |  WHERE len(toks) >= 5)),
         |tr AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train')
         |SELECT s.doc_id, s.split, CAST(count(*) AS BIGINT) AS n_hit
         |FROM sh s JOIN tr ON s.shingle = tr.shingle
         |WHERE s.split <> 'train'
         |GROUP BY 1, 2 ORDER BY s.doc_id""".stripMargin,
    // Fixed-point surprisal: round(ln(k)*1e6) agrees bit-for-bit
    // across engines for integer k (verified to 2e7), so the sum is
    // integer-exact and order-free; the only floats are the final
    // correctly-rounded division chain.
    "q_perplexity" ->
      s"""WITH $pplCtes
         |SELECT doc_id, split, n_bigrams, n_unseen, surprisal_x1e6,
         |  round(surprisal_x1e6/1e6/n_bigrams, 4) AS avg_nats
         |FROM sc ORDER BY doc_id""".stripMargin,
    // CCNet tercile bucketing: exact per-lang order-statistic cutoffs
    // from the value histogram (the integer ratio floor-divides the
    // same on both engines since both operands are non-negative),
    // then value-defined head/middle/tail labels.
    "q_ppl_buckets" ->
      s"""WITH $pplCtes,
         |$pplBucketCtes
         |SELECT b.doc_id, b.lang, b.ratio_x1e6,
         |  CASE WHEN b.ratio_x1e6 <= c.c1 THEN 'head'
         |       WHEN b.ratio_x1e6 <= c.c2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM base b JOIN cut c ON b.lang = c.lang
         |ORDER BY b.doc_id""".stripMargin,
    "q_ppl_cutoffs" ->
      s"""WITH $pplCtes,
         |$pplBucketCtes
         |SELECT b.lang, CAST(count(*) AS BIGINT) AS n_docs, c.c1, c.c2,
         |  CAST(sum(CASE WHEN b.ratio_x1e6 <= c.c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
         |  CAST(sum(CASE WHEN b.ratio_x1e6 > c.c1 AND b.ratio_x1e6 <= c.c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_middle,
         |  CAST(sum(CASE WHEN b.ratio_x1e6 > c.c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
         |FROM base b JOIN cut c ON b.lang = c.lang
         |GROUP BY 1, c.c1, c.c2 ORDER BY b.lang""".stripMargin,
    // DSIR importance weights: the same capped feature vocab, add-one
    // smoothing totals, and fixed-point ln chain as the Spark side —
    // the per-doc sum is integer-exact, and the length-normalized
    // column uses the signed truncating shift both engines agree on.
    "q_dsir_weights" ->
      s"""WITH $dsirCtesAll
         |SELECT doc_id, n_feats, n_oov, logw_x1e6,
         |  CAST(CASE WHEN logw_x1e6 >= 0 THEN logw_x1e6 // n_feats
         |       ELSE -((-logw_x1e6) // n_feats) END AS BIGINT) AS avg_x1e6
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q_dsir_sample" ->
      s"""WITH $dsirCtesAll,
         |top AS (SELECT doc_id, n_feats, logw_x1e6,
         |    CAST(row_number() OVER (ORDER BY logw_x1e6 DESC, doc_id) AS BIGINT) AS rnk
         |  FROM sc ORDER BY logw_x1e6 DESC, doc_id
         |  LIMIT ${graft.operators.TextAnalysis.DsirSampleK})
         |SELECT t.rnk, t.doc_id, d.lang, d.source, t.n_feats, t.logw_x1e6
         |FROM top t JOIN documents d ON t.doc_id = d.doc_id
         |ORDER BY t.rnk""".stripMargin,
    "q_dsir_shift" ->
      s"""WITH $dsirCtesAll,
         |sel AS (SELECT doc_id FROM sc
         |  ORDER BY logw_x1e6 DESC, doc_id
         |  LIMIT ${graft.operators.TextAnalysis.DsirSampleK})
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_pool,
         |  CAST(sum(CASE WHEN sel.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_sel
         |FROM documents d LEFT JOIN sel ON d.doc_id = sel.doc_id
         |GROUP BY 1 ORDER BY d.lang""".stripMargin,
    // The streaming DSIR gate's ground truth — the %4 split, the
    // frozen-model arithmetic, and the integer cross-multiplied admit;
    // the disk variant must produce the identical verdict set.
    "q_dsir_gate" -> dsirGateSql,
    "q_dsir_gate_disk" -> dsirGateSql,
    // trained quality classifier: whole-pool scores, the learning
    // evidence (confusion counts), and the frozen-model %4 gate —
    // disk variant shares the SQL (the saved model IS the model)
    "q_quality_clf" -> qclfSqlAll,
    "q_quality_clf_eval" -> qclfEvalSql,
    "q_quality_clf_gate" -> qclfGateSql,
    "q_quality_clf_gate_disk" -> qclfGateSql,
    // drift batch analog: score ALL docs against the %4-trained
    // model, baseline stats from the training pool's own scores,
    // stream batches z-tested with the telemetry monitor's exact
    // decimal-sum + fixed-IEEE-chain recipe
    "q_quality_clf_drift" ->
      s"""WITH ${qclfCtes("doc_id % 4 <> 0", "TRUE")},
         |qb AS (SELECT count(*) AS bn,
         |    CAST(sum(CAST(p_x1e6 AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(p_x1e6 * p_x1e6 AS DECIMAL(38,6))) AS DOUBLE) AS s2
         |  FROM qsc WHERE doc_id % 4 <> 0),
         |sb AS (SELECT (doc_id // 4) % ${graft.streaming.QualityClfGate.DriftBatches} AS batch_id,
         |    count(*) AS n_docs, CAST(sum(admit) AS BIGINT) AS n_admit,
         |    CAST(sum(CAST(p_x1e6 AS DECIMAL(38,6))) AS DOUBLE) AS bs1
         |  FROM qsc WHERE doc_id % 4 = 0 GROUP BY 1)
         |SELECT batch_id, n_docs, n_admit,
         |  bs1/n_docs AS mean_p,
         |  (bs1/n_docs - s1/bn) / sqrt(((s2 - s1*s1/bn)/bn)/n_docs) AS z,
         |  abs((bs1/n_docs - s1/bn) / sqrt(((s2 - s1*s1/bn)/bn)/n_docs))
         |    > ${graft.streaming.QualityClfGate.DriftZCut} AS drifted
         |FROM sb, qb
         |WHERE bn >= 2 AND (s2 - s1*s1/bn)/bn > 0
         |ORDER BY batch_id""".stripMargin,
    // Trigram stupid-backoff mirror: the same capped tables, context
    // sums, pinned ln(0.4) integer, and fixed-point ln chain as the
    // Spark side — every branch of the backoff CASE is integer-exact.
    "q_perplexity3" ->
      s"""WITH ${trigram3Ctes(
             s"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 13",
             scoreCond = "TRUE")}
         |SELECT doc_id,
         |  CASE WHEN (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 13 THEN 'train'
         |       WHEN (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 15 THEN 'val'
         |       ELSE 'test' END AS split,
         |  n_trigrams, n_tri_hit, n_bi_hit, n_uni, surprisal_x1e6,
         |  round(surprisal_x1e6/1e6/n_trigrams, 4) AS avg_nats
         |FROM sc ORDER BY doc_id""".stripMargin,
    // Same chain over the %4 batch/corpus split with the integer
    // cross-multiplied admit verdict — the trigram gate's ground truth
    "q_quality3_gate" ->
      s"""WITH ${trigram3Ctes("doc_id % 4 <> 0", scoreCond = "g.doc_id % 4 = 0")}
         |SELECT doc_id, n_trigrams, n_tri_hit, n_bi_hit, n_uni, surprisal_x1e6,
         |  round(surprisal_x1e6/1e6/n_trigrams, 4) AS avg_nats,
         |  CAST(CASE WHEN surprisal_x1e6 <= ${graft.streaming.QualityGate.AdmitMaxNats3X1e6} * n_trigrams
         |    THEN 1 ELSE 0 END AS BIGINT) AS admit
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      s"""WITH $seqPackCtes
         |SELECT bucket, pack_id, n_chunks, n_tokens, n_docs
         |FROM packs ORDER BY bucket, pack_id""".stripMargin,
    // The manifest digest is a MULTISET hash (bit_xor of 60-bit md5
    // prefixes) — deliberately order-free, so neither engine's
    // aggregation order can matter, and agg state is O(1) per shard.
    "q_pack_shards" ->
      s"""WITH $seqPackCtes,
         |k AS (SELECT (bucket * 31 + pack_id) % ${graft.operators.TextAnalysis.NumShards} AS shard,
         |    n_chunks, n_tokens,
         |    CAST(('0x' || substr(md5(
         |      CAST(bucket AS VARCHAR) || ':' || CAST(pack_id AS VARCHAR) || ':' ||
         |      CAST(n_chunks AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR) || ':' ||
         |      CAST(n_docs AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM packs)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_packs,
         |  CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  bit_xor(h) AS digest
         |FROM k GROUP BY 1 ORDER BY shard""".stripMargin,
    "q_data_split" ->
      """SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT CASE WHEN bucket < 13 THEN 'train'
        |              WHEN bucket < 15 THEN 'val' ELSE 'test' END AS split, n_chars
        |  FROM (SELECT n_chars,
        |      strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bucket
        |    FROM documents))
        |GROUP BY split ORDER BY split""".stripMargin,
    // mirror of TextAnalysis.qSourceQuota: top-N longest per source
    // (window form — the Spark side's bounded partial agg is
    // plan-shape, not semantics)
    "q_source_quota" ->
      s"""SELECT source, CAST(rn AS BIGINT) AS rnk, doc_id, n_chars
         |FROM (SELECT source, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY source
         |        ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= ${graft.operators.TextAnalysis.QuotaPerSource}
         |ORDER BY source, rnk""".stripMargin,
    // mirror of TextAnalysis.qTokenBudgetSample: single global
    // cumulative window in md5 order (the Spark side's bucketed
    // prefix-sum decomposition is plan-shape, not semantics)
    "q_token_budget" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |      md5(CAST(doc_id AS VARCHAR)) AS k
         |    FROM (SELECT doc_id, $tokSql AS toks FROM documents)),
         |tot AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS budget FROM t),
         |c AS (SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY k, doc_id
         |        ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
         |FROM c, tot WHERE cum <= budget ORDER BY doc_id""".stripMargin,
    // mirror of TextAnalysis.qFilterFunnel: first-failing-rule charge,
    // integer cross-multiplied thresholds, funnel arithmetic from one
    // counter row
    "q_filter_funnel" ->
      s"""WITH m AS (SELECT n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS tok_len,
         |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_dist
         |  FROM (SELECT n_chars, text, $tokSql AS toks FROM documents)),
         |s AS (SELECT CASE WHEN NOT (n_chars BETWEEN 100 AND 100000) THEN 1
         |        WHEN NOT (tok_len BETWEEN 4*n_tok AND 10*n_tok) THEN 2
         |        WHEN NOT (20*n_stop >= n_tok) THEN 3
         |        WHEN NOT (10*n_dist >= 3*n_tok) THEN 4 ELSE 5 END AS stage FROM m),
         |a AS (SELECT count(*) AS total,
         |    CAST(sum(CASE WHEN stage = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         |    CAST(sum(CASE WHEN stage = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         |    CAST(sum(CASE WHEN stage = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         |    CAST(sum(CASE WHEN stage = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
         |  FROM s)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage, 'len_band' AS rule,
         |    total AS n_in, d1 AS n_dropped, total - d1 AS n_out FROM a
         |  UNION ALL SELECT 2, 'word_len', total - d1, d2, total - d1 - d2 FROM a
         |  UNION ALL SELECT 3, 'stop_ratio', total - d1 - d2, d3,
         |    total - d1 - d2 - d3 FROM a
         |  UNION ALL SELECT 4, 'lex_diversity', total - d1 - d2 - d3, d4,
         |    total - d1 - d2 - d3 - d4 FROM a) t
         |ORDER BY stage""".stripMargin,
    // Per-source data-card row: same funnel CTE shape as
    // q_filter_funnel, plus the md5 dup headroom and the truncating
    // per-mille (both engines' integer division agrees on
    // non-negatives)
    "q_corpus_report" ->
      s"""WITH m AS (SELECT source, lang, n_chars, md5(text) AS h,
         |    CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS tok_len,
         |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_dist
         |  FROM (SELECT source, lang, n_chars, text, $tokSql AS toks FROM documents)),
         |s AS (SELECT source, lang, n_chars, h, n_tok,
         |    CASE WHEN NOT (n_chars BETWEEN 100 AND 100000) THEN 1
         |      WHEN NOT (tok_len BETWEEN 4*n_tok AND 10*n_tok) THEN 2
         |      WHEN NOT (20*n_stop >= n_tok) THEN 3
         |      WHEN NOT (10*n_dist >= 3*n_tok) THEN 4 ELSE 5 END AS stage FROM m)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts,
         |  CAST(count(*) - count(DISTINCT h) AS BIGINT) AS exact_dup_docs,
         |  CAST(sum(CASE WHEN stage = 5 THEN 1 ELSE 0 END) AS BIGINT) AS funnel_pass,
         |  CAST(sum(CASE WHEN stage = 5 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS pass_permille
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // Mirror of Curation.qCurationE2e — the composed curation chain,
    // recomputed stage by stage from first principles: the funnel
    // verdicts, the exact-Jaccard pair closure RESTRICTED to funnel
    // survivors (≡ the Spark side's restricted LSH index), keep-best,
    // bloom-free decontam (proving the bloom prefilter invisible),
    // the single-window token budget (≡ the bucketed prefix sum), and
    // the pack/shard arithmetic with the multiset digest folded over
    // ALL packs (XOR associativity).
    "q_curation_e2e" ->
      s"""WITH RECURSIVE
         |bs AS (SELECT doc_id, n_chars, $tokSql AS toks,
         |    strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bkt
         |  FROM documents),
         |mt AS (SELECT doc_id, n_chars, bkt,
         |    CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS tok_len,
         |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_dist
         |  FROM bs),
         |lb AS (SELECT doc_id, n_chars, bkt, n_tok,
         |    CASE WHEN NOT (n_chars BETWEEN 100 AND 100000) THEN 1
         |         WHEN NOT (tok_len BETWEEN 4*n_tok AND 10*n_tok) THEN 2
         |         WHEN NOT (20*n_stop >= n_tok) THEN 3
         |         WHEN NOT (10*n_dist >= 3*n_tok) THEN 4 ELSE 5 END AS stage
         |  FROM mt),
         |s1 AS (SELECT doc_id, n_chars, bkt, n_tok FROM lb WHERE stage = 5),
         |${ccCtes(
             s"""SELECT doc_a, doc_b FROM ($jaccardSql)
                |  WHERE doc_a IN (SELECT doc_id FROM s1)
                |    AND doc_b IN (SELECT doc_id FROM s1)""".stripMargin, "doc_id")},
         |m2 AS (SELECT s1.doc_id, coalesce(cc.cluster_id, s1.doc_id) AS cluster_id,
         |    s1.n_chars, s1.bkt, s1.n_tok
         |  FROM s1 LEFT JOIN cc ON s1.doc_id = cc.doc_id),
         |best AS (SELECT cluster_id, doc_id AS rep FROM (
         |    SELECT cluster_id, doc_id, row_number() OVER (
         |        PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM m2) t WHERE rn = 1),
         |s2 AS (SELECT m2.doc_id, m2.bkt, m2.n_tok
         |  FROM m2 JOIN best b ON m2.cluster_id = b.cluster_id AND m2.doc_id = b.rep),
         |evsh AS (SELECT DISTINCT shingle FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(toks)-4),
         |        i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4])) AS shingle
         |    FROM bs WHERE bkt >= 13 AND len(toks) >= 5)),
         |s2t AS (SELECT doc_id, n_tok FROM s2 WHERE bkt < 13),
         |csh AS (SELECT DISTINCT doc_id, shingle FROM (
         |    SELECT b2.doc_id, unnest(list_transform(generate_series(1, len(b2.toks)-4),
         |        i -> b2.toks[i]||' '||b2.toks[i+1]||' '||b2.toks[i+2]||' '||b2.toks[i+3]||' '||b2.toks[i+4])) AS shingle
         |    FROM bs b2 JOIN s2t ON b2.doc_id = s2t.doc_id
         |    WHERE len(b2.toks) >= 5)),
         |contam AS (SELECT DISTINCT c.doc_id FROM csh c JOIN evsh e ON c.shingle = e.shingle),
         |s3 AS (SELECT doc_id, n_tok FROM s2t
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |tot AS (SELECT CAST(sum(n_tok) // 2 AS BIGINT) AS budget FROM s3),
         |cm AS (SELECT doc_id, n_tok,
         |    sum(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum FROM s3),
         |s4 AS (SELECT doc_id, n_tok FROM cm, tot WHERE cum <= budget),
         |c4 AS (SELECT doc_id, n_tok,
         |    unnest(generate_series(0, CAST(floor((n_tok-1)/40.0) AS INT))) AS chunk_id
         |  FROM s4 WHERE n_tok > 0),
         |ch4 AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |    CAST(least(50, n_tok - chunk_id*40) AS BIGINT) AS ct FROM c4),
         |nbk AS (SELECT greatest(COALESCE(CAST(ceil(sum(ct)
         |      / ${graft.operators.TextAnalysis.TargetBucketTokens}.0) AS BIGINT), 1), 1)
         |    AS n_buckets FROM ch4),
         |b4 AS (SELECT ch4.*, (
         |    (strpos('0123456789abcdef', substring(md5(CAST(ch4.doc_id AS VARCHAR)), 1, 1)) - 1) * 1048576
         |  + (strpos('0123456789abcdef', substring(md5(CAST(ch4.doc_id AS VARCHAR)), 2, 1)) - 1) * 65536
         |  + (strpos('0123456789abcdef', substring(md5(CAST(ch4.doc_id AS VARCHAR)), 3, 1)) - 1) * 4096
         |  + (strpos('0123456789abcdef', substring(md5(CAST(ch4.doc_id AS VARCHAR)), 4, 1)) - 1) * 256
         |  + (strpos('0123456789abcdef', substring(md5(CAST(ch4.doc_id AS VARCHAR)), 5, 1)) - 1) * 16
         |  + (strpos('0123456789abcdef', substring(md5(CAST(ch4.doc_id AS VARCHAR)), 6, 1)) - 1)
         |  ) % nbk.n_buckets AS bucket
         |  FROM ch4, nbk),
         |p4 AS (SELECT bucket, doc_id, chunk_id, ct,
         |    COALESCE(sum(ct) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM b4),
         |packs AS (SELECT CAST(bucket AS BIGINT) AS bucket,
         |    CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
         |    count(*) AS n_chunks, CAST(sum(ct) AS BIGINT) AS n_tokens,
         |    count(DISTINCT doc_id) AS n_docs
         |  FROM p4 GROUP BY 1, 2),
         |pkk AS (SELECT (bucket * 31 + pack_id) % ${graft.operators.TextAnalysis.NumShards} AS shard,
         |    n_tokens,
         |    CAST(('0x' || substr(md5(
         |      CAST(bucket AS VARCHAR) || ':' || CAST(pack_id AS VARCHAR) || ':' ||
         |      CAST(n_chunks AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR) || ':' ||
         |      CAST(n_docs AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM packs),
         |a0 AS (SELECT count(*) AS n0, COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS t0 FROM mt),
         |a1 AS (SELECT count(*) AS n1, COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS t1 FROM s1),
         |a2 AS (SELECT count(*) AS n2, COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS t2 FROM s2),
         |a3 AS (SELECT count(*) AS n3, COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS t3 FROM s3),
         |a4 AS (SELECT count(*) AS n4, COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS t4 FROM s4),
         |a5 AS (SELECT count(DISTINCT doc_id) AS nd FROM ch4),
         |a6 AS (SELECT count(*) AS n_packs,
         |    COALESCE(CAST(sum(n_tokens) AS BIGINT), 0) AS pack_toks,
         |    count(DISTINCT shard) AS n_shards,
         |    COALESCE(bit_xor(h), 0) AS digest FROM pkk)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage, 'raw' AS name, n0 AS n_in,
         |    CAST(0 AS BIGINT) AS n_dropped, n0 AS n_out, t0 AS tokens_out,
         |    CAST(0 AS BIGINT) AS digest FROM a0
         |  UNION ALL SELECT 2, 'quality_funnel', n0, n0 - n1, n1, t1, 0 FROM a0, a1
         |  UNION ALL SELECT 3, 'neardup_keep_best', n1, n1 - n2, n2, t2, 0 FROM a1, a2
         |  UNION ALL SELECT 4, 'decontam_split', n2, n2 - n3, n3, t3, 0 FROM a2, a3
         |  UNION ALL SELECT 5, 'token_budget', n3, n3 - n4, n4, t4, 0 FROM a3, a4
         |  UNION ALL SELECT 6, 'seq_pack', n4, n4 - nd, n_packs, pack_toks, 0 FROM a4, a5, a6
         |  UNION ALL SELECT 7, 'shard_manifest', n_packs, 0, n_shards, pack_toks, digest FROM a6) t
         |ORDER BY stage""".stripMargin,
    "q_embed_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |e AS (SELECT vec_id, embedding,
        |    CASE WHEN mx > 0 THEN 127.0/mx ELSE 0.0 END AS scale FROM m),
        |x AS (SELECT vec_id, scale, embedding,
        |    unnest(generate_series(0, len(embedding)-1)) AS pos FROM e)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(floor(CAST(embedding[pos+1] AS DOUBLE)*scale + 0.5) AS BIGINT) AS qv,
        |  scale
        |FROM x ORDER BY vec_id, pos""".stripMargin,
    "q_ivf_recall" ->
      s"""SELECT qid, k, n_hit, CAST(n_hit AS DOUBLE)/k AS recall FROM (
         |  SELECT b.qid, count(*) AS k,
         |    CAST(sum(CASE WHEN i.icid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM ($knnBruteSql) b
         |  LEFT JOIN (SELECT qid AS iqid, cid AS icid FROM ($knnIvfSql)) i
         |    ON b.qid = i.iqid AND b.cid = i.icid
         |  GROUP BY 1) t ORDER BY qid""".stripMargin,
    "q_clean_corpus" ->
      s"""WITH survivors AS (
         |  SELECT doc_id, lang, source, text FROM (
         |    SELECT doc_id, lang, source, text,
         |      row_number() OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |                         ORDER BY doc_id) AS rn
         |    FROM documents) t WHERE rn = 1),
         |losers AS (SELECT DISTINCT doc_b AS loser FROM ($jaccardSql))
         |SELECT doc_id, lang, source,
         |  CAST(len($tokSql) AS BIGINT) AS n_tokens
         |FROM survivors
         |WHERE doc_id NOT IN (SELECT loser FROM losers)
         |  AND len($tokSql) >= 20
         |ORDER BY doc_id""".stripMargin,
    "q_knn_ivf" -> knnIvfSql,
    "q_knn_ivf_int8" -> knnIvfInt8Sql,
    "q_pq_codes" -> pqCodesSql,
    "q_knn_pq" -> knnPqSql,
    "q_pq_recall" -> pqRecallSql,
    "q_opq_rotate" -> opqRotateSql,
    "q_knn_opq" -> knnOpqSql,
    "q_opq_recall" -> opqRecallSql,
    // streaming ANN-ingest batch analog: the full-corpus kmeans chain
    // + the shared assignment CTEs, restricted to the %4 "stream"
    "q_ann_ingest" ->
      s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM embeddings),
         |$veSql,
         |$kmeansChainSql,
         |$ivfAssignCtes
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM assign
         |WHERE vec_id % 4 = 0 ORDER BY vec_id""".stripMargin,
    // The rebuild twin retrains the SAME fixed-point k-means over the
    // drift construction (base ∪ rotated copies) and assigns every
    // drifted vector — mirroring AnnIngest.rebuild's output table.
    // The chain CTEs are the q_ann_ingest ones re-rooted at `drift`
    // (textual FROM-substitution: n/ve/seed-stride all range over the
    // grown corpus, exactly like the Spark side's trainCentroids over
    // the drifted frame).
    "q_ann_rebuild" -> {
      val off = graft.streaming.AnnIngest.DriftIdOffset
      val sh = graft.streaming.AnnIngest.DriftShift
      s"""WITH drift AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + $off,
         |    list_concat(embedding[${sh + 1}:], embedding[1:$sh])
         |  FROM embeddings),
         |n AS MATERIALIZED (SELECT vec_id, embedding, ${n2Sql("embedding")} AS n2 FROM drift),
         |${veSql.replace("FROM embeddings", "FROM drift")},
         |${kmeansChainSql.replace("FROM embeddings", "FROM drift")},
         |$ivfAssignCtes
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM assign
         |ORDER BY vec_id""".stripMargin
    },
    // the serving read path: the same IVF probe/rerank chain re-rooted
    // at the drift construction — what the mounted rebuilt index must
    // reproduce bit-for-bit
    "q_ann_search_rebuilt" -> {
      val off = graft.streaming.AnnIngest.DriftIdOffset
      val sh = graft.streaming.AnnIngest.DriftShift
      s"""WITH drift AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + $off,
         |    list_concat(embedding[${sh + 1}:], embedding[1:$sh])
         |  FROM embeddings),
         |""".stripMargin +
        knnIvfSql.stripPrefix("WITH ").replace("FROM embeddings", "FROM drift")
    },
    "q_knn_ivfpq" -> knnIvfPqSql,
    "q_ivfpq_recall" -> ivfPqRecallSql,
    "q_knn_ivfpq_res" -> knnIvfPqRSql,
    "q_ivfpq_res_recall" -> ivfPqRRecallSql,
    "q_ivf_int8_recall" ->
      s"""SELECT qid, k, n_hit, CAST(n_hit AS DOUBLE)/k AS recall FROM (
         |  SELECT b.qid, count(*) AS k,
         |    CAST(sum(CASE WHEN i.icid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM ($knnBruteSql) b
         |  LEFT JOIN (SELECT qid AS iqid, cid AS icid FROM ($knnIvfInt8Sql)) i
         |    ON b.qid = i.iqid AND b.cid = i.icid
         |  GROUP BY 1) t ORDER BY qid""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id, 'fake/raw' AS format,
        |  CAST(n_chars % 640 + 1 AS BIGINT) AS width,
        |  CAST(n_chars % 480 + 1 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      """WITH f AS (SELECT doc_id, CAST(octet_length(encode(text)) // 50 + 1 AS BIGINT) AS n_frames FROM documents)
        |SELECT doc_id, n_frames, frame_idx, frame_idx * 50 AS frame_off
        |FROM (SELECT doc_id, n_frames,
        |        unnest(generate_series(0, least(n_frames - 1, 18), 2)) AS frame_idx
        |      FROM f) t
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // mirror of Multimodal.qMediaDecode: the Spark side round-trips a
    // real 44-byte-header RIFF/WAVE PCM binary (encode -> strict parse
    // -> payload stats); the oracle recomputes the SAME stats straight
    // from the source text (ASCII corpus: sample values are code
    // points), so a single byte of header/offset drift on the Spark
    // side breaks the hash compare
    "q_media_decode" ->
      """WITH s AS (SELECT doc_id,
        |    octet_length(encode(text)) AS n,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
        |    8000 + (doc_id % 8) * 1000 AS rate
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(44 + n AS BIGINT) AS n_bytes,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(COALESCE(list_sum(bs), 0) AS BIGINT) AS sum_samples,
        |  CAST(COALESCE(list_max(bs), 0) AS BIGINT) AS peak_sample,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE CAST(list_sum(bs) AS DOUBLE) / n END AS mean_sample,
        |  CAST(n * 1000 // rate AS BIGINT) AS duration_ms
        |FROM s ORDER BY doc_id""".stripMargin,
    // Frame windows recomputed from the source bytes: only matches if
    // the WAV header offsets AND the 64-sample window boundaries the
    // decoder used are both exactly right.
    "q_audio_features" ->
      s"""WITH s AS (SELECT doc_id,
         |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs
         |  FROM documents),
         |f AS (SELECT doc_id, bs,
         |    unnest(generate_series(0,
         |      CAST(ceil(len(bs) / ${graft.operators.Multimodal.AudioFrameSize}.0) AS INT) - 1)) AS frame_idx
         |  FROM s WHERE len(bs) > 0),
         |fr AS (SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |    bs[frame_idx*${graft.operators.Multimodal.AudioFrameSize}+1 :
         |       least((frame_idx+1)*${graft.operators.Multimodal.AudioFrameSize}, len(bs))] AS fb
         |  FROM f)
         |SELECT doc_id, frame_idx,
         |  CAST(len(fb) AS BIGINT) AS n_samples,
         |  CAST(list_sum(list_transform(fb, v -> (v-128)*(v-128))) AS BIGINT) AS sum_sq_dev,
         |  CAST(list_max(list_transform(fb, v -> abs(v-128))) AS BIGINT) AS peak_dev,
         |  CAST(CASE WHEN list_max(list_transform(fb, v -> abs(v-128)))
         |       < ${graft.operators.Multimodal.AudioSilencePeak} THEN 1 ELSE 0 END AS BIGINT) AS silent
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
    // The resampled stream recomputed from source bytes: pair mean
    // with integer floor, odd tail passes through, rate halves — a
    // match proves decode, transform, re-encode, and re-parse at once.
    "q_media_resample" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
        |    8000 + (doc_id % 8) * 1000 AS rate
        |  FROM documents),
        |r AS (SELECT doc_id, rate // 2 AS rate2,
        |    list_transform(generate_series(0, (len(bs)+1)//2 - 1),
        |      j -> CASE WHEN 2*j+2 <= len(bs) THEN (bs[2*j+1]+bs[2*j+2])//2
        |           ELSE bs[2*j+1] END) AS rs
        |  FROM s)
        |SELECT doc_id,
        |  CAST(44 + len(rs) AS BIGINT) AS n_bytes,
        |  CAST(rate2 AS BIGINT) AS sample_rate,
        |  CAST(len(rs) AS BIGINT) AS n_samples,
        |  CAST(COALESCE(list_sum(rs), 0) AS BIGINT) AS sum_samples,
        |  CAST(COALESCE(list_max(rs), 0) AS BIGINT) AS peak_sample,
        |  CASE WHEN len(rs) = 0 THEN 0.0
        |       ELSE CAST(list_sum(rs) AS DOUBLE) / len(rs) END AS mean_sample,
        |  CAST(len(rs) * 1000 // rate2 AS BIGINT) AS duration_ms
        |FROM r ORDER BY doc_id""".stripMargin,
    // quarantine mirror: the planted-corruption split plus the strict
    // parser's static reason string; ok rows reuse the decode stats
    "q_media_quarantine" ->
      s"""WITH s AS (SELECT doc_id,
        |    octet_length(encode(text)) AS n,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % ${graft.operators.Multimodal.CorruptEvery} = 0
        |    THEN 'quarantined' ELSE 'ok' END AS status,
        |  CAST(CASE WHEN doc_id % ${graft.operators.Multimodal.CorruptEvery} = 0
        |    THEN 0 ELSE n END AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN doc_id % ${graft.operators.Multimodal.CorruptEvery} = 0
        |    THEN 0 ELSE COALESCE(list_sum(bs), 0) END AS BIGINT) AS sum_samples,
        |  CASE WHEN doc_id % ${graft.operators.Multimodal.CorruptEvery} = 0
        |    THEN 'not a PCM WAV: missing RIFF magic' ELSE '' END AS reason
        |FROM s ORDER BY doc_id""".stripMargin,
    // BMP image decode: the oracle recomputes width/height geometry,
    // header size (54 + padded rows), and pixel stats straight from
    // the source text bytes — only the strict codec round trip matches
    "q_image_decode" ->
      """WITH s AS (SELECT doc_id, octet_length(encode(text)) AS nb,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
        |    CAST(doc_id % 29 + 3 AS BIGINT) AS w
        |  FROM documents),
        |g AS (SELECT doc_id, w, nb // w AS h, bs FROM s WHERE nb // w >= 1)
        |SELECT doc_id,
        |  CAST(54 + ((w*3 + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
        |  w AS width, h AS height, CAST(w*h AS BIGINT) AS n_pixels,
        |  CAST(list_sum(bs[1:w*h]) AS BIGINT) AS sum_lum,
        |  CAST(list_max(bs[1:w*h]) AS BIGINT) AS peak_lum,
        |  CAST(list_sum(bs[1:w*h]) AS DOUBLE) / (w*h) AS mean_lum
        |FROM g ORDER BY doc_id""".stripMargin,
    // histogram/entropy mirror: 16-bucket luminance histogram over the
    // same byte=codepoint pixels, entropy in the fixed-point ln-of-
    // integer convention (sum c_b*(lnx(n)-lnx(c_b)) // n), peak ties
    // toward the lower bucket
    "q_image_features" ->
      """WITH s AS (SELECT doc_id, octet_length(encode(text)) AS nb,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
        |    CAST(doc_id % 29 + 3 AS BIGINT) AS w
        |  FROM documents),
        |g AS (SELECT doc_id, w, nb // w AS h, bs FROM s WHERE nb // w >= 1),
        |px AS (SELECT doc_id, w*h AS n, unnest(bs[1:w*h]) AS v FROM g),
        |hist AS (SELECT doc_id, any_value(n) AS n, v * 16 // 256 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM px GROUP BY doc_id, v * 16 // 256),
        |hr AS (SELECT doc_id, n, bucket, cnt,
        |    max(cnt) OVER (PARTITION BY doc_id) AS mx FROM hist)
        |SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_pixels,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(min(CASE WHEN cnt = mx THEN bucket END) AS BIGINT) AS peak_bucket,
        |  CAST(any_value(mx) AS BIGINT) AS peak_cnt,
        |  CAST(sum(cnt * (CAST(round(ln(CAST(n AS DOUBLE))*1e6) AS BIGINT)
        |                - CAST(round(ln(CAST(cnt AS DOUBLE))*1e6) AS BIGINT)))
        |    // any_value(n) AS BIGINT) AS entropy_x1e6
        |FROM hr GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Fingerprint recomputed from source bytes; the near-dup mirror
    // is the same band/bucket/verify pipeline over the audio bands.
    "q_audio_fingerprint" ->
      s"""WITH $audioFpCtes
         |SELECT doc_id, n_samples, b0, b1, b2, b3
         |FROM asig ORDER BY doc_id""".stripMargin,
    "q_audio_neardup" ->
      s"""WITH $audioFpCtes,
         |xb AS (SELECT doc_id, b0, b1, b2, b3, k AS band_id,
         |    CASE k WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS band_val
         |  FROM asig, (SELECT unnest(generate_series(0, 3)) AS k)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
         |       + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
         |  FROM xb x JOIN xb y ON x.band_id = y.band_id
         |    AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // dHash recomputed from source bytes; the near-dup mirror is the
    // simhash band/bucket/verify pipeline over the image signatures.
    "q_image_dhash" ->
      s"""WITH $imageDhashCtes
         |SELECT doc_id, width, height, b0, b1, b2, b3
         |FROM dsig ORDER BY doc_id""".stripMargin,
    "q_image_neardup" ->
      s"""WITH $imageDhashCtes,
         |xb AS (SELECT doc_id, b0, b1, b2, b3, k AS band_id,
         |    CASE k WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS band_val
         |  FROM dsig, (SELECT unnest(generate_series(0, 3)) AS k)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
         |       + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
         |  FROM xb x JOIN xb y ON x.band_id = y.band_id
         |    AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // 2:2 box-filter mirror in image space: per output pixel the
    // integer-floor mean of its (clamped) 2x2 source block, then the
    // re-encoded artifact's stats — bottom-up recovery, the exact
    // filter, and the re-written header all under one hash
    "q_image_resize" ->
      """WITH s AS (SELECT doc_id, octet_length(encode(text)) AS nb,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
        |    CAST(doc_id % 29 + 3 AS BIGINT) AS w
        |  FROM documents),
        |g AS (SELECT doc_id, w, nb // w AS h, bs FROM s WHERE nb // w >= 1),
        |d2 AS (SELECT doc_id, w, h, (w+1)//2 AS w2, (h+1)//2 AS h2, bs FROM g),
        |yy AS (SELECT doc_id, w, h, w2, h2, bs,
        |    unnest(generate_series(0, h2-1)) AS y2 FROM d2),
        |xx AS (SELECT doc_id, w, h, w2, h2, bs, y2,
        |    unnest(generate_series(0, w2-1)) AS x2 FROM yy),
        |v AS (SELECT doc_id, w2, h2,
        |    ( bs[(2*y2)*w + 2*x2 + 1]
        |      + (CASE WHEN 2*x2+1 < w THEN bs[(2*y2)*w + 2*x2 + 2] ELSE 0 END)
        |      + (CASE WHEN 2*y2+1 < h THEN bs[(2*y2+1)*w + 2*x2 + 1] ELSE 0 END)
        |      + (CASE WHEN 2*x2+1 < w AND 2*y2+1 < h THEN bs[(2*y2+1)*w + 2*x2 + 2] ELSE 0 END) )
        |    // (1 + (CASE WHEN 2*x2+1 < w THEN 1 ELSE 0 END)
        |       + (CASE WHEN 2*y2+1 < h THEN 1 ELSE 0 END)
        |       + (CASE WHEN 2*x2+1 < w AND 2*y2+1 < h THEN 1 ELSE 0 END)) AS val
        |  FROM xx)
        |SELECT doc_id,
        |  CAST(54 + ((w2*3 + 3) // 4) * 4 * h2 AS BIGINT) AS n_bytes,
        |  w2 AS width, h2 AS height, CAST(w2*h2 AS BIGINT) AS n_pixels,
        |  CAST(sum(val) AS BIGINT) AS sum_lum,
        |  CAST(max(val) AS BIGINT) AS peak_lum,
        |  CAST(sum(val) AS DOUBLE) / (w2*h2) AS mean_lum
        |FROM v GROUP BY doc_id, w2, h2 ORDER BY doc_id""".stripMargin,
    // Mirror of Multimodal.qVideoMeta: every column recomputed from
    // (doc_id, text length) alone — n_bytes is the CLOSED container-
    // size formula (RIFF 12 + hdrl 200 + movi 12 + n*(8 + stride*h) +
    // idx1 8 + n*16), so a hash match proves the writer's exact
    // canonical AVI layout AND the strict parser's read of it.
    "q_video_meta" ->
      """WITH s AS (SELECT doc_id,
        |    octet_length(encode(text)) AS len,
        |    doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h, 10 + doc_id % 5 AS fps
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, fps,
        |    ((w*3 + 3) // 4) * 4 AS rs,
        |    least(len // (w*h*3), 8) AS n
        |  FROM s)
        |SELECT doc_id,
        |  CAST(12 + 200 + 12 + n*(8 + rs*h) + 8 + n*16 AS BIGINT) AS n_bytes,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(fps AS BIGINT) AS fps,
        |  CAST(1000000 // fps AS BIGINT) AS usec_per_frame,
        |  CAST(n AS BIGINT) AS n_frames
        |FROM p WHERE n >= 1 ORDER BY doc_id""".stripMargin,
    // Frame stats recomputed from the source text slices: a match
    // proves the movi walk, the idx1 seek offsets, the stride-padding
    // strip, and (via first_px = the frame's byte 0) the bottom-up ->
    // top-down orientation recovery.
    "q_video_frames" ->
      s"""WITH s AS (SELECT doc_id,
         |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
         |    doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h
         |  FROM documents),
         |p AS (SELECT doc_id, bs, w, h, w*h*3 AS fl,
         |    least(len(bs) // (w*h*3), 8) AS n FROM s),
         |f AS (SELECT doc_id, w, h, fl, bs,
         |    unnest(generate_series(0, n - 1, ${graft.operators.Multimodal.VideoFrameStep})) AS k
         |  FROM p WHERE n >= 1),
         |fr AS (SELECT doc_id, CAST(k AS BIGINT) AS frame_idx, w, h,
         |    bs[k*fl+1 : (k+1)*fl] AS fb FROM f)
         |SELECT doc_id, frame_idx,
         |  CAST(w*h AS BIGINT) AS n_px,
         |  CAST(list_sum(fb) AS BIGINT) AS sum_px,
         |  CAST(list_max(fb) AS BIGINT) AS peak_px,
         |  CAST(fb[1] AS BIGINT) AS first_px
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
    // Motion recomputed from the source slices: per consecutive-frame
    // pair, the sum of absolute byte diffs + the integer
    // cross-multiplied scene-cut verdict.
    "q_video_motion" ->
      s"""WITH s AS (SELECT doc_id,
         |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
         |    doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h
         |  FROM documents),
         |p AS (SELECT doc_id, bs, w, h, w*h*3 AS fl,
         |    least(len(bs) // (w*h*3), 8) AS n FROM s),
         |f AS (SELECT doc_id, bs, fl,
         |    unnest(generate_series(0, n - 2)) AS k
         |  FROM p WHERE n >= 2),
         |m AS (SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
         |    CAST(fl AS BIGINT) AS n_bytes,
         |    CAST(list_sum(list_transform(
         |      list_zip(bs[k*fl+1 : (k+1)*fl], bs[(k+1)*fl+1 : (k+2)*fl]),
         |      z -> abs(z[1] - z[2]))) AS BIGINT) AS motion
         |  FROM f)
         |SELECT doc_id, frame_idx, n_bytes, motion,
         |  motion * 1000 > ${graft.operators.Multimodal.MotionCutX1e3} * n_bytes AS cut
         |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    // The thinned artifact recomputed from source: kept-frame stats +
    // the container-size formula at n2 = ceil(n/2) — a match proves
    // decode, thinning, RE-encode, and strict re-parse at once (the
    // resample/resize convention, video edition).
    "q_video_thin" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
        |    doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h
        |  FROM documents),
        |p AS (SELECT doc_id, bs, w, h, w*h*3 AS fl,
        |    ((w*3 + 3) // 4) * 4 AS rs,
        |    least(len(bs) // (w*h*3), 8) AS n FROM s),
        |f AS (SELECT doc_id, w, h, rs, fl, bs, n, (n+1)//2 AS n2,
        |    unnest(generate_series(0, n - 1, 2)) AS k
        |  FROM p WHERE n >= 1),
        |fr AS (SELECT doc_id, w, h, rs, n2,
        |    bs[k*fl+1 : (k+1)*fl] AS fb FROM f)
        |SELECT doc_id,
        |  CAST(12 + 200 + 12 + n2*(8 + rs*h) + 8 + n2*16 AS BIGINT) AS n_bytes,
        |  CAST(n2 AS BIGINT) AS n_frames,
        |  CAST(sum(list_sum(fb)) AS BIGINT) AS sum_px,
        |  CAST(max(list_max(fb)) AS BIGINT) AS peak_px
        |FROM fr GROUP BY doc_id, w, h, rs, n2 ORDER BY doc_id""".stripMargin,
    // Video quarantine: same planted-fault stride as the WAV one; the
    // reason is the AVI parser's (static) RIFF-tag failure
    "q_video_quarantine" ->
      s"""WITH s AS (SELECT doc_id,
         |    octet_length(encode(text)) AS len,
         |    doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h
         |  FROM documents),
         |p AS (SELECT doc_id, w, h,
         |    ((w*3 + 3) // 4) * 4 AS rs,
         |    least(len // (w*h*3), 8) AS n
         |  FROM s),
         |q AS (SELECT doc_id, w, h, rs, n,
         |    doc_id % ${graft.operators.Multimodal.CorruptEvery} = 0 AS bad
         |  FROM p WHERE n >= 1)
         |SELECT doc_id,
         |  CASE WHEN bad THEN 'quarantined' ELSE 'ok' END AS status,
         |  CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN bad THEN 0
         |    ELSE 12 + 200 + 12 + n*(8 + rs*h) + 8 + n*16 END AS BIGINT) AS n_bytes,
         |  CASE WHEN bad THEN 'not a canonical AVI: expected ''RIFF'' tag'
         |    ELSE '' END AS reason
         |FROM q ORDER BY doc_id""".stripMargin,
    // Video fingerprint recomputed from source bytes; the near-dup
    // mirror is the shared band/bucket/verify pipeline — the same
    // SQL shape as the image and audio editions, completing the
    // modality matrix.
    "q_video_fingerprint" ->
      s"""WITH $videoDhashCtes
         |SELECT doc_id, n_frames, b0, b1, b2, b3
         |FROM vsig ORDER BY doc_id""".stripMargin,
    "q_video_neardup" ->
      s"""WITH $videoDhashCtes,
         |xb AS (SELECT doc_id, n_frames, b0, b1, b2, b3, k AS band_id,
         |    CASE k WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS band_val
         |  FROM vsig, (SELECT unnest(generate_series(0, 3)) AS k)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
         |       + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
         |  FROM xb x JOIN xb y ON x.n_frames = y.n_frames
         |    AND x.band_id = y.band_id
         |    AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
  )
}
