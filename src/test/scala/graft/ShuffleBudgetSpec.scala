package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Shuffle budgets for headline queries — the plan-shape regression
  * guard. Every exchange is a full materialize-and-repartition of its
  * input; at 100 TB an accidental extra one (a lost partial
  * aggregation, a stray repartition, a join that stopped reusing its
  * child's partitioning) is the difference between a plan that holds
  * and one that doesn't. Budgets pin the CURRENT static plan (AQE off
  * for determinism — AQE only removes/splits exchanges at runtime,
  * never adds); a failure means the plan got structurally worse, not
  * that a threshold needs bumping.
  */
class ShuffleBudgetSpec extends SparkTestBase {

  private def countShuffles(p: SparkPlan): Int = {
    val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
    self + p.children.map(countShuffles).sum + p.subqueries.map(countShuffles).sum
  }

  // (query, max exchanges incl. the output-stability sort)
  private val budgets = Seq(
    "q1_pricing_summary"    -> 2,
    "q5_region_revenue"     -> 2,
    "etl_pipeline_e2e"      -> 4,
    "corpus_curate_e2e"     -> 4,
    "corpus_prep_e2e"       -> 2,
    "dedup_exact"           -> 2,
    "dedup_minhash"         -> 2,
    "etl_upc_match"         -> 1,
    "etl_similarity_match"  -> 3,
    "events_hourly"         -> 3,
    "events_sessionize"     -> 2,
    "events_asof_native"    -> 3,
    "corpus_sample_bottomk" -> 2,
    "etl_incremental_agg"   -> 3,
    "text_tokens"           -> 1,
    "dq_checks"             -> 7, // +3 single-row aggs: the model-contract families
    "dedup_chunks"          -> 2,
    "multimodal_dedup"      -> 2,
    "corpus_report"         -> 2,
    "q_grouping_sets"       -> 2,
    "text_repetition"       -> 3,
    "etl_scd2_history"      -> 3,
    "sketch_hll_union"      -> 5,
    "events_quantiles_approx" -> 2,
    "text_tfidf_topk"       -> 6,
    "corpus_quality_gate"   -> 2,
    "events_sliding_volume" -> 3,
    "q4_order_priority"     -> 2,
    "q_brand_premium"       -> 2,
    "q_large_orders"        -> 3,
    "text_winnowing"        -> 2,
    "events_promo_attribution" -> 4,
    "graph_triangles"       -> 7,
    "graph_pagerank"        -> 8,
    // codes fold (the stored-index build) + table fold + rank + output
    // sort; the ADC scan itself is a map (adc_dist6), no (q,vec) agg
    "ann_pq_topk"           -> 5,
    "q7_bination_volume"    -> 2,
    "sketch_count_min"      -> 3,
    "etl_snapshot_diff"     -> 3,
    "text_winnow_pairs"     -> 2,
    // k-means chain + codes/table folds + rank/sort; the ADC scoring
    // join is all-equi with a map-side adc_dist6, no re-aggregation
    "ann_ivfadc_topk"       -> 10,
    "q13_custdist"          -> 3,
    "q15_top_supplier"      -> 4,
    "q22_dormant_customers" -> 4,
    "events_resample_ffill" -> 3,
    // the packers pay 2 extra exchanges for the two-phase cumsum
    // (range + local-window hash + tiny offsets + output sort) — the
    // price of parallelism that scales with data instead of with the
    // 3-value partition key (PackingSpec pins the equivalence + reuse)
    "corpus_pack_contexts"  -> 4,
    "multimodal_shard_pack" -> 4,
    "corpus_token_budget"   -> 4,
    "events_markov_transitions" -> 4,
    "corpus_split_leakage"  -> 2,
    "corpus_importance_resample" -> 1,
    "events_equiheight_hist" -> 3,
    "dq_snapshot_drift"     -> 4,
    // agg + window-limit hash + output sort; the supplier dim is a
    // broadcast (rank()=1 keeps the fact table to ONE scan)
    "q2_min_price_supplier" -> 3,
    // two (order,supplier) DISTINCTs + multi-keyset agg + anti join +
    // final agg; late relation checkpointed once
    "q21_sole_late_supplier" -> 5,
    // tf/df/dl/stats model branches over the one posting relation
    "text_bm25_topk"        -> 7,
    // the two-phase-cumsum family price (see the packers above)
    "corpus_shuffle_export" -> 4,
    // bounded-aggregate partial pass + weight join-back/output sort
    "corpus_weighted_sample" -> 2,
    // scan-side filters + one final 1-row agg — the floor for a
    // full-table query; q14/q19's single exchange is the same shape
    // (their part join broadcasts at spec scale)
    "q6_forecast_revenue"   -> 1,
    "q8_market_share"       -> 2,
    "q9_profit_by_nation"   -> 2,
    "q10_returned_items"    -> 1,
    // grouped agg (checkpointed, reused for the 1-row total) + output
    // sort; the scalar threshold joins back as a broadcast
    "q11_important_parts"   -> 2,
    "q12_ship_priority"     -> 2,
    "q14_promo_share"       -> 1,
    // distinct (partsupp surrogate) + two-phase countDistinct expand +
    // output sort
    "q16_supplier_variety"  -> 4,
    // ONE part-partitioned window computes and applies the per-part
    // threshold (agg+join-back would add an exchange)
    "q17_small_qty_revenue" -> 2,
    "q19_disjunctive_revenue" -> 1,
    // per-(part,supp) agg + per-part rollup + distinct + output sort;
    // fact scanned once (checkpointed)
    "q20_top_part_suppliers" -> 4,
    // candidate distinct + verify agg + size join + batch left-join/sort
    // over the CHECKPOINTED shingle/signature relations (the corpus
    // explode and index build run once, not per reader)
    "dedup_incremental"     -> 4,
    // feature explode is map-side; one doc_id agg + output sort
    "corpus_model_quality"  -> 2,
    // LM branches (bigram/context/vocab) over the one checkpointed
    // pair relation + scoring join + doc agg + sort — same shape and
    // budget as text_bm25_topk's model branches
    "text_perplexity"       -> 7,
    // two independent retrieval legs (LSH candidate distinct + cosine
    // window; BM25 probe over the CHECKPOINTED impact-weight relation —
    // the df/dl/stats branches run once at weight-build, r13) + the
    // rank fusion join
    "ann_rrf_fusion"        -> 8,
    // same banded-candidate + intersection shape as dedup_ngram_jaccard;
    // signature/shingle relations checkpointed once
    "dedup_containment"     -> 2,
    // POST-FIXPOINT labeling plan only (per-round contraction plans are
    // materialized behind checkpoints): star-forest groupBy + root
    // anti-join + size window + sort
    "dedup_components_star" -> 5,
    // component labels (checkpointed) join + hash-bucket split decision
    "corpus_group_split"    -> 2,
    // the Dagster-style schedule allocator: per-(job, window) expansion
    // windows + cumulative-capacity rollup
    "etl_job_allocation"    -> 8,
    // keyset paging: page-boundary window + per-page offset join-backs
    "etl_products_page"     -> 6,
    // phash16 is a pure map — output sort is the only exchange
    "multimodal_phash"      -> 1,
    // banded self-join over the CHECKPOINTED fingerprints + distinct;
    // windowless verification (bit_count on the pair row). 2 since the
    // fingerprint pass stopped ending in an aggregation: the join
    // shuffles both sides on the band key (the co-partitioned shape
    // that survives scale; the pre-r8 plan broadcast one side)
    "multimodal_phash_pairs" -> 2,
    // final plan reads k checkpointed 1-row winners: the per-round pair
    // aggregations live behind the checkpoints, the merge table itself
    // is union + sort over k rows
    "text_bpe_merges"       -> 1,
    // corpus explode is map-side, trained vocab broadcasts, one doc_id
    // agg + output sort — the deployed-tokenizer scan shape
    "text_bpe_encode"       -> 2,
    // the ivfadc chain (10) + the shortlist window; the exact re-scoring
    // joins ride the shortlist's partitioning and the ≤ R-per-query
    // relation broadcasts
    "ann_ivfadc_rerank"     -> 11,
    // map-side bucket assignment + one keyed agg + output sort
    "corpus_length_buckets" -> 2,
    // coarse assign windows + PQ-train argmin windows + final (q,vec)
    // agg/rank; residual subtraction and both ADC tables are broadcast
    "ann_ivfpq_residual"    -> 7,
    // rank window + output sort ONLY: the range model folds behind a
    // checkpoint, encode and the sq8_dist scoring scan are pure
    // map-side (array-at-a-time native expressions — no per-dim
    // explode, no term re-aggregation), model and queries broadcast
    "ann_sq8_topk"          -> 2,
    // vocab agg + the rank window over the AGGREGATED vocab relation
    "text_zipf_profile"     -> 2,
    // bit-pack agg + (q,vec) rank + output sort; query codes broadcast
    "ann_bq_topk"           -> 4,
    // gram relation (checkpointed) -> distinct + df agg + doc agg + sort
    "text_repeated_spans"   -> 4,
    // masters agg + fold-key join + output sort
    "etl_accent_fold_match" -> 3,
    // one grouped symbol-string agg + output sort; regexes are map-side
    "events_cep_pattern"    -> 2,
    // one user-partitioned window (all K lags share it) + output sort
    "events_ema"            -> 2,
    // token explode is map-side; one (doc, bucket) agg + output sort
    "text_hashing_features" -> 2,
    // df agg + rarity join + per-doc prefix window + prefix self-join
    // distinct + verify intersection/size joins + output sort, over the
    // CHECKPOINTED shingle relation
    "dedup_prefix_filter"   -> 8,
    // bench gram distinct (+ the bloom subquery's own 1-row agg) +
    // candidate confirm distinct + final left join/sort; corpus grams
    // die map-side at the bloom probe
    "corpus_decontaminate_bloom" -> 6,
    // ---- round-8 additions ----
    // lineitem agg; the having-sliver joins broadcast, the top-100 is
    // TakeOrdered (no exchange) — the aggregate-before-join floor
    "q18_large_volume_customers" -> 1,
    // daily agg + the global frame window over it (allowed: above an
    // aggregation, one row per ship-day)
    "q_moving_corr"         -> 2,
    // (brand, year) agg + brand-partitioned lag window + output sort
    "q_yoy_growth"          -> 3,
    // POST-peel plans only: per-round degree aggs + endpoint joins are
    // materialized behind per-round checkpoints (like the components
    // fixpoint); same for BFS's per-round min-folds
    "graph_kcore"           -> 2,
    "graph_bfs"             -> 1,
    // wedge join + degree joins + anti-join + AA agg + output sort,
    // over the CHECKPOINTED edge relation
    "graph_link_prediction" -> 9,
    // k-means assign windows + the sq8 scan's rank window + output
    // sort; codes ride the vec_id join, probes/model/queries broadcast
    "ann_ivfsq8_topk"       -> 8,
    // bit-pack agg + hamming shortlist window + exact rank + sort
    "ann_bq_rerank"         -> 4,
    // per-set distinct + the O(k) partial bottom_k single-partition
    // merge (×2 sets); everything after is 1-row broadcast algebra
    "sketch_kmv_setops"     -> 4,
    // langid scan agg + declared-lang share window + output sort
    "text_langid_eval"      -> 3,
    // (hour, user) agg + hour-partitioned rank window + output sort
    "events_windowed_topk"  -> 3,
    // (user, day) distinct + daily agg + exploded 7-window distinct agg
    // + output sort
    "events_uniques_sliding" -> 4,
    // daily agg + 7-day-shifted self-join + type summary + sort
    "events_forecast_eval"  -> 4,
    // bucketed pair join + per-purchase k window + hour agg + sort
    "events_attribution_multitouch" -> 4,
    // first-day agg + user join-back + (cohort, age) agg + cum window
    // + size join + output sort
    "events_cohort_ltv"     -> 7,
    // inserted distinct + bit-position distinct + probe agg + three
    // 1-row count aggregates
    "dq_bloom_fpr"          -> 6,
    // ONE key-partitioned window pass (rank + change count) + sort
    "etl_cdc_apply"         -> 2,
    // version build windows + the fact equi-join + usage agg/sort
    "etl_temporal_join"     -> 3,
    // the logreg chain's feature scan (training folds behind 1-row
    // aggs) + the ≤10-row bucket agg
    "corpus_quality_calibration" -> 2,
    // per-part agg + the two-phase cumsum family price (post-checkpoint
    // slice windows + offsets agg) + 1-row total + output sort
    "q_abc_analysis"        -> 6,
    // ---- round-9 additions ----
    // the fused multi-axis rank: ONE two-phase cumsum (range + slice
    // windows + offsets) + explode/fold-back aggs + output sort — the
    // three chained cumsums this replaced cost ~3× the exchanges
    "q_rfm_segmentation"    -> 7,
    // artifact scan + output sort only
    "graph_knn_edges"       -> 1,
    // r12: the K-capped twin — the collapse build sits behind its
    // checkpoint; the visible plan is two price join-backs + the
    // per-key rank + output sort
    "q_price_band_join_topk" -> 4,
    // the *_indexed twins: probe-side plans over the edge-table scan —
    // same per-iteration shapes as the base forms minus the build
    "graph_pagerank_indexed" -> 5,
    "graph_triangles_indexed" -> 3,
    "graph_kcore_indexed"   -> 2,
    "graph_bfs_indexed"     -> 1,
    "graph_link_prediction_indexed" -> 3,
    "graph_label_propagation_indexed" -> 9, // 3 unrolled LPA rounds
    "graph_modularity_indexed" -> 12, // LPA rounds + modularity terms
    // served ANN: artifact scans + query ADC table + rank + sort — the
    // training chains (10-11 exchanges in the base forms) are gone
    "ann_ivfadc_served"     -> 4,
    "ann_ivfadc_rerank_served" -> 4,
    // r13: the lex leg reads the bm25_w impact-weight artifact — the
    // per-candidate df/dl joins are gone (weights precomputed at build)
    "ann_rrf_fusion_served" -> 6,
    // served dedup policy/audit: label/pair artifact scans + the view
    // aggregations; the pair build + fixpoint live at artifact-write
    "dedup_components_served" -> 2,
    "dedup_cluster_stats_served" -> 3,
    "dedup_keep_best_served" -> 4,
    "dedup_incremental_served" -> 3,
    "corpus_group_split_served" -> 1,
    // map-side DCT fingerprints + output sort; the pair search runs
    // entirely over the checkpointed fingerprint relation
    "multimodal_phash_dct"  -> 1,
    // r10: was 1 when the checkpoint materialized an ORDERED fingerprint
    // relation (the pre-sort exchange ran inside the checkpoint job,
    // invisible to this count). The checkpoint is now unordered — one
    // whole sort less in total — and the probe plan honestly carries
    // its band-join + pair-distinct exchanges
    "multimodal_phash_dct_pairs" -> 2,
    // band self-join over the bucketed fingerprint table + pair
    // distinct + output sort
    "multimodal_phash_dct_pairs_served" -> 3,
    "multimodal_phash_dct_pairs_r3" -> 3,
    // checkpointed gram relation: df agg (distinct+groupBy) + the
    // window island merge + output sort
    "dedup_exact_spans"     -> 4,
    // the g-bucketed artifact makes the df agg and the self-join
    // exchange-free on the table side — 2 exchanges saved
    "dedup_exact_spans_served" -> 2,
    // span search (4) + removal distinct + token join/agg + output sort
    "dedup_span_strip"      -> 8,
    // corpus df agg + probe/hit joins + verdict agg + output sort
    "dedup_span_admit"      -> 6,
    // candidate distinct + agreement agg + 17-row grid join
    "dedup_lsh_sensitivity" -> 3,
    // +1 r12: the single-row corpus-count agg behind the calibration
    // sample's modulus (broadcast after; the pair join itself shrank)
    "ann_lsh_sensitivity"   -> 5,
    "dedup_simhash_sensitivity" -> 3,
    // +1 r12: the calibration-sample modulus count agg
    "multimodal_phash_sensitivity" -> 5,
    // r12: the SQL-text twins go through the same Catalyst pipeline as
    // their Scala forms. sql_simhash_pairs probes the artifact: band
    // join + distinct ride one exchange with the output sort.
    // r13: bm25/ann serve from the artifact tier too — bm25's postings
    // joins ride the doc_id bucketing (was 7 when the inlined tf CTE
    // re-planned per reference), leaving only the 1-row stats agg;
    // ann reads stored (v, nrm), keeping just the rank + output sort
    "sql_simhash_pairs"     -> 1,
    "sql_bm25_topk"         -> 1,
    "sql_quality_gate"      -> 2,
    "sql_ann_topk"          -> 2,
    // r13: the SQL graph twins match their Scala twins exactly —
    // pagerank: 3 per-iteration aggs over the checkpointed adjacency
    // views + r0 distinct + output sort (graph_pagerank_indexed is
    // also 5); components: size window + output sort over the label
    // artifact (dedup_components_served is also 2)
    "sql_pagerank"          -> 5,
    "sql_components"        -> 2,
    // r13: the SQL events twins match their Scala forms exactly —
    // sessionize: both windows share one (user_id, ts, event_id) sort
    // + output sort (events_sessionize is also 2); retention: day
    // distinct + cohort agg + two-phase countDistinct expand + output
    // sort (events_retention, pinned below, is also 5)
    "sql_sessionize"        -> 2,
    "sql_retention"         -> 5,
    "events_retention"      -> 5,
    "sql_funnel"            -> 2, // agg + output sort, = events_funnel
    // r13: the hybrid-retrieval capstone — plans to exactly the served
    // DataFrame twin's shape (6 exchanges + 4 broadcasts)
    "sql_rrf_fusion"        -> 6,
    // r14: the capped fusion reads pre-capped artifacts; r15 added the
    // champion-list + exact-rescore lexical leg (truncation-only
    // scoring reordered the dense low-idf rankings — recall@5 0.20),
    // whose candidate-distinct + rescore aggregation costs one
    // exchange over the served twin's 6
    "ann_rrf_fusion_capped" -> 7,
    // r15: the analyst pair search over the served dedup_sigs/dedup_sh
    // artifacts — candidate self-join on the band key, gram
    // intersection riding the artifact bucketing, sizes aggregation,
    // jaccard joins + output sort
    "sql_dedup_pairs"       -> 7,
    // r14: the SQL temporal twins plan to exactly their DataFrame
    // forms — asof: union + one user_id window sort + output sort
    // share 2 exchanges; temporal join: the scd2 windows share the
    // partkey sort, + the fact join's aggregation + output sort
    "sql_asof"              -> 2,
    "events_asof_join"      -> 2,
    // = etl_temporal_join (pinned above at 3)
    "sql_temporal_join"     -> 3,
    // the named-WINDOW text shares all three windows on one partkey
    // sort, = etl_scd2_history (pinned above at 3)
    "sql_scd2_history"      -> 3,
    // r15 second half: the bounded admission probe — occupancy agg +
    // gate joins feed checkpointed candidates; the verdict tail is the
    // served form's
    "dedup_incremental_capped" -> 3,
    // r15 second half: the whole candidate build + both positional
    // joins ride the g-bucketed artifact exchange-free; only the
    // island merge and the output sort move data
    "dedup_exact_spans_capped" -> 2,
    // r15 second half: the capped fine perceptual search — the gate/
    // window phases sit behind the checkpointed candidate relation
    // (broadcast occupancy joins); the final distinct + output sort
    // are the two exchanges
    "multimodal_phash_dct_pairs_capped" -> 2,
    // r15 second half: the analyst form of the coarse perceptual pair
    // search over the served fingerprint artifact — the band self-join
    // broadcasts, distinct rides it, output sort is the exchange
    // (= the r3 DataFrame twin's count)
    "sql_phash_pairs" -> 2)

  test("window top-N runs under WindowGroupLimit (partial group limit before the shuffle)") {
    // Spark's own InferWindowGroupLimit plans rank-filter windows as a
    // Partial+Final group limit — each map task forwards only its own
    // top-N per group, the same shuffle reduction a custom top-k
    // operator would buy (which is why the repo does not carry one;
    // the native bounded aggregate exists for the SAMPLING shape the
    // optimizer cannot infer)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_top_parts_per_brand")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), s"group-limit pushdown missing:\n$plan")
      assert(plan.contains("Partial") && plan.contains("Final"),
        "expected two-phase (Partial before the exchange, Final after)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("headline queries stay within their shuffle budgets") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val over = budgets.flatMap { case (name, budget) =>
        val n = countShuffles(
          SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
        if (n > budget) Some(s"$name: $n > $budget") else None
      }
      assert(over.isEmpty, s"shuffle budgets exceeded: ${over.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
