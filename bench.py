#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_SYN_DOCS synthetic extraction corpus size (default 8000)
  SPARK_GRAFT_REPEATS  warm runs per query (default 3; p50 is the
                       headline because this host shows 3-18x
                       run-to-run noise — single samples mislead)
  SPARK_GRAFT_ONLY     comma list to subset the queries

Each query is forced end-to-end with the noop sink (count() would let
Catalyst prune the very expressions being measured).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ocr_translation_spark.datagen import write_fixture_parquet  # noqa: E402
from ocr_translation_spark.pipeline import extract  # noqa: E402
from ocr_translation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYN_DOCS = int(os.environ.get("SPARK_GRAFT_SYN_DOCS", "8000"))
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def synthetic_dir() -> str:
    d = os.path.join("/tmp", f"ocr_xlate_bench_{SYN_DOCS}")
    marker = os.path.join(d, "documents.parquet")
    if not os.path.exists(marker):
        write_fixture_parquet(d, n_docs=SYN_DOCS)
    return d


def main() -> None:
    import __spark_entry__ as entry_mod

    syn = synthetic_dir()
    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    queries = entry_mod.queries()

    docs = spark.read.parquet(os.path.join(syn, "documents.parquet"))
    media = spark.read.parquet(os.path.join(syn, "media.parquet"))
    n_docs = docs.count()
    n_spans = docs.agg(F.sum(F.size("spans"))).collect()[0][0]

    timings: dict[str, float] = {}
    max_warm: dict[str, float] = {}
    cold: dict[str, float] = {}

    def timed(name, fn, repeats=None):
        # first run warms JIT/codegen (a freshly generated class executes
        # interpreted; observed 13x slower) and the Python workers —
        # steady-state throughput is the metric, cold times are reported
        # separately. p50 over REPEATS warm runs is the headline: this
        # host shows 3-18x run-to-run noise, single samples mislead.
        reps = repeats or REPEATS
        t0 = time.monotonic()
        fn()
        cold[name] = round(time.monotonic() - t0, 3)
        warm = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            warm.append(time.monotonic() - t0)
        warm.sort()
        timings[name] = round(statistics.median(warm), 3)
        # honestly labeled: at small reps this is the max of the warm
        # samples, not a tail percentile
        max_warm[name] = round(warm[-1], 3)

    only = os.environ.get("SPARK_GRAFT_ONLY")  # comma list to subset

    def want(name):
        return only is None or name in only.split(",")

    # headline: full synthetic extraction (stages A+B+C incl. OCR)
    if want("extract_synthetic"):
        timed(
            "extract_synthetic",
            lambda: _force(extract(spark, docs, media).result),
        )
    # flagship derived-span pipeline over the driver corpus; >=5 warm
    # reps so host variance can't mask real drift (r3->r4 committed
    # 1.65 -> 1.92 s was un-adjudicable from n=3)
    if want("extract_flagship"):
        timed(
            "extract_flagship",
            lambda: _force(queries["extract_flagship"](spark, SF_DIR)),
            repeats=max(REPEATS, 5),
        )
    for name in (
        "exact_dedup",
        "minhash_near_dup",
        "simhash_sketch",
        "ann_cosine_topk",
        "tpch_pricing_summary",
        "events_hourly",
        "quality_scores",
        "lang_id",
        # round-4 operator additions: iterative connected components,
        # composed curation, TF-IDF ranking, repetition signals
        "dedup_clusters",
        "curation_e2e",
        "tfidf_top_terms",
        "repetition_signals",
        # round-5 curation additions: decontamination, vocabulary
        # coverage, mixture resampling, passage-level global dedup,
        # bigram LM scoring, quality stratification
        "ngram_decontaminate",
        "vocab_oov_rate",
        "token_concentration",
        "mixture_resample",
        "passage_dedup",
        "bigram_lm_score",
        "quality_decile_stats",
        "training_shuffle_order",
        "pii_scrub",
        # exact string-similarity self-join (PassJoin segment filter)
        "edit_distance_pairs",
        # one-scan curation-cascade drop accounting
        "filter_funnel_report",
        # round-5 continuation: Unicode canonicalization (Arrow NFC),
        # hashed linear quality classifier (pure codegen map),
        # cohort retention triangle, embedding-cluster dedup rollup
        "canonical_fingerprint",
        "hashed_classifier_score",
        "user_retention_cohorts",
        "semantic_dedup",
        # fixed-iteration integer PageRank over the derived link graph
        "pagerank_centrality",
        # incremental crawl-snapshot CDC diff
        "snapshot_diff",
        # rolling-hash winnowing fingerprints (row-local codegen)
        "winnowing_fingerprint",
        # bounded-memory sketches: Misra-Gries exact heavy hitters,
        # KMV cardinality estimate, Bloom-prefiltered anti-join
        "heavy_hitters",
        "kmv_distinct",
        "bloom_prefilter_decontaminate",
        # corpus collocation mining + BPE merge-round pair counting
        "pmi_collocations",
        "bpe_pair_counts",
        # exact-integer BM25 ranked retrieval (shuffle-free corpus path)
        "bm25_topk",
        # exact prefix-filtered set-similarity self-join (PPJoin)
        "setsim_join_exact",
        # degree-oriented wedge-join triangle counting
        "triangle_counts",
        # incremental materialized-rollup maintenance (merge == full)
        "rollup_incremental",
        # one-pass per-column data-audit profile
        "table_profile",
        # distributed recall@k of the LSH index vs exact top-k
        "ann_recall_eval",
        # sorted-neighborhood blocking w/ distributed global rank
        "snm_candidate_pairs",
        # leakage-safe cluster-atomic train/test splitting
        "cluster_safe_split",
        # capped item-item co-occurrence similarity
        "item_cooccurrence_sim",
        # Gopher composite quality rules (zero-shuffle codegen map)
        "gopher_quality_rules",
        # iterative distributed BPE training (4 merge rounds)
        "bpe_train_merges",
        # GloVe-style windowed co-occurrence counting
        "word_cooccurrence",
        # bounded per-target anchor-text aggregation (link graph)
        "anchor_text_agg",
        # row-local lexicon taxonomy tagging (zero-shuffle map)
        "taxonomy_tag",
        # BPE tokenization with the 4 trained merges (train + apply)
        "bpe_encode",
        # hot-key skew diagnostic (pre-salting audit)
        "skew_report",
        # politeness-aware crawl-frontier scheduling
        "frontier_schedule",
        # Fellegi-Sunter record linkage (SNM blocking + exact-rational
        # likelihood-ratio classification, zero shuffles over blocking)
        "record_linkage_fs",
        # Morton clustering-key derivation (pure codegen bit math)
        "zorder_key",
        # Apriori association rules (band prune + capped baskets)
        "assoc_rules",
        # exact-rational OLS daily-volume trend per event type
        "trend_slope",
        # declarative data-contract audit (single-scan rules + FK)
        "constraint_audit",
        # largest-remainder token-budget apportionment across sources
        "budget_apportion",
        # Count-Min sketch estimates vs exact counts (verifiable)
        "cms_counts",
        # golden-record survivorship (FS matches -> CC -> merge)
        "golden_record",
        # span-level extraction P/R/F1 eval (perturbed vs golden)
        "extraction_span_f1",
        # SCD Type-2 history fold (one key-window shuffle)
        "scd2_history",
        # first-order Markov transition matrix in micro-units
        "markov_transitions",
        # k-anonymity / l-diversity release audit over banded QIs
        "k_anonymity_audit",
        # exact-integer chi-squared feature/label association
        "chi2_feature_scores",
        # multi-source BFS hop distances (frontier expansion)
        "bfs_distances",
        # robust median/MAD daily-volume anomaly flags
        "mad_outlier_days",
        # fixed-K HITS hub/authority (integer max-normalized)
        "hits_scores",
        # depth-4 session opening-path mining
        "session_paths",
        # reciprocal-rank fusion of BM25 + PageRank top-50s
        "rrf_fusion",
        # 2-round semi-supervised label spreading (clamped seeds)
        "label_propagation",
        # arrival-vs-sorted inference-batching padding waste
        "batching_waste",
        # seed-restarted personalized PageRank (K=3)
        "personalized_pagerank",
        # bounded-state per-group KMV distinct (k=32 minima/group)
        "group_kmv_distinct",
        # exact per-group quantiles by histogram narrowing
        "exact_group_quantiles",
        # 2-D Pareto frontier, local+global prune
        "skyline_orders",
        # theta-sketch-style distinct set overlap (k=64)
        "kmv_set_overlap",
        # perceptual occupancy-grid hash + banded Hamming join
        "phash_near_dup",
        # bitext mutual-NN alignment with margin (exact baseline)
        "mutual_nn_align",
        # weighted exact quantiles (weight-mass narrowing)
        "weighted_quantiles",
        # grouped top-k with per-partition pruning
        "grouped_topk_pushdown",
        # Merkle bucket-checksum replica diff (anti-entropy)
        "merkle_replica_diff",
        # corpus distribution-shift terms (exact ppm log-odds family)
        "corpus_drift_terms",
        # winsorized robust stats (clip at exact p05/p95, micro sums)
        "winsorized_stats",
        # running-distinct growth curve (first-touch identity)
        "cumulative_new_users",
        # exact-integer CUSUM level-shift detection
        "cusum_changepoint",
        # MRR eval of the BM25 ranker vs boolean-AND relevance
        "mrr_eval",
        # inter-arrival-regularity bot detection (exact CV^2 ppm)
        "bot_regularity_scores",
        # exact percent-rank normalize (range-partitioned cumulative)
        "rank_normalize",
        # asymmetric near-containment self-join (quote detection)
        "containment_join",
        # longest-prefix-match CIDR enrichment (broadcast join chain)
        "ip_lpm_enrich",
        # grid-bucketed spatial join (cell equi-join, exact predicate)
        "geo_grid_join",
        # linear multi-touch attribution (largest-remainder credit)
        "multi_touch_attribution",
        # iterative k-core peel over the derived link graph
        "kcore_decomposition",
        # gaps-and-islands interval coalescing (one user shuffle)
        "interval_coalesce",
        # sequential Poisson weighted sample (TakeOrdered, no sort)
        "weighted_priority_sample",
        # exact ppm day-of-week seasonality (one corpus shuffle)
        "seasonality_index",
        # last-touch latency quantiles (attribution x selection)
        "time_to_convert",
        # contrastive training triplets over near-dup clusters
        "contrastive_triplets",
        # deterministic hash-split A/B report (one user shuffle)
        "ab_experiment_report",
        # hysteresis burst segmentation (planted x3 weekday regime)
        "burst_windows",
        # TPC-H q8 national market share (exact integer ppm)
        "tpch_q8_market_share",
        # resource-allocation link prediction (wedge join + anti-join)
        "link_prediction_ra",
        # GPT-3-style n-gram eval-overlap decontamination
        "ngram_decontaminate",
        # DSIR hashed-gram importance selection (2 scans, 1 shuffle)
        "dsir_select",
        # MMR diversified per-source top-5 (bounded per-group greedy)
        "mmr_diverse_topk",
        # TextRank keywords (PageRank over the word co-occur graph)
        "textrank_keywords",
        # T5 span-corruption example generation (zero-shuffle map)
        "t5_span_corruption",
        # approximate-FD discovery, all candidates in one scan
        "fd_violations",
        # local-minimum greedy maximal matching (iterative rounds)
        "greedy_matching",
        # DeepWalk walk generation (4 frontier-adjacency joins)
        "deepwalk_walks",
        # PQ-ADC ANN: codebook train + encode + shortlist + rerank
        "pq_ann_topk",
        # BERT NSP pair generation (lead window + partner equi-join)
        "nsp_pairs",
        # image-text caption pairing over the flagship span stream
        "caption_pairs",
        # exact tie-aware ROC AUC (rollup-cumulative Mann-Whitney)
        "roc_auc_eval",
        # Nelson-Aalen repurchase hazard (censored waiting spells)
        "survival_hazard",
        # greedy k-center coreset (6 incremental-min-dist scans)
        "kcenter_coreset",
        # Snorkel-style LF coverage/overlap/conflict audit (one scan)
        "weak_label_report",
        # HRW shard placement + drop-one rebalance audit (one scan)
        "rendezvous_shards",
        # reliability-diagram calibration bins (one hash aggregate)
        "calibration_bins",
        # post-stratified causal effect (one hash agg + rollup math)
        "ipw_stratified_effect",
        # bounded Bellman-Ford weighted shortest paths (4 rounds)
        "sssp_weighted",
        # Newman modularity of the source partition (exact ppm)
        "modularity_score",
        # O(delta) incremental CC relabel (contracted-graph CC)
        "cc_incremental",
        # exact Kendall tau-a over the joint score rollup
        "kendall_tau_eval",
        # hop-strided audio PCM windowing (zero-shuffle mapInPandas)
        "audio_segments",
        # GSP sequential patterns (1 session shuffle + 1 agg/level)
        "seq_patterns",
        # SGNS pairs + CDF negative sampling (broadcast-only joins)
        "skipgram_negsamp",
        # composite-state landmark BFS -> harmonic centrality
        "harmonic_centrality",
        # decayed top-k (one agg + TakeOrdered) and row-local indices
        "trending_users",
        "readability_scores",
        # exact Pearson parts (one 1-row agg) + kappa agreement
        "corr_features",
        "cohens_kappa",
        # suffix prefix-doubling exact-substring dup spans (5 rounds)
        "substring_dup_spans",
        # SYNTHVID demux + hop frame sampling (zero-shuffle Arrow)
        "video_frames",
        # Boruvka MSF + CC rollup (iterative, pointer-jump contract)
        "msf_summary",
        # grid-DBSCAN density clusters (1 agg + CC over dense cells)
        "grid_dbscan",
        # exact hourly lerp imputation (one key shuffle, 2 windows)
        "events_interp_hourly",
        # equi-width histogram drift in exact ppm (one agg to 16 cells)
        "events_value_drift",
        # dendrogram K-cut clustering (MSF + TakeOrdered cut + CC)
        "single_linkage_clusters",
        # Benford first-digit audit (one agg to 10 cells)
        "benford_orders",
        # exact EWMA fold over per-key day spines (2 aggs, no window)
        "events_ewma_daily",
        # packed-BIGINT cooldown suppression fold (1 agg, no window)
        "alert_throttle",
        # DAG longest-path layering (iterative max-relaxation)
        "dag_layers",
        # exact tied-average-rank Spearman (rollup cumulatives + 1-row agg)
        "spearman_activity",
        # RFC 9309 robots longest-match gate (broadcast rules, no
        # corpus shuffle)
        "robots_filter",
        # CUPED variance-reduced A/B effect (1 unit agg + 2-row rollup)
        "cuped_effect",
        # COEC position-bias click model (1 window + curve broadcast)
        "coec_position_bias",
        # split-conformal thresholds (rank_for narrowing + audit agg)
        "conformal_thresholds",
        # k-truss edge peel (support recount rounds, prepared-memoized)
        "ktruss_edges",
        # XY-cut block/line segmentation + reading-order sort
        # (1 doc exchange + 3 sorts)
        "layout_reading_order",
        # sliding 7-day distinct actives (bounded-contribution explode)
        "rolling_active_users",
        # sample-ratio-mismatch chi-square gate (exact ppm)
        "srm_check",
        # balanced deterministic stratified k-fold (1 stratum window)
        "stratified_kfold",
        # greedy max-coverage selection (8 scans + TakeOrdered(1))
        "greedy_set_cover",
        # 2-round mean-pooling neighbor aggregation (exact div)
        "graph_feature_agg",
        # leave-one-out target encoding (1 category agg + rejoin)
        "loo_target_encoding",
        # minimal cover-window proximity top-k (O(n) sweep, 0 shuffles)
        "proximity_topk",
        # adjusted Rand index (1 contingency agg, exact signed ppm)
        "adjusted_rand_index",
        # join-view IVM refresh (three delta joins + union)
        "join_view_incremental",
        # TextTiling topic boundaries (1 doc window shuffle)
        "texttiling_boundaries",
        # Shapley channel attribution (1 bitmask agg + 16-row game)
        "shapley_attribution",
        # point-in-time feature join + leak audit (1 key exchange)
        "pit_feature_join",
    ):
        if want(name):
            timed(name, lambda n=name: _force(queries[n](spark, SF_DIR)))

    total = round(sum(timings.values()), 3)
    # round-over-round comparable subset: the query set bench carried
    # in round 4 — `value` grows every round as operators are added,
    # core_total tracks the same 12 queries across rounds
    _CORE = (
        "extract_synthetic",
        "extract_flagship",
        "exact_dedup",
        "minhash_near_dup",
        "simhash_sketch",
        "ann_cosine_topk",
        "tpch_pricing_summary",
        "events_hourly",
        "quality_scores",
        "lang_id",
        "dedup_clusters",
        "curation_e2e",
    )
    core_total = round(
        sum(timings[q] for q in _CORE if q in timings), 3
    )
    out = {
        "metric": "headline_total",
        "value": total,
        "core_total": core_total,
        "core_queries": [q for q in _CORE if q in timings],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "synthetic_docs": n_docs,
        "synthetic_spans": int(n_spans),
        "repeats": REPEATS,
        "queries_max_warm": max_warm,
        "cold_queries": cold,
    }
    # throughput only when the headline extraction query actually ran
    # (SPARK_GRAFT_ONLY subsets may exclude it)
    ext_sec = timings.get("extract_synthetic")
    if ext_sec:
        out["docs_per_sec"] = round(n_docs / ext_sec, 1)
        out["spans_per_sec"] = round(n_spans / ext_sec, 1)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
