#!/usr/bin/env python3
"""Generate docs/SCALING.md from bench_full.json captures at
sf0.001 / sf0.01 / sf0.1 (10x data per step): per-query time and
step-growth ratios, classifying each operator's measured scaling.

The question this artifact answers with DATA instead of assertions:
which operators' cost grows with data volume, how fast, and is anything
super-linear that a 100 TB deployment would need to watch?

Fluke resistance (round 13 -- the round-12 doc let ONE noisy capture
reclassify healthy operators as "re-shape"):
 - each SF slot accepts a comma-separated LIST of captures; the per-query
   time is the MIN across captures of its probe-normalized seconds
   (norm_sec), so a single loaded session cannot flip a class;
 - a query that still classifies ~linear WITHOUT an inherent-cost note
   falls back to its round-11 adjudicated class (PRIOR_CLASSES) with a
   visible capture-variance annotation instead of an "UNDOCUMENTED --
   re-shape" marker; SUPER-LINEAR is never softened this way.

Override honesty (round 14 -- the round-13 fallback could reclassify a
GENUINE new ~linear regression as sublinear in the main table forever,
with the contradiction visible only in a secondary section):
 - the fallback only fires when the measured step-2 ratio is NEAR the
   sublinear boundary (<= 4.5x, i.e. 3.0x + capture noise); a query
   measuring well into linear territory keeps its measured class and
   renders the UNDOCUMENTED marker;
 - an overridden class renders as `sublinear*` IN the main table -- the
   marker, not a clean class name, is what the reader sees;
 - overrides persist per round in scripts/scaling_overrides.json; a
   query overridden in TWO consecutive rounds fails generation (exit 1)
   -- it must be re-adjudicated (LINEAR_NOTES entry or a plan fix), not
   carried on the prior class indefinitely.

Usage: gen_scaling.py <sf0001.json[,more...]> <sf001.json[,more...]> \\
                      <sf01.json[,more...]> > docs/SCALING.md
"""
import json
import os
import re
import sys

# measured step-2 ratios past this keep their measured ~linear class:
# the capture-variance argument only holds near the 3.0x class boundary
OVERRIDE_MAX_G2 = 4.5
LEDGER = os.path.join(os.path.dirname(__file__), "scaling_overrides.json")


def load_slot(paths):
    """Per-query min of probe-normalized seconds across the slot's
    captures (norm_sec ~ seconds at probe==1s; falls back to raw sec
    for pre-round-11 captures). A -1 (failed) trial is ignored unless
    the query failed in every capture."""
    caps = [json.load(open(p)) for p in paths.split(",")]
    qs = {}
    for c in caps:
        for k, v in c["queries"].items():
            t = v.get("norm_sec", v["sec"])
            if t < 0:
                qs.setdefault(k, [])
            else:
                qs.setdefault(k, []).append(t)
    return ({k: (min(v) if v else -1.0) for k, v in qs.items()},
            [c["calibration_sec"] for c in caps],
            [len(c["queries"]) for c in caps])


def main():
    slots = sys.argv[1:4]
    if len(slots) != 3:
        sys.exit(__doc__)
    loaded = [load_slot(s) for s in slots]
    qs = [l[0] for l in loaded]
    names = sorted(set(qs[0]) & set(qs[1]) & set(qs[2]))
    calibs = [c for l in loaded for c in l[1]]
    ncaps = [len(l[1]) for l in loaded]

    def classify(t1, t2, t3):
        # Sub-second at sf0.1: the job-scheduling floor dominates and
        # ratios are noise, not scaling signal.
        if t3 < 0.7:
            return "overhead-bound"
        g2 = t3 / t2 if t2 > 0 else float("inf")
        if g2 <= 3.0:
            return "sublinear"     # 10x data, <=3x time: parallelism wins
        if g2 <= 12.0:
            return "~linear"       # tracks data volume (10x +/- noise)
        return "SUPER-LINEAR"

    rows, counts, overrides = [], {}, []
    for n in names:
        t1, t2, t3 = qs[0][n], qs[1][n], qs[2][n]
        if min(t1, t2, t3) < 0:
            cls = "errored"
        else:
            cls = classify(t1, t2, t3)
        # capture-variance fallback: a ~linear read with no inherent-cost
        # note reverts to the adjudicated class (marked `*` in the main
        # table), because every such flip so far (q112 r12, q130,
        # q105...) dissolved against a second capture — but only when
        # the measured ratio sits NEAR the class boundary; a reading
        # deep in linear territory is a real regression and stands.
        # SUPER-LINEAR always stands.
        if cls == "~linear" and n not in LINEAR_NOTES:
            prior = PRIOR_CLASSES.get(n)
            g2m = t3 / t2 if t2 > 0 else float("inf")
            if prior in ("overhead-bound", "sublinear") \
                    and g2m <= OVERRIDE_MAX_G2:
                overrides.append((n, t3, g2m, prior))
                cls = prior + "*"
        counts[cls] = counts.get(cls, 0) + 1
        g1 = t2 / t1 if t1 > 0 else float("nan")
        g2 = t3 / t2 if t2 > 0 else float("nan")
        rows.append((t3, n, t1, t2, g1, g2, cls))
    rows.sort(reverse=True)

    print("# Measured scaling (generated by scripts/gen_scaling.py)")
    print()
    print("Per-query PROBE-NORMALIZED seconds at sf0.001 / sf0.01 / sf0.1")
    print("(10x rows per step, local[32]); each cell is the MIN across this")
    print("round's captures of norm_sec (seconds at calibration probe = 1s),")
    print("so neither host load nor a single noisy session moves a class.")
    print("Captures per slot: " + "/".join(str(n) for n in ncaps) + ".")
    print("Growth = time ratio per 10x data step. Sub-0.7s queries at sf0.1")
    print("are classified overhead-bound: the fixed Spark job-scheduling")
    print("floor dominates and their ratios are noise. A sublinear step")
    print("(10x data, <=3x time) means the extra rows were absorbed by the")
    print("32 cores; ~linear tracks volume; SUPER-LINEAR (>12x per step")
    print("above 0.7s) is the class a 100 TB deployment must re-shape.")
    print("Calibration probes per capture (host-load control): "
          + ", ".join(f"{c['before']:.2f}/{c['after']:.2f}s"
                      for c in calibs) + ".")
    print()
    summary = ", ".join(f"{v} {k}" for k, v in sorted(counts.items()))
    print(f"Classification counts: {summary}.")
    print()
    print("| query | sf0.001 | sf0.01 | sf0.1 | x per 10x (step 1) | "
          "x per 10x (step 2) | class |")
    print("|---|---|---|---|---|---|---|")
    for t3, n, t1, t2, g1, g2, cls in rows:
        print(f"| {n} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {g1:.1f}x | "
              f"{g2:.1f}x | {cls} |")

    if overrides:
        print()
        print("## Capture-variance overrides")
        print()
        print("These queries read ~linear in this round's min-of-captures but")
        print("carry no inherent-cost note and sit near the class boundary")
        print(f"(step-2 <= {OVERRIDE_MAX_G2}x); their class reverts to the")
        print("round-11 adjudication, rendered `class*` in the main table so")
        print("it never silently contradicts the measured numbers. A query")
        print("overridden two rounds running FAILS generation -- it must be")
        print("re-adjudicated (LINEAR_NOTES entry or a plan fix).")
        print()
        for n, t3, g2, prior in overrides:
            print(f"- `{n}` ({t3:.1f}s at sf0.1, step-2 {g2:.1f}x): "
                  f"kept `{prior}*` (adjudicated r11)")

    lin = [r for r in rows if r[6] == "~linear"]
    if lin:
        print()
        print("## Why the ~linear queries are ~linear")
        print()
        print("Each tracks data volume because its WORK is the data: the")
        print("cost is per-item content, not a shuffle or driver artifact.")
        print()
        for t3, n, *_ in lin:
            note = LINEAR_NOTES.get(
                n, "per-row/content-proportional work -- UNDOCUMENTED: "
                   "add a note to LINEAR_NOTES or re-shape the operator")
            print(f"- `{n}` ({t3:.1f}s at sf0.1): {note}")

    # ---- override ledger: an override that repeats in consecutive
    # rounds is no longer capture variance, it is an unadjudicated
    # drift — fail generation (the doc above is already fully written)
    rounds = [int(x) for x in re.findall(r"r(\d+)", slots[2])]
    if rounds:
        rnd = max(rounds)  # slots may mix prior-round sibling captures
        try:
            ledger = json.load(open(LEDGER))
        except (FileNotFoundError, json.JSONDecodeError):
            ledger = {}
        ledger[str(rnd)] = sorted(n for n, *_ in overrides)
        json.dump(ledger, open(LEDGER, "w"), indent=1)
        repeat = set(ledger[str(rnd)]) & set(ledger.get(str(rnd - 1), []))
        if repeat:
            print(f"FATAL: overridden two rounds running (r{rnd - 1}, "
                  f"r{rnd}): {sorted(repeat)} -- re-adjudicate "
                  "(LINEAR_NOTES or plan fix)", file=sys.stderr)
            sys.exit(1)


# inherent-cost notes for queries that legitimately track data volume;
# a ~linear query WITHOUT a note renders an UNDOCUMENTED marker so a
# newly-linear operator can't slip into the study unexplained
LINEAR_NOTES = {
    "d18_assortment_match":
        "posting-list join cost is sum over parts of cust(p)*supp(p) — "
        "the pair volume itself grows with data (adjudicated r7/r8)",
    "d13_substring_spans":
        "positional shingle spans: candidate span pairs grow with "
        "document content (adjudicated r8)",
    "q91_order_stats":
        "percentile battery: percentile_cont sorts grow with rows "
        "(adjudicated r8)",
    "d11_edit_verify":
        "exact Levenshtein over blocked candidate pairs — verify work "
        "is proportional to candidates (adjudicated r8)",
    "d09_repeated_passages":
        "positional shingle posting lists — repeated-span volume grows "
        "with corpus text (same family as d13)",
    "q86_quantile_sketch":
        "computes the EXACT percentile battery alongside the sketch "
        "for the error audit — the exact side sorts per group (q91's "
        "cost); the sketch alone is the one-pass scale path",
    "q71_arg_extremes":
        "single map-side-combined argmin/argmax pass — work is one "
        "comparison per row by definition (~1s absolute)",
    "q34_percentiles":
        "exact interpolated percentiles sort per group (q86/x23 hold "
        "the registered sketch twins; ~1s absolute)",
    "t23_readability":
        "syllable/word/sentence counts touch every character of every "
        "document (content-proportional projection, sub-second)",
    "q46_hash_sample":
        "md5 evaluated per row for the deterministic sample gate "
        "(content-proportional projection, sub-second)",
    "q138_bootstrap_ci":
        "32 Poisson replicas accumulate per row: work = 32x rows by "
        "construction, one pass, map-side combined",
    "d05_ngram_jaccard":
        "shingle-set intersection over blocked candidate pairs — "
        "pair content volume grows with corpus text",
    "t22_ngram_novelty":
        "distinct per-doc 5-gram shingles explode with corpus text; "
        "only (shingle, doc) pairs shuffle, min-agg map-side combined",
    "t11_bigram_logprob":
        "per-doc bigram term frequencies grow with tokens; posting-"
        "list equi-joins only, hash-aggs map-side combined (t08 skeleton)",
    "x07_cluster_reps":
        "rides d03's iterated label propagation (cost documented "
        "there); the selection step itself is one exchange",
    "t04_text_rolling_hash":
        "rolling hash touches every character of every document "
        "(sub-second absolute; content-proportional projection)",
    "t02_text_quality":
        "per-document regex/stopword scans over full text "
        "(sub-second absolute; content-proportional projection)",
    "t06_pii_redact":
        "PII regex scrub over full text (sub-second absolute; "
        "content-proportional projection)",
}

# round-11 adjudicated classes (docs/SCALING.md @ 890725a) -- the
# capture-variance fallback for note-less ~linear reads; regenerate
# only from a LOW-NOISE round whose classes were judge-adjudicated
PRIOR_CLASSES = {
    'd01_dedup_exact': 'sublinear',
    'd02_dedup_fingerprint': 'overhead-bound',
    'd03_dedup_minhash_lsh': 'sublinear', 'd04_dedup_simhash': 'sublinear',
    'd05_ngram_jaccard': 'sublinear', 'd06_dedup_embedding': 'sublinear',
    'd07_embedding_pairs': 'sublinear',
    'd08_dedup_pairs_bucketed': 'sublinear',
    'd09_repeated_passages': '~linear',
    'd10_incremental_dedup': 'sublinear', 'd11_edit_verify': '~linear',
    'd12_minhash_calibration': 'sublinear',
    'd13_substring_spans': 'sublinear',
    'd14_dedup_threshold_sweep': 'sublinear',
    'd15_cluster_sizes': 'sublinear', 'd16_semantic_prune': 'sublinear',
    'd17_method_agreement': 'sublinear', 'd18_assortment_match': '~linear',
    'm01_multimodal_meta': 'overhead-bound',
    'm02_multimodal_features': 'overhead-bound',
    'm03_frame_sample': 'overhead-bound', 'm04_media_neardup': 'sublinear',
    'm05_vad_segments': 'sublinear', 'm06_cdc_chunk_dedup': 'sublinear',
    'm07_interleaved_pack': 'sublinear', 'm08_aspect_buckets': 'sublinear',
    'm09_segment_dedup': 'sublinear',
    'q01_pricing_summary': 'overhead-bound',
    'q02_filter_project': 'overhead-bound', 'q03_join_agg': 'sublinear',
    'q04_semi_join': 'sublinear', 'q05_anti_join': 'overhead-bound',
    'q06_broadcast_join': 'overhead-bound',
    'q07_conditional_agg': 'overhead-bound',
    'q08_topk_per_group': 'sublinear', 'q09_window_analytic': 'sublinear',
    'q100_twap': 'sublinear', 'q101_asof_native': 'overhead-bound',
    'q102_rfm_segments': 'sublinear', 'q103_cohort_ltv': 'sublinear',
    'q104_cusum_changepoint': 'sublinear',
    'q105_mutual_top_partner': 'sublinear', 'q106_ab_lift': 'sublinear',
    'q107_conversion_lag': 'overhead-bound',
    'q108_funnel_trend': 'sublinear', 'q109_band_native': 'overhead-bound',
    'q10_rollup': 'sublinear', 'q110_rarity_score': 'sublinear',
    'q111_beaconing': 'sublinear', 'q112_first_seen': 'sublinear',
    'q113_pareto': 'sublinear', 'q114_source_gini': 'overhead-bound',
    'q115_weekday_profile': 'overhead-bound',
    'q116_basket_lift': 'sublinear', 'q117_mad_outliers': 'sublinear',
    'q118_price_volume_bridge': 'sublinear',
    'q119_holt_forecast': 'sublinear', 'q11_cube': 'sublinear',
    'q120_kcore': 'sublinear', 'q121_multitouch_attribution': 'sublinear',
    'q122_order_backlog': 'sublinear', 'q123_dau_mau': 'sublinear',
    'q124_retention_decay': 'sublinear',
    'q125_archive_pushdown': 'overhead-bound',
    'q126_timed_funnel': 'sublinear',
    'q127_amount_reconciliation': 'sublinear',
    'q128_burn_rate': 'sublinear', 'q129_session_gap_sweep': 'sublinear',
    'q12_distinct_agg': 'sublinear', 'q130_leaderboard_churn': 'sublinear',
    'q131_sla_attainment': 'sublinear', 'q132_supplier_hhi': 'sublinear',
    'q133_trade_matrix': 'sublinear',
    'q134_sales_opportunity': 'sublinear',
    'q135_market_share': 'sublinear', 'q136_return_rates': 'sublinear',
    'q137_psi_drift': 'sublinear', 'q138_bootstrap_ci': '~linear',
    'q139_interp_join': 'sublinear', 'q13_sort_limit': 'overhead-bound',
    'q140_cuped_lift': 'sublinear', 'q141_rank_battery': 'overhead-bound',
    'q142_archive_agg_pushdown': 'overhead-bound',
    'q143_survival_km': 'sublinear',
    'q144_archive_group_pushdown': 'overhead-bound',
    'q145_seasonal_decompose': 'sublinear',
    'q146_url_analytics': 'sublinear', 'q147_theilsen': 'sublinear',
    'q148_chi_square': 'overhead-bound',
    'q149_mann_whitney': 'overhead-bound',
    'q14_setop_union': 'overhead-bound',
    'q150_partition_planner': 'overhead-bound',
    'q151_skipping_audit': 'sublinear',
    'q152_label_communities': 'sublinear',
    'q153_fifo_allocation': 'sublinear',
    'q154_autocorrelation': 'sublinear',
    'q156_encoding_advisor': 'sublinear', 'q157_fanout_audit': 'sublinear',
    'q158_late_blame': 'sublinear', 'q159_weighted_median': 'sublinear',
    'q15_setop_intersect': 'overhead-bound',
    'q160_max_drawdown': 'overhead-bound', 'q161_dq_rules': 'sublinear',
    'q162_dp_release': 'overhead-bound', 'q163_two_hop': 'sublinear',
    'q164_anf_sketch': 'sublinear', 'q165_product_profit': 'sublinear',
    'q166_abc_xyz': 'sublinear', 'q167_event_dq': 'overhead-bound',
    'q168_ir_metrics': 'sublinear', 'q169_feature_relevance': 'sublinear',
    'q16_setop_except': 'sublinear', 'q170_log_templates': 'sublinear',
    'q171_change_point': 'sublinear', 'q172_markov_eval': 'sublinear',
    'q173_forecast_backtest': 'sublinear',
    'q174_robust_outliers': 'sublinear', 'q175_join_estimate': 'sublinear',
    'q176_stl_anomaly': 'sublinear', 'q177_custdist': 'sublinear',
    'q178_large_orders': 'sublinear',
    'q179_decayed_popularity': 'sublinear',
    'q17_string_funcs': 'overhead-bound',
    'q180_harmonic_centrality': 'sublinear', 'q181_tier_plan': 'sublinear',
    'q182_skyline': 'overhead-bound', 'q183_important_stock': 'sublinear',
    'q184_sequential_ab': 'sublinear', 'q185_median_ci': 'sublinear',
    'q186_assortativity': 'sublinear',
    'q187_higher_moments': 'overhead-bound', 'q188_ks_test': 'sublinear',
    'q18_date_funcs': 'overhead-bound', 'q190_top_supplier': 'sublinear',
    'q191_archive_limit_pushdown': 'overhead-bound',
    'q192_archive_topn_pushdown': 'overhead-bound',
    'q193_archive_runtime_prune': 'overhead-bound',
    'q194_archive_keygrouped': 'sublinear',
    'q195_volume_dominant_supplier': 'sublinear',
    'q196_disjunctive_join': 'overhead-bound',
    'q197_small_order_revenue': 'overhead-bound',
    'q198_cheapest_supplier': 'sublinear',
    'q199_returned_item_ranking': 'overhead-bound',
    'q19_math_funcs': 'overhead-bound', 'q200_promo_revenue': '~linear',
    'q201_supplier_diversity': 'sublinear', 'q20_json_funcs': '~linear',
    'q21_case_when': 'overhead-bound', 'q22_grouping_sets': 'sublinear',
    'q23_array_funcs': 'overhead-bound', 'q25_asof_join': 'sublinear',
    'q26_range_join': 'overhead-bound', 'q27_approx_distinct': 'sublinear',
    'q28_map_funcs': 'overhead-bound', 'q29_outer_join': 'overhead-bound',
    'q30_full_outer_join': 'sublinear', 'q31_udaf_geomean': 'sublinear',
    'q32_explode_wordcount': 'overhead-bound',
    'q33_range_frame': 'sublinear', 'q34_percentiles': '~linear',
    'q35_stats': 'overhead-bound', 'q36_salted_agg': 'sublinear',
    'q37_sessionize': 'sublinear', 'q38_pivot': 'overhead-bound',
    'q39_unpivot': 'overhead-bound', 'q40_window_nav': 'sublinear',
    'q41_collect_agg': 'sublinear',
    'q42_correlated_subquery': 'overhead-bound',
    'q43_string_funcs2': 'overhead-bound',
    'q44_math_funcs2': 'overhead-bound', 'q45_date_funcs2': '~linear',
    'q46_hash_sample': '~linear', 'q47_recursive_cte': 'sublinear',
    'q48_scd2': 'sublinear', 'q49_bloom_prune_join': 'sublinear',
    'q50_histogram': 'overhead-bound',
    'q51_not_in_nulls': 'overhead-bound', 'q52_lateral_topn': 'sublinear',
    'q53_profile': 'sublinear', 'q54_dist_windows': 'sublinear',
    'q55_gap_fill': 'sublinear', 'q56_ohlc': 'sublinear',
    'q57_funnel': 'sublinear', 'q58_retention': 'sublinear',
    'q59_value_deciles': 'sublinear', 'q60_anomaly_zscore': 'sublinear',
    'q61_markov_transitions': 'sublinear',
    'q62_session_paths': 'sublinear',
    'q63_series_correlation': 'sublinear', 'q64_ewma': 'overhead-bound',
    'q65_autocorrelation': 'overhead-bound',
    'q66_heavy_hitters': 'sublinear', 'q67_sketch_rollup': 'sublinear',
    'q68_attribution': 'sublinear', 'q69_star_join': 'sublinear',
    'q70_event_dedup': 'sublinear', 'q71_arg_extremes': 'sublinear',
    'q72_regression': 'overhead-bound', 'q73_copurchase_rank': 'sublinear',
    'q74_variant_extract': 'sublinear',
    'q75_hof_battery': 'overhead-bound', 'q76_zorder_layout': 'sublinear',
    'q77_group_heavy_hitters': 'sublinear', 'q78_snapshot_diff': '~linear',
    'q79_exists_chain': '~linear', 'q80_sliding_distinct': 'sublinear',
    'q81_triangles': 'sublinear', 'q82_bfs_levels': 'sublinear',
    'q83_peak_concurrency': 'sublinear', 'q84_interval_join': 'sublinear',
    'q85_decile_mobility': 'sublinear', 'q86_quantile_sketch': 'sublinear',
    'q87_deletion_plan': 'sublinear', 'q88_incremental_view': 'sublinear',
    'q89_asof_directions': 'sublinear', 'q90_seasonal_naive': 'sublinear',
    'q91_order_stats': '~linear', 'q92_skew_audit': 'sublinear',
    'q93_sketch_overlap': 'sublinear', 'q94_fk_audit': 'sublinear',
    'q95_rolling_quantiles': 'sublinear',
    'q96_connected_components': 'sublinear',
    'q97_merge_apply': 'sublinear', 'q98_link_prediction': 'sublinear',
    'q99_benford_audit': 'sublinear', 's01_sim_topk': 'sublinear',
    's02_sim_ann_lsh': 'sublinear', 's03_sim_ann_ivf': 'sublinear',
    's04_sim_ann_pq': 'sublinear', 's05_label_centroids': 'sublinear',
    's06_cluster_cohesion': 'sublinear',
    's07_centroid_outliers': 'sublinear', 's08_sim_mmr': 'sublinear',
    's09_knn_graph': 'sublinear', 's10_sim_radius': 'sublinear',
    's11_hybrid_rrf': 'sublinear', 's12_embedding_drift': 'sublinear',
    's13_sim_ann_ivfpq': 'sublinear', 's14_sim_matryoshka': 'sublinear',
    's15_ivf_nprobe_sweep': 'sublinear',
    's16_filtered_topk': 'overhead-bound', 's17_sim_ann_sq8': 'sublinear',
    's18_embedding_audit': 'overhead-bound', 's19_graph_walk': 'sublinear',
    's20_beam_sweep': 'sublinear', 's22_kcenter_coreset': 'sublinear',
    't01_text_langid': 'sublinear', 't02_text_quality': 'sublinear',
    't03_text_tokens': 'overhead-bound',
    't04_text_rolling_hash': 'sublinear', 't05_text_tfidf': 'sublinear',
    't06_pii_redact': 'sublinear', 't07_repetition': 'sublinear',
    't08_unigram_logprob': 'sublinear', 't09_token_entropy': 'sublinear',
    't10_gopher_rules': 'sublinear', 't11_bigram_logprob': 'sublinear',
    't12_collocations': 'sublinear', 't13_langid_confusion': 'sublinear',
    't14_chunking': 'overhead-bound', 't15_corpus_datasheet': 'sublinear',
    't16_chunk_dedup': 'sublinear', 't17_quality_classifier': 'sublinear',
    't18_ppl_buckets': 'sublinear', 't19_bpe_pairs': 'overhead-bound',
    't20_bpe_tokenize': 'sublinear', 't21_drift_report': 'sublinear',
    't22_ngram_novelty': 'sublinear', 't23_readability': 'overhead-bound',
    't24_lexical_richness': 'overhead-bound',
    't25_zipf_slope': 'overhead-bound',
    't26_quality_threshold_sweep': 'sublinear',
    't27_distinctive_terms': 'overhead-bound',
    'x01_decontaminate': 'sublinear',
    'x02_stratified_sample': 'overhead-bound',
    'x03_domain_mix': 'overhead-bound',
    'x04_decontaminate_fuzzy': 'sublinear',
    'x05_weighted_sample': 'overhead-bound',
    'x06_pack_sequences': 'sublinear',
    'x07_cluster_reps': 'overhead-bound',
    'x08_temperature_mix': 'overhead-bound',
    'x09_leakage_split': 'overhead-bound',
    'x10_curation_pipeline': 'sublinear',
    'x11_bloom_decontaminate': 'sublinear',
    'x12_compaction_plan': 'overhead-bound', 'x13_epoch_plan': 'sublinear',
    'x14_k_anonymity': 'sublinear', 'x15_dsir_weights': 'sublinear',
    'x16_shard_plan': 'sublinear', 'x17_modality_agreement': 'sublinear',
    'x18_curriculum_plan': 'sublinear', 'x19_token_budget': 'sublinear',
    'x20_dedup_aware_sample': 'overhead-bound',
    'x21_post_dedup_rebalance': 'sublinear',
    'x22_context_sweep': 'overhead-bound',
    'x23_dedup_sample_sketch': 'overhead-bound',
    'x24_largest_remainder': 'sublinear',
    'x25_epoch_shuffle_audit': 'sublinear'
}


if __name__ == "__main__":
    main()
