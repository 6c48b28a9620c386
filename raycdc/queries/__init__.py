"""The general operator surface: one named query per implemented operator
family from SURVEY.md §2, each over the driver's testdata tables, plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and the flagship CDC replay.

``QUERIES`` maps name -> fn(sf_dir) -> Dataset|DataFrame|Table.
``ORACLE_SQL`` maps the SQL-expressible subset to DuckDB SQL over the same
parquet tables (views pre-registered by the driver). Column names match
between the two by construction.
"""

from __future__ import annotations

from raycdc.queries import (
    aggregates,
    analytics,
    ann,
    cdc,
    docs,
    events,
    graph,
    multimodal,
    neardup,
    scrub,
    sketches,
    tpch,
    tpch2,
    tpch3,
    traces,
)

# Registration order matters: the correctness driver verifies the FIRST 50
# entries of ``QUERIES`` each round (hard row cap, dict order).  Rounds 1-4
# spent that budget on the tpch/events families repeatedly, so 98 of the 198
# queries never received an official row.  ``_MODULES`` below is family
# priority for round 5: the never-officially-checked families first.
_MODULES = [
    cdc, multimodal, sketches, analytics, scrub, graph, traces, neardup,
    ann, docs, events, aggregates, tpch, tpch2, tpch3,
]

# Queries with at least one official green row in CORRECTNESS_r01..r04.
# These are pushed BEHIND the never-checked ones so the driver's 50-row cap
# converts preflight-green into official-green for the remaining families.
_OFFICIAL_GREEN = {
    'ann_bruteforce', 'ann_bruteforce_multi', 'ann_ivf', 'ann_lsh',
    'cdc_apply_events', 'cdc_conv_latest', 'cdc_conv_stats', 'cdc_replay',
    'cdc_replay_salted', 'conv_cumulative_stats', 'conv_daily_stats',
    'corpus_prep', 'customer_rfm_segments', 'customer_running_total',
    'customers_without_orders', 'dedup_exact', 'dedup_levenshtein_pairs',
    'dedup_minhash_pairs', 'dedup_simhash', 'dedup_simhash_hamming',
    'doc_chunks', 'doc_pack_offsets', 'docs_contamination',
    'docs_split_assign', 'docs_stratified_sample', 'embedding_neardup',
    'embedding_norms', 'events_asof_orders', 'events_audience_except',
    'events_burst_velocity', 'events_conversion_lag', 'events_cusum_drift',
    'events_daily_growth', 'events_daily_p50_p95',
    'events_daily_type_pivot', 'events_daily_type_unpivot',
    'events_funnel3', 'events_hourly_locf', 'events_hourly_stats',
    'events_latest_per_user', 'events_new_users_hourly',
    'events_path_trigrams', 'events_percent_rank', 'events_props_extract',
    'events_range_join_orders', 'events_rolling_window',
    'events_seasonal_outliers', 'events_sessionize', 'events_share_of_day',
    'events_time_weighted_avg', 'events_top_per_user',
    'events_trimmed_stats', 'events_type_hour_indep', 'events_type_stats',
    'events_type_transitions', 'events_user_daily', 'events_value_delta',
    'events_value_ntile', 'events_value_quantiles',
    'events_value_time_corr', 'fingerprints', 'lang_id', 'lang_stats',
    'lineitem_entity_views', 'lineitem_filter_spec', 'media_features',
    'nation_customer_stats', 'neardup_clusters', 'neardup_survivors',
    'ngram_jaccard_pairs', 'order_priority_count',
    'priority_distinct_customers', 'q10_returned_items',
    'q11_value_concentration', 'q12_late_shipments',
    'q13_customer_distribution', 'q14_promo_revenue', 'q15_top_supplier',
    'q16_supplier_part_counts', 'q17_small_quantity_revenue',
    'q18_large_volume_customers', 'q19_banded_revenue',
    'q1_pricing_summary', 'q20_window_concentrated_suppliers',
    'q21_sole_failed_supplier', 'q22_dormant_balances',
    'q2_min_cost_supplier', 'q3_top_orders', 'q5_nation_revenue',
    'q6_forecast_revenue', 'q7_volume_shipping', 'q8_market_share',
    'q9_product_profit', 'quality_scores', 'tfidf_top_terms',
    'token_counts', 'top_customers_by_revenue', 'urgent_revenue_bloom',
    'users_pareto_frontier', 'vocab_top_terms',
}

# Pinned head: the flagship replay gets an official row every round (the
# crown-jewel upsert path), and users_pareto_frontier re-verifies the r04
# red row's oracle-cast fix.
_PINNED = ['cdc_replay', 'users_pareto_frontier']

_merged: dict = {}
ORACLE_SQL: dict = {}
for _m in _MODULES:
    _merged.update(_m.QUERIES)
    ORACLE_SQL.update(getattr(_m, "ORACLE_SQL", {}))

QUERIES: dict = {_n: _merged[_n] for _n in _PINNED if _n in _merged}
for _n, _fn in _merged.items():
    if _n not in QUERIES and _n not in _OFFICIAL_GREEN:
        QUERIES[_n] = _fn
for _n, _fn in _merged.items():
    if _n not in QUERIES:
        QUERIES[_n] = _fn
