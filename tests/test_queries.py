"""Driver-style conformance: run every SQL-backed query through Ray AND its
DuckDB oracle on the same parquet dir, compare row count + schema +
order-insensitive values (mirrors the graft driver's CORRECTNESS check).
Non-SQL queries get determinism/shape checks."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("RAYCDC_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows sorted
    by all columns, ts normalized."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            # normalize nan→None so object-column null equality is stable
            # across pandas versions (FutureWarning: nan vs None compare)
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _sql_backed():
    from raycdc.queries import ORACLE_SQL, QUERIES

    return sorted(ORACLE_SQL), QUERIES, ORACLE_SQL


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
        "order_priority_count", "top_customers_by_revenue",
        "lineitem_filter_spec", "customer_running_total",
        "nation_customer_stats", "events_latest_per_user",
        "events_hourly_stats", "events_user_daily", "events_type_stats",
        "events_sessionize", "dedup_exact", "token_counts", "lang_stats",
        "ann_bruteforce", "embedding_norms", "embedding_neardup",
        "cdc_apply_events", "lineitem_entity_views", "events_asof_orders",
        "priority_distinct_customers", "quality_scores", "lang_id",
        "ngram_jaccard_pairs", "fingerprints", "dedup_minhash_pairs",
        "dedup_simhash", "dedup_simhash_hamming", "media_features",
        "doc_chunks", "events_props_extract", "ann_bruteforce_multi",
        "corpus_prep", "trace_flatten", "media_resize", "video_frame_sample",
        "events_rolling_window", "events_range_join_orders",
        "events_top_per_user", "vocab_top_terms", "docs_stratified_sample",
        "tfidf_top_terms", "customers_without_orders",
        "events_value_quantiles", "neardup_clusters",
        "events_daily_type_pivot", "events_value_outliers",
        "hll_registers", "hll_daily_users",
        "heavy_hitter_users", "cms_registers", "value_quantile_sketch",
        "docs_normalize",
        "events_funnel", "events_rollup", "events_value_histogram",
        "user_retention_cohorts", "urgent_revenue_bloom",
        "dedup_levenshtein_pairs", "docs_split_assign", "doc_pack_offsets",
        "docs_contamination", "media_content_dedup", "media_phash_neardup",
        "docs_weighted_sample", "docs_lm_familiarity",
        "docs_dup_spans", "graph_pagerank", "graph_cosupply_pairs",
        "q10_returned_items", "ann_quantized", "events_range_layout",
        "events_session_concurrency", "events_value_mad_outliers",
        "video_scene_changes", "q6_forecast_revenue", "events_type_moments",
        "q7_volume_shipping", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier",
        "q17_small_quantity_revenue", "q18_large_volume_customers",
        "q19_banded_revenue", "q8_market_share", "events_trimmed_stats",
        "events_group_sample", "dedup_prefix_jaccard",
        "events_new_users_hourly", "q22_dormant_balances",
        "q16_supplier_part_counts", "q21_sole_failed_supplier",
        "events_cube", "events_value_ntile", "graph_triangles",
        "docs_char_budget", "events_share_of_day",
        "events_value_time_corr", "q11_value_concentration",
        "users_pareto_frontier", "events_audience_except",
        "events_daily_growth", "docs_length_clip", "label_doc_stats",
        "events_time_weighted_avg", "events_type_transitions",
        "trace_depth_stats", "events_conversion_lag",
        "events_daily_type_unpivot", "events_type_hour_indep",
        "events_daily_p50_p95", "events_funnel3",
        "customer_rfm_segments", "events_daily_gini",
        "q2_min_cost_supplier", "q9_product_profit", "q12_late_shipments",
        "q20_window_concentrated_suppliers", "events_session_overlap",
        "events_percent_rank", "events_rolling_median",
        "events_user_modal_type", "hll_user_overlap", "graph_bfs_hops",
        "events_type_assoc", "token_counts_bpe", "events_hourly_locf",
        "docs_filter_funnel", "docs_dedup_cut", "docs_vocab_drift",
        "docs_distinct_ngrams", "docs_bpe_pairs", "docs_curation_pipeline", "docs_langid_confusion",
        "docs_freq_spectrum", "events_seasonal_outliers", "events_path_trigrams",
        "events_burst_velocity", "events_cusum_drift",
        "graph_label_prop",
    ],
)
def test_sql_backed_query_matches_oracle(ray_session, name):
    from raycdc.queries import ORACLE_SQL, QUERIES

    got = canon(to_df(QUERIES[name](SF_DIR)))
    want = canon(duck(ORACLE_SQL[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_media_phash_pairs_planted_reencodes(ray_session):
    """The planted 're-encoded' variants are BYTE-different from their
    originals (exact content addressing cannot pair them) yet land in the
    original's perceptual group — the case that motivates pHash dedup."""
    from raycdc.queries import QUERIES
    from raycdc.queries.multimodal import (
        PHASH_VARIANT_EVERY,
        attach_blob_variants,
    )

    blobs = attach_blob_variants(SF_DIR).to_pandas()
    orig = blobs[blobs.variant == 0].set_index("doc_id")["media"]
    var = blobs[blobs.variant == 1].set_index("doc_id")["media"]
    assert len(var) > 0
    assert (var.index % PHASH_VARIANT_EVERY == 0).all()
    differing = sum(var[d] != orig[d] for d in var.index)
    assert differing >= 0.9 * len(var), "swaps should change bytes"

    df = to_df(QUERIES["media_phash_neardup"](SF_DIR))
    got_pairs = df[df.variant == 1].set_index("doc_id")["phash"]
    assert set(got_pairs.index) == set(var.index)  # every variant grouped
    oph = df[df.variant == 0].drop_duplicates("doc_id").set_index("doc_id")[
        "phash"
    ]
    assert (oph.reindex(got_pairs.index) == got_pairs).all()


def test_registry_covers_all_oracle_entries():
    from raycdc.queries import ORACLE_SQL, QUERIES

    assert set(ORACLE_SQL) <= set(QUERIES)
    assert len(QUERIES) >= 25


def test_hll_overlap_estimate_tracks_exact(ray_session):
    """The register algebra's payoff: |A| + |B| − |A∪B| from the three
    register tables tracks the EXACT segment intersection (small-range
    linear-counting regime at test scale → tight)."""
    from raycdc.queries import QUERIES
    from raycdc.queries.sketches import HLL_SPLIT_DAY, hll_estimate

    regs = to_df(QUERIES["hll_user_overlap"](SF_DIR))
    est = {
        s: hll_estimate(regs[regs["segment"] == s])
        for s in ("a", "b", "union")
    }
    inter_est = est["a"] + est["b"] - est["union"]
    exact = duck(f"""
        SELECT count(*) AS n FROM (
          SELECT user_id FROM events WHERE EXTRACT(day FROM ts) < {HLL_SPLIT_DAY}
          INTERSECT
          SELECT user_id FROM events WHERE EXTRACT(day FROM ts) >= {HLL_SPLIT_DAY})
    """)["n"].iloc[0]
    assert abs(inter_est - exact) <= max(5.0, 0.3 * float(exact))


def test_ann_mmr_matches_sql_oracle(ray_session):
    """MMR greedy vs the unrolled-CTE SQL oracle; also pins that diversity
    actually re-ranks (the MMR order differs from pure relevance order
    past rank 1) while rank 1 IS the relevance winner."""
    from raycdc.queries import ORACLE_SQL, QUERIES
    from raycdc.queries.ann import MMR_K

    got = to_df(QUERIES["ann_mmr"](SF_DIR)).reset_index(drop=True)
    want = duck(ORACLE_SQL["ann_mmr"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, rtol=0, atol=0
    )
    assert len(got) == MMR_K
    by_rel = got.sort_values(
        ["iscore", "vec_id"], ascending=[False, True], kind="stable"
    )["vec_id"].tolist()
    assert got["vec_id"].iloc[0] == by_rel[0]
    assert got["vec_id"].tolist() != by_rel  # diversity re-ranked something


def test_kmeans_refine_matches_sql_oracle(ray_session):
    """One distributed Lloyd step vs the DuckDB oracle (assignment from
    centroid literals + int8-law update numerators); also pins that every
    corpus row is accounted for and that the refined numerators actually
    move at least one centroid (the step does work)."""
    import numpy as np

    from raycdc.queries import QUERIES
    from raycdc.queries.ann import (
        KM_SUM_DIMS,
        QSCALE,
        _train_centroids,
        build_ann_oracle_sql,
    )

    got = canon(to_df(QUERIES["kmeans_refine"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["kmeans_refine"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{SF_DIR}/embeddings.parquet").metadata.num_rows
    assert got["n_members"].sum() == n
    cent = _train_centroids(SF_DIR)
    old_q = np.clip(
        np.floor(cent[:, :KM_SUM_DIMS] * QSCALE + 0.5), -127, 127
    )
    new_mean = (
        got[[f"sq{j}" for j in range(KM_SUM_DIMS)]].to_numpy()
        / got["n_members"].to_numpy()[:, None]
    )
    assert np.abs(new_mean - old_q[got["cluster_id"].to_numpy()]).max() > 0


def test_semdedup_matches_sql_oracle(ray_session):
    """Cluster-bucketed semantic dedup vs the DuckDB oracle replaying
    assignment (centroid literals) + the correlated same-cluster EXISTS;
    also pins that flagged dups exist (non-trivial at every tier) and
    that keep-first semantics hold (lowest vec_id of a cluster never
    flagged)."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["semdedup"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["semdedup"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)
    assert got["is_dup"].sum() > 0
    first = got.sort_values("vec_id").groupby("ivf_list").first()
    assert (first["is_dup"] == 0).all()


def test_ann_ivf_matches_sql_oracle(ray_session):
    """IVF output vs a DuckDB oracle carrying the deterministically-trained
    centroids as literals (assignment + nprobe search expressed in SQL)."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_ivf"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_ivf"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_knn_graph_matches_sql_oracle(ray_session):
    """Per-list kNN graph vs the DuckDB self-join oracle over the same
    deterministic list assignment (centroids embedded as literals)."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_knn_graph"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_knn_graph"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_ivf_layout_matches_sql_oracle(ray_session):
    """Persisted-layout occupancy (footer-metadata counts per inverted
    list) vs the oracle's centroid-literal assignment counts."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_ivf_layout"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_ivf_layout"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ann_ivf_search_prunes_io(ray_session):
    """The point of the persisted layout: the search's candidate read must
    touch ≤ nprobe/N_CENTROIDS of the corpus (footer row counts of the
    probed partition files vs the base table), with slack only for
    occupancy skew — and the layout build must be cached (second call
    returns the published dir without rebuilding)."""
    import pyarrow.parquet as pq

    from raycdc.queries.ann import (
        N_CENTROIDS,
        NPROBE,
        _probe_lists,
        _probe_paths,
        _query_vec,
        ivf_layout,
    )

    lay = ivf_layout(SF_DIR)
    assert ivf_layout(SF_DIR) == lay  # cached: no rebuild
    cent = np.load(os.path.join(lay, "centroids.npy"))
    probe = _probe_lists(cent, _query_vec(SF_DIR))
    assert len(probe) == NPROBE
    files = _probe_paths(lay, probe)
    probed = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    total = pq.ParquetFile(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).metadata.num_rows
    frac = probed / total
    assert frac <= (NPROBE / N_CENTROIDS) * 1.5, (
        f"candidate IO not pruned: reads {probed}/{total} = {frac:.3f}"
    )


def test_ann_ivf_multi_matches_sql_oracle(ray_session):
    """Batched multi-query IVF over the persisted layout vs a DuckDB oracle
    carrying the trained centroids and every query's probe list."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_ivf_multi"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_ivf_multi"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_lsh_indexed_matches_sql_oracle(ray_session):
    """The persisted-layout LSH search must return EXACTLY what the
    full-scan ann_lsh (and its SQL oracle) returns — same any-band
    candidate set, same exact-cosine top-k."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_lsh_indexed"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_lsh_indexed"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_lsh_indexed_prunes_io(ray_session):
    """The point of the per-band layout: the probed buckets' parquet files
    hold ≈ NBANDS/2^BAND_BITS of the EXPLODED table (= the corpus's
    any-band candidate mass) — file-level pruning, with slack only for
    bucket-occupancy skew — and the build is cached."""
    import pyarrow.parquet as pq

    from raycdc.queries.ann import (
        LSH_BAND_BITS,
        LSH_NBANDS,
        _band_codes,
        _lsh_bucket_ids,
        _lsh_bucket_paths,
        _lsh_planes,
        _query_vec,
        lsh_layout,
    )

    lay = lsh_layout(SF_DIR)
    assert lsh_layout(SF_DIR) == lay  # cached: no rebuild
    q = _query_vec(SF_DIR)
    buckets = [
        int(b) for b in _lsh_bucket_ids(_band_codes(q[None, :], _lsh_planes()))[0]
    ]
    assert len(buckets) == LSH_NBANDS
    files = _lsh_bucket_paths(lay, buckets)
    probed = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    total = pq.ParquetFile(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).metadata.num_rows
    # one bucket per band holds ≈ N/2^BAND_BITS corpus rows; probing NBANDS
    # of them reads ≈ NBANDS/2^BAND_BITS of the corpus
    frac = probed / total
    expect = LSH_NBANDS / (1 << LSH_BAND_BITS)
    assert frac <= expect * 2.0, (
        f"candidate IO not pruned: reads {probed}/{total} = {frac:.3f} "
        f"(expected ≈{expect:.3f})"
    )


def test_ann_lsh_matches_sql_oracle(ray_session):
    """Hyperplane-LSH ANN vs a DuckDB oracle carrying the (data-independent)
    hyperplanes and the query's band codes as literals."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_lsh"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_lsh"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_lsh_recall_vs_bruteforce(ray_session):
    """Any-band match keeps high-cosine rows with high probability; a broken
    signer would show up as near-zero overlap with the exact top-k."""
    from raycdc.queries import QUERIES

    bf = to_df(QUERIES["ann_bruteforce"](SF_DIR))
    lsh = to_df(QUERIES["ann_lsh"](SF_DIR))
    recall = len(set(lsh["vec_id"]) & set(bf["vec_id"])) / len(bf)
    assert recall >= 0.5, f"recall@{len(bf)} = {recall}"


def test_ann_lsh_multiprobe_matches_sql_oracle(ray_session):
    """Multi-probe LSH vs a DuckDB oracle whose per-band probe SETS (query
    bucket + nearest 1-bit flips) are embedded as IN lists."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_lsh_multiprobe"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_lsh_multiprobe"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_lsh_multiprobe_recall_dominates(ray_session):
    """The probe set is a strict superset of the single-probe bucket per
    band, so multiprobe recall must dominate ann_lsh's — and clear a
    higher floor (measured 0.85 vs 0.50 at sf0.01, 2 extra probes/band)."""
    from raycdc.queries import QUERIES

    bf = to_df(QUERIES["ann_bruteforce"](SF_DIR))
    lsh = to_df(QUERIES["ann_lsh"](SF_DIR))
    mp = to_df(QUERIES["ann_lsh_multiprobe"](SF_DIR))
    r_single = len(set(lsh["vec_id"]) & set(bf["vec_id"])) / len(bf)
    r_multi = len(set(mp["vec_id"]) & set(bf["vec_id"])) / len(bf)
    assert r_multi >= r_single, (r_multi, r_single)
    assert r_multi >= 0.6, f"multiprobe recall@{len(bf)} = {r_multi}"


def test_ann_lsh_multiprobe_indexed_matches_and_prunes(ray_session):
    """The indexed multiprobe search returns exactly the full-scan
    multiprobe result (same probe sets, shared oracle) while reading only
    the probed buckets: ≈ NBANDS·(1+T)/2^BAND_BITS of the exploded table —
    the recall lift costs a proportional, still-pruned read fraction."""
    import pyarrow.parquet as pq

    from raycdc.queries import QUERIES
    from raycdc.queries.ann import (
        LSH_BAND_BITS,
        LSH_NBANDS,
        MULTIPROBE_T,
        _lsh_bucket_paths,
        _lsh_planes,
        _multiprobe_codes,
        _query_vec,
        build_ann_oracle_sql,
        lsh_layout,
    )

    got = canon(to_df(QUERIES["ann_lsh_multiprobe_indexed"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_lsh_multiprobe_indexed"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)

    q = _query_vec(SF_DIR)
    buckets = [
        band * (1 << LSH_BAND_BITS) + c
        for band, cs in enumerate(_multiprobe_codes(q, _lsh_planes()))
        for c in cs
    ]
    files = _lsh_bucket_paths(lsh_layout(SF_DIR), buckets)
    probed = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    total = pq.ParquetFile(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).metadata.num_rows
    expect = LSH_NBANDS * (1 + MULTIPROBE_T) / (1 << LSH_BAND_BITS)
    assert probed / total <= expect * 2.0, (
        f"multiprobe IO not pruned: {probed}/{total} vs ≈{expect:.3f}"
    )


def test_minhash_finds_planted_near_dups(ray_session, tmp_path):
    """Plant near-duplicate docs and check LSH surfaces them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()
    dup = base.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    dup["text"] = dup["text"] + " tail"
    planted = pd.concat([base, dup], ignore_index=True)
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(planted, preserve_index=False),
                   str(d / "documents.parquet"))

    from raycdc.queries import QUERIES

    pairs = to_df(QUERIES["dedup_minhash_pairs"](str(d)))
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    expected = {(int(i), int(i) + 1_000_000) for i in base.head(5)["doc_id"]}
    assert expected <= found, f"missing planted near-dups: {expected - found}"


def test_cdc_replay_salted_matches_unsalted(ray_session):
    from raycdc.queries import QUERIES

    a = canon(to_df(QUERIES["cdc_replay"](SF_DIR)))
    b = canon(to_df(QUERIES["cdc_replay_salted"](SF_DIR)))
    pd.testing.assert_frame_equal(a, b)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = to_df(e.entry())
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "text"} <= set(df.columns)


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    """IVF (nprobe=3 of 8 lists) must recover a meaningful fraction of the
    exact top-k — the recall/throughput tradeoff is the point of IVF, but a
    broken quantizer would show up as near-zero overlap."""
    from raycdc.queries import QUERIES

    bf = to_df(QUERIES["ann_bruteforce"](SF_DIR))
    ivf = to_df(QUERIES["ann_ivf"](SF_DIR))
    recall = len(set(ivf["vec_id"]) & set(bf["vec_id"])) / len(bf)
    assert recall >= 0.5, f"recall@{len(bf)} = {recall}"


def test_ann_ivf_recall_on_cluster_sorted_corpus(ray_session, tmp_path):
    """A corpus sorted by cluster is the adversarial case for prefix-based
    training (``limit(n)`` would only ever see cluster 0); the
    bottom-k-by-hash sample must keep recall up regardless of file order.
    The query row (vec_id=0) deliberately belongs to the LAST cluster."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    dim, per = 16, 400
    centers = rng.randn(8, dim) * 10
    vecs = np.concatenate(
        [c[None, :] + rng.randn(per, dim) for c in centers]
    ).astype(np.float32)
    vecs[0] = centers[-1] + rng.randn(dim)  # query from the last cluster
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )

    from raycdc.queries import QUERIES

    bf = to_df(QUERIES["ann_bruteforce"](str(d)))
    ivf = to_df(QUERIES["ann_ivf"](str(d)))
    recall = len(set(ivf["vec_id"]) & set(bf["vec_id"])) / len(bf)
    assert recall >= 0.5, f"recall@{len(bf)} = {recall}"


def test_range_layout_pruned_read(ray_session):
    """The balanced range layout partitions events completely and
    disjointly, and a single-range read touches ONLY that directory's
    rows (partition pruning — the point of the layout)."""
    import os

    import pyarrow.dataset as pads

    from raycdc.queries.sketches import range_layout

    lay = range_layout(SF_DIR)
    dirs = sorted(d for d in os.listdir(lay) if d.startswith("range_id="))
    assert dirs
    total = 0
    events_n = len(pd.read_parquet(os.path.join(SF_DIR, "events.parquet")))
    one = None
    for d in dirs:
        t = pads.dataset(os.path.join(lay, d)).to_table()
        total += len(t)
        if one is None:
            rid = int(d.split("=", 1)[1])
            cents = np.floor(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            bitlen = np.frexp(np.maximum(cents, 0).astype("float64"))[1]
            bucket = np.where(cents <= 0, 0, bitlen)
            # every row in the dir belongs to exactly this range
            from raycdc.queries.sketches import NRANGES, value_quantile_sketch

            reg = value_quantile_sketch(SF_DIR).sort_values("bucket")
            cum = np.cumsum(reg["n"].to_numpy(np.int64))
            rid_map = dict(
                zip(
                    reg["bucket"].astype(int),
                    ((cum - 1) * NRANGES // cum[-1]).astype(int),
                )
            )
            assert all(rid_map[int(b)] == rid for b in bucket)
            one = d
    assert total == events_n  # complete and disjoint


def test_ann_quantized_recall_vs_bruteforce(ray_session):
    """int8 candidate scan + exact rerank must recover nearly all of the
    exact top-k (the 3×-candidate-pool margin absorbs quantization error)."""
    from raycdc.queries import QUERIES

    bf = to_df(QUERIES["ann_bruteforce"](SF_DIR))
    q8 = to_df(QUERIES["ann_quantized"](SF_DIR))
    recall = len(set(q8["vec_id"]) & set(bf["vec_id"])) / len(bf)
    assert recall >= 0.9, f"recall@{len(bf)} = {recall}"


@pytest.mark.parametrize(
    "name",
    ["cdc_replay", "cdc_replay_salted", "cdc_schema_evolution",
     "cdc_dead_letter",
     "cdc_partition_stats", "cdc_cascade", "cdc_conv_stats",
     "cdc_conv_latest",
     "conv_daily_stats", "conv_cumulative_stats", "cdc_time_travel",
     "cdc_read_key", "cdc_changefeed", "cdc_changefeed_window",
     "cdc_changefeed_latest",
     "cdc_incremental_stats", "cdc_join_view", "cdc_snapshot_diff",
     "cdc_history_scd2",
     "cdc_history_scd2_delta", "cdc_round_ledger", "cdc_fingerprint_index",
     "cdc_neardup_candidates", "cdc_neardup_delta", "cdc_window_dedup",
     "cdc_scd2_asof", "cdc_conv_text", "cdc_turn_pairs",
     "cdc_column_diff", "cdc_mirror", "cdc_line_dedup",
     "cdc_mirror_sharded", "cdc_branch", "cdc_consolidate",
     "cdc_branch_promote"],
)
def test_replay_queries_match_sql_oracle(ray_session, name):
    """The flagship CDC replay (and its derived aggregates) checked against
    a pure-SQL DuckDB replay of the SAME generated change log: rollback
    resolution, guarded LWW, update-patch semantics as window functions."""
    from raycdc.queries import QUERIES
    from raycdc.queries.aggregates import build_aggregate_oracle_sql
    from raycdc.queries.cdc import build_cdc_oracle_sql

    sqls = {**build_cdc_oracle_sql(SF_DIR), **build_aggregate_oracle_sql(SF_DIR)}
    got = canon(to_df(QUERIES[name](SF_DIR)))
    want = canon(duck(sqls[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_dead_letter_replay_state_matches_good_rows_only_oracle(ray_session):
    """error_policy="record" must DIVERT bad rows without distorting what
    survives: the dead-letter variant's final lake state equals a SQL
    replay of the same log restricted to well-formed data rows (rollback
    markers kept — the SQL resolves reorgs from them)."""
    from raycdc import gen
    from raycdc.queries.cdc import (
        _DL_BAD_EVERY,
        CDC_REPLAY_SQL_TEMPLATE,
        _memo_engine,
        _spec_for,
    )

    eng = _memo_engine(
        SF_DIR, "dl",
        spec_overrides={"bad_row_every": _DL_BAD_EVERY},
        engine_kwargs={"error_policy": "record"},
    )
    got = canon(eng.read_lake_pandas())

    dl_spec = _spec_for(SF_DIR, rollback_epochs=(1,), bad_row_every=_DL_BAD_EVERY)
    dl_path = os.path.join(gen.cached_change_log(dl_spec), "changes-*.parquet")
    good_where = (
        " WHERE op = 'rollback' OR (op IN ('insert','update','delete')"
        " AND conv_id IS NOT NULL AND turn_idx IS NOT NULL)"
    )
    want = canon(duck(
        CDC_REPLAY_SQL_TEMPLATE.format(path=dl_path, where=good_where)
    ))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cdc_neardup_candidates_find_planted_content_dups(ray_session):
    """The generator plants mirrored-content convs (content_dup_every), so
    the index-served candidate groups must be NONEMPTY, and every reported
    group must be consistent (n_members = actual member count)."""
    from raycdc.queries import QUERIES

    df = to_df(QUERIES["cdc_neardup_candidates"](SF_DIR))
    assert len(df) > 0, "planted content dups not surfaced by the index"
    sizes = df.groupby("simhash")["conv_id"].size().sort_index()
    got = (
        df.drop_duplicates("simhash")
        .set_index("simhash")["n_members"]
        .sort_index()
        .astype("int64")
    )
    assert sizes.astype("int64").equals(got)
    assert (sizes > 1).all()


def test_simhash_hamming_finds_planted_near_dups(ray_session, tmp_path):
    """Pigeonhole-banded hamming-k search surfaces near-identical docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()
    dup = base.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    planted = pd.concat([base, dup], ignore_index=True)  # EXACT copies: hamming 0
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(planted, preserve_index=False),
                   str(d / "documents.parquet"))

    from raycdc.queries import QUERIES

    pairs = to_df(QUERIES["dedup_simhash_hamming"](str(d)))
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    expected = {(int(i), int(i) + 1_000_000) for i in base.head(5)["doc_id"]}
    assert expected <= found, f"missing planted near-dups: {expected - found}"
    assert (pairs["hamming"] <= 3).all()


def test_scd2_current_rows_equal_replay_state(ray_session):
    """SCD2 law: projecting the history table's is_current versions must
    reproduce the replay's final lake state exactly — the history table is
    a strict superset of current state, closed under the same rollback /
    patch / delete semantics."""
    from raycdc.queries import QUERIES
    from raycdc.queries.cdc import _WM

    hist = to_df(QUERIES["cdc_history_scd2"](SF_DIR))
    cur = hist[hist["is_current"] == 1].copy()
    cur["cursor"] = cur["valid_from"] // _WM
    cur["seq"] = (cur["valid_from"] % _WM).astype("int32")
    cur = cur[["conv_id", "turn_idx", "role", "text", "tool", "ts",
               "cursor", "seq"]]
    replay = QUERIES["cdc_replay"](SF_DIR)
    pd.testing.assert_frame_equal(canon(cur), canon(replay), check_dtype=False)


def test_hll_daily_users_estimates_per_group(ray_session):
    """Each day's register slice must estimate that day's true distinct
    user count within the m=256 standard-error envelope."""
    import duckdb

    from raycdc.queries import QUERIES
    from raycdc.queries.sketches import hll_estimate

    regs = to_df(QUERIES["hll_daily_users"](SF_DIR))
    truth = duck(
        "SELECT date_trunc('day', ts) AS day,"
        " count(DISTINCT user_id) AS n FROM events GROUP BY 1"
    ).set_index("day")["n"]
    assert set(regs["day"]) == set(truth.index)
    for day, grp in regs.groupby("day"):
        est = hll_estimate(grp)
        true_n = int(truth[day])
        assert abs(est - true_n) / true_n < 0.25, (day, est, true_n)


def test_quantile_sketch_estimates_within_bucket_width(ray_session):
    """The sketch estimator must land within the factor-2 bucket envelope
    of the exact quantile for p50/p90/p99."""
    from raycdc.queries import QUERIES
    from raycdc.queries.sketches import quantile_sketch_estimate

    regs = to_df(QUERIES["value_quantile_sketch"](SF_DIR))
    exact = duck(
        "SELECT quantile_cont(value, 0.5) AS p50,"
        " quantile_cont(value, 0.9) AS p90,"
        " quantile_cont(value, 0.99) AS p99 FROM events"
    ).iloc[0]
    for q, true in (("p50", exact.p50), ("p90", exact.p90), ("p99", exact.p99)):
        est = quantile_sketch_estimate(regs, float(q[1:]) / 100)
        assert 0.5 <= est / true <= 2.0, (q, est, true)


def test_scd2_delta_prunes_input(ray_session):
    """The incremental history pass must (a) prune the file list by the
    filename cursor ranges before any IO and (b) restrict the re-derive to
    a dirty key set smaller than the corpus."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    from raycdc.queries.cdc import (
        _log_files,
        _snapshot_round_cursor,
    )

    _, anchor = _snapshot_round_cursor(SF_DIR)
    files = _log_files(SF_DIR)
    hi = lambda p: int(os.path.basename(p).split("-")[3].split(".")[0])
    post = [f for f in files if hi(f) > anchor]
    assert 0 < len(post) < len(files), (len(post), len(files))

    all_convs = pc.count_distinct(
        pads.dataset(files).to_table(columns=["conv_id"]).column("conv_id")
    ).as_py()
    dirty = pc.count_distinct(
        pads.dataset(post)
        .to_table(columns=["conv_id"], filter=pads.field("cursor") > anchor)
        .column("conv_id")
    ).as_py()
    assert dirty < all_convs, (dirty, all_convs)


def test_dsir_weights_match_sql_oracle(ray_session):
    """DSIR importance weights vs the DuckDB oracle that derives bucket
    statistics independently in SQL (tokenization/hash/split drift would
    surface as a LUT mismatch); pins that scores are non-constant."""
    from raycdc.queries import QUERIES
    from raycdc.queries.docs import build_docs_oracle_sql

    got = canon(to_df(QUERIES["docs_dsir_weights"](SF_DIR)))
    want = canon(duck(build_docs_oracle_sql(SF_DIR)["docs_dsir_weights"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)
    assert got["dsir_score"].nunique() > 1


def test_bm25_matches_sql_oracle(ray_session):
    """BM25 top-k vs a DuckDB oracle carrying the driver-computed
    idf/avgdl double literals — unrounded scores are bit-identical, so
    rank order needs no tolerance."""
    from raycdc.queries import QUERIES
    from raycdc.queries.docs import build_docs_oracle_sql

    got = canon(to_df(QUERIES["docs_bm25_topk"](SF_DIR)))
    want = canon(duck(build_docs_oracle_sql(SF_DIR)["docs_bm25_topk"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)


def test_ann_pq_matches_sql_oracle(ray_session):
    """PQ/ADC candidates + exact rerank vs a DuckDB oracle carrying the
    trained codebooks and the query LUT as literals."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_pq"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_pq"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)


def test_ann_pq_recall_vs_bruteforce(ray_session):
    """ADC candidates must carry most of the exact top-k: 4-byte codes are
    lossy, but CAND_K=3×TOP_K rerank recovers recall ≥ 0.7 on this corpus."""
    from raycdc.queries import QUERIES

    pq = to_df(QUERIES["ann_pq"](SF_DIR))
    bf = to_df(QUERIES["ann_bruteforce"](SF_DIR))
    recall = len(set(pq["vec_id"]) & set(bf["vec_id"])) / len(bf)
    assert recall >= 0.7, f"recall@{len(bf)} = {recall}"


def test_ann_ivf_pq_matches_sql_oracle(ray_session):
    """Persisted IVF-PQ (probed-list IO pruning + int8-code ADC scan +
    exact rerank) vs a DuckDB oracle replaying the whole pipeline from
    centroid/codebook/LUT literals."""
    from raycdc.queries import QUERIES
    from raycdc.queries.ann import build_ann_oracle_sql

    got = canon(to_df(QUERIES["ann_ivf_pq"](SF_DIR)))
    want = canon(duck(build_ann_oracle_sql(SF_DIR)["ann_ivf_pq"]))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)
