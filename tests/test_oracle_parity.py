"""Local replica of the driver's correctness gate: every queries() entry vs
its oracle_sql() DuckDB mirror at sf0.001 — row count, column names, and
order-insensitive values must match exactly."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(x) -> pd.DataFrame:
    return x.to_pandas() if hasattr(x, "to_pandas") else pd.DataFrame(x)


def _check(entry_mod, con, name):
    ray_df = _canon(_to_df(entry_mod.queries()[name](SF)))
    ora_df = _canon(con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(ora_df.columns)
    assert len(ray_df) == len(ora_df)
    for c in ray_df.columns:
        if ray_df[c].dtype == object:
            ora_df[c] = ora_df[c].astype(str)
        else:
            ora_df[c] = ora_df[c].astype(ray_df[c].dtype)
    pd.testing.assert_frame_equal(ray_df, ora_df)


@pytest.mark.parametrize(
    "name",
    [
        "fixture_gold_triples",
        "extract_triples_baseline",
        "extract_triples_mpn",
        "extract_triples_mhs",
        "extract_triples_biaffine",
        "extract_triples_baseline_wordpiece",
        "extract_complex_slots",
        "transcripts_reconstruct",
        "kg_nodes",
        "kg_edges",
        "kg_node_degrees",
        "kg_triangles",
        "kg_components",
        "q1_pricing_summary",
        "q3_top_orders",
        "suppliers_per_region",
        "events_user_stats",
        "events_sessionize",
        "events_sessionize_salted",
        "events_prev_lag",
        "events_attribution",
        "events_funnel",
        "events_retention",
        "events_window_counts",
        "events_hopping_counts",
        "events_distinct_users",
        "orders_priority_exists",
        "custs_no_urgent_order",
        "q5_local_supplier_revenue",
        "q10_returned_revenue",
        "events_type_quantiles",
        "orders_priority_exists_bloom",
        "docs_posting_lists",
        "docs_lang_source_rollup",
        "docs_lang_source_cube",
        "docs_repetition",
        "docs_decontaminate",
        "docs_pii_redact",
        "docs_chunks",
        "docs_stratified_sample",
        "docs_bottomk_sample",
        "docs_substring_dup",
        "docs_tfidf_terms",
        "docs_top_tokens",
        "docs_top2_per_lang",
        "events_value_median",
        "parts_brand_stats",
        "part_cheapest_supplier",
        "docs_train_test_split",
        "docs_exact_dedup",
        "docs_ngram_jaccard",
        "docs_dup_clusters",
        "docs_dedup_keep",
        "docs_clean_corpus",
        "eval_extraction_pr",
        "docs_token_stats",
        "docs_quality",
        "docs_langid",
        "emb_knn_bruteforce",
        # sketch-accuracy boolean verdicts (oracle = exact values + TRUE)
        "events_user_hll_check",
        "docs_top_tokens_mg_check",
        "events_value_quantiles_hist_check",
        # round-4 additions
        "q18_large_orders",
        "events_running_total",
        "docs_search_and",
        "docs_quality_filter",
        "kg_edges_named",
        "parts_above_brand_avg",
        "events_user_type_pivot",
        "region_nations_list",
        "docs_near_dup_check",
        "emb_ivf_recall_check",
        "events_value_ma_1h",
        "docs_langid_confusion",
        "docs_training_corpus",
        "docs_edit_dist_pairs",
        "parts_price_rank",
        # round-5 additions
        "kg_pagerank_check",
        "events_type_stats_var",
        "events_hivalue_except_users",
        "events_hivalue_intersect_users",
        "lineitem_discount_bands",
        "events_user_ntile",
        "docs_url_domains",
        "docs_rare_token_stats",
        "custs_priority_mode",
        "kg_kcore_check",
        "events_full_coverage_users",
    ],
)
def test_query_matches_oracle(entry_mod, con, name):
    _check(entry_mod, con, name)


def test_every_query_has_rows_and_callables(entry_mod):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    assert ds.count() > 0
    assert "predicate" in ds.schema().names


def test_kb_alias_uniqueness():
    """The SQL kb join assumes alias surfaces are globally unique."""
    from nlp_series_relation_extraction_ray.sources.kb import build_alias_kb

    seen = {}
    for row in build_alias_kb():
        for alias in row["aliases"]:
            assert alias not in seen, (alias, seen.get(alias), row["entity_id"])
            seen[alias] = row["entity_id"]
