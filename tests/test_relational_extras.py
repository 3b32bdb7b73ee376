"""Semantics tests for the round-3 relational additions: per-type exact
quantiles, Bloom-accelerated EXISTS, bounded-df posting lists, and the
Q10-shaped top-k ranking join with late materialization."""

import duckdb
import numpy as np
import pandas as pd


def test_events_type_quantiles_matches_duckdb(ray_session, tmp_path):
    """Distribution-reduce quantiles equal quantile_disc for every type,
    including a type whose size exercises each ceil(q*n)-1 edge."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        TYPE_QUANTILES_SQL,
        events_type_quantiles,
    )

    rng = np.random.default_rng(11)
    rows = []
    for et, n in [("view", 101), ("click", 7), ("buy", 4)]:
        vals = np.round(rng.uniform(0, 50, size=n), 2)
        rows.append(pd.DataFrame({"event_type": et, "value": vals}))
    df = pd.concat(rows, ignore_index=True)
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = (
        events_type_quantiles(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = (
        con.execute(TYPE_QUANTILES_SQL).df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in want.columns.drop("event_type"):
        want[c] = want[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_bloom_exists_equals_exact_operator(ray_session):
    """The Bloom-pruned EXISTS returns bit-identical rows to the exact
    semi-join on real data (false positives die in the verify)."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        orders_priority_exists,
        orders_priority_exists_bloom,
    )

    sf = "/root/testdata/sf0.001"
    exact = (
        orders_priority_exists(sf).to_pandas()
        .sort_values("o_orderpriority").reset_index(drop=True)
    )
    bloomed = (
        orders_priority_exists_bloom(sf).to_pandas()
        .sort_values("o_orderpriority").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bloomed[exact.columns], exact)


def test_posting_lists_band_and_dedup(ray_session, tmp_path):
    """df band is inclusive on both edges; repeated tokens within one doc
    produce ONE posting; out-of-band tokens vanish entirely."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        docs_posting_lists,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "common rare stop stop common",   # 'common' twice -> 1 posting
                "common stop",
                "common stop",
                "stop mid mid",
            ],
        }
    )
    # df: common=3, stop=4, rare=1, mid=1
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = (
        docs_posting_lists(str(tmp_path), min_df=2, max_df=3)
        .to_pandas()
        .sort_values(["token", "doc_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"token": ["common"] * 3, "df": [3] * 3, "doc_id": [1, 2, 3]}
    )
    want["df"] = want["df"].astype("int64")
    want["doc_id"] = want["doc_id"].astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_q10_topk_late_materialization(ray_session, tmp_path):
    """Only returned ('R') lineitems of in-window orders count; ranking is
    revenue DESC with custkey tie-break; names come from the customer
    table only for winners."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        q10_returned_revenue,
    )

    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["Customer#1", "Customer#2", "Customer#3"],
        }
    ).to_parquet(tmp_path / "customer.parquet", index=False)
    pd.DataFrame(
        {
            "o_orderkey": [10, 11, 12, 13],
            "o_custkey": [1, 2, 3, 1],
            "o_orderdate": pd.to_datetime(
                ["1996-02-01", "1996-02-01", "1996-02-01", "1995-01-01"]
            ),  # 13 out of window
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "l_orderkey": [10, 10, 11, 12, 13],
            "l_returnflag": ["R", "N", "R", "R", "R"],
            "l_extendedprice": [10.0, 99.0, 7.5, 10.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)

    got = q10_returned_revenue(str(tmp_path), k=2).reset_index(drop=True)
    # cust1: 10.00 (R only, window); cust3: 10.00 -> tie broken by custkey;
    # cust2: 7.50 excluded by k=2
    want = pd.DataFrame(
        {
            "o_custkey": [1, 3],
            "c_name": ["Customer#1", "Customer#3"],
            "revenue_cents": [1000, 1000],
        }
    )
    got = got.sort_values("o_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype(
        {"o_custkey": "int64", "revenue_cents": "int64"}
    ), want)


def test_rollup_levels_sum_consistently(ray_session, tmp_path):
    """Leaf rows sum to their lang subtotal, lang subtotals to the grand
    total, across multiple input blocks."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        docs_lang_source_rollup,
    )

    docs = pd.DataFrame(
        {
            "lang": ["en", "en", "en", "zh", "zh"],
            "source": ["web", "web", "book", "web", "book"],
            "n_chars": [10, 20, 30, 40, 50],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    got = (
        docs_lang_source_rollup(str(tmp_path))
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "lang": ["ALL", "en", "en", "en", "zh", "zh", "zh"],
            "source": ["ALL", "ALL", "book", "web", "ALL", "book", "web"],
            "n_docs": [5, 3, 1, 2, 2, 1, 1],
            "total_chars": [150, 60, 30, 30, 90, 50, 40],
        }
    )
    for c in ("n_docs", "total_chars"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)
