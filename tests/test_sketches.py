"""Mergeable-sketch bounds: HyperLogLog distinct counting and Misra–Gries
heavy hitters (functions/sketches.py) — the published error guarantees,
merge algebra, and the Dataset-level operators vs their exact
counterparts."""

import numpy as np
import pandas as pd
import pytest

from nlp_series_relation_extraction_ray.functions.sketches import (
    HLL_P,
    docs_top_tokens_mg,
    events_user_hll,
    hll_estimate,
    hll_merge,
    hll_partial,
    mg_merge,
    mg_partial,
)

from nlp_series_relation_extraction_ray.functions.sketches import (
    bloom_fold,
    bloom_may_contain,
    bloom_partial,
)

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_low_fp():
    """Every inserted key probes True (one-sided error), the fold is an
    OR (merging partials == inserting the union), and the false-positive
    rate stays near the (1-e^{-kn/m})^k prediction."""
    rng = np.random.default_rng(5)
    m_bits, k = 1 << 16, 4
    keys = rng.choice(1 << 40, size=2000, replace=False)
    a = bloom_partial(keys[:1000], m_bits, k)
    b = bloom_partial(keys[1000:], m_bits, k)
    bits = bloom_fold([a, b], m_bits)
    assert bloom_may_contain(bits, keys, m_bits, k).all()
    # fold == insert-all
    assert np.array_equal(bits, bloom_partial(keys, m_bits, k))

    absent = rng.choice(1 << 40, size=20_000, replace=False)
    absent = absent[~np.isin(absent, keys)]
    fp = bloom_may_contain(bits, absent, m_bits, k).mean()
    predicted = (1 - np.exp(-k * len(keys) / m_bits)) ** k  # ~0.3%
    assert fp < 3 * predicted + 0.005


def test_bloom_empty_batch():
    m_bits, k = 1 << 10, 3
    assert bloom_partial(np.array([], dtype=np.int64), m_bits, k).sum() == 0
    assert bloom_may_contain(
        np.zeros(m_bits // 8, np.uint8), np.array([], dtype=np.int64),
        m_bits, k,
    ).shape == (0,)


def test_hll_accuracy_and_merge():
    """Estimate within ~3σ of the 1.04/sqrt(m) bound at 10k distinct, and
    the register merge is associative/commutative/idempotent."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 50, size=20_000)
    distinct = len(set(vals.tolist()))

    a = hll_partial(vals[:7_000])
    b = hll_partial(vals[7_000:15_000])
    c = hll_partial(vals[15_000:])

    merged = hll_merge(hll_merge(a, b), c)
    est = hll_estimate(merged)
    rel_err = abs(est - distinct) / distinct
    assert rel_err < 3 * 1.04 / np.sqrt(1 << HLL_P)

    # merge algebra
    assert np.array_equal(
        hll_merge(a, hll_merge(b, c)), hll_merge(hll_merge(a, b), c)
    )
    assert np.array_equal(hll_merge(a, b), hll_merge(b, a))
    assert np.array_equal(hll_merge(a, a), a)
    # duplicates never move the estimate: same registers for 1x and 3x
    assert np.array_equal(
        hll_partial(np.concatenate([vals, vals, vals])), hll_partial(vals)
    )


def test_hll_small_range_exact_ish():
    """Linear-counting correction keeps tiny cardinalities near-exact."""
    est = hll_estimate(hll_partial(np.arange(100)))
    assert abs(est - 100) <= 3


def test_misra_gries_bounds():
    """Any token above n/(k+1) survives partial+merge, and reported counts
    under-estimate by at most n/(k+1)."""
    k = 10
    rng = np.random.default_rng(3)
    # planted heavy hitter: 30% of a 10k stream; tail is near-uniform noise
    stream = ["HEAVY"] * 3000 + [f"t{int(x)}" for x in
                                 rng.integers(0, 2000, size=7000)]
    rng.shuffle(stream)
    half = len(stream) // 2
    merged = mg_merge(
        mg_partial(stream[:half], k), mg_partial(stream[half:], k), k
    )
    n = len(stream)
    assert "HEAVY" in merged  # true count 3000 > n/(k+1) = 909
    true = 3000
    assert merged["HEAVY"] <= true
    assert true - merged["HEAVY"] <= n // (k + 1)
    assert len(merged) <= k


def test_events_user_hll_matches_exact_within_bound(ray_session):
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        events_distinct_users,
    )

    exact = (
        events_distinct_users(SF).to_pandas().set_index("event_type")[
            "n_users"
        ]
    )
    approx = (
        events_user_hll(SF).to_pandas().set_index("event_type")[
            "n_users_approx"
        ]
    )
    assert set(exact.index) == set(approx.index)
    for et in exact.index:
        rel_err = abs(int(approx[et]) - int(exact[et])) / max(int(exact[et]), 1)
        assert rel_err < 3 * 1.04 / np.sqrt(1 << HLL_P) + 0.05


def test_docs_top_tokens_mg_finds_exact_heavy_hitters(ray_session):
    """With 256 counters over the sf0.001 vocabulary, every exact top-20
    token must survive the MG pass (they all clear n/257), and each MG
    count must be a lower bound within n/257 of the true count."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        docs_top_tokens,
    )

    exact = docs_top_tokens(SF, k=20).to_pandas()
    mg = docs_top_tokens_mg(SF, k=256, counters=256).to_pandas()
    mg_map = dict(zip(mg["token"], mg["mg_count"].astype(int)))

    n_tokens = int(
        pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
        .str.split(" ").str.len().sum()
    )
    slack = n_tokens // 257
    for _, row in exact.iterrows():
        tok, true = row["token"], int(row["cnt"])
        if true <= slack:
            continue  # below the guarantee threshold
        assert tok in mg_map, f"heavy hitter {tok!r} lost by MG"
        assert mg_map[tok] <= true
        assert true - mg_map[tok] <= slack


def test_hist_quantile_partial_merge_and_bound():
    """Merged bin counts give quantiles within one bin width of exact."""
    import numpy as np

    from nlp_series_relation_extraction_ray.functions.sketches import (
        hist_partial,
        hist_quantile,
    )

    rng = np.random.RandomState(7)
    vals = rng.gamma(2.0, 50.0, size=20_000)
    lo, hi = float(vals.min()), float(vals.max())
    # merge = vector add over independently-folded partials
    counts = sum(
        hist_partial(chunk, lo, hi) for chunk in np.array_split(vals, 13)
    )
    width = (hi - lo) / len(counts)
    for q in (0.5, 0.9, 0.99):
        exact = float(np.sort(vals)[int(np.ceil(q * len(vals))) - 1])
        assert abs(hist_quantile(counts, q, lo, hi) - exact) <= width + 1e-9


def test_events_value_quantiles_hist_close_to_exact(ray_session):
    """The distributed histogram sketch lands within one bin width of the
    exact per-type order statistics."""
    import duckdb

    from nlp_series_relation_extraction_ray.functions.sketches import (
        events_value_quantiles_hist,
    )

    sf = "/root/testdata/sf0.001"
    got = events_value_quantiles_hist(sf).to_pandas().set_index("event_type")
    con = duckdb.connect()
    exact = con.execute(f"""
        SELECT event_type, COUNT(*) AS n, MIN(value) lo, MAX(value) hi,
          quantile_disc(value, 0.50) q50, quantile_disc(value, 0.90) q90,
          quantile_disc(value, 0.99) q99
        FROM read_parquet('{sf}/events.parquet') GROUP BY event_type
    """).df().set_index("event_type")
    assert set(got.index) == set(exact.index)
    for et in got.index:
        width = (exact.loc[et, "hi"] - exact.loc[et, "lo"]) / 1024
        assert got.loc[et, "n"] == exact.loc[et, "n"]
        for qc, ec in (("p50", "q50"), ("p90", "q90"), ("p99", "q99")):
            assert abs(got.loc[et, qc] - exact.loc[et, ec]) <= width + 1e-9
