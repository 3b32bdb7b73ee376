"""bucketed_group_apply: the vectorized high-cardinality reduce."""

import numpy as np
import pandas as pd


def test_bucketed_group_apply_matches_per_group(ray_session):
    """Hash-bucketed vectorized reduce must equal a per-group reduce for
    every key, with keys spread across many input blocks."""
    import ray

    from nlp_series_relation_extraction_ray.functions.grouping import (
        bucketed_group_apply,
    )

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 500, size=5000),
            "s": [f"key-{i % 37}" for i in range(5000)],
            "v": rng.randint(0, 1000, size=5000).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(
        [df.iloc[i : i + 250] for i in range(0, len(df), 250)]
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.groupby(["k", "s"], as_index=False)["v"].sum()
        out["v"] = out["v"].astype("int64")
        return out

    got = (
        bucketed_group_apply(ds, ["k", "s"], merge, n_buckets=16)
        .to_pandas()
        .sort_values(["k", "s"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k", "s"], as_index=False)["v"]
        .sum()
        .sort_values(["k", "s"])
        .reset_index(drop=True)
    )
    got["k"] = got["k"].astype(want["k"].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_group_apply_key_never_split(ray_session):
    """Every row of a key must appear in exactly one bucket invocation."""
    import ray

    from nlp_series_relation_extraction_ray.functions.grouping import (
        bucketed_group_apply,
    )

    df = pd.DataFrame({"k": list(range(200)) * 5, "v": 1})
    ds = ray.data.from_pandas(
        [df.iloc[i : i + 100] for i in range(0, len(df), 100)]
    )

    def counts(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.groupby("k", as_index=False)["v"].sum()
        out["v"] = out["v"].astype("int64")
        return out

    got = bucketed_group_apply(ds, "k", counts, n_buckets=8).to_pandas()
    # if a key were split across buckets it would surface as two partial rows
    assert got["k"].is_unique
    assert (got["v"] == 5).all()
