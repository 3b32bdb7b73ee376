"""Hash-bucketed group-apply: the vectorized reduce for high-cardinality keys.

``Dataset.groupby(key).map_groups(fn)`` calls ``fn`` once per group with a
per-group pandas frame — correct, but at 10⁶+ distinct keys the per-group
frame construction dominates (100 µs × 10⁶ groups ≈ minutes of pure
overhead).  ``bucketed_group_apply`` shuffles on ``hash(key) % n_buckets``
instead, so the reduce UDF receives ONE multi-group frame per bucket and
runs a *vectorized* ``df.groupby(key)`` over thousands of keys at once.

Partitioning guarantee is identical (every row of a key lands in exactly one
bucket — the hash is a pure function of the key columns), reducer count is
bounded by ``n_buckets`` (size it ≈ 2-4× cluster cores; each bucket holds
~N/n_buckets rows), and the output is the concatenation of the per-bucket
frames — same rows as per-group map_groups, in no guaranteed order.

The hash is ``pandas.util.hash_pandas_object`` (fixed internal key —
deterministic across processes and machines, vectorized over the column).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket_of(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    if len(df) == 0:
        # hash_pandas_object raises on empty object-dtype columns
        return np.array([], dtype=np.int32)
    h = np.zeros(len(df), dtype=np.uint64)
    for ki, k in enumerate(keys):
        s = df[k]
        if pd.api.types.is_numeric_dtype(s):
            # canonicalize: an int64 key NaN-upcast to float64 in another
            # block must hash identically (2 vs 2.0); exact for |v| < 2^53
            s = s.astype("float64")
        # per-column hash_key salt: with one shared hash function, rows
        # whose key columns carry equal (or swapped) values would XOR to
        # the same bucket (h^h=0) — a reducer-skew hotspot when key
        # columns correlate
        h ^= pd.util.hash_pandas_object(
            s, index=False, hash_key=f"{ki:016d}"
        ).to_numpy(dtype=np.uint64)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def bucketed_group_apply(ds, keys, fn, n_buckets: int = 64):
    """``fn(bucket_df) -> DataFrame`` over hash buckets of ``keys``.

    ``fn`` sees all rows of many whole groups at once and must itself group
    by ``keys`` (vectorized ``df.groupby``) — it is never handed a partial
    group.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0 and not all(k in df.columns for k in keys):
            # degenerate empty block (e.g. schema-less artifact): it holds
            # no rows, so it contributes nothing — canonical minimal schema
            return pd.DataFrame({"__bucket": pd.Series([], dtype="int32")})
        df["__bucket"] = _bucket_of(df, keys, n_buckets)
        return df

    def apply_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__bucket")
        if len(df) == 0 and not all(k in df.columns for k in keys):
            # zero-row degenerate group frame: emit nothing (fn would not
            # know this schema either)
            return pd.DataFrame()
        return fn(df)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def coalesced_group_apply(ds, keys, fn):
    """Single-block group apply for SMALL post-reduce datasets.

    A final ``Dataset.groupby(key).map_groups(fn)`` over a handful of
    groups (priorities, nations, event types) still pays a full sort
    all-to-all — ~seconds of fixed coordination for KB of data.  When the
    input is already bounded (the output of a bucketed reduce:
    ≤ #buckets × #groups rows), coalescing to ONE block and grouping in
    pandas is strictly cheaper and scale-safe.

    Use ONLY for finals whose group count is intrinsically small and whose
    input is a reduce output — never for corpus-cardinality keys (those
    stay on ``bucketed_group_apply``).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def apply_all(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        outs = [fn(g) for _, g in df.groupby(keys, sort=False)]
        return (
            pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
        )

    return ds.repartition(1).map_batches(
        apply_all, batch_format="pandas", batch_size=None
    )
