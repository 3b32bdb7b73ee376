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


def empty_frame(spec: dict[str, str]) -> pd.DataFrame:
    """Zero-row pandas frame with an explicit dtype per column.

    The one sanctioned way to emit "nothing" from a map/reduce UDF: a bare
    ``pd.DataFrame()`` is schema-less, and schema-divergent empty blocks
    are what produce Ray Data's ``RefBundle with a different schema`` /
    ``Failed to hash the schemas`` warnings — and, at scale, what breaks
    downstream union/write stages.
    """
    return pd.DataFrame(
        {c: pd.Series([], dtype=dt) for c, dt in spec.items()}
    )


def _coerce_empty(empty_result) -> pd.DataFrame | None:
    """Normalize the ``empty_result`` hint (spec dict or zero-row frame)."""
    if empty_result is None:
        return None
    if isinstance(empty_result, dict):
        return empty_frame(empty_result)
    return empty_result.iloc[0:0]


def bucketed_group_apply(ds, keys, fn, n_buckets: int = 64,
                         empty_result=None, dense: bool = True):
    """``fn(bucket_df) -> DataFrame`` over hash buckets of ``keys``.

    ``fn`` sees all rows of many whole groups at once and must itself group
    by ``keys`` (vectorized ``df.groupby``) — it is never handed a partial
    group.

    ``empty_result``: optional OUTPUT-schema hint (``{col: dtype}`` spec or
    a zero-row frame).  Degenerate zero-row inputs then yield a typed empty
    frame instead of a schema-less ``pd.DataFrame()``, keeping every block
    of the stage schema-identical (no per-op guards needed downstream).
    Without the hint, a zero-row frame that still carries the key columns
    is probed through ``fn`` (vectorized groupby UDFs return typed empties
    naturally); only a schema-less zero-row input with no hint falls back
    to the schema-less empty.

    ``dense`` (default True): when the distinct-key count is SMALL (a
    handful of cluster ids, a tiny test fixture), Ray's sort shuffle
    produces empty partitions (more range boundaries than distinct
    ``__bucket`` values), and empty partitions bypass the UDF and surface
    as schema-less bundles (the ``RefBundle with a different schema``
    warnings — and, at scale, schema-divergent empty blocks in downstream
    unions/writes).  Dense mode appends one sentinel row per bucket id to
    every non-empty input block (the block's own first row, ``__bucket``
    overwritten — dtypes exactly preserved, ``n_buckets`` extra rows per
    block, ≈0.1% of a real block) so every bucket value is always
    populated; sentinels are dropped before ``fn`` runs.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    empty_out = _coerce_empty(empty_result)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0 and not all(k in df.columns for k in keys):
            # degenerate empty block (e.g. schema-less artifact): it holds
            # no rows, so it contributes nothing — canonical minimal schema
            cols = {"__bucket": pd.Series([], dtype="int32")}
            if dense:
                cols["__sentinel"] = pd.Series([], dtype="bool")
            return pd.DataFrame(cols)
        df["__bucket"] = _bucket_of(df, keys, n_buckets)
        if dense:
            df["__sentinel"] = False
            if len(df) > 0:
                sent = df.iloc[np.zeros(n_buckets, dtype=np.int64)].copy()
                sent["__bucket"] = np.arange(n_buckets, dtype=np.int32)
                sent["__sentinel"] = True
                df = pd.concat([df, sent], ignore_index=True)
        return df

    def apply_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if dense and "__sentinel" in df.columns:
            df = df[~df["__sentinel"]].drop(columns="__sentinel")
        df = df.drop(columns="__bucket")
        if len(df) == 0:
            if empty_out is not None:
                return empty_out.copy()
            if not all(k in df.columns for k in keys):
                # schema-less zero-row frame and no hint: emit nothing (fn
                # would not know this schema either)
                return pd.DataFrame()
        return fn(df)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def coalesced_group_apply(ds, keys, fn, empty_result=None):
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
    empty_out = _coerce_empty(empty_result)

    def apply_all(df: pd.DataFrame) -> pd.DataFrame:
        empty = (
            empty_out.copy() if empty_out is not None else pd.DataFrame()
        )
        if len(df) == 0:
            return empty
        outs = [fn(g) for _, g in df.groupby(keys, sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    return ds.repartition(1).map_batches(
        apply_all, batch_format="pandas", batch_size=None
    )
