"""Join strategies for Ray Data (the reference has no relational joins —
SURVEY §2.5 — but an engine at corpus scale needs them).

Two physical strategies, chosen by side size:

- ``broadcast_join``: the small side is ``ray.put`` once as a hash map and
  probed inside ``map_batches`` — a map-side hash join, zero shuffle.  Use
  whenever one side fits comfortably in a worker heap (dimension tables).
- ``shuffle_join``: both sides tagged and unioned, then one
  ``groupby(key)`` co-locates matching keys and ``map_groups`` emits the
  join — a single all-to-all exchange, the general path for two large
  tables.  Skewed keys hurt here exactly like any shuffle; pre-filter and
  pre-project before calling.
"""

from __future__ import annotations

from ..sources.readers import table_from_pandas

import numpy as np
import pandas as pd
import pyarrow as pa


def _pandas_dtypes(ds) -> dict[str, np.dtype]:
    """Column -> numpy dtype map from a Dataset's schema (arrow or pandas
    blocks; arrow types map through ``to_pandas_dtype``)."""
    sch = ds.schema()
    out: dict[str, np.dtype] = {}
    for name, t in zip(sch.names, sch.types):
        try:
            out[name] = np.dtype(t.to_pandas_dtype())
        except (AttributeError, TypeError):
            try:
                out[name] = np.dtype(t)
            except TypeError:
                out[name] = np.dtype("object")
    return out


def broadcast_join(
    large_ds,
    small_df: pd.DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
):
    """Probe-side map join: ``large_ds`` ⋈ broadcast ``small_df``.

    The small side ships to each task via Ray's object store (zero-copy
    reads per node, not per batch).
    """
    import ray

    small_ref = ray.put(small_df)

    def probe(batch: pa.Table) -> pa.Table:
        small = ray.get(small_ref)
        df = batch.to_pandas()
        out = df.merge(small, how=how, left_on=left_on, right_on=right_on)
        return table_from_pandas(out, preserve_index=False)

    return large_ds.map_batches(probe, batch_format="pyarrow")


def shuffle_join(left_ds, right_ds, on, l_cols=None, r_cols=None):
    """Distributed hash join via union + groupby(key) co-location.

    Projects each side first (never shuffle unused columns), unions with a
    side tag, then one groupby moves each key to one reducer where the
    in-group cartesian join runs.  ``on`` may be one column or a list
    (composite keys — e.g. the (key, salt) pair of
    :func:`salted_shuffle_join`).
    """
    on = [on] if isinstance(on, str) else list(on)
    if l_cols is not None:
        left_ds = left_ds.select_columns(list(dict.fromkeys(on + l_cols)))
    if r_cols is not None:
        right_ds = right_ds.select_columns(list(dict.fromkeys(on + r_cols)))
    # union() unifies schemas (null-filling the other side's columns), so
    # remember each side's real column set to re-project inside the group
    l_names = list(left_ds.schema().names)
    r_names = list(right_ds.schema().names)

    # normalize both sides to the SAME column set AND dtypes before the
    # union: reindex alone fills a side's missing columns with NaN
    # (float64) while the owning side keeps int64/bool, so the two sides'
    # blocks carry genuinely different schemas through the shuffle.  A
    # common dtype map — promote a column missing on one side to its
    # NaN-compatible dtype on BOTH sides — makes every union block
    # schema-identical.  Join keys exist on both sides, so key dtypes are
    # never promoted; non-key promotions (int→float64, exact below 2^53)
    # match what the in-bucket pandas concat did implicitly anyway.
    all_names = list(dict.fromkeys(l_names + r_names))
    l_types = _pandas_dtypes(left_ds)
    r_types = _pandas_dtypes(right_ds)

    def _null_ok(dt: np.dtype) -> np.dtype:
        if dt.kind in "iu":
            return np.dtype("float64")
        if dt.kind == "b":
            return np.dtype("object")
        return dt

    target: dict[str, np.dtype] = {}
    for c in all_names:
        if c in l_types and c in r_types:
            lt, rt = l_types[c], r_types[c]
            if lt == rt:
                target[c] = lt
            elif lt.kind in "iuf" and rt.kind in "iuf":
                target[c] = np.promote_types(lt, rt)
            else:
                target[c] = np.dtype("object")
        else:
            target[c] = _null_ok(l_types.get(c) or r_types[c])

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reindex(columns=all_names)
            casts = {
                c: t for c, t in target.items() if df[c].dtype != t
            }
            if casts:
                df = df.astype(casts)
            df["__side"] = side
            return df

        return fn

    tagged = left_ds.map_batches(tag("l"), batch_format="pandas").union(
        right_ds.map_batches(tag("r"), batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pandas merge per hash bucket joins EVERY key in
        # the bucket at once (merge handles the per-key cartesian); a
        # per-group merge would pay frame construction per distinct key
        # reindex: a bucket block may carry only one side's physical schema
        l = df[df["__side"] == "l"].reindex(columns=l_names)
        r = df[df["__side"] == "r"].reindex(columns=r_names)
        # merge on empty sides still yields the full joined column set, so
        # downstream stages always see a stable schema
        return l.merge(r, on=on)

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(tagged, on, join_bucket)


def cents(x: np.ndarray | pd.Series) -> np.ndarray:
    """Deterministic fixed-point money: floor(x*100 + 0.5) as int64.

    Matches DuckDB ``CAST(FLOOR(x*100 + 0.5) AS BIGINT)`` bit-for-bit, so
    distributed sums are order-independent integers (raw double sums differ
    across engines/partitionings in the last ulp).
    """
    arr = np.asarray(x, dtype=np.float64)
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


def salted_shuffle_join(
    left_ds,
    right_ds,
    on: str,
    hot_keys,
    n_salt: int = 8,
    l_cols=None,
    r_cols=None,
):
    """:func:`shuffle_join` with HOT-KEY SALTING: rows of ``hot_keys``
    (the handful of keys that dominate the distribution — a viral user, a
    default value) spread across ``n_salt`` sub-partitions instead of all
    landing on one reducer.

    Classic asymmetric salting, expressed through the composite-key
    shuffle join: LEFT hot rows take a round-robin salt (the salt only
    chooses WHERE a pair is computed, never WHETHER — output is
    partition-invariant), RIGHT hot rows replicate to every salt, and the
    join key becomes ``(on, __salt)`` — each (left row, right row) pair
    meets in exactly one salt cell, so the result is identical to the
    unsalted join with no post-filtering.  Non-hot rows keep salt 0 and
    pay nothing.  Replication cost = #right-hot-rows × ``n_salt``; salt
    the side with FEWER hot rows by swapping arguments.

    ``hot_keys`` comes from a cheap pre-count (e.g. the Misra–Gries
    heavy-hitter sketch, ``functions/sketches.py``) — the same detection
    the salted sessionizer uses.
    """
    if l_cols is not None:
        left_ds = left_ds.select_columns(list(dict.fromkeys([on] + l_cols)))
    if r_cols is not None:
        right_ds = right_ds.select_columns(
            list(dict.fromkeys([on] + r_cols))
        )
    hot = set(hot_keys)

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__salt"] = np.int32(0)
        m = df[on].isin(hot).to_numpy()
        df.loc[m, "__salt"] = (
            np.arange(int(m.sum())) % n_salt
        ).astype("int32")
        return df

    def replicate_right(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__salt"] = np.int32(0)
        m = df[on].isin(hot)
        if not m.any():
            return df
        cold = df[~m]
        hot_rows = df[m].drop(columns="__salt")
        reps = []
        for sdx in range(n_salt):
            r = hot_rows.copy()
            r["__salt"] = np.int32(sdx)
            reps.append(r)
        return pd.concat([cold] + reps, ignore_index=True)

    joined = shuffle_join(
        left_ds.map_batches(salt_left, batch_format="pandas"),
        right_ds.map_batches(replicate_right, batch_format="pandas"),
        on=[on, "__salt"],
    )
    return joined.map_batches(
        lambda df: df.drop(columns="__salt"), batch_format="pandas"
    )
